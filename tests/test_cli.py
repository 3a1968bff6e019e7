"""CLI surface (S8 parity verb) — one end-to-end subprocess invocation:
`python -m sassy_spark search` over the sf0.001 documents table, TSV
contract on stdout (header + sorted match rows)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_cli_search_tsv_contract():
    proc = subprocess.run(
        [
            sys.executable, "-m", "sassy_spark", "search",
            "-p", "able", "-k", "0",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--id-col", "doc_id", "--text-col", "text", "--no-trace",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if "\t" in ln]
    header = lines[0].split("\t")
    assert header == [
        "pat_id", "text_id", "cost", "strand", "start", "end",
        "match_region", "cigar",
    ]
    rows = [ln.split("\t") for ln in lines[1:]]
    assert len(rows) > 0
    assert all(r[0] == "p0" and r[2] == "0" and r[3] == "+" for r in rows)
    # deterministic order: sorted by (text_id, start/end, pat_id) —
    # text_id is a STRING column, so the defined order is lexicographic
    keys = [(r[1], int(r[5])) for r in rows]
    assert keys == sorted(keys)
