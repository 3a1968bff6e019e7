"""Batch-vectorized unrestricted Damerau-Levenshtein distance.

Transposition-tolerant edit distance for short identifying fields — the
classic "typo distance" of record linkage (swapped letters cost 1, not
2). This is the UNRESTRICTED variant (Lowrance-Wagner 1975): a
transposed block may be edited again later, so e.g. CA -> ABC costs 2
(not the OSA/restricted 3). Semantics are pinned byte-for-byte to
DuckDB's `damerau_levenshtein` (UTF-8 bytes, not codepoints) by a fuzz
test in tests/test_strsim.py.

Unlike Levenshtein (Myers bit-parallel, kernel/myers.py), no practical
bit-parallel algorithm exists for the unrestricted variant — the
transposition term references an arbitrary earlier DP cell via
last-occurrence bookkeeping. The implementation here keeps the full
(n, La+2, Lb+2) DP tensor and walks the classic double loop with every
cell update vectorized across the PAIR axis: ~La*Lb vector steps per
batch regardless of batch size. That is the right trade for short
fields (<= ~128 bytes, the intended use); for long-text distance use
the Myers kernel.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def damerau_levenshtein_batch(
    a: Sequence[bytes], b: Sequence[bytes]
) -> np.ndarray:
    """Unrestricted Damerau-Levenshtein distance per aligned pair.

    Returns int64 array of shape (len(a),).
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)
    La = int(la.max(initial=0))
    Lb = int(lb.max(initial=0))
    if La == 0 or Lb == 0:
        return np.where(la == 0, lb, la).astype(np.int64)

    # byte matrices; pads get DISTINCT out-of-alphabet codes per side so
    # a-pad never equals b-pad and neither equals a real byte — cells
    # beyond a pair's true lengths then never pollute its da/db
    # bookkeeping, and its answer is read at (la+1, lb+1) before pad
    # rows could matter
    A = np.full((n, La), 256, dtype=np.int64)
    B = np.full((n, Lb), 257, dtype=np.int64)
    for r, s in enumerate(a):
        if s:
            A[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    for r, s in enumerate(b):
        if s:
            B[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)

    maxdist = int(La + Lb)
    rows = np.arange(n)

    # D has a -inf-like border at index 0 (maxdist) and the standard
    # first row/col at index 1 — Lowrance-Wagner layout
    D = np.full((n, La + 2, Lb + 2), maxdist, dtype=np.int32)
    D[:, 1, 1:] = np.arange(Lb + 1, dtype=np.int32)[None, :]
    D[:, 1:, 1] = np.arange(La + 1, dtype=np.int32)[None, :]

    # da[p, c]: last row index i (1-based) where byte c occurred in a[p];
    # slots 256/257 are the pad codes and stay 0 (border row)
    da = np.zeros((n, 258), dtype=np.int64)

    for i in range(1, La + 1):
        ai = A[:, i - 1]
        db = np.zeros(n, dtype=np.int64)
        for j in range(1, Lb + 1):
            bj = B[:, j - 1]
            k = da[rows, bj]
            l = db
            eq = ai == bj
            cost = np.where(eq, 0, 1).astype(np.int32)
            db = np.where(eq, j, db)
            sub = D[:, i, j] + cost
            ins = D[:, i + 1, j] + 1
            dele = D[:, i, j + 1] + 1
            trans = (
                D[rows, k, l]
                + (i - k - 1).astype(np.int32)
                + 1
                + (j - l - 1).astype(np.int32)
            )
            D[:, i + 1, j + 1] = np.minimum(
                np.minimum(sub, ins), np.minimum(dele, trans)
            )
        da[rows, ai] = i

    return D[rows, la + 1, lb + 1].astype(np.int64)
