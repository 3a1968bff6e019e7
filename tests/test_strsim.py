"""Jaro-Winkler kernel + operator tests.

The kernel's contract is byte-for-byte agreement with DuckDB's
`jaro_winkler_similarity` (the q60 oracle): textbook pins, a seeded
non-ASCII fuzz against DuckDB, and the Spark operator end-to-end.
"""

import random

import numpy as np
import pytest

from sassy_spark.kernel.jaro import jaro_batch, jaro_winkler_batch


def test_textbook_values():
    # classic published examples (Winkler 1990 / common test vectors)
    got = jaro_winkler_batch(
        [b"MARTHA", b"DIXON", b"DWAYNE", b"abc", b"", b"abc"],
        [b"MARHTA", b"DICKSONX", b"DUANE", b"abc", b"abc", b""],
    )
    exp = [0.9611111111111111, 0.8133333333333332, 0.84, 1.0, 0.0, 0.0]
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_jaro_zero_window_and_transpositions():
    # len 3 strings: window 0 -> only in-place matches
    np.testing.assert_allclose(
        jaro_batch([b"abc"], [b"acb"]), [5.0 / 9.0], atol=1e-12
    )
    # one full transposition (t = 1)
    np.testing.assert_allclose(
        jaro_batch([b"abcd"], [b"acbd"]), [11.0 / 12.0], atol=1e-12
    )


def test_boost_needs_jaro_above_0_7():
    # jaro = 0.5619 with a 4-byte common prefix: boost must NOT apply
    got = jaro_winkler_batch([b"abcdxxxxxx"], [b"abcdyyyyyyyyyy"])
    np.testing.assert_allclose(got, jaro_batch([b"abcdxxxxxx"], [b"abcdyyyyyyyyyy"]))


def test_operates_on_utf8_bytes_not_codepoints():
    # DuckDB-pinned value: byte-level comparison of café vs cafe
    got = jaro_winkler_batch(["café".encode()], [b"cafe"])
    np.testing.assert_allclose(got, [0.8483333333333334], atol=1e-12)


def test_fuzz_against_duckdb():
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(31)
    alph = "abcdef éß日"
    pairs = []
    for _ in range(800):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        s1 = "".join(rng.choice(alph) for _ in range(la))
        s2 = "".join(rng.choice(alph) for _ in range(lb))
        if rng.random() < 0.3:  # force related pairs too
            s2 = s1[: max(0, la - 2)] + s2[:3]
        pairs.append((s1, s2))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    exp = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT jaro_winkler_similarity(a, b) FROM p"
            ).fetchall()
        ]
    )
    got = jaro_winkler_batch(
        [a.encode() for a, _ in pairs], [b.encode() for _, b in pairs]
    )
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_damerau_pins():
    from sassy_spark.kernel.damerau import damerau_levenshtein_batch

    got = damerau_levenshtein_batch(
        [b"CA", b"abcd", b"ab", b"", b"abc", "café".encode()],
        [b"ABC", b"acbd", b"ba", b"abc", b"", b"cafe"],
    )
    # CA->ABC = 2 pins the UNRESTRICTED variant (OSA would say 3)
    assert got.tolist() == [2, 1, 1, 3, 3, 2]


def test_damerau_fuzz_against_duckdb():
    duckdb = pytest.importorskip("duckdb")
    from sassy_spark.kernel.damerau import damerau_levenshtein_batch

    rng = random.Random(13)
    alph = "abcdé 日"
    pairs = []
    for _ in range(800):
        la, lb = rng.randint(0, 10), rng.randint(0, 10)
        s1 = "".join(rng.choice(alph) for _ in range(la))
        s2 = "".join(rng.choice(alph) for _ in range(lb))
        if rng.random() < 0.35 and len(s1) >= 2:  # plant transpositions
            s2 = list(s1)
            i = rng.randrange(len(s2) - 1)
            s2[i], s2[i + 1] = s2[i + 1], s2[i]
            s2 = "".join(s2)
        pairs.append((s1, s2))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    exp = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT damerau_levenshtein(a, b) FROM p"
            ).fetchall()
        ]
    )
    got = damerau_levenshtein_batch(
        [a.encode() for a, _ in pairs], [b.encode() for _, b in pairs]
    )
    assert (got == exp).all()


def test_damerau_operator(spark):
    from pyspark.sql import functions as F

    from sassy_spark.operators.strsim import damerau_pairs

    fields = spark.createDataFrame(
        [("u1", "acme corp"), ("u2", "amce corp"), ("u3", None)],
        ["url", "field"],
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3")], ["url_a", "url_b"]
    )
    rows = {
        (r["url_a"], r["url_b"]): r["dl"]
        for r in damerau_pairs(pairs, fields).collect()
    }
    assert rows[("u1", "u2")] == 1  # one transposition
    assert rows[("u1", "u3")] == len("acme corp")  # vs empty


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _byte_text = st.text(
        alphabet="abcé 日ß", min_size=0, max_size=14
    )

    @given(st.lists(st.tuples(_byte_text, _byte_text), min_size=1, max_size=40))
    @settings(max_examples=60, deadline=None)
    def test_jw_matches_duckdb_hypothesis(pairs):
        duckdb = pytest.importorskip("duckdb")

        con = duckdb.connect()
        con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
        con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
        exp = np.array(
            [
                r[0]
                for r in con.execute(
                    "SELECT jaro_winkler_similarity(a, b) FROM p"
                ).fetchall()
            ]
        )
        got = jaro_winkler_batch(
            [a.encode() for a, _ in pairs], [b.encode() for _, b in pairs]
        )
        np.testing.assert_allclose(got, exp, atol=1e-12)

    @given(st.lists(st.tuples(_byte_text, _byte_text), min_size=1, max_size=40))
    @settings(max_examples=60, deadline=None)
    def test_damerau_matches_duckdb_hypothesis(pairs):
        duckdb = pytest.importorskip("duckdb")

        from sassy_spark.kernel.damerau import damerau_levenshtein_batch

        con = duckdb.connect()
        con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
        con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
        exp = np.array(
            [
                r[0]
                for r in con.execute(
                    "SELECT damerau_levenshtein(a, b) FROM p"
                ).fetchall()
            ]
        )
        got = damerau_levenshtein_batch(
            [a.encode() for a, _ in pairs], [b.encode() for _, b in pairs]
        )
        assert (got == exp).all()


def test_operator_end_to_end(spark):
    from pyspark.sql import functions as F

    from sassy_spark.operators.strsim import jaro_winkler_pairs

    fields = spark.createDataFrame(
        [("u1", "martha stewart"), ("u2", "marhta stewart"), ("u3", None)],
        ["url", "field"],
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3")], ["url_a", "url_b"]
    )
    rows = {
        (r["url_a"], r["url_b"]): r["jw"]
        for r in jaro_winkler_pairs(pairs, fields).collect()
    }
    duckdb = pytest.importorskip("duckdb")

    exp = duckdb.connect().execute(
        "SELECT jaro_winkler_similarity('martha stewart', 'marhta stewart')"
    ).fetchone()[0]
    assert rows[("u1", "u2")] == pytest.approx(exp, abs=1e-12)
    assert rows[("u1", "u3")] == 0.0  # null field -> empty -> 0


def test_missing_field_rows_kept_as_empty(spark):
    from sassy_spark.operators.strsim import damerau_pairs, jaro_winkler_pairs

    fields = spark.createDataFrame([("u1", "acme")], ["url", "field"])
    pairs = spark.createDataFrame([("u1", "u9")], ["url_a", "url_b"])
    # u9 absent from fields entirely: the pair is KEPT, scoring vs ""
    (jw_row,) = jaro_winkler_pairs(pairs, fields).collect()
    assert jw_row["jw"] == 0.0
    (dl_row,) = damerau_pairs(pairs, fields).collect()
    assert dl_row["dl"] == len("acme")


def test_operator_non_ascii_matches_kernel(spark):
    from sassy_spark.operators.strsim import jaro_winkler_pairs

    # byte-level semantics must survive the Spark/Arrow string path:
    # café vs cafe is the DuckDB-pinned 0.8483... (5 UTF-8 bytes vs 4)
    fields = spark.createDataFrame(
        [("u1", "café"), ("u2", "cafe")], ["url", "field"]
    )
    pairs = spark.createDataFrame([("u1", "u2")], ["url_a", "url_b"])
    (row,) = jaro_winkler_pairs(pairs, fields).collect()
    assert row["jw"] == pytest.approx(0.8483333333333334, abs=1e-12)


def test_monge_elkan_series_closed_form():
    import pandas as pd

    from sassy_spark.operators.strsim import _me_series
    from sassy_spark.kernel.jaro import jaro_winkler_batch

    # hand-checked: ME("peter christen", "christian pedro") =
    # mean(max JW(peter, {christian, pedro}), max JW(christen, ...))
    a, b = "peter christen", "christian pedro"
    jw = jaro_winkler_batch(
        [b"peter", b"peter", b"christen", b"christen"],
        [b"christian", b"pedro", b"christian", b"pedro"],
    )
    t1 = int(np.floor(1e6 * max(jw[0], jw[1])))
    t2 = int(np.floor(1e6 * max(jw[2], jw[3])))
    exp = (t1 + t2) // 2
    got = _me_series(pd.Series([a]), pd.Series([b]))
    assert got.tolist() == [exp]

    # identical multi-token fields -> exactly 1.0 (1e6 micros)
    got = _me_series(pd.Series(["acme corp ltd"]), pd.Series(["acme corp ltd"]))
    assert got.tolist() == [1_000_000]

    # asymmetry: left-token mean, so swapping sides can change the score
    l = _me_series(pd.Series(["acme"]), pd.Series(["acme incorporated"]))
    r = _me_series(pd.Series(["acme incorporated"]), pd.Series(["acme"]))
    assert l.tolist() == [1_000_000]  # 'acme' finds its exact match
    assert r.tolist()[0] < 1_000_000  # 'incorporated' has no good match

    # empty / null / punctuation-only fields score 0
    z = _me_series(
        pd.Series(["", None, "!!!", "real text"]),
        pd.Series(["x", "y", "z", ""]),
    )
    assert z.tolist() == [0, 0, 0, 0]


def test_monge_elkan_operator_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")

    from sassy_spark.operators.strsim import monge_elkan_pairs

    rows = [
        ("u1", "peter christen data matching"),
        ("u2", "christian pedro entity resolution"),
        ("u3", "acme corporation 42 ltd"),
        ("u4", "ACME Corp. Ltd (42)"),
    ]
    fields = spark.createDataFrame(rows, ["url", "field"])
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u3", "u4"), ("u4", "u3")], ["url_a", "url_b"]
    )
    got = {
        (r["url_a"], r["url_b"]): r["me_qmicros"]
        for r in monge_elkan_pairs(pairs, fields).collect()
    }
    con = duckdb.connect()
    by_url = dict(rows)
    for (ua, ub), val in got.items():
        exp = con.execute(
            """
            WITH t AS (SELECT
              list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'),
                          x -> x <> '')[1:12] AS ta,
              list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'),
                          x -> x <> '')[1:12] AS tb)
            SELECT CAST(CASE
              WHEN len(ta) = 0 OR len(tb) = 0 THEN 0
              ELSE list_sum(list_transform(ta,
                     x -> CAST(floor(1e6 * list_max(list_transform(tb,
                            y -> jaro_winkler_similarity(x, y))))
                          AS BIGINT))) // len(ta)
            END AS BIGINT) FROM t
            """,
            [by_url[ua], by_url[ub]],
        ).fetchone()[0]
        assert val == exp, (ua, ub, val, exp)


def test_score_pairs_fan_out_from_single_partition(spark):
    # a blocked equi-join upstream can leave EVERY candidate pair in
    # one partition; the operator must fan out before the kernel so
    # scoring is never single-threaded (measured 5.8s -> sub-second on
    # q68's 599k one-partition pairs)
    from pyspark.sql import functions as F

    from sassy_spark.operators.strsim import jaro_winkler_pairs

    n = 512
    pairs = spark.createDataFrame(
        [(f"a{i}", f"b{i}") for i in range(n)], ["url_a", "url_b"]
    ).coalesce(1)
    fields = spark.createDataFrame(
        [(f"a{i}", f"name {i}") for i in range(n)]
        + [(f"b{i}", f"name {i % 7}") for i in range(n)],
        ["url", "field"],
    )
    out = jaro_winkler_pairs(pairs, fields)
    n_parts = (
        out.select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts > 1, n_parts
    assert out.count() == n
    # explicit 0 inherits upstream partitioning (no exchange)
    out0 = jaro_winkler_pairs(pairs, fields, score_partitions=0)
    assert out0.count() == n
