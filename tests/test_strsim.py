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


def _scalar_gotoh(a: bytes, b: bytes, sub=2, o=3, e=1) -> int:
    """Textbook three-matrix Gotoh DP, O(la*lb) scalar — the oracle for
    the batch kernel's fuzz pin."""
    la, lb = len(a), len(b)
    INF = 1 << 30
    D = [[0] * (lb + 1) for _ in range(la + 1)]
    P = [[INF] * (lb + 1) for _ in range(la + 1)]
    Q = [[INF] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        D[i][0] = o + i * e
    for j in range(1, lb + 1):
        D[0][j] = o + j * e
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            P[i][j] = min(D[i - 1][j] + o + e, P[i - 1][j] + e)
            Q[i][j] = min(D[i][j - 1] + o + e, Q[i][j - 1] + e)
            c = 0 if a[i - 1] == b[j - 1] else sub
            D[i][j] = min(D[i - 1][j - 1] + c, P[i][j], Q[i][j])
    return D[la][lb]


def test_gotoh_pins():
    from sassy_spark.kernel.gotoh import affine_gap_batch

    got = affine_gap_batch(
        [b"", b"abc", b"", b"abc", b"abcdef", b"kitten"],
        [b"", b"", b"xy", b"abc", b"abef", b"sitting"],
    )
    # abcdef->abef: delete "cd" = one gap of 2 = 3+2 = 5 (Levenshtein
    # under the same unit costs would pay 2*ext+2*open if split);
    # kitten->sitting: 2 subs (2*2) + 1 insert (3+1) = 8
    assert got.tolist() == [0, 6, 5, 0, 5, 8]


def test_gotoh_gap_cheaper_than_scattered_edits():
    from sassy_spark.kernel.gotoh import affine_gap_batch

    # the affine model's reason to exist: a dropped middle token is ONE
    # gap (open + L*ext), not L independent edits
    a = b"john robert smith"
    b = b"john smith"
    (got,) = affine_gap_batch([a], [b]).tolist()
    assert got == 3 + 7  # one 7-byte gap "robert "


def test_gotoh_fuzz_against_scalar_dp():
    from sassy_spark.kernel.gotoh import affine_gap_batch

    rng = random.Random(7)
    alph = "abcé 日"
    cases = []
    for _ in range(600):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        s1 = "".join(rng.choice(alph) for _ in range(la)).encode()
        s2 = "".join(rng.choice(alph) for _ in range(lb)).encode()
        if rng.random() < 0.3 and len(s1) >= 4:  # plant internal gaps
            cut = rng.randrange(1, len(s1) - 1)
            s2 = s1[:cut] + s1[cut + rng.randint(1, 3):]
        cases.append((s1, s2))
    got = affine_gap_batch([a for a, _ in cases], [b for _, b in cases])
    exp = np.array([_scalar_gotoh(a, b) for a, b in cases])
    assert (got == exp).all()
    # and under non-default costs
    got2 = affine_gap_batch(
        [a for a, _ in cases[:100]],
        [b for _, b in cases[:100]],
        sub=5,
        gap_open=4,
        gap_extend=2,
    )
    exp2 = np.array(
        [_scalar_gotoh(a, b, sub=5, o=4, e=2) for a, b in cases[:100]]
    )
    assert (got2 == exp2).all()


def test_gotoh_closed_form_inserted_run():
    from sassy_spark.kernel.gotoh import affine_gap_batch

    # the q105 oracle's closed form: ONE inserted run of k
    # out-of-alphabet bytes costs exactly open + k*ext, regardless of
    # the carrier text
    for text in [b"", b"x", b"hello world, affine gaps"]:
        for k in range(1, 8):
            cut = min(7, len(text))
            b = text[:cut] + b"\x01" * k + text[cut:]
            (got,) = affine_gap_batch([text], [b]).tolist()
            assert got == 3 + k, (text, k, got)


def test_affine_gap_operator(spark):
    from pyspark.sql import functions as F

    from sassy_spark.operators.strsim import affine_gap_pairs

    fields = spark.createDataFrame(
        [("u1", "john robert smith"), ("u2", "john smith"), ("u3", None)],
        ["url", "field"],
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u1", "zz")],
        ["url_a", "url_b"],
    )
    rows = {
        (r.url_a, r.url_b): r.aff
        for r in affine_gap_pairs(pairs, fields).collect()
    }
    assert rows[("u1", "u2")] == 10  # one 7-byte gap
    # NULL field and missing url both score as empty string:
    # delete all 17 bytes = 3 + 17
    assert rows[("u1", "u3")] == 20
    assert rows[("u1", "zz")] == 20


def test_soft_tfidf_closed_form(spark):
    from pyspark.sql import functions as F

    from sassy_spark.operators.strsim import soft_tfidf_pairs

    # 4-doc corpus, hand-computable: N=4, idf_scale=100
    #   token df: acme 2, corp 2, corpp 1, zenith 1, metals 2, ltd 1
    fields = spark.createDataFrame(
        [
            ("u1", "acme corp"),
            ("u2", "acme corpp"),
            ("u3", "zenith metals"),
            ("u4", "metals corp ltd"),
        ],
        ["url", "field"],
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u9", "u3")],
        ["url_a", "url_b"],
    )
    got = {
        (r.url_a, r.url_b): r.stfidf_q
        for r in soft_tfidf_pairs(pairs, fields).collect()
    }
    widf = {"acme": 200, "corp": 200, "corpp": 400, "zenith": 400,
            "metals": 200, "ltd": 400}
    import duckdb

    jw = lambda a, b: int(
        duckdb.sql(
            f"SELECT floor(jaro_winkler_similarity('{a}','{b}')*1e4)"
        ).fetchone()[0]
    )
    # u1 vs u2: acme->acme exact (jwq4=10000); corp->corpp soft
    j_corp = jw("corp", "corpp")
    assert j_corp >= 9000  # the soft-match case the scorer exists for
    exp12 = (
        widf["acme"] * widf["acme"] * 10000
        + widf["corp"] * widf["corpp"] * j_corp
    )
    assert got[("u1", "u2")] == exp12
    # u1 vs u3: no token pair reaches JW 0.9 -> 0
    assert got[("u1", "u3")] == 0
    # unknown url scores 0 and the pair row is KEPT
    assert got[("u9", "u3")] == 0


def test_soft_tfidf_idf_weighting_downranks_common_tokens(spark):
    from sassy_spark.operators.strsim import soft_tfidf_pairs

    # "inc" appears in every doc (df=N -> widf=100, the floor); the
    # rare surname dominates the score exactly as IDF intends
    fields = spark.createDataFrame(
        [("u%d" % i, "smith inc" if i else "smythe inc")
         for i in range(8)],
        ["url", "field"],
    )
    pairs = spark.createDataFrame([("u0", "u1")], ["url_a", "url_b"])
    (row,) = soft_tfidf_pairs(pairs, fields).collect()
    # widf: inc = 8*100//8 = 100; smythe = 800; smith = 800//7 = 114
    import duckdb

    j = int(duckdb.sql(
        "SELECT floor(jaro_winkler_similarity('smythe','smith')*1e4)"
    ).fetchone()[0])
    exp = 100 * 100 * 10000 + (800 * 114 * j if j >= 9000 else 0)
    assert row.stfidf_q == exp
