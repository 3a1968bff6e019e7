"""PPRL CLK encodings + Dice: hand-pinned positions, edge cases, plan."""

import pytest
from pyspark.sql import functions as F

from sassy_spark.operators.pprl import (
    clk_encode,
    clk_pack,
    dice_pairs,
    dice_pairs_packed,
    hlsh_candidates,
)

pytestmark = pytest.mark.usefixtures("spark")

_KNUTH = 2_654_435_761
_MOD32 = 4_294_967_296


def _positions(field, n_bits=256, k=4):
    # the documented double-hash contract, in plain python
    out = set()
    for a, b in zip(field, field[1:]):
        h1 = ord(a) * 256 + ord(b)
        h2 = (h1 * _KNUTH) % _MOD32
        for j in range(k):
            out.add((h1 + j * h2) % n_bits)
    return sorted(out)


def test_clk_positions_hand_pinned(spark):
    # 'ab': h1=24930, h2=24930*2654435761 % 2^32=3473849298
    # j=0..3 -> 24930%256=98, (24930+3473849298)%256=36, ... pin the
    # python model once by hand, then the engine against the model.
    assert 24930 % 256 in _positions("ab")
    df = spark.createDataFrame(
        [("u1", "ab"), ("u2", "abcab"), ("u3", None), ("u4", "x")],
        "url string, f string",
    )
    got = {
        r["url"]: (r["clk"], r["clk_card"])
        for r in clk_encode(df, "f").collect()
    }
    assert got["u1"][0] == _positions("ab")
    assert got["u2"][0] == _positions("abcab")  # dup bigram deduped
    assert got["u3"] == ([], 0)  # NULL -> empty set
    assert got["u4"] == ([], 0)  # single char: no bigram
    for url in ("u1", "u2"):
        clk, card = got[url]
        assert clk == sorted(set(clk)) and card == len(clk)


def test_dice_pairs_values(spark):
    enc = clk_encode(
        spark.createDataFrame(
            [("a", "hello"), ("b", "hello"), ("c", "zzzz"), ("d", "")],
            "url string, f string",
        ),
        "f",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "d")],
        "url_a string, url_b string",
    )
    got = {
        (r["url_a"], r["url_b"]): r
        for r in dice_pairs(pairs, enc).collect()
    }
    # identical encodings -> 2|A|/(2|A|) = 1.0 -> 1_000_000 micros
    assert got[("a", "b")]["dice_qmicros"] == 1_000_000
    ac = got[("a", "c")]
    assert ac["dice_qmicros"] == (2_000_000 * ac["inter_card"]) // (
        ac["card_a"] + ac["card_b"]
    )
    # both-empty pair guards the divide
    assert got[("d", "d")]["dice_qmicros"] == 0


def test_clk_pack_words_hand_pinned(spark):
    # positions {0, 31, 32, 255} -> word0 = 1 + 2^31, word1 = 1,
    # word7 = 2^31, rest 0; every word stays positive (32-bit lanes
    # inside signed 64-bit words)
    df = spark.createDataFrame([("u", "xx")], "url string, f string")
    enc = clk_encode(df, "f").withColumn(
        "clk", F.expr("array(0, 31, 32, 255)")
    )
    words = clk_pack(enc).first()["clk_words"]
    assert words == [1 + 2**31, 1, 0, 0, 0, 0, 0, 2**31]
    assert all(w >= 0 for w in words)


def test_packed_dice_equals_unpacked(spark):
    # contract identity on real-ish varied strings, incl empty/NULL
    rows = [
        ("a", "the quick brown fox"),
        ("b", "the quick brown fax"),
        ("c", "zzzz 1234 qqqq"),
        ("d", ""),
        ("e", None),
        ("f", "the quick brown fox"),
    ]
    df = spark.createDataFrame(rows, "url string, f string")
    enc = clk_encode(df, "f")
    pairs = spark.createDataFrame(
        [(a, b) for a in "abcdef" for b in "abcdef" if a < b],
        "url_a string, url_b string",
    )
    cols = ["url_a", "url_b", "inter_card", "card_a", "card_b",
            "dice_qmicros"]
    unpacked = sorted(
        tuple(r[c] for c in cols) for r in dice_pairs(pairs, enc).collect()
    )
    packed = sorted(
        tuple(r[c] for c in cols)
        for r in dice_pairs_packed(pairs, clk_pack(enc)).collect()
    )
    assert packed == unpacked and len(packed) == 15


def test_hlsh_candidates_hand_built(spark):
    # hand-built packed encodings (8 segments each):
    #  a and b share segment 0 (val 5) AND segment 2 (val 9) -> ONE
    #    deduped pair (a, b)
    #  c shares only zero segments with everyone -> no pairs
    #  d matches a on segment 7 -> pair (a, d)
    rows = [
        ("a", [5, 0, 9, 0, 0, 0, 0, 3]),
        ("b", [5, 1, 9, 0, 0, 0, 0, 0]),
        ("c", [0, 0, 0, 0, 0, 0, 0, 0]),
        ("d", [6, 0, 0, 0, 0, 0, 0, 3]),
    ]
    packed = spark.createDataFrame(
        rows, "url string, clk_words array<bigint>"
    )
    got = sorted(
        (r["url_a"], r["url_b"]) for r in hlsh_candidates(packed).collect()
    )
    assert got == [("a", "b"), ("a", "d")]


def test_hlsh_gate_passes_high_dice_pairs(spark):
    # a near-identical pair (one bigram apart) must collide in >= 1
    # segment; its Dice stays high end-to-end through the gate
    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps"),
         ("b", "the quick brown fox jumpy"),
         ("c", "totally unrelated 12345 qq")],
        "url string, f string",
    )
    enc = clk_encode(df, "f")
    cands = hlsh_candidates(clk_pack(enc))
    pairs = {(r["url_a"], r["url_b"]) for r in cands.collect()}
    assert ("a", "b") in pairs
    scored = {
        (r["url_a"], r["url_b"]): r["dice_qmicros"]
        for r in dice_pairs(cands, enc).collect()
    }
    assert scored[("a", "b")] >= 900_000


def test_clk_encode_is_pure_catalyst(spark):
    df = spark.createDataFrame([("u", "abc")], "url string, f string")
    plan = clk_encode(df, "f")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEval" not in plan
    assert "FlatMapsInPandas" not in plan
