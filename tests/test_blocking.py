"""Unit tests for operators/blocking.py: phonetic keys, distributed
sorted-neighborhood, and CBS meta-blocking — each pinned against a
brute-force Python oracle on small in-memory frames."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from sassy_spark.operators.blocking import (
    cbs_pairs,
    global_rank,
    phonetic_key,
    prefix_filter_pairs,
    sorted_neighborhood_pairs,
)


def _phonetic_oracle(name: str) -> str:
    """Straight-line Python of the documented spec."""
    letters = "".join(c for c in name.upper() if "A" <= c <= "Z")
    if not letters:
        return "0000"
    mapping = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"))
    digits = "".join(mapping[c] for c in letters[1:])
    out = []
    for ch in digits:
        if out and out[-1] == ch and ch != "0":
            continue
        out.append(ch)
    collapsed = "".join(out).replace("0", "")
    return (letters[0] + collapsed)[:4].ljust(4, "0")


def test_phonetic_key_matches_python_oracle(spark):
    names = [
        "Robert", "Rupert", "robert!", "Ashcraft", "Ashcroft", "Tymczak",
        "Pfister", "Honeyman", "a", "", "1234", "Lukasiewicz", "MULLER",
        "mueller", "o'brien", "O Brien", "smith", "SMYTHE", "  spaced ",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        r["name"]: r["pkey"]
        for r in df.select("name", phonetic_key(F.col("name")).alias("pkey")).collect()
    }
    for n in names:
        assert got[n] == _phonetic_oracle(n), n


def test_phonetic_key_blocks_similar_names(spark):
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Smith",), ("Smythe",), ("Lopez",)],
        ["name"],
    )
    keys = dict(
        (r["name"], r["pkey"])
        for r in df.select("name", phonetic_key(F.col("name")).alias("pkey")).collect()
    )
    assert keys["Robert"] == keys["Rupert"]
    assert keys["Smith"] == keys["Smythe"]
    assert keys["Lopez"] != keys["Smith"]


def test_global_rank_is_dense_and_ordered(spark):
    rows = [(i, f"k{(i * 7) % 23:03d}") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "key"])
    ranked = global_rank(df, ["key", "id"], num_partitions=7).collect()
    assert sorted(r["rank"] for r in ranked) == list(range(1, 201))
    by_rank = sorted(ranked, key=lambda r: r["rank"])
    assert [
        (r["key"], r["id"]) for r in by_rank
    ] == sorted((r["key"], r["id"]) for r in by_rank)


def test_global_rank_empty_input(spark):
    df = spark.createDataFrame([], "id long, key string")
    out = global_rank(df, ["key", "id"])
    assert out.count() == 0
    assert "rank" in out.columns


def test_sorted_neighborhood_matches_bruteforce(spark):
    rows = [(i, f"w{(i * 13) % 17:02d}") for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "key"])
    w = 3
    got = {
        (r["id_a"], r["id_b"], r["gap"])
        for r in sorted_neighborhood_pairs(
            df, ["key"], id_col="id", window=w, num_partitions=5
        ).collect()
    }
    order = [i for _, i in sorted((k, i) for i, k in rows)]
    want = {
        (order[i], order[i + g], g)
        for i in range(len(order))
        for g in range(1, w + 1)
        if i + g < len(order)
    }
    assert got == want


def test_cbs_pairs_matches_bruteforce(spark):
    # 8 docs x 3 schemes with planted agreements
    rows = []
    blocks_of = {}
    for i in range(8):
        bl = [f"s{i % 3}", f"l{i % 2}", f"n{i % 4}"]
        blocks_of[i] = set(bl)
        rows += [(i, b) for b in bl]
    df = spark.createDataFrame(rows, ["id", "block"])
    got = {
        (r["id_a"], r["id_b"]): r["cbs"]
        for r in cbs_pairs(df, min_common=2).collect()
    }
    want = {}
    for a, b in combinations(range(8), 2):
        n = len(blocks_of[a] & blocks_of[b])
        if n >= 2:
            want[(a, b)] = n
    assert got == want


def test_cbs_pairs_drops_mega_blocks(spark):
    # one block holds everyone (over the cap) -> contributes nothing
    rows = [(i, "mega") for i in range(10)] + [
        (0, "tiny"), (1, "tiny"), (0, "tiny2"), (1, "tiny2"),
    ]
    df = spark.createDataFrame(rows, ["id", "block"])
    got = {
        (r["id_a"], r["id_b"]): r["cbs"]
        for r in cbs_pairs(df, min_common=2, max_block_size=5).collect()
    }
    assert got == {(0, 1): 2}


def test_cbs_pairs_duplicate_rows_do_not_inflate(spark):
    rows = [(0, "b1"), (0, "b1"), (1, "b1"), (0, "b2"), (1, "b2")]
    df = spark.createDataFrame(rows, ["id", "block"])
    got = {
        (r["id_a"], r["id_b"]): r["cbs"]
        for r in cbs_pairs(df, min_common=2).collect()
    }
    assert got == {(0, 1): 2}


def test_prefix_filter_completeness_bruteforce(spark):
    # THE property the operator exists for: every pair whose true
    # Jaccard >= t must survive the prefix + length filters. Random
    # token sets with planted near-duplicates, checked exhaustively.
    import random

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(60)]
    sets = {}
    for i in range(40):
        sets[i] = set(rng.sample(vocab, rng.randint(3, 14)))
    # planted near-dupes: copy with small edits (high Jaccard)
    for i in range(40, 52):
        base = set(sets[i - 40])
        if len(base) > 3 and rng.random() < 0.7:
            base.discard(next(iter(base)))
        if rng.random() < 0.5:
            base.add(rng.choice(vocab))
        sets[i] = base

    t = 0.6
    rows = [(i, w) for i, ws in sets.items() for w in ws]
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_pairs(
            spark.createDataFrame(rows, ["id", "token"]), threshold=t
        ).collect()
    }
    qualifying = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            qualifying.add((a, b))
    missed = qualifying - got
    assert not missed, f"prefix filter dropped qualifying pairs: {missed}"
    # and it actually prunes: the candidate set must be far below all-pairs
    assert len(got) < len(sets) * (len(sets) - 1) // 2 * 0.5
    # every survivor passes the length filter it claims to apply
    for a, b in got:
        na, nb = len(sets[a]), len(sets[b])
        assert min(na, nb) >= t * max(na, nb)


def test_prefix_filter_duplicate_tokens_and_identical_sets(spark):
    rows = [
        (1, "x"), (1, "x"), (1, "y"),          # duplicate token rows
        (2, "x"), (2, "y"),                    # identical set to 1
        (3, "z"),                              # disjoint singleton
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_pairs(
            spark.createDataFrame(rows, ["id", "token"]), threshold=0.9
        ).collect()
    }
    assert got == {(1, 2)}


def test_scheme_stats_hand_pinned(spark):
    from sassy_spark.operators.blocking import scheme_stats

    blocks = spark.createDataFrame(
        # A: {1,2,3} {4,5,6}; B: {1,4} + singletons; C: all singletons
        [(i, "A", "a1") for i in (1, 2, 3)]
        + [(i, "A", "a2") for i in (4, 5, 6)]
        + [(1, "B", "b1"), (4, "B", "b1")]
        + [(i, "B", f"s{i}") for i in (2, 3, 5, 6)]
        + [(i, "C", f"c{i}") for i in range(1, 7)],
        ["id", "scheme", "block"],
    )
    truth = spark.createDataFrame(
        [(1, 2), (4, 6), (1, 4)], ["id_a", "id_b"]
    )
    got = {
        r["scheme"]: r.asDict()
        for r in scheme_stats(blocks, truth, n_records=6).collect()
    }
    # C(6,2) = 15 total pairs
    assert got["A"]["comparisons"] == 6
    assert got["A"]["covered_truth"] == 2
    assert got["A"]["pc_qmicros"] == (1_000_000 * 2) // 3
    assert got["A"]["rr_qmicros"] == 1_000_000 - (6_000_000 // 15)
    assert got["B"]["n_blocks"] == 5
    assert got["B"]["comparisons"] == 1
    assert got["B"]["covered_truth"] == 1
    assert got["B"]["pc_qmicros"] == 333_333
    assert got["C"]["comparisons"] == 0
    assert got["C"]["covered_truth"] == 0
    assert got["C"]["pc_qmicros"] == 0
    assert got["C"]["rr_qmicros"] == 1_000_000


def test_suffix_pairs_prefix_noise_robust(spark):
    """The reason suffix blocking exists: records equal up to leading
    junk ('www.' / 'the ') share long suffixes and pair up, while
    unrelated keys do not."""
    from sassy_spark.operators.blocking import suffix_pairs

    recs = spark.createDataFrame(
        [
            (1, "www.acme-widgets.com"),
            (2, "acme-widgets.com"),
            (3, "the acme-widgets.com"),
            (4, "zenith metals ltd"),
        ],
        ["id", "key"],
    )
    got = {
        (r.id_a, r.id_b)
        for r in suffix_pairs(recs, min_len=10).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_suffix_pairs_stopword_cap_drops_block(spark):
    from sassy_spark.operators.blocking import suffix_pairs

    # all four share the 6-char suffix ' corp.'; with the cap at 3 the
    # shared block is dropped and only the longer-suffix pair survives
    recs = spark.createDataFrame(
        [
            (1, "alpha corp."),
            (2, "beta corp."),
            (3, "gamma corp."),
            (4, "gamma corp."),
        ],
        ["id", "key"],
    )
    uncapped = {
        (r.id_a, r.id_b)
        for r in suffix_pairs(recs, min_len=6, max_block_size=None)
        .collect()
    }
    assert uncapped == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    capped = {
        (r.id_a, r.id_b)
        for r in suffix_pairs(recs, min_len=6, max_block_size=3)
        .collect()
    }
    assert capped == {(3, 4)}  # full-key block of size 2 survives


def test_suffix_pairs_min_len_excludes_short_keys(spark):
    from sassy_spark.operators.blocking import suffix_pairs

    recs = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "abcdefgh"), (4, "xabcdefgh")],
        ["id", "key"],
    )
    got = {
        (r.id_a, r.id_b)
        for r in suffix_pairs(recs, min_len=5).collect()
    }
    assert got == {(3, 4)}


def _brute_ed_pairs(rows, k):
    import itertools

    def ed(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[lb]

    out = {}
    for (ia, ka), (ib, kb) in itertools.combinations(sorted(rows), 2):
        d = ed(ka, kb)
        if d <= k:
            out[(ia, ib)] = d
    return out


def test_passjoin_equals_brute_force_mixed_lengths(spark):
    """Lossless-join contract: on a planted corpus of variable-length
    keys with substitutions, insertions, deletions, transposed words
    and unrelated strings, passjoin_pairs == brute-force levenshtein
    (both the pair SET and the distances)."""
    from sassy_spark.operators.blocking import passjoin_pairs

    rows = [
        (1, "acme corporation ltd"),
        (2, "acme corporation ltd"),   # exact dup: ed 0
        (3, "acme corporatiom ltd"),   # 1 substitution
        (4, "acme corporation ltda"),  # 1 insertion at the end
        (5, "acme corporatio ltd"),    # 1 deletion mid-word
        (6, "acme corporatoin ld"),    # transposition+deletion: ed 3
        (7, "globex international"),   # unrelated
        (8, "globex internationa"),    # ed 1 from 7
        (9, "initech"),                # short key, len 7
        (10, "initech inc"),           # ed 4 from 9
        (11, "xacme corporation ltd"), # 1 insertion at the FRONT
    ]
    want = _brute_ed_pairs(rows, 2)
    recs = spark.createDataFrame(rows, ["id", "key"])
    got = {
        (r.id_a, r.id_b): r.ed
        for r in passjoin_pairs(recs, k=2).collect()
    }
    assert got == want


def test_passjoin_k1_and_short_key_exclusion(spark):
    from sassy_spark.operators.blocking import passjoin_pairs

    rows = [
        (1, "ab"),        # shorter than k+1=2? len 2 == k+1 for k=1: kept
        (2, "ac"),        # ed 1 from 'ab'
        (3, "a"),         # len 1 < k+1: excluded from the join entirely
        (4, "abcd"),
        (5, "abxd"),      # ed 1 from 'abcd'
    ]
    recs = spark.createDataFrame(rows, ["id", "key"])
    got = {
        (r.id_a, r.id_b): r.ed
        for r in passjoin_pairs(recs, k=1).collect()
    }
    want = {
        p: d for p, d in _brute_ed_pairs(rows, 1).items()
        if 3 not in p  # len-1 key excluded by the len >= k+1 rule
    }
    assert got == want


def test_passjoin_join_bipartite_equals_brute_force(spark):
    """R-S variant: left batch vs right index, including an id value
    shared across the two tables (no canonicalization) and length
    deltas at the +-k boundary."""
    from sassy_spark.operators.blocking import passjoin_join

    left_rows = [
        (1, "acme corporation"),
        (2, "globex intl"),
        (3, "wayne enterprises"),
    ]
    right_rows = [
        (1, "acme corporatiom"),    # same id as left 1, ed 1
        (20, "acme corporation xx"), # ed 3: outside k
        (30, "globexx intl"),        # ed 1 (insertion)
        (40, "wayne enterprise"),    # ed 1 (deletion at end)
        (50, "stark industries"),
    ]

    def ed(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    want = {
        (il, ir): ed(kl, kr)
        for il, kl in left_rows
        for ir, kr in right_rows
        if ed(kl, kr) <= 2
    }
    got = {
        (r.id_l, r.id_r): r.ed
        for r in passjoin_join(
            spark.createDataFrame(left_rows, ["id", "key"]),
            spark.createDataFrame(right_rows, ["id", "key"]),
            k=2,
        ).collect()
    }
    assert got == want and len(want) >= 3


def test_grid_distance_pairs_boundaries_and_negatives(spark):
    """Pairs straddling cell boundaries are found (3x3 probe), pairs
    just past the radius are not, and negative coordinates floor onto
    the same grid as the oracle's // semantics."""
    import pytest

    from sassy_spark.operators.blocking import grid_distance_pairs

    pts = [
        (1, 99, 0),     # cell (9,0) with cell=10
        (2, 101, 0),    # cell (10,0): adjacent cell, d2=4 -> match
        (3, 109, 0),    # d to 1 = 10 exactly -> d2=100 == r2: match
        (4, 120, 0),    # d to 3 = 11 -> 121 > 100: no match with 3
        (5, -1, -1),    # negative coords
        (6, -9, -2),    # d2 to 5 = 64+1=65 <= 100: match
        (7, 500, 500),  # isolated
    ]
    got = {
        (r.id_a, r.id_b): r.d2
        for r in grid_distance_pairs(
            spark.createDataFrame(pts, ["id", "x", "y"]), radius=10
        ).collect()
    }
    want = {}
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1:]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= 100:
                want[(ia, ib)] = d2
    assert got == want
    assert (1, 2) in got and (1, 3) in got and (5, 6) in got
    with pytest.raises(ValueError):
        grid_distance_pairs(
            spark.createDataFrame(pts, ["id", "x", "y"]),
            radius=10,
            cell=5,
        )


def test_multipass_sn_union_and_pass_counts(spark):
    """Two passes with opposite orders: a prefix-typo pair missed by
    the forward window is caught by the reverse pass; a pair adjacent
    in both orders reports n_passes == 2."""
    from sassy_spark.operators.blocking import multipass_sn_pairs

    recs = spark.createDataFrame(
        [
            (1, "smith john"),
            (2, "smith john"),    # adjacent in BOTH orders
            (3, "zmith john"),    # prefix typo: far in fwd, near 1 in rev
            (4, "aardvark xx"),
            (5, "middle row"),
        ],
        ["id", "key"],
    )
    keyed = recs.selectExpr("id", "key", "reverse(key) AS rkey")
    out = {
        (r.id_a, r.id_b): r.n_passes
        for r in multipass_sn_pairs(
            keyed, {"fwd": ["key"], "rev": ["rkey"]}, window=2
        ).collect()
    }
    # fwd order: aardvark(4) middle(5) smith john(1) smith john(2)
    # zmith(3) — (1,3) is gap 2 in fwd too, BUT with window=1 only the
    # reverse pass (…htims/…htimz cluster: 1,2,3 contiguous) holds the
    # trio together; at window=2 both passes see (1,3), and the typo
    # row 3 is FAR from 4/5 in fwd while adjacent to 1/2 in rev.
    assert out[(1, 2)] == 2          # both orders adjacent
    assert out[(1, 3)] == 2          # window-2 in both orders
    assert out[(2, 3)] == 2
    narrow = {
        (r.id_a, r.id_b): r.n_passes
        for r in multipass_sn_pairs(
            keyed, {"fwd": ["key"], "rev": ["rkey"]}, window=1
        ).collect()
    }
    # window 1: (1,3) unreachable in either order (2 sits between) —
    # the union still links the trio through (1,2) + (2,3)
    assert (1, 3) not in narrow
    assert narrow[(1, 2)] == 2 and narrow[(2, 3)] == 2
    import pytest
    with pytest.raises(ValueError):
        multipass_sn_pairs(keyed, {}, window=1)


def test_qgram_count_pairs_equals_brute_force(spark):
    """Count-filter join == brute force on a planted corpus with edits
    at the front, middle, and end, plus short-key exclusion."""
    from sassy_spark.operators.blocking import qgram_count_pairs

    rows = [
        (1, "acme corporation ltd"),
        (2, "acme corporation ltd"),
        (3, "xacme corporation ltd"),   # front insertion, ed 1
        (4, "acme corpXration ltd"),    # middle substitution, ed 1
        (5, "acme corporation l"),      # 2 deletions at end, ed 2
        (6, "acme corp"),               # len 10 >= q*(k+1)=9: included
        (7, "acme corX"),               # ed 1 from 6
        (8, "short"),                   # len 5 < 9: excluded
        (9, "shorx"),                   # excluded (would be ed 1 to 8)
        (10, "globex international"),
    ]

    def ed(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    want = {
        (ia, ib): ed(ka, kb)
        for i, (ia, ka) in enumerate(rows)
        for ib, kb in rows[i + 1:]
        if ed(ka, kb) <= 2 and len(ka) >= 9 and len(kb) >= 9
    }
    got = {
        (r.id_a, r.id_b): r.ed
        for r in qgram_count_pairs(
            spark.createDataFrame(rows, ["id", "key"]), q=3, k=2
        ).collect()
    }
    assert got == want
    assert (8, 9) not in got  # short keys excluded by the LB>=1 rule
    assert len(want) >= 5


def test_global_prefix_sum_matches_python(spark):
    import random

    rng = random.Random(23)
    rows = [(i, f"k{rng.randint(0, 40):03d}", rng.randint(0, 9))
            for i in range(150)]
    df = spark.createDataFrame(rows, ["id", "key", "v"])
    from sassy_spark.operators.blocking import global_prefix_sum

    got = {
        r.id: r.cum
        for r in global_prefix_sum(
            df, ["key", "id"], "v", num_partitions=7
        ).collect()
    }
    acc, want = 0, {}
    for i, _k, v in sorted(rows, key=lambda r: (r[1], r[0])):
        acc += v
        want[i] = acc
    assert got == want


def test_block_purging_budget_admission(spark):
    """Blocks admitted smallest-first: sizes 2,2,3,4 -> comparisons
    1,1,3,6; budget 5 admits (1,1,3); the tie between the two size-2
    blocks breaks on the block key."""
    from sassy_spark.operators.blocking import block_purging

    rows = (
        [(i, "big") for i in range(4)]         # C(4,2)=6
        + [(i, "mid") for i in range(10, 13)]  # C(3,2)=3
        + [(1, "a2"), (2, "a2")]               # 1
        + [(3, "b2"), (4, "b2")]               # 1
    )
    got = {
        r.block: (r.size, r.comparisons, r.cum_comparisons)
        for r in block_purging(
            spark.createDataFrame(rows, ["id", "block"]), budget=5
        ).collect()
    }
    assert got == {
        "a2": (2, 1, 1),
        "b2": (2, 1, 2),
        "mid": (3, 3, 5),
    }
    # budget 11 admits 'big' too
    got11 = {
        r.block
        for r in block_purging(
            spark.createDataFrame(rows, ["id", "block"]), budget=11
        ).collect()
    }
    assert got11 == {"a2", "b2", "mid", "big"}


def test_block_filtering_keeps_r_smallest(spark):
    from sassy_spark.operators.blocking import block_filtering

    rows = (
        [(i, "huge") for i in range(6)]       # size 6
        + [(0, "mid"), (1, "mid"), (2, "mid")]  # size 3
        + [(0, "tiny"), (1, "tiny")]            # size 2
        + [(0, "solo")]                          # size 1
        + [(0, "solo")]                          # dup row collapsed
    )
    got = {
        (r.id, r.block): (r.block_size, r.rank)
        for r in block_filtering(
            spark.createDataFrame(rows, ["id", "block"]), r=2
        ).collect()
    }
    # record 0 has 4 blocks -> keeps solo(1) and tiny(2); 'huge' cut
    assert got[(0, "solo")] == (1, 1)
    assert got[(0, "tiny")] == (2, 2)
    assert (0, "huge") not in got and (0, "mid") not in got
    # record 1: tiny(2) then mid(3)
    assert got[(1, "tiny")] == (2, 1)
    assert got[(1, "mid")] == (3, 2)
    # record 5 only sits in 'huge': kept at rank 1 (fewer than r blocks)
    assert got[(5, "huge")] == (6, 1)


def test_pair_range_tasks_balanced_enumeration(spark):
    """PairRange: global pair indices are a 0..total-1 permutation-free
    dense enumeration; every task except the last has exactly cap
    pairs; within a block the (i,j) upper-triangle order is replayed by
    a python reference."""
    from sassy_spark.operators.blocking import pair_range_tasks

    memb = [(f"r{i:02d}", "A") for i in range(5)]      # C(5,2)=10
    memb += [(f"s{i:02d}", "B") for i in range(4)]     # C(4,2)=6
    memb += [(f"t{i:02d}", "C") for i in range(2)]     # C(2,2)=1
    memb += [("solo", "D")]                            # no pairs
    df = spark.createDataFrame(memb, ["id", "block"])
    rows = pair_range_tasks(df, cap=4).collect()

    # dense global enumeration 0..16
    idxs = sorted(r.pair_index for r in rows)
    assert idxs == list(range(17))
    # task sizes: 4,4,4,4,1
    from collections import Counter
    tc = Counter(r.task_id for r in rows)
    assert tc == {0: 4, 1: 4, 2: 4, 3: 4, 4: 1}

    # python replay: blocks in key order, ids ascending, row-major
    # upper triangle
    import itertools
    want = []
    g = 0
    for blk, ids in (
        ("A", [f"r{i:02d}" for i in range(5)]),
        ("B", [f"s{i:02d}" for i in range(4)]),
        ("C", [f"t{i:02d}" for i in range(2)]),
    ):
        for x, y in itertools.combinations(ids, 2):
            want.append((blk, x, y, g, g // 4))
            g += 1
    got = sorted(
        (r.block, r.id_a, r.id_b, r.pair_index, r.task_id) for r in rows
    )
    assert got == sorted(want)
