"""Kernel correctness: bit-parallel numpy Myers vs textbook DP oracles.

Mirrors the reference repo's test strategy (golden tiny cases +
planted-mutation fuzz + cross-mode consistency; reference
src/search.rs:1760-1773,2605-2709)."""

import random

import numpy as np
import pytest

from sassy_spark.kernel import (
    edit_distances,
    local_minima,
    semiglobal_scores,
    semiglobal_search,
    traceback,
)
from sassy_spark.kernel.reference_dp import levenshtein, semiglobal_costs

rng = random.Random(42)


def _rand_s(n, alpha="ACGT"):
    return "".join(rng.choice(alpha) for _ in range(n))


def _mutate(s: str, edits: int) -> str:
    s = list(s)
    for _ in range(edits):
        op = rng.choice("ids")
        pos = rng.randrange(len(s) + 1) if op == "i" else (
            rng.randrange(len(s)) if s else 0
        )
        if op == "i":
            s.insert(pos, rng.choice("ACGT"))
        elif op == "d" and s:
            del s[pos]
        elif s:
            s[pos] = rng.choice("ACGT")
    return "".join(s)


# ------------------------------------------------------------ global distance


def test_edit_distance_goldens():
    a = ["kitten", "", "abc", "abc", "same", "abcdefgh"]
    b = ["sitting", "xyz", "", "abc", "same", "abXdefh"]
    exp = [3, 3, 3, 0, 0, 2]
    got = edit_distances(a, b)
    assert got.tolist() == exp


def test_edit_distance_fuzz_small():
    pairs = []
    for _ in range(300):
        a = _rand_s(rng.randrange(0, 40))
        b = _mutate(a, rng.randrange(0, 6)) if rng.random() < 0.5 else _rand_s(
            rng.randrange(0, 40)
        )
        pairs.append((a, b))
    got = edit_distances([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), g in zip(pairs, got):
        assert g == levenshtein(a, b), (a, b)


def test_edit_distance_fuzz_multiword():
    """Patterns > 64 chars exercise the multi-word (blocked) recurrence."""
    pairs = []
    for _ in range(60):
        a = _rand_s(rng.randrange(60, 300), alpha="abcdefgh ")
        b = _mutate(a, rng.randrange(0, 10))
        pairs.append((a, b))
    got = edit_distances([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), g in zip(pairs, got):
        assert g == levenshtein(a, b)


def test_edit_distance_k_cutoff_exact_below_k():
    a = [_rand_s(500) for _ in range(20)]
    b = [_mutate(x, rng.randrange(0, 4)) for x in a] + []
    got = edit_distances(a, b, k=8)
    ref = [levenshtein(x, y) for x, y in zip(a, b)]
    for g, r in zip(got, ref):
        assert g == r


def test_edit_distance_k_cutoff_caps_above_k():
    a = [_rand_s(800)]
    b = [_rand_s(800)]
    got = edit_distances(a, b, k=5)
    assert got[0] >= 6  # either exact or capped at k+1, never under-reported
    assert got[0] == 6 or got[0] == levenshtein(a[0], b[0])


def test_unicode_bytes():
    a = ["héllo wörld"]
    b = ["hello world"]
    # byte-level distance (UTF-8): each accented char differs in 2 bytes
    got = edit_distances(a, b)
    assert got[0] == levenshtein(a[0].encode(), b[0].encode())


# --------------------------------------------------------------- semi-global


def test_semiglobal_matches_dp_fuzz():
    pats, txts = [], []
    for _ in range(120):
        m = rng.randrange(1, 80)
        pats.append(_rand_s(m))
        txts.append(_rand_s(rng.randrange(1, 300)))
    smat, tlens = semiglobal_scores(pats, txts)
    for i in range(len(pats)):
        ref = semiglobal_costs(pats[i], txts[i])
        assert smat[i, : tlens[i]].tolist() == ref, i


def test_search_exact_match():
    """Reference golden shape: exact occurrence found with cost 0 at the
    right end position (cf. reference src/search.rs:1760-1773)."""
    res = semiglobal_search(["needle"], ["xxxneedlexxx"], k=0, mode="all")
    ends, costs = res[0]
    assert 9 in ends.tolist()
    assert all(c == 0 for c in costs)


def test_search_planted_fuzz():
    """Plant a mutated copy of the pattern; search must find a match with
    cost <= edits near the planted position (reference search_fuzz)."""
    for _ in range(60):
        m = rng.randrange(8, 48)
        pat = _rand_s(m)
        edits = rng.randrange(0, 4)
        planted = _mutate(pat, edits)
        pre = _rand_s(rng.randrange(0, 100))
        post = _rand_s(rng.randrange(0, 100))
        text = pre + planted + post
        res = semiglobal_search([pat], [text], k=edits, mode="all")
        ends, costs = res[0]
        assert len(ends) > 0
        want_end = len(pre) + len(planted)
        assert any(abs(int(e) - want_end) <= edits for e in ends)


def test_best_mode_rightmost_min():
    # two exact occurrences -> best picks the rightmost one
    res = semiglobal_search(["ab"], ["abxxab"], k=1, mode="best")
    ends, costs = res[0]
    assert ends.tolist() == [6]
    assert costs.tolist() == [0]


def test_local_minima_plateaus():
    costs = np.array([5, 3, 3, 3, 4, 2, 2, 5, 1], dtype=np.int32)
    got = local_minima(costs, k=4).tolist()
    # plateau of 3s -> rightmost idx 3; plateau of 2s -> idx 6; final 1 is
    # below k and a minimum at the right edge
    assert got == [3, 6, 8]


def test_local_minima_rejects_high_plateau():
    costs = np.array([1, 2, 2, 3], dtype=np.int32)
    assert local_minima(costs, k=3).tolist() == [0]


def test_modes_consistency():
    """all >= local_minima >= best, and all sets agree on best cost —
    the reference's cross-mode consistency oracle
    (src/search.rs:2004-2069)."""
    for _ in range(40):
        pat = _rand_s(rng.randrange(4, 30))
        txt = _rand_s(rng.randrange(20, 200))
        k = rng.randrange(0, 5)
        a = semiglobal_search([pat], [txt], k, mode="all")[0]
        lm = semiglobal_search([pat], [txt], k, mode="local_minima")[0]
        be = semiglobal_search([pat], [txt], k, mode="best")[0]
        set_a = set(a[0].tolist())
        assert set(lm[0].tolist()) <= set_a
        assert set(be[0].tolist()) <= set_a
        if len(a[0]):
            assert len(be[0]) == 1
            assert be[1][0] == a[1].min()


# ---------------------------------------------------------------- traceback


def test_traceback_exact():
    start, cigar = traceback("needle", "xxxneedlexxx", end=9, cost=0)
    assert start == 3
    assert cigar == "6="


def test_traceback_substitution():
    start, cigar = traceback("needle", "xxxneXdlexxx", end=9, cost=1)
    assert start == 3
    assert cigar == "2=1X3="


def test_traceback_cost_consistent_fuzz():
    for _ in range(40):
        pat = _rand_s(rng.randrange(4, 40))
        edits = rng.randrange(0, 4)
        planted = _mutate(pat, edits)
        pre = _rand_s(rng.randrange(0, 50))
        text = pre + planted + _rand_s(rng.randrange(0, 50))
        res = semiglobal_search([pat], [text], k=edits, mode="best")[0]
        if not len(res[0]):
            continue
        end, cost = int(res[0][0]), int(res[1][0])
        start, cigar = traceback(pat, text, end, cost)
        assert 0 <= start <= end
        # cigar ops must sum to the reported cost
        import re

        tot = 0
        for cnt, op in re.findall(r"(\d+)([=XID])", cigar):
            if op in "XID":
                tot += int(cnt)
        assert tot == cost


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
