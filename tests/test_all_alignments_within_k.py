"""K7 bounded-suboptimal enumeration parity
(kernel.all_tracebacks_within_k vs reference src/alignment_iterator.rs).

The oracle here is structurally independent of the engine: it first
enumerates EVERY monotone backward alignment path with cost <= k by raw
3-way branching (no DP matrix, no in-DFS pruning), then post-filters
complete paths by replaying the reference's three "clearly inefficient"
rules (alignment_iterator.rs:246-327) as path-level predicates:

* no text-gap ('D') while no pattern char is consumed yet or after all
  are (leading/trailing deletions, alignment_iterator.rs:258-263),
* a gap may not LEAVE a diagonal whose remaining pattern prefix
  exactly matches the text diagonally above it
  (alignment_iterator.rs:292-299), and may not ENTER a diagonal that
  was reachable by exact matches from the matrix bottom or from the
  row where the current path last visited that diagonal
  (alignment_iterator.rs:301-318),
* since the last exact-match op, insertions and deletions may not both
  appear — substitutions are transparent (alignment_iterator.rs:320-326).

The engine prunes these rules inside a cost-matrix-guided DFS; the
oracle filters after exhaustive enumeration. Agreement across the
randomized sweep pins that the pruning (incl. the last-visited-row
bookkeeping restored on backtrack) implements exactly these predicates.
"""

import math
import random

import pytest

from sassy_spark.kernel.myers import (
    all_optimal_tracebacks,
    all_tracebacks_within_k,
    _rle,
)


def _oracle_within_k(pattern, text, end, k, is_match=None):
    """Reference-semantics enumeration by exhaustive-then-filter."""
    if is_match is None:
        is_match = lambda p, t: p == t  # noqa: E731
    m, tl = len(pattern), len(text)

    def diag_ext(p0, p1, t0):
        """pattern[p0:p1] matches text[t0:t0+len]? Empty -> True,
        out-of-text -> False (is_match_slice unequal-length semantics +
        the explicit bounds check, profiles.rs:43-49)."""
        ln = p1 - p0
        if ln <= 0:
            return True
        if t0 < 0 or t0 + ln > tl:
            return False
        return all(is_match(pattern[p0 + i], text[t0 + i]) for i in range(ln))

    raw = []  # complete op-lists, end->start order

    def enum(t, p, cost, ops):
        if cost > k:
            return
        if p == 0:
            raw.append((t, cost, list(ops)))
            return
        if t > 0:
            op = "=" if is_match(pattern[p - 1], text[t - 1]) else "X"
            ops.append(op)
            enum(t - 1, p - 1, cost + (op == "X"), ops)
            ops.pop()
        if t > 0 and p < m:  # leading/trailing-D rule folded in here
            ops.append("D")
            enum(t - 1, p, cost + 1, ops)
            ops.pop()
        ops.append("I")
        enum(t, p - 1, cost + 1, ops)
        ops.pop()

    enum(end, m, 0, [])

    def passes(ops):
        t, p = end, m
        last = {}  # diagonal (t - p) -> last visited pattern row
        seen = []
        for op in ops:
            if op in ("D", "I"):
                if diag_ext(0, p, t - p):  # leave rule
                    return False
                net = 0
                for o in reversed(seen):
                    if o == "=":
                        break
                    if o == "I":
                        net += 1
                    elif o == "D":
                        net -= 1
                if (op == "I" and net < 0) or (op == "D" and net > 0):
                    return False
                nt, np_ = (t - 1, p) if op == "D" else (t, p - 1)
                if diag_ext(np_, last.get(nt - np_, m), nt):  # enter rule
                    return False
                t, p = nt, np_
            else:
                t, p = t - 1, p - 1
            last[t - p] = p
            seen.append(op)
        return True

    return {
        (t, cost, _rle(ops[::-1]))
        for t, cost, ops in raw
        if passes(ops)
    }


def _engine(pattern, text, end, k, classes=None):
    return set(
        all_tracebacks_within_k(
            pattern, text, end, k, max_paths=100_000, classes=classes
        )
    )


def test_combinatorial_count_within_k():
    """The reference's own closed form (src/search.rs:1841-1853):
    'a'*8 vs 'a'*5 at k=3 -> exactly C(8,3)=56 alignments."""
    r = _engine("a" * 8, "a" * 5, 5, 3)
    assert len(r) == math.comb(8, 3) == 56
    assert {c for _, c, _ in r} == {3}
    assert r == _oracle_within_k("a" * 8, "a" * 5, 5, 3)


def test_emits_strictly_suboptimal_paths():
    """pattern ABC vs text AXC ending at 3 with k=2: the optimal set is
    just the cost-1 substitution path, but the reference enumeration
    also keeps the cost-2 path (sub A->X, skip B, match C) because the
    X mismatch breaks the leave-diagonal extension."""
    opt = all_optimal_tracebacks("ABC", "AXC", end=3, cost=1)
    assert opt == [(0, "1=1X1=")]
    within = _engine("ABC", "AXC", 3, 2)
    assert (0, 1, "1=1X1=") in within
    assert (1, 2, "1X1I1=") in within  # strictly suboptimal survivor
    assert within == _oracle_within_k("ABC", "AXC", 3, 2)


def test_lower_cost_paths_surface_first():
    """Edge ordering: results arrive sorted so lower-cost alignments
    surface before higher-cost ones under a max_paths cap (the
    reference's stable edge sort by total cost)."""
    res = all_tracebacks_within_k("ABC", "AXC", 3, 2, max_paths=1)
    assert res == [(0, 1, "1=1X1=")]


@pytest.mark.parametrize("alphabet", ["ab", "abc"])
def test_randomized_parity_vs_oracle(alphabet):
    rng = random.Random(20260818 + len(alphabet))
    checked = 0
    for _ in range(120):
        m = rng.randint(1, 5)
        n = rng.randint(1, 8)
        k = rng.randint(0, 3)
        pat = "".join(rng.choice(alphabet) for _ in range(m))
        txt = "".join(rng.choice(alphabet) for _ in range(n))
        for end in range(1, n + 1):
            got = _engine(pat, txt, end, k)
            want = _oracle_within_k(pat, txt, end, k)
            assert got == want, (pat, txt, end, k, got ^ want)
            checked += len(want)
    assert checked > 500  # the sweep actually exercised alignments


def test_parity_with_profile_classes():
    """The diagonal rules must use PROFILE matching, not raw equality:
    IUPAC R matches A and G, so the leave-rule extension check fires on
    class matches too."""
    from sassy_spark.kernel.profiles import chars_match, resolve_profile

    classes = resolve_profile("iupac")

    def is_match(p, t):
        return chars_match(p, t, classes)

    for pat, txt, k in [("ACGR", "ACGA", 1), ("RR", "AGA", 1), ("NAC", "TACG", 2)]:
        for end in range(1, len(txt) + 1):
            got = _engine(pat, txt, end, k, classes=classes)
            want = _oracle_within_k(pat, txt, end, k, is_match=is_match)
            assert got == want, (pat, txt, end, k, got ^ want)


def test_full_text_extension_beyond_window():
    """The enter rule consults text PAST the current end: entering a
    diagonal that extends by exact matches to the matrix bottom means
    the same body is enumerated at a later end, so it must be pruned
    here even though the extension lies beyond `end` (the reference
    slices self.text, not the DP window — alignment_iterator.rs:308-317)."""
    # pattern ACG in AACG: ending at 3 with k=1, the path I== (start 2)
    # would re-enter the diagonal that exact-matches down to end=4's
    # full match, so end=3 must yield nothing.
    assert _engine("ACG", "AACG", 3, 1) == set()
    assert _oracle_within_k("ACG", "AACG", 3, 1) == set()
    # and end=4 has exactly the exact match
    assert _engine("ACG", "AACG", 4, 1) == {(1, 0, "3=")}
