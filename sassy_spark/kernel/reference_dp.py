"""Slow, obviously-correct DP oracles used only by the test suite.

These replicate the textbook definitions so the bit-parallel kernel in
``myers.py`` can be property-tested against them (the role the reference
repo's ``search_fuzz`` / cross-engine consistency tests play in its own
suite — see reference src/search.rs:2605-2709).

Unit of distance matches the kernel: characters for str inputs (so the
oracles agree with SQL ``levenshtein`` on non-ASCII text), bytes for
bytes inputs.
"""

from __future__ import annotations

import math


def levenshtein(a, b) -> int:
    """Global edit distance, O(len(a)*len(b))."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        ai = a[i - 1]
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ai != b[j - 1]),
            )
        prev = cur
    return prev[n]


def semiglobal_costs(pattern, text) -> list[int]:
    """costs[j] = min edit distance of pattern vs any text substring ending
    at j+1 (free text prefix): D[0][j] = 0, answer row = D[m][1..n]."""
    m, n = len(pattern), len(text)
    prev = [0] * (n + 1)  # row 0: free start anywhere in text
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        pi = pattern[i - 1]
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (pi != text[j - 1]),
            )
        prev = cur
    return prev[1:]


def _overhang_pen(o: int, alpha: float, mo: int) -> int:
    capped = min(o, mo)
    return math.floor(capped * alpha) + max(o - capped, 0)


def semiglobal_costs_overhang(
    pattern, text, alpha: float, max_overhang: int | None = None
) -> list[int]:
    """Overhang-scored semiglobal cost curve (reference K12 semantics):
    pattern chars hanging over the text's LEFT edge (alignments starting
    at text position 0) cost floor(alpha * overhang); same for the RIGHT
    edge (alignments ending at text position n). Mid-text end positions
    pay full pattern end gaps. Plain O(m*n) DP with the adjusted column-0
    init, plus a final min over rows at the last column."""
    mo = max_overhang if max_overhang is not None else (1 << 40)
    m, n = len(pattern), len(text)
    # D[i][j] over full matrix; column 0 = left-overhang init
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = _overhang_pen(i, alpha, mo)
    for j in range(n + 1):
        d[0][j] = 0  # free text prefix
    for i in range(1, m + 1):
        pi = pattern[i - 1]
        for j in range(1, n + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (pi != text[j - 1]),
            )
    costs = [d[m][j] for j in range(1, n + 1)]
    if n >= 1:
        # right overhang at the final end position
        best = costs[-1]
        for i in range(0, m + 1):
            best = min(best, d[i][n] + _overhang_pen(m - i, alpha, mo))
        costs[-1] = best
    return costs
