"""Slow, obviously-correct DP oracles used only by the test suite.

These replicate the textbook definitions so the bit-parallel kernel in
``myers.py`` can be property-tested against them (the role the reference
repo's ``search_fuzz`` / cross-engine consistency tests play in its own
suite — see reference src/search.rs:2605-2709).
"""

from __future__ import annotations


def levenshtein(a: bytes, b: bytes) -> int:
    """Global edit distance, O(len(a)*len(b))."""
    if isinstance(a, str):
        a = a.encode()
    if isinstance(b, str):
        b = b.encode()
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


def semiglobal_costs(pattern: bytes, text: bytes) -> list[int]:
    """costs[j] = min edit distance of pattern vs any text substring ending
    at j+1 (free text prefix): D[0][j] = 0, answer row = D[m][1..n]."""
    if isinstance(pattern, str):
        pattern = pattern.encode()
    if isinstance(text, str):
        text = text.encode()
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
