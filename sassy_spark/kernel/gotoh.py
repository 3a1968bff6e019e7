"""Batch-vectorized affine-gap alignment distance (Gotoh 1982).

The affine-gap cost model is the record-linkage answer to fields that
differ by a missing WORD rather than scattered typos ("J. Smith" vs
"J. Robert Smith", a dropped middle token, an elided street suffix):
a gap of length L costs ``gap_open + L * gap_extend`` instead of
Levenshtein's L, so one long insertion is much cheaper than L scattered
edits. This is the minimal-cost (distance) formulation of Gotoh's
three-matrix recurrence — the same model sassy's overhang-alpha mode
approximates at the text ends (/root/reference/src/search.rs, overhang
cost floor(alpha*d)) applied to INTERNAL gaps:

    D[i][j] = min(D[i-1][j-1] + sub * [a_i != b_j], P[i][j], Q[i][j])
    P[i][j] = min(D[i-1][j] + open + ext, P[i-1][j] + ext)   # gap in b
    Q[i][j] = min(D[i][j-1] + open + ext, Q[i][j-1] + ext)   # gap in a

No bit-parallel formulation exists for affine gaps (the Myers trick
needs unit costs), so like kernel/damerau.py the double loop is kept
and every cell update is vectorized across the PAIR axis: ~La*Lb
vector steps per batch regardless of batch size, rolling rows only
(O(n * Lb) memory, not O(n * La * Lb)). Intended for short identifying
fields (<= ~128 bytes); use the Myers kernel for long-text distance.

Semantics are pinned by a brute-force scalar DP fuzz test in
tests/test_strsim.py and by a closed-form driver oracle (q105):
aligning ``a`` against ``a`` with one inserted run of k out-of-alphabet
bytes costs exactly ``open + k * ext`` (any alignment must carry >= k
net insertions, so its cost is >= open + k*ext, with equality at the
single-gap alignment).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def affine_gap_batch(
    a: Sequence[bytes],
    b: Sequence[bytes],
    sub: int = 2,
    gap_open: int = 3,
    gap_extend: int = 1,
) -> np.ndarray:
    """Affine-gap alignment distance per aligned pair of byte strings.

    A gap of length L costs ``gap_open + L * gap_extend``; a
    substitution costs ``sub``; a match costs 0. Empty-vs-empty is 0;
    empty-vs-length-L is ``gap_open + L * gap_extend``.

    Returns int64 array of shape (len(a),).
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)
    La = int(la.max(initial=0))
    Lb = int(lb.max(initial=0))

    def gap_cost(length: np.ndarray) -> np.ndarray:
        return np.where(length > 0, gap_open + length * gap_extend, 0)

    if La == 0 or Lb == 0:
        return gap_cost(np.maximum(la, lb)).astype(np.int64)

    # byte matrices with DISTINCT out-of-alphabet pad codes per side, so
    # pad cells never produce spurious matches; each pair's answer is
    # read at its true (la, lb) cell, which pads cannot influence
    # because costs are non-negative and pads only extend beyond it
    A = np.full((n, La), 256, dtype=np.int64)
    B = np.full((n, Lb), 257, dtype=np.int64)
    for r, s in enumerate(a):
        if s:
            A[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    for r, s in enumerate(b):
        if s:
            B[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)

    INF = np.int32(2**30)
    jj = np.arange(1, Lb + 1, dtype=np.int32)

    # rolling rows over j = 0..Lb; P needs only the previous D/P rows,
    # Q only the current row's running values
    D_prev = np.empty((n, Lb + 1), dtype=np.int32)
    D_prev[:, 0] = 0
    D_prev[:, 1:] = gap_open + jj[None, :] * gap_extend
    P_prev = np.full((n, Lb + 1), INF, dtype=np.int32)
    D_cur = np.empty((n, Lb + 1), dtype=np.int32)
    P_cur = np.empty((n, Lb + 1), dtype=np.int32)

    # per-pair answer, captured at row i == la for columns j == lb
    out = np.where(la == 0, gap_cost(lb), 0).astype(np.int64)
    rows = np.arange(n)
    out_col = np.minimum(lb, Lb)

    for i in range(1, La + 1):
        ai = A[:, i - 1]
        D_cur[:, 0] = gap_open + i * gap_extend
        P_cur[:, 0] = np.minimum(
            D_prev[:, 0] + gap_open + gap_extend,
            P_prev[:, 0] + gap_extend,
        )
        Q_run = np.full(n, INF, dtype=np.int32)
        for j in range(1, Lb + 1):
            p = np.minimum(
                D_prev[:, j] + gap_open + gap_extend,
                P_prev[:, j] + gap_extend,
            )
            Q_run = np.minimum(
                D_cur[:, j - 1] + gap_open + gap_extend,
                Q_run + gap_extend,
            )
            diag = D_prev[:, j - 1] + np.where(
                ai == B[:, j - 1], 0, sub
            ).astype(np.int32)
            D_cur[:, j] = np.minimum(np.minimum(diag, p), Q_run)
            P_cur[:, j] = p
        hit = la == i
        if hit.any():
            out[hit] = D_cur[rows[hit], out_col[hit]].astype(np.int64)
        D_prev, D_cur = D_cur, D_prev
        P_prev, P_cur = P_cur, P_prev

    return out
