"""Bit-parallel approximate string matching kernel (numpy, batch-vectorized).

This is the computational heart of the engine: a from-scratch numpy
implementation of Myers' 1999 bit-parallel edit-distance recurrence
(with Hyyro's block extension for patterns longer than 64 chars), laid
out so the *batch of pairs* is the vectorized dimension. One Python-level
loop step advances ALL pairs in the batch by one text character — the
numpy analog of the reference engine's SIMD lanes (sassy processes 4-8
64-char blocks per AVX vector, src/bitpacking.rs:63-85; we process
B pairs x W words per numpy op).

Semantics intentionally mirror the reference (RagnarGrootKoerkamp/sassy):

* ``edit_distances``      — global Levenshtein distance per pair
  (the pairwise scoring primitive of the entity-resolution pipeline).
* ``semiglobal_search``   — "find approximate occurrences of pattern in
  text": deletions before/after the match are free (text prefix/suffix
  skipped at no cost), like sassy's ``Searcher::search``
  (reference src/search.rs:510-525). Supports ``all`` end positions with
  cost <= k (search_all, src/search.rs:685-700), rightmost ``local
  minima`` (the default search, src/search.rs:1286-1369) and ``best``
  (only_best_match, src/search.rs:442-445,1392-1455: min cost, rightmost
  end tie-break).
* ``traceback``           — start position + CIGAR via greedy backtrace
  preferring match > sub > del > ins (reference src/trace.rs:273-406,
  preference documented src/lib.rs:42-50). Run only on accepted matches
  (rare), like sassy's batched traceback after candidate filtering.

No code is copied from the reference; the recurrence follows the
published algorithm (G. Myers, JACM 46(3), 1999; H. Hyyro, 2003).
"""

from __future__ import annotations

import numpy as np

U1 = np.uint64(1)
U63 = np.uint64(63)
UFULL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _as_bytes(s) -> bytes:
    if isinstance(s, bytes):
        return s
    return str(s).encode("utf-8", errors="surrogatepass")


def build_peq(patterns: list[bytes], n_words: int) -> tuple[np.ndarray, np.ndarray]:
    """Positional-equality bitmask tensor for a batch of patterns.

    Returns (peq, mlens):
      peq  : (B, n_words, 256) uint64 — bit i of word w set for char c iff
             pattern[w*64 + i] == c  (the numpy analog of sassy's
             Profile::encode_pattern, reference src/profiles/ascii.rs:18-28).
      mlens: (B,) int64 pattern lengths.
    """
    b = len(patterns)
    peq = np.zeros((b, n_words, 256), dtype=np.uint64)
    mlens = np.empty(b, dtype=np.int64)
    for i, pat in enumerate(patterns):
        pb = np.frombuffer(pat, dtype=np.uint8)
        mlens[i] = len(pb)
        pos = np.arange(len(pb))
        words = pos >> 6
        bits = (U1 << (pos & 63).astype(np.uint64))
        np.bitwise_or.at(peq[i], (words, pb), bits)
    return peq, mlens


def _pad_texts(texts: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length byte strings into a (B, n_max) uint8 matrix.

    Padding char 0x00: real inputs are UTF-8 text so NUL never occurs;
    padded steps are additionally masked out of score updates.
    """
    b = len(texts)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    n_max = int(lens.max()) if b else 0
    mat = np.zeros((b, n_max), dtype=np.uint8)
    for i, t in enumerate(texts):
        mat[i, : lens[i]] = np.frombuffer(t, dtype=np.uint8)
    return mat, lens


def _advance(peq, pv, mv, chars, score, top_word, top_bit, hin0, active):
    """Advance all pairs by one text character.

    peq: (B,W,256); pv/mv: (B,W) uint64 vertical delta bitmasks;
    chars: (B,) uint8; score: (B,) int64 (updated in place);
    top_word: (B,) int; top_bit: (B,) uint64 single-bit mask of row m;
    hin0: +1 for global alignment (row 0 of the DP matrix increases along
    the text), 0 for semi-global (free text prefix);
    active: (B,) bool — pairs still inside their own text.
    """
    b, w_count, _ = peq.shape
    bi = np.arange(b)
    eq_all = peq[bi, :, chars]  # (B, W)

    hin_p = np.full(b, np.uint64(1 if hin0 > 0 else 0), dtype=np.uint64)
    hin_m = np.zeros(b, dtype=np.uint64)

    for w in range(w_count):
        pvw = pv[:, w]
        mvw = mv[:, w]
        eqw = eq_all[:, w]

        xv = eqw | mvw
        eqw2 = eqw | hin_m  # carry a -1 horizontal input into the word
        # (eq & pv) + pv with incoming carry is not needed: the addition is
        # word-local in Hyyro's block formulation (carry between words is
        # conveyed entirely by the hin/hout +-1 deltas).
        xh = (((eqw2 & pvw) + pvw) ^ pvw) | eqw2
        ph = mvw | ~(xh | pvw)
        mh = pvw & xh

        # score delta where row m lives in this word
        sel = active & (top_word == w)
        if sel.any():
            tb = top_bit[sel]
            delta = ((ph[sel] & tb) != 0).astype(np.int64) - (
                (mh[sel] & tb) != 0
            ).astype(np.int64)
            score[sel] += delta

        hout_p = ph >> U63
        hout_m = mh >> U63
        ph = (ph << U1) | hin_p
        mh = (mh << U1) | hin_m
        pv[:, w] = mh | ~(xv | ph)
        mv[:, w] = ph & xv
        hin_p = hout_p
        hin_m = hout_m


def edit_distances(
    a_list: list, b_list: list, k: int | None = None
) -> np.ndarray:
    """Global (NW) Levenshtein distance for each pair, vectorized over the batch.

    ``k`` is an optional early-exit bound: once every still-active pair
    provably exceeds k (score - remaining_text > k, the Ukkonen-style
    cutoff mirroring sassy's early row termination,
    reference src/search.rs:1131-1162), iteration stops and those pairs
    report k+1. Exact distances <= k are always exact.
    """
    bsz = len(a_list)
    if bsz == 0:
        return np.zeros(0, dtype=np.int64)
    pats = [_as_bytes(x) for x in a_list]
    texts = [_as_bytes(x) for x in b_list]
    # Pattern = the shorter string: fewer words, same distance (symmetry).
    swapped = [len(p) > len(t) for p, t in zip(pats, texts)]
    pats2 = [t if s else p for p, t, s in zip(pats, texts, swapped)]
    texts2 = [p if s else t for p, t, s in zip(pats, texts, swapped)]

    mlens = np.array([len(p) for p in pats2], dtype=np.int64)
    n_words = max(1, int((mlens.max() + 63) // 64))
    peq, _ = build_peq(pats2, n_words)
    tmat, tlens = _pad_texts(texts2)

    pv = np.full((bsz, n_words), UFULL, dtype=np.uint64)
    mv = np.zeros((bsz, n_words), dtype=np.uint64)
    score = mlens.copy()
    top_word = ((mlens - 1) >> 6).astype(np.int64)
    top_word[mlens == 0] = 0
    top_bit = (U1 << ((mlens - 1) & 63).astype(np.uint64))
    top_bit[mlens == 0] = U1

    n_max = tmat.shape[1]
    out = np.empty(bsz, dtype=np.int64)
    final_mask = tlens == 0
    out[final_mask] = mlens[final_mask]

    for j in range(n_max):
        act = tlens > j
        if not act.any():
            break
        if k is not None and j % 64 == 63:
            # lower bound on final distance: current score minus the text
            # still unread (each remaining char can reduce score by <= 1)
            lb = score - (tlens - j - 1).clip(min=0)
            if bool(((lb > k) | ~act).all()):
                out[act] = k + 1
                return out
        _advance(peq, pv, mv, tmat[:, j], score, top_word, top_bit, 1, act)
        fin = tlens == j + 1
        if fin.any():
            out[fin] = score[fin]
    zero = mlens == 0
    if zero.any():
        out[zero] = tlens[zero]
    return out


def semiglobal_scores(patterns: list, texts: list):
    """Yield-free batched semi-global scan.

    Returns (scores_matrix, tlens): scores_matrix[b, j] = best edit cost of
    pattern b against any text substring ending at position j+1 (int16,
    padded steps = large). Used by :func:`semiglobal_search`; exposed for
    tests.
    """
    bsz = len(patterns)
    pats = [_as_bytes(x) for x in patterns]
    txts = [_as_bytes(x) for x in texts]
    mlens = np.array([len(p) for p in pats], dtype=np.int64)
    n_words = max(1, int((mlens.max() + 63) // 64))
    peq, _ = build_peq(pats, n_words)
    tmat, tlens = _pad_texts(txts)

    pv = np.full((bsz, n_words), UFULL, dtype=np.uint64)
    mv = np.zeros((bsz, n_words), dtype=np.uint64)
    score = mlens.copy()
    top_word = ((mlens - 1) >> 6).astype(np.int64)
    top_word[mlens == 0] = 0
    top_bit = (U1 << ((mlens - 1) & 63).astype(np.uint64))
    top_bit[mlens == 0] = U1

    n_max = tmat.shape[1]
    big = np.int32(1 << 20)
    smat = np.full((bsz, n_max), big, dtype=np.int32)
    for j in range(n_max):
        act = tlens > j
        if not act.any():
            break
        _advance(peq, pv, mv, tmat[:, j], score, top_word, top_bit, 0, act)
        smat[act, j] = score[act]
    return smat, tlens


def local_minima(costs: np.ndarray, k: int) -> np.ndarray:
    """Indices of *rightmost local minima* with cost <= k along one pair's
    end-position cost curve — the match-reporting rule of the reference's
    default search (one match per run of equal minimal costs, rightmost
    position; reference src/search.rs:1286-1369, doc src/lib.rs:17-26)."""
    n = len(costs)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # rightmost element of each equal-cost plateau that is strictly below the
    # values bounding the plateau on both sides (array edges count as +inf)
    idx = np.arange(n)
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = costs[1:] != costs[:-1]
    run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
    prev_val = np.where(
        run_start > 0, costs[np.maximum(run_start - 1, 0)], costs[0] + 1
    )
    nxt = np.empty(n, dtype=costs.dtype)
    nxt[:-1] = costs[1:]
    nxt[-1] = costs[-1] + 1
    cand = (costs <= k) & (costs < nxt) & (costs < prev_val)
    return np.nonzero(cand)[0].astype(np.int64)


def semiglobal_search(
    patterns: list,
    texts: list,
    k: int,
    mode: str = "local_minima",
):
    """Approximate occurrences of each pattern in its paired text.

    mode: 'all' (every end position with cost<=k), 'local_minima'
    (reference default), 'best' (min cost, rightmost end — only_best_match).
    Returns list over pairs of (ends, costs) int64/int32 arrays where
    ``end`` is the exclusive end offset in the text (reference
    README.md:232-234 convention).
    """
    smat, tlens = semiglobal_scores(patterns, texts)
    out = []
    for i in range(len(patterns)):
        costs = smat[i, : tlens[i]]
        if mode == "all":
            idx = np.nonzero(costs <= k)[0]
        elif mode == "best":
            if len(costs) == 0 or costs.min() > k:
                out.append((np.zeros(0, np.int64), np.zeros(0, np.int32)))
                continue
            c = costs.min()
            idx = np.array([np.nonzero(costs == c)[0].max()], dtype=np.int64)
        else:
            idx = local_minima(costs, k)
        out.append(((idx + 1).astype(np.int64), costs[idx].astype(np.int32)))
    return out


# ---------------------------------------------------------------- traceback


def traceback(pattern, text, end: int, cost: int, semiglobal: bool = True):
    """Recover (start, cigar) for one accepted match by banded DP + greedy
    backtrace with the reference's preference order match > sub > del > ins
    (reference src/lib.rs:42-50, src/trace.rs:273-406). ``del`` consumes
    text, ``ins`` consumes pattern, ops emitted as ``= X I D`` run-length
    CIGAR like the reference (src/search.rs:53-61).

    Only called on accepted matches, so an O(m * (m+k)) python DP is fine.
    """
    p = _as_bytes(pattern)
    t = _as_bytes(text)[:end]
    m = len(p)
    # window of text that can participate: at most m + cost chars back
    lo = max(0, end - m - cost) if semiglobal else 0
    tt = t[lo:]
    n = len(tt)
    # DP: rows pattern 0..m, cols text 0..n; D[0][j] = 0 (free start)
    d = np.empty((m + 1, n + 1), dtype=np.int32)
    d[0, :] = 0 if semiglobal else np.arange(n + 1)
    d[:, 0] = np.arange(m + 1)
    pa = np.frombuffer(p, dtype=np.uint8)
    ta = np.frombuffer(tt, dtype=np.uint8)
    for i in range(1, m + 1):
        sub = d[i - 1, :-1] + (ta != pa[i - 1])
        # vectorized row update: need prefix-min for the insertion chain
        row = np.minimum(d[i - 1, 1:] + 1, sub)
        # left-to-right dependency (deletion from text / gap): do cumulative
        run = d[i, 0]
        out_row = np.empty(n, dtype=np.int32)
        for j in range(n):
            run = min(row[j], run + 1)
            out_row[j] = run
        d[i, 1:] = out_row
    # greedy backtrace from (m, n)
    i, j = m, n
    ops: list[str] = []
    while i > 0 or (not semiglobal and j > 0):
        if i > 0 and j > 0 and pa[i - 1] == ta[j - 1] and d[i, j] == d[i - 1, j - 1]:
            ops.append("=")
            i -= 1
            j -= 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            ops.append("X")
            i -= 1
            j -= 1
        elif j > 0 and d[i, j] == d[i, j - 1] + 1:
            ops.append("D")
            j -= 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            ops.append("I")
            i -= 1
        else:  # pragma: no cover - DP invariant
            raise AssertionError("traceback stuck")
    ops.reverse()
    start = lo + j
    # run-length encode
    cig = []
    for op in ops:
        if cig and cig[-1][1] == op:
            cig[-1][0] += 1
        else:
            cig.append([1, op])
    cigar = "".join(f"{c}{op}" for c, op in cig)
    return start, cigar
