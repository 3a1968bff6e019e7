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


def build_peq(
    patterns: list[bytes], n_words: int, alphabet: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """Positional-equality bitmask tensor for a batch of patterns.

    Returns (peq, mlens):
      peq  : (B, n_words, alphabet) uint64 — bit i of word w set for char c
             iff pattern[w*64 + i] == c  (the numpy analog of sassy's
             Profile::encode_pattern, reference src/profiles/ascii.rs:18-28).
      mlens: (B,) int64 pattern lengths.
    """
    b = len(patterns)
    peq = np.zeros((b, n_words, alphabet), dtype=np.uint64)
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
    a_list: list, b_list: list, k=None
) -> np.ndarray:
    """Global Levenshtein distance per pair, vectorized over the batch.

    ``k`` (scalar or per-pair array) switches to the *banded* kernel:
    exact for distances <= k, reports k+1 otherwise, and only computes
    the ~(2k+64)-wide diagonal word window per column — O(n * k/64)
    instead of O(n * m/64), the bit-parallel form of the Ukkonen band
    (the role sassy's early row termination plays,
    reference src/search.rs:1131-1162).
    """
    if k is not None:
        return banded_edit_distances(a_list, b_list, k)
    return _full_edit_distances(a_list, b_list, None)


def _full_edit_distances(
    a_list: list, b_list: list, k: int | None = None
) -> np.ndarray:
    """Unbanded reference path (also used when k >= pattern length)."""
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
    # compact alphabet: same cache win as the banded kernel
    pmat0 = np.zeros((bsz, max(1, int(mlens.max()))), dtype=np.uint8)
    for i, p in enumerate(pats):
        pmat0[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    tmat0, tlens = _pad_texts(txts)
    alphabet = _compact_alphabet(pmat0, tmat0)
    pats = [pmat0[i, : mlens[i]].tobytes() for i in range(bsz)]
    peq, _ = build_peq(pats, n_words, alphabet)
    tmat = tmat0

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


# ------------------------------------------------------------ banded kernel


def _peq_word(pmat: np.ndarray, w: int, alphabet_size: int = 256) -> np.ndarray:
    """Positional-equality masks for pattern word w only (lazy build: the
    banded kernel touches ~(2k+64)/64 words per column, so materializing
    the full (B, W, 256) tensor would waste both time and memory).

    ``alphabet_size``: inputs remapped to a dense alphabet keep this table
    small enough to live in L2 even with 32 concurrent workers — the
    engine's version of sassy's compile-time alphabet profiles
    (reference src/profiles.rs:13-66: Dna=4, Iupac=16, Ascii=256)."""
    b = pmat.shape[0]
    peqw = np.zeros((b, alphabet_size), dtype=np.uint64)
    lo = w * 64
    hi = min(pmat.shape[1], lo + 64)
    if hi <= lo:
        return peqw
    chunk = pmat[:, lo:hi]
    bits = (U1 << np.arange(hi - lo, dtype=np.uint64))
    rows = np.arange(b)[:, None]
    np.bitwise_or.at(peqw, (rows, chunk), bits[None, :])
    # bits scattered for padding char 0 beyond each pattern's end sit above
    # the tracked row and never propagate downward — harmless by the same
    # argument as unbanded padding.
    return peqw


def _compact_alphabet(pmat: np.ndarray, tmat: np.ndarray) -> int:
    """Remap both matrices in place to a dense 0..A-1 alphabet; returns A.

    Web text uses a few dozen distinct bytes; a (B, A) gather table at
    A~32 is 8x smaller than (B, 256) — the difference between the inner
    gather hitting L2 or thrashing shared L3 across 32 workers."""
    used = np.zeros(256, dtype=bool)
    used[0] = True  # padding char stays 0
    used[np.unique(pmat)] = True
    used[np.unique(tmat)] = True
    amap = np.cumsum(used).astype(np.uint8) - 1
    pmat[...] = amap[pmat]
    tmat[...] = amap[tmat]
    return int(used.sum())


def _window_column_min(
    pv: np.ndarray,
    mv: np.ndarray,
    lo_w: int,
    track_row: np.ndarray,
    score: np.ndarray,
) -> np.ndarray:
    """Min DP value in the current column across the computed window.

    Unpacks the vertical-delta bitmasks (pv bit r => D[row r+2]-D[row r+1]
    = +1, mv => -1) and walks down from the tracked row whose value is
    known — the batch analog of sassy's prefix_min lane scan
    (reference src/minima.rs:62-92), done only at 64-column boundaries so
    the amortized cost is < 1 op per column per word.
    """
    tw_max = int(track_row.max()) >> 6
    sel = slice(lo_w, tw_max + 1)
    pbits = np.unpackbits(
        np.ascontiguousarray(pv[sel].T).view(np.uint8), axis=1, bitorder="little"
    ).astype(np.int32)
    mbits = np.unpackbits(
        np.ascontiguousarray(mv[sel].T).view(np.uint8), axis=1, bitorder="little"
    ).astype(np.int32)
    delta = pbits - mbits
    rows = np.arange(lo_w * 64, (tw_max + 1) * 64)
    invalid = rows[None, :] > track_row[:, None]
    delta[invalid] = 0
    # V[r] = D[DP row r+1]; V[track_row] = score;
    # V[r] = score - sum_{q > r} delta[q]
    suffix = np.cumsum(delta[:, ::-1], axis=1)[:, ::-1]
    v = score[:, None] - (suffix - delta)
    big = np.int32(1 << 20)
    v[invalid] = big
    colmin = v.min(axis=1)
    bottom = v[:, 0] - delta[:, 0]  # DP row lo_w*64 itself
    return np.minimum(colmin, bottom)


def banded_edit_distances(a_list: list, b_list: list, k) -> np.ndarray:
    """Banded bit-parallel global edit distance (the edlib-style moving
    word window over Myers' recurrence).

    Per pair: exact distance if <= k_i, else k_i + 1. ``k`` scalar or
    per-pair array. Work per column is O(band_words) instead of
    O(pattern_words); finished and provably-hopeless pairs are compacted
    out of the batch as the scan advances (the batch analog of sassy's
    per-lane early termination, reference src/search.rs:952-975).
    """
    bsz = len(a_list)
    out = np.zeros(bsz, dtype=np.int64)
    if bsz == 0:
        return out
    k_arr = np.broadcast_to(np.asarray(k, dtype=np.int64), (bsz,)).copy()

    pats, texts = [], []
    for a, b in zip(a_list, b_list):
        ab, bb = _as_bytes(a), _as_bytes(b)
        if len(ab) > len(bb):
            ab, bb = bb, ab
        pats.append(ab)
        texts.append(bb)
    mlens = np.array([len(p) for p in pats], dtype=np.int64)
    nlens = np.array([len(t) for t in texts], dtype=np.int64)

    # trivial / prefiltered pairs
    hopeless0 = (nlens - mlens) > k_arr
    empty_p = mlens == 0
    out[hopeless0] = k_arr[hopeless0] + 1
    out[empty_p & ~hopeless0] = nlens[empty_p & ~hopeless0]
    live0 = ~(hopeless0 | empty_p)
    idx = np.nonzero(live0)[0]
    if len(idx) == 0:
        return out

    # dense per-alive arrays; pv/mv are (W, B) so each word's lane vector is
    # contiguous (column-major over words would stride by W and thrash cache)
    def compress(sel):
        nonlocal idx, pmat, tmat, mlens_a, tlens, k_a, pv, mv
        nonlocal score, track_row, top_row, peq_cache
        idx = idx[sel]
        pmat = pmat[sel]
        tmat = np.ascontiguousarray(tmat[:, sel])
        mlens_a = mlens_a[sel]
        tlens = tlens[sel]
        k_a = k_a[sel]
        pv = np.ascontiguousarray(pv[:, sel])
        mv = np.ascontiguousarray(mv[:, sel])
        score = score[sel]
        track_row = track_row[sel]
        top_row = top_row[sel]
        peq_cache = {w: np.ascontiguousarray(p[sel]) for w, p in peq_cache.items()}

    m_max = int(mlens[idx].max())
    n_max = int(nlens[idx].max())
    w_count = (m_max + 63) // 64
    pmat = np.zeros((len(idx), m_max), dtype=np.uint8)
    tmat = np.zeros((n_max, len(idx)), dtype=np.uint8)  # column-major scan
    for row, orig in enumerate(idx):
        pb = np.frombuffer(pats[orig], dtype=np.uint8)
        tb = np.frombuffer(texts[orig], dtype=np.uint8)
        pmat[row, : len(pb)] = pb
        tmat[: len(tb), row] = tb
    mlens_a = mlens[idx]
    tlens = nlens[idx]
    k_a = k_arr[idx]
    alphabet_size = _compact_alphabet(pmat, tmat)

    pv = np.full((w_count, len(idx)), UFULL, dtype=np.uint64)
    mv = np.zeros((w_count, len(idx)), dtype=np.uint64)
    top_row = mlens_a - 1  # bit-space row of D[m]
    peq_cache: dict[int, np.ndarray] = {}

    kmax = int(k_a.max())
    hi_w = min(w_count - 1, (63 + kmax) >> 6)
    lo_w = 0
    win_top = (hi_w + 1) * 64 - 1
    track_row = np.minimum(top_row, win_top)
    score = track_row + 1
    bi = np.arange(len(idx))

    jb = 0
    while jb < n_max and len(idx):
        if jb > 0:
            new_hi = min(w_count - 1, (jb + 63 + kmax) >> 6)
            if new_hi > hi_w:
                # virgin words above carry pv=all-ones (D grows +1 per row),
                # so the tracked score moves up by the row delta exactly
                hi_w = new_hi
                win_top = (hi_w + 1) * 64 - 1
                new_track = np.minimum(top_row, win_top)
                score += new_track - track_row
                track_row = new_track
            lo_w = max(lo_w, (jb - kmax) >> 6)
        for w in range(lo_w, hi_w + 1):
            if w not in peq_cache:
                peq_cache[w] = _peq_word(pmat, w, alphabet_size)

        track_word = (track_row >> 6).astype(np.int64)
        track_bit = (U1 << (track_row & 63).astype(np.uint64))
        # per-word selection masks are stable within the block
        sel_by_word = {
            w: track_word == w
            for w in range(lo_w, hi_w + 1)
            if bool((track_word == w).any())
        }
        j_end = min(jb + 64, n_max)
        # preallocated scratch: the inner step would otherwise allocate
        # ~16 fresh temporaries per word per column — allocator churn is
        # both a cache hazard and (in this sandbox) a serialized-fault
        # hazard. All ops below write into these via out=.
        b_now = len(idx)
        eqw = np.empty(b_now, dtype=np.uint64)
        xv = np.empty(b_now, dtype=np.uint64)
        t1 = np.empty(b_now, dtype=np.uint64)
        t2 = np.empty(b_now, dtype=np.uint64)
        mh = np.empty(b_now, dtype=np.uint64)
        hin_p = np.empty(b_now, dtype=np.uint64)
        hin_m = np.empty(b_now, dtype=np.uint64)
        hout_p = np.empty(b_now, dtype=np.uint64)
        hout_m = np.empty(b_now, dtype=np.uint64)
        flat = np.empty(b_now, dtype=np.int64)
        base_idx = bi[:b_now] * np.int64(alphabet_size)
        for j in range(jb, j_end):
            act = tlens > j
            if not act.any():
                break
            chars = tmat[j]
            hin_p.fill(1)  # band-bottom/global +1
            hin_m.fill(0)
            for w in range(lo_w, hi_w + 1):
                pvw = pv[w]
                mvw = mv[w]
                np.add(base_idx, chars, out=flat)
                np.take(peq_cache[w].reshape(-1), flat, out=eqw)
                np.bitwise_or(eqw, mvw, out=xv)
                np.bitwise_or(eqw, hin_m, out=eqw)
                np.bitwise_and(eqw, pvw, out=t1)
                np.add(t1, pvw, out=t1)
                np.bitwise_xor(t1, pvw, out=t1)
                np.bitwise_or(t1, eqw, out=t1)  # t1 = xh
                np.bitwise_or(t1, pvw, out=t2)
                np.invert(t2, out=t2)
                np.bitwise_or(mvw, t2, out=t2)  # t2 = ph
                np.bitwise_and(pvw, t1, out=mh)  # mh
                sel = sel_by_word.get(w)
                if sel is not None:
                    sa = sel & act
                    tb = track_bit[sa]
                    score[sa] += ((t2[sa] & tb) != 0).astype(np.int64)
                    score[sa] -= ((mh[sa] & tb) != 0).astype(np.int64)
                np.right_shift(t2, U63, out=hout_p)
                np.right_shift(mh, U63, out=hout_m)
                np.left_shift(t2, U1, out=t2)
                np.bitwise_or(t2, hin_p, out=t2)  # ph shifted
                np.left_shift(mh, U1, out=mh)
                np.bitwise_or(mh, hin_m, out=mh)  # mh shifted
                np.bitwise_or(xv, t2, out=t1)
                np.invert(t1, out=t1)
                np.bitwise_or(mh, t1, out=pvw)  # pv[w] updated in place
                np.bitwise_and(t2, xv, out=mvw)  # mv[w] updated in place
                hin_p, hout_p = hout_p, hin_p
                hin_m, hout_m = hout_m, hin_m
            fin = tlens == j + 1
            if fin.any():
                out[idx[fin]] = np.minimum(score[fin], k_a[fin] + 1)
        jb = j_end
        # prune: any full path crosses every column; cells computed by the
        # banded recurrence are >= true and exact whenever true <= kmax, so
        # "entire computed column > k_a" proves the true final distance
        # > k_a (rows outside the window have |i - j| > kmax >= k_a).
        colmin = _window_column_min(pv, mv, lo_w, track_row, score)
        hopeless = colmin > k_a
        done = (tlens <= jb) | hopeless
        if done.any():
            h = hopeless & (tlens > jb)
            out[idx[h]] = k_a[h] + 1
            keep = ~done
            if not keep.any():
                break
            compress(keep)
            new_kmax = int(k_a.max())
            if new_kmax < kmax:
                kmax = new_kmax  # narrows future lo_w; hi_w never shrinks
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
