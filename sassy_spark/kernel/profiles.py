"""Character-equivalence profiles for the matching kernel.

The reference engine matches characters through per-profile bitmasks:
two chars match iff their class masks intersect
(reference src/profiles/iupac.rs:136-138: ``encode_char(a) &
encode_char(b) > 0``; table src/profiles/iupac.rs:281-316). This module
provides the same tables as plain codepoint->mask dicts that the numpy
kernel turns into a compact-alphabet compatibility matrix.

Chars absent from a profile fall back to exact-equality semantics (they
match only themselves), so profiles compose safely with arbitrary
web text.
"""

from __future__ import annotations

import numpy as np

_A, _C, _T, _G = 1, 2, 4, 8

_IUPAC_BASE = {
    "A": _A,
    "C": _C,
    "T": _T,
    "U": _T,
    "G": _G,
    "N": _A | _C | _T | _G,
    "R": _A | _G,
    "Y": _C | _T,
    "S": _G | _C,
    "W": _A | _T,
    "K": _G | _T,
    "M": _A | _C,
    "B": _C | _G | _T,
    "D": _A | _G | _T,
    "H": _A | _C | _T,
    "V": _A | _C | _G,
    "X": 0,  # matches nothing, like the reference's gap/unknown
}

#: IUPAC nucleotide ambiguity classes, case-insensitive (reference
#: src/profiles/iupac.rs: lowercase shares the upper-case class).
IUPAC_CLASSES: dict[int, int] = {}
for _ch, _m in _IUPAC_BASE.items():
    IUPAC_CLASSES[ord(_ch)] = _m
    IUPAC_CLASSES[ord(_ch.lower())] = _m

#: Plain DNA classes: ACGT (+ case folding), everything else exact.
DNA_CLASSES: dict[int, int] = {
    ord(c): m
    for c, m in (("A", _A), ("C", _C), ("T", _T), ("G", _G))
} | {
    ord(c.lower()): m
    for c, m in (("A", _A), ("C", _C), ("T", _T), ("G", _G))
}


def casefold_classes() -> dict[int, int]:
    """ASCII case-insensitive matching as an equivalence-class LUT: each
    letter pair {X, x} shares one class bit-set — the profile form of the
    reference's Ascii<false> (src/profiles/ascii.rs:94-119), usable
    without rewriting the text."""
    out: dict[int, int] = {}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz"):
        out[ord(c)] = 1 << i
        out[ord(c.upper())] = 1 << i
    return out


def resolve_profile(profile) -> dict[int, int] | None:
    """'ascii' (exact bytes/chars) | 'dna' | 'iupac' | 'ascii_ci' |
    a codepoint->mask dict | None."""
    if profile is None or profile == "ascii":
        return None
    if isinstance(profile, dict):
        return profile
    if profile == "iupac":
        return IUPAC_CLASSES
    if profile == "dna":
        return DNA_CLASSES
    if profile == "ascii_ci":
        return casefold_classes()
    raise ValueError(f"unknown profile: {profile!r}")


def chars_match(a: str, b: str, classes: dict[int, int]) -> bool:
    """One-pair form of the profile rule: symbols in ``classes`` match iff
    their masks intersect; symbols outside match only themselves; a
    profiled symbol never matches an unprofiled one. THE single source of
    truth for scalar profile matching (the kernel's compat_matrix is the
    vectorized form of the same rule)."""
    ma = classes.get(ord(a), -1)
    mb = classes.get(ord(b), -1)
    if ma >= 0 and mb >= 0:
        return (ma & mb) > 0
    return ma < 0 and mb < 0 and a == b


def seqs_match(a: str, b: str, classes: dict[int, int]) -> bool:
    """Equal-length sequences match iff every position matches."""
    return len(a) == len(b) and all(
        chars_match(x, y, classes) for x, y in zip(a, b)
    )


def compat_matrix(originals: np.ndarray, classes: dict[int, int]) -> np.ndarray:
    """(A, A) bool compatibility matrix over a compact alphabet.

    ``originals[cid]`` is the original codepoint of compact symbol cid.
    Symbols in ``classes`` match iff their masks intersect; symbols
    outside match only themselves; a profiled symbol never matches an
    unprofiled one (mask vs exact are disjoint vocabularies), except that
    identical codepoints always match themselves when their mask is
    nonzero.
    """
    a = len(originals)
    masks = np.array(
        [classes.get(int(s), -1) for s in originals], dtype=np.int64
    )
    has = masks >= 0
    compat = np.zeros((a, a), dtype=bool)
    both = has[:, None] & has[None, :]
    inter = (masks[:, None] & masks[None, :]) > 0
    compat[both] = inter[both]
    exact = originals[:, None] == originals[None, :]
    neither = ~has[:, None] & ~has[None, :]
    compat[neither] = exact[neither]
    return compat
