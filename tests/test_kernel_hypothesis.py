"""Property-based kernel tests (hypothesis) — adversarial small-alphabet
strings stress plateau/boundary cases the seeded fuzz may miss."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sassy_spark.kernel.myers import (
    banded_edit_distances,
    semiglobal_scores,
    _full_edit_distances,
)
from sassy_spark.kernel.reference_dp import levenshtein, semiglobal_costs

short = st.text(alphabet="ab", max_size=40)
medium = st.text(alphabet="abc", max_size=150)


@settings(max_examples=200, deadline=None)
@given(short, short)
def test_full_matches_dp(a, b):
    assert _full_edit_distances([a], [b])[0] == levenshtein(a, b)


@settings(max_examples=200, deadline=None)
@given(medium, medium, st.integers(min_value=0, max_value=30))
def test_banded_contract(a, b, k):
    got = int(banded_edit_distances([a], [b], k)[0])
    ref = levenshtein(a, b)
    if ref <= k:
        assert got == ref
    else:
        assert got > k


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="ab", min_size=1, max_size=30),
    st.text(alphabet="ab", min_size=1, max_size=120),
)
def test_semiglobal_matches_dp(p, t):
    smat, tlens = semiglobal_scores([p], [t])
    assert smat[0, : tlens[0]].tolist() == semiglobal_costs(p, t)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(short, short), min_size=1, max_size=20))
def test_batch_equals_singles(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    batch = banded_edit_distances(a, b, 12)
    singles = [int(banded_edit_distances([x], [y], 12)[0]) for x, y in pairs]
    assert batch.tolist() == singles


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="ab", min_size=1, max_size=40),
    st.text(alphabet="ab", min_size=1, max_size=150),
    st.integers(min_value=0, max_value=6),
)
def test_streaming_search_all_matches_dp(p, t, k):
    """The streaming row-banded search must emit exactly the <=k end
    positions of the textbook DP curve (adversarial ab-strings hit
    plateau and band-boundary cases)."""
    from sassy_spark.kernel.myers import semiglobal_search

    ref = semiglobal_costs(p, t)
    want = [(j + 1, c) for j, c in enumerate(ref) if c <= k]
    got = semiglobal_search([p], [t], k, mode="all")[0]
    assert list(zip(got[0].tolist(), got[1].tolist())) == want


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="ab", min_size=1, max_size=30),
    st.text(alphabet="ab", min_size=1, max_size=120),
    st.integers(min_value=0, max_value=4),
    st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
def test_streaming_overhang_matches_dp(p, t, k, alpha):
    from sassy_spark.kernel.myers import semiglobal_search
    from sassy_spark.kernel.reference_dp import semiglobal_costs_overhang

    ref = semiglobal_costs_overhang(p, t, alpha)
    want = [(j + 1, c) for j, c in enumerate(ref) if c <= k]
    got = semiglobal_search([p], [t], k, mode="all", alpha=alpha)[0]
    assert list(zip(got[0].tolist(), got[1].tolist())) == want
