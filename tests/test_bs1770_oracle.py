"""Independent BS.1770-4 oracle (VERDICT r4 #5).

Everything else in the repo that checks loudness ultimately shares one
author's reading of BS.1770 (`tests/reference_impl.py` re-derives the
same filter design and gating as the engine). A shared misreading would
pass all of those tests. This file anchors the chain to material that
CANNOT share that misreading:

1. The literal coefficient tables PUBLISHED in ITU-R BS.1770-4 (Tables
   1 and 2, 48 kHz) — typed in below as constants, not derived.
2. An independent integrated-loudness implementation written directly
   from the spec's text, filtering with scipy.signal.lfilter (an
   external IIR implementation) and the published tables.
3. True peak cross-checked against scipy.signal.resample_poly
   oversampling (an independent polyphase interpolator).

The libav bridge in this image has no libavfilter (no ebur128 filter),
so scipy + the published tables are the independent instruments.

Reference behavior under test: the ebur128 crate consumed at
/root/reference/src/analyzer.rs:29-53,139-182.
"""

import numpy as np
import pytest
import scipy.signal as sig

from soundscope_tpu.ops.kweight import design_kweight

# ITU-R BS.1770-4, Table 1 (stage 1 shelving filter) and Table 2 (RLB
# high-pass), 48 kHz. Typed from the standard; NOT derived by this repo's
# design code.
T1_B = [1.53512485958697, -2.69169618940638, 1.19839281085285]
T1_A = [1.0, -1.69065929318241, 0.73248077421585]
T2_B = [1.0, -2.0, 1.0]
T2_A = [1.0, -1.99004745483398, 0.99007225036621]


def test_kfilter_design_matches_published_tables_48k():
    """The analog-prototype rediscretisation must land on the standard's
    own published 48 kHz tables. A misread prototype constant (f0, Q,
    gain, or transform) moves these in the 3rd-4th decimal; the
    round-trip (table -> printed precision) is ~1e-12."""
    bs, as_ = design_kweight(48000)
    np.testing.assert_allclose(bs[0], T1_B, rtol=0, atol=1e-6)
    np.testing.assert_allclose(as_[0], T1_A, rtol=0, atol=1e-6)
    np.testing.assert_allclose(bs[1], T2_B, rtol=0, atol=1e-6)
    np.testing.assert_allclose(as_[1], T2_A, rtol=0, atol=1e-6)


def _integrated_lufs_spec(x: np.ndarray, rate: int,
                          use_tables: bool) -> float:
    """Integrated loudness written directly from BS.1770-4's text.

    x: (C, N) float. Filters with scipy.signal.lfilter; gating blocks are
    400 ms at 75% overlap; J_abs = blocks > -70 LKFS; relative threshold
    = gated mean - 10 LU; channel weights 1 (no surround here).
    """
    if use_tables:
        assert rate == 48000
        b1, a1, b2, a2 = T1_B, T1_A, T2_B, T2_A
    else:
        bs, as_ = design_kweight(rate)
        (b1, a1), (b2, a2) = (bs[0], as_[0]), (bs[1], as_[1])
    y = sig.lfilter(b2, a2, sig.lfilter(b1, a1, np.asarray(x, np.float64)))

    T_g = int(round(0.4 * rate))          # 400 ms gating block
    step = T_g // 4                       # 75% overlap
    n = y.shape[1]
    if n < T_g:
        return float("-inf")
    nblocks = (n - T_g) // step + 1
    e = np.empty(nblocks)
    for j in range(nblocks):
        seg = y[:, j * step: j * step + T_g]
        e[j] = np.sum(np.mean(seg * seg, axis=1))   # sum over channels
    lk = -0.691 + 10.0 * np.log10(np.maximum(e, 1e-30))
    abs_gated = e[lk > -70.0]
    if abs_gated.size == 0:
        return float("-inf")
    rel_thresh = -0.691 + 10.0 * np.log10(abs_gated.mean()) - 10.0
    final = e[(lk > -70.0) & (lk > rel_thresh)]
    if final.size == 0:
        return float("-inf")
    return -0.691 + 10.0 * np.log10(final.mean())


def _fixture(seed: int, rate: int, seconds: float = 12.0) -> np.ndarray:
    """Randomized program-like stereo fixture: tone+noise segments at
    stepped levels with silent gaps, exercising both gates."""
    rng = np.random.default_rng(seed)
    n = int(seconds * rate)
    x = np.zeros((2, n))
    t = np.arange(n) / rate
    pos = 0
    while pos < n:
        seg = int(rng.uniform(0.8, 2.5) * rate)
        end = min(pos + seg, n)
        kind = rng.integers(0, 3)
        if kind == 0:   # silence (absolute-gate fodder)
            pass
        else:
            level = 10.0 ** (rng.uniform(-45.0, -6.0) / 20.0)
            f = rng.uniform(80.0, 8000.0)
            for c in range(2):
                tone = np.sin(2 * np.pi * f * t[pos:end]
                              + rng.uniform(0, 2 * np.pi))
                noise = rng.standard_normal(end - pos) * 0.3
                x[c, pos:end] = level * (tone + noise)
        pos = end
    return np.clip(x, -0.99, 0.99).astype(np.float32)


@pytest.mark.parametrize("seed", [11, 23, 37, 51])
def test_integrated_vs_independent_oracle_48k(seed):
    """Engine integrated LUFS vs the scipy + published-tables oracle,
    <= 0.05 LU on a randomized fixture matrix (budget: 0.1 LU)."""
    import jax.numpy as jnp

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_fn

    rate = 48000
    x = _fixture(seed, rate)
    got = float(analyze_fn(MeterConfig(channels=2, rate=rate, max_blocks=0))(
        jnp.asarray(x), jnp.int32(x.shape[1])).integrated_lufs)
    want = _integrated_lufs_spec(x, rate, use_tables=True)
    assert abs(got - want) <= 0.05, (got, want)


@pytest.mark.parametrize("rate", [44100, 96000])
def test_integrated_vs_independent_gating_other_rates(rate):
    """At non-48k rates the spec publishes no tables; the filter design
    is shared, but the FILTERING (scipy lfilter) and the whole gating
    chain remain independent."""
    import jax.numpy as jnp

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_fn

    x = _fixture(77, rate)
    got = float(analyze_fn(MeterConfig(channels=2, rate=rate, max_blocks=0))(
        jnp.asarray(x), jnp.int32(x.shape[1])).integrated_lufs)
    want = _integrated_lufs_spec(x, rate, use_tables=False)
    assert abs(got - want) <= 0.05, (got, want)


@pytest.mark.parametrize("seed", [3, 9])
def test_true_peak_vs_independent_resampler(seed):
    """True peak vs scipy.signal.resample_poly 8x oversampling on
    band-limited content, <= 0.1 dB (the BS.1770-4 Annex 2 budget).

    Band-limiting to < 0.5x Nyquist keeps both interpolators in their
    flat passband, so disagreement means a broken interpolator rather
    than filter-shape taste."""
    import jax.numpy as jnp

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_fn

    rate = 48000
    rng = np.random.default_rng(seed)
    n = 1 << 16
    t = np.arange(n) / rate
    x = np.zeros((2, n))
    for c in range(2):
        for _ in range(6):
            f = rng.uniform(100.0, 11000.0)
            x[c] += rng.uniform(0.05, 0.3) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    x = (0.7 * x / np.abs(x).max()).astype(np.float32)

    res = analyze_fn(MeterConfig(channels=2, rate=rate, max_blocks=0))(
        jnp.asarray(x), jnp.int32(n))
    got = np.asarray(res.true_peak)

    up = sig.resample_poly(np.asarray(x, np.float64), 8, 1, axis=1)
    want = np.abs(up).max(axis=1)
    got_db = 20 * np.log10(got)
    want_db = 20 * np.log10(want)
    np.testing.assert_allclose(got_db, want_db, rtol=0, atol=0.1)
