"""EBU Tech 3341 / 3342 conformance vectors (synthesised per the specs)
and cross-validation against the trusted float64 reference chain.

The BASELINE fidelity budget is <= 0.1 LU integrated / 0.1 dB true peak.
"""

import numpy as np
import pytest

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.models.engine import analyze_array
from soundscope_tpu.utils.synth import segments, sine, stereo
from tests.reference_impl import analyze_reference

RATE = 48000


def _analyze(planar, rate=RATE):
    cfg = MeterConfig(channels=planar.shape[0], rate=rate, max_blocks=0)
    return analyze_array(planar, cfg)


# --- EBU Tech 3341: integrated loudness minimum requirements -----------------

def test_3341_case1_minus23():
    """Stereo 997 Hz at -23 dBFS, 20 s -> I = -23.0 +/- 0.1 LUFS."""
    x = stereo(sine(997.0, 20.0, RATE, -23.0))
    res = _analyze(x)
    assert abs(float(res.integrated_lufs) + 23.0) < 0.1
    # steady state: momentary and short-term also read -23
    mom = np.asarray(res.momentary)[: int(res.n_momentary)]
    st = np.asarray(res.shortterm)[: int(res.n_shortterm)]
    assert abs(mom[-1] + 23.0) < 0.1
    assert abs(st[-1] + 23.0) < 0.1


def test_3341_case2_minus33():
    x = stereo(sine(997.0, 20.0, RATE, -33.0))
    res = _analyze(x)
    assert abs(float(res.integrated_lufs) + 33.0) < 0.1


def test_3341_case3_relative_gate():
    """-36 (10 s) | -23 (60 s) | -36 (10 s): quiet flanks fall below the
    relative gate -> I = -23.0 +/- 0.1."""
    x = stereo(
        segments([
            sine(997.0, 10.0, RATE, -36.0),
            sine(997.0, 60.0, RATE, -23.0),
            sine(997.0, 10.0, RATE, -36.0),
        ])
    )
    res = _analyze(x)
    assert abs(float(res.integrated_lufs) + 23.0) < 0.1


def test_3341_case4_absolute_gate():
    """Adds -72 dBFS flanks below the absolute gate."""
    x = stereo(
        segments([
            sine(997.0, 10.0, RATE, -72.0),
            sine(997.0, 10.0, RATE, -36.0),
            sine(997.0, 60.0, RATE, -23.0),
            sine(997.0, 10.0, RATE, -36.0),
            sine(997.0, 10.0, RATE, -72.0),
        ])
    )
    res = _analyze(x)
    assert abs(float(res.integrated_lufs) + 23.0) < 0.1


@pytest.mark.parametrize("rate", [44100, 96000])
def test_case1_other_rates(rate):
    x = stereo(sine(997.0, 12.0, rate, -23.0))
    res = _analyze(x, rate)
    assert abs(float(res.integrated_lufs) + 23.0) < 0.1


def test_mono_channel_summation():
    """A single -23 dBFS channel reads 3.01 LU quieter than stereo."""
    mono = sine(997.0, 12.0, RATE, -23.0)[None, :]
    res = _analyze(mono)
    assert abs(float(res.integrated_lufs) + 23.0 - (-3.0103)) < 0.1


def test_surround_channel_weights():
    """5.0: surround channels carry +1.5 dB weight (1.41)."""
    quiet = np.zeros_like(sine(997.0, 12.0, RATE, -23.0))
    ls = sine(997.0, 12.0, RATE, -23.0)
    x = np.stack([quiet, quiet, quiet, ls, quiet])  # L R C Ls Rs
    res = _analyze(x)
    expected = -23.0 - 3.0103 + 10 * np.log10(1.41)
    assert abs(float(res.integrated_lufs) - expected) < 0.1


# --- EBU Tech 3342: loudness range -------------------------------------------

def test_3342_case1_lra10():
    """-20 (20 s) | -30 (20 s) -> LRA = 10 +/- 1 LU."""
    x = stereo(
        segments([sine(997.0, 20.0, RATE, -20.0), sine(997.0, 20.0, RATE, -30.0)])
    )
    res = _analyze(x)
    assert abs(float(res.lra) - 10.0) < 1.0


def test_3342_case2_lra5():
    x = stereo(
        segments([sine(997.0, 20.0, RATE, -20.0), sine(997.0, 20.0, RATE, -15.0)])
    )
    res = _analyze(x)
    assert abs(float(res.lra) - 5.0) < 1.0


def test_3342_case3_lra20():
    x = stereo(
        segments([sine(997.0, 20.0, RATE, -40.0), sine(997.0, 20.0, RATE, -20.0)])
    )
    res = _analyze(x)
    assert abs(float(res.lra) - 20.0) < 1.0


# --- True peak (Tech 3341 cases 15+ style) ------------------------------------

def test_true_peak_997_minus6():
    x = stereo(sine(997.0, 3.0, RATE, -6.0))
    res = _analyze(x)
    dbtp = 20 * np.log10(np.asarray(res.true_peak))
    assert np.all(np.abs(dbtp + 6.0) < 0.1)


def test_true_peak_intersample():
    """fs/4 sine sampled at 45 deg: sample peak = A/sqrt(2), true peak = A."""
    a = 10 ** (-6.0 / 20.0)
    x = stereo(sine(RATE / 4.0, 2.0, RATE, -6.0, phase=np.pi / 4))
    res = _analyze(x)
    sp = float(np.asarray(res.sample_peak)[0])
    tp = float(np.asarray(res.true_peak)[0])
    assert abs(sp - a / np.sqrt(2)) < 0.01
    assert abs(tp - a) < 10 ** (-6.0 / 20.0) * 0.12  # within ~1 dB of A
    assert tp > sp + 0.05


def test_true_peak_192k_no_oversampling():
    x = stereo(sine(997.0, 1.0, 192000, -6.0))
    res = _analyze(x, 192000)
    assert abs(20 * np.log10(float(np.asarray(res.true_peak)[0])) + 6.0) < 0.1


# --- Cross-validation against the float64 reference chain ---------------------

def test_cross_validation_noise(rng):
    """Shaped noise with level steps: integrated, LRA, timelines and true
    peak all match the per-sample float64 chain within tight tolerances."""
    n = RATE * 12
    t = np.arange(n) / RATE
    env = 10 ** (np.where(t < 6.0, -18.0, -30.0) / 20.0)
    sig = rng.standard_normal(n) * 0.25 * env
    lp = np.convolve(sig, np.ones(8) / 8, mode="same")  # tame HF a bit
    x = np.stack([lp, 0.8 * lp]).astype(np.float32)

    ref = analyze_reference(x, RATE)
    res = _analyze(x)

    assert abs(float(res.integrated_lufs) - ref["integrated"]) < 0.02
    assert abs(float(res.lra) - ref["lra"]) < 0.05
    mom = np.asarray(res.momentary)[: int(res.n_momentary)]
    st = np.asarray(res.shortterm)[: int(res.n_shortterm)]
    assert mom.shape == ref["momentary"].shape
    assert st.shape == ref["shortterm"].shape
    assert np.abs(mom - ref["momentary"]).max() < 0.02
    assert np.abs(st - ref["shortterm"]).max() < 0.02
    assert np.abs(np.asarray(res.true_peak) - ref["true_peak"]).max() < 1e-3


def test_silence():
    x = np.zeros((2, RATE * 5), np.float32)
    res = _analyze(x)
    assert float(res.integrated_lufs) == -np.inf
    assert float(res.lra) == 0.0
    assert float(np.asarray(res.true_peak).max()) == 0.0


def test_3341_case5_averaging():
    """997 Hz: 20 s @ -26 | 20.1 s @ -20 | 20 s @ -26 -> I = -23.0 +/- 0.1
    (all blocks pass both gates; power-average lands at -23)."""
    x = stereo(
        segments([
            sine(997.0, 20.0, RATE, -26.0),
            sine(997.0, 20.1, RATE, -20.0),
            sine(997.0, 20.0, RATE, -26.0),
        ])
    )
    res = _analyze(x)
    assert abs(float(res.integrated_lufs) + 23.0) < 0.1


# --- EBU Tech 3341: momentary / short-term burst maxima ----------------------
#
# The M/S minimum-requirement cases use isolated tone bursts: the maximum
# reading of the meter over the burst must equal the burst's loudness.
# With the zero-initialized window ring (libebur128 semantics, pinned in
# test_meter_extra.py), the max is reached exactly when the window covers
# the whole burst.

def _meter_max(x, rate, query, hop_s):
    import jax

    from soundscope_tpu.core.state import init_meter_state
    from soundscope_tpu.models import meter as M

    cfg = MeterConfig(channels=x.shape[0], rate=rate, max_blocks=0)
    step = jax.jit(M.meter_step(cfg))
    q = jax.jit(lambda s: getattr(M, query)(cfg, s))
    state = init_meter_state(cfg)
    hop = int(hop_s * rate)
    best = -np.inf
    for lo in range(0, x.shape[1] - hop + 1, hop):
        state = step(state, x[:, lo: lo + hop])
        v = float(q(state))
        if np.isfinite(v):
            best = max(best, v)
    return best


def test_3341_shortterm_burst_max():
    """2 s silence | 3 s 997 Hz -23 LUFS | 2 s silence: max S = -23 +/- 0.1."""
    x = stereo(segments([
        np.zeros(2 * RATE, np.float32),
        sine(997.0, 3.0, RATE, -23.0),
        np.zeros(2 * RATE, np.float32),
    ]))
    best = _meter_max(np.asarray(x, np.float32), RATE, "shortterm_lufs", 0.1)
    assert abs(best + 23.0) < 0.1


def test_3341_momentary_burst_max():
    """1 s silence | 0.4 s 997 Hz -23 LUFS | 1 s silence: max M = -23 +/- 0.1."""
    x = stereo(segments([
        np.zeros(RATE, np.float32),
        sine(997.0, 0.4, RATE, -23.0),
        np.zeros(RATE, np.float32),
    ]))
    best = _meter_max(np.asarray(x, np.float32), RATE, "momentary_lufs", 0.01)
    assert abs(best + 23.0) < 0.1


def test_shortterm_alternating_levels_max():
    """Alternating 1.5 s blocks at -20 / -30 LUFS (period 3 s): every full
    3 s window holds exactly half of each level, so S is pinned at the
    50/50 energy mix ~= -22.6 LUFS — a window-alignment stress case."""
    seg = [sine(997.0, 1.5, RATE, -20.0), sine(997.0, 1.5, RATE, -30.0)]
    x = stereo(segments(seg * 4))
    best = _meter_max(np.asarray(x, np.float32), RATE, "shortterm_lufs", 0.1)
    want = 10 * np.log10((10 ** (-20 / 10) + 10 ** (-30 / 10)) / 2)
    assert abs(best - want) < 0.15


def test_rows_layout_matches_3d():
    """analyze() accepts rows-layout (b*ch, N) input (the relayout-free
    fast path the bench and batch uploads use) and must agree exactly
    with the (b, ch, N) form."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_batch_native

    cfg = MeterConfig(channels=2, rate=48000, max_blocks=0)
    an = jax.jit(analyze_batch_native(cfg))
    rng = np.random.default_rng(5)
    x = (0.2 * rng.standard_normal((3, 2, 48000))).astype(np.float32)
    nv = jnp.full((3,), 48000, jnp.int32)
    r3 = an(jnp.asarray(x), nv)
    r2 = an(jnp.asarray(x.reshape(6, -1)), nv)
    for a, b in zip(jax.tree_util.tree_leaves(r3),
                    jax.tree_util.tree_leaves(r2)):
        assert a.shape == b.shape
        if a.size:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
