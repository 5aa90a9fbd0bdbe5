"""Additional meter behavior: short-term settling after level steps,
exact-history overflow into histogram mode, long-stream stability."""

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import init_meter_state
from soundscope_tpu.models import meter as M
from soundscope_tpu.models.engine import analyze_array
from soundscope_tpu.utils.synth import segments, sine, stereo

RATE = 48000


def test_shortterm_settles_after_step():
    """ST (3 s window) must fully reflect a level step 3 s after it."""
    x = stereo(
        segments([sine(997.0, 5.0, RATE, -40.0), sine(997.0, 5.0, RATE, -20.0)])
    )
    res = analyze_array(x, MeterConfig(channels=2, rate=RATE, max_blocks=0))
    st = np.asarray(res.shortterm)[: int(res.n_shortterm)]
    # timeline index j = window ending at sub-block j+30 (t = (j+30)/10 s)
    t = (np.arange(len(st)) + 30) / 10.0
    assert abs(st[np.searchsorted(t, 4.9)] + 40.0) < 0.2
    assert abs(st[np.searchsorted(t, 8.2)] + 20.0) < 0.2
    # momentary settles within 400 ms
    mom = np.asarray(res.momentary)[: int(res.n_momentary)]
    tm = (np.arange(len(mom)) + 4) / 10.0
    assert abs(mom[np.searchsorted(tm, 5.5)] + 20.0) < 0.1


def test_exact_history_overflow_falls_back_to_histogram():
    """A meter whose exact gating history fills keeps metering correctly
    via the histogram (unbounded-duration contract)."""
    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=40)  # 4 s of blocks
    step = jax.jit(M.meter_step(cfg))
    state = init_meter_state(cfg)
    x = stereo(sine(997.0, 10.0, RATE, -23.0))  # 97 gating blocks > 40
    for lo in range(0, x.shape[1], RATE):
        state = step(state, jnp.asarray(x[:, lo: lo + RATE]))
    assert int(state.block_count) > cfg.max_blocks
    integ = float(M.integrated_lufs(cfg, state))
    assert abs(integ + 23.0) < 0.1  # histogram quantisation ≤ 0.04 LU
    lra = float(M.loudness_range_lu(cfg, state))
    assert lra < 0.5


def test_streaming_counter_sanity_long_run():
    """Sub-block bookkeeping stays consistent over many odd chunks."""
    cfg = MeterConfig(channels=1, rate=16000, max_blocks=0)
    step_sizes = [1601, 1599, 16000, 7, 4093]
    steps = {n: jax.jit(M.meter_step(cfg)) for n in set(step_sizes)}
    state = init_meter_state(cfg)
    total = 0
    rng = np.random.default_rng(7)
    for i in range(40):
        n = step_sizes[i % len(step_sizes)]
        state = steps[n](state, jnp.asarray(rng.standard_normal((1, n)) * 0.1,
                                            jnp.float32))
        total += n
    h = cfg.subblock
    assert int(state.subblocks_done) == total // h
    assert int(state.subblock_fill) == total % h
    assert int(state.frames_total) == total
    assert int(state.block_count) == total // h - 3


def test_early_window_semantics_match_libebur128():
    """Before the 400 ms / 3 s windows fill, libebur128 averages its
    zero-initialized audio ring over the FULL window (its query never
    checks frames-seen), diluting early readings. Pin that the streaming
    meter does the same, against the f64 reference chain."""
    from tests.reference_impl import k_filter, channel_weights

    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=0)
    step = jax.jit(M.meter_step(cfg))

    x = stereo(sine(997.0, 1.5, RATE, -23.0))  # 1.5 s into a 3 s window
    state = init_meter_state(cfg)
    state = step(state, jnp.asarray(x))

    w = channel_weights(2)
    y = k_filter(np.asarray(x, np.float64), RATE)
    z = (w[:, None] * y * y).sum(0)

    # short-term: mean over the zero-padded 3 s window
    e_st = z.sum() / (3 * RATE)
    want_st = -0.691 + 10 * np.log10(e_st)
    got_st = float(M.shortterm_lufs(cfg, state))
    assert abs(got_st - want_st) < 0.05
    # the diluted reading sits 10*log10(1.5/3) ≈ 3.01 LU below steady state
    steady = -0.691 + 10 * np.log10(z.mean())
    assert abs((steady - got_st) - 3.0103) < 0.05

    # momentary: 0.2 s pushed into the 400 ms window
    state2 = init_meter_state(cfg)
    x2 = x[:, : int(0.2 * RATE)]
    state2 = step(state2, jnp.asarray(x2))
    z2 = z[: int(0.2 * RATE)]
    want_m = -0.691 + 10 * np.log10(z2.sum() / int(0.4 * RATE))
    got_m = float(M.momentary_lufs(cfg, state2))
    assert abs(got_m - want_m) < 0.05
