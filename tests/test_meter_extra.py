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
