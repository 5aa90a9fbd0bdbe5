"""Streaming meter: chunked pushes must agree with the offline pass and
with the float64 reference, regardless of chunk boundaries."""

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import init_meter_state
from soundscope_tpu.models import meter as M
from soundscope_tpu.models.engine import analyze_array
from soundscope_tpu.utils.synth import segments, sine, stereo
from tests.reference_impl import analyze_reference

RATE = 48000


def _push_chunks(cfg, planar, sizes):
    state = init_meter_state(cfg)
    steps = {}
    pos = 0
    i = 0
    n = planar.shape[-1]
    while pos < n:
        size = sizes[i % len(sizes)]
        size = min(size, n - pos)
        if size not in steps:
            steps[size] = jax.jit(M.meter_step(cfg))
        state = steps[size](state, jnp.asarray(planar[:, pos: pos + size]))
        pos += size
        i += 1
    return state


def test_streaming_matches_offline_exact_mode(rng):
    x = stereo(
        segments([sine(997.0, 4.0, RATE, -20.0), sine(997.0, 4.0, RATE, -30.0)])
    )
    x += rng.standard_normal(x.shape).astype(np.float32) * 1e-4
    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=2000)
    state = _push_chunks(cfg, x, [16384, 1000, 333, 4800])

    ref = analyze_reference(x, RATE)
    integ = float(M.integrated_lufs(cfg, state))
    assert abs(integ - ref["integrated"]) < 0.02

    st = float(M.shortterm_lufs(cfg, state))
    assert abs(st - ref["shortterm"][-1]) < 0.05  # window ends mid-sub-block

    tp = np.asarray(M.true_peak_linear(state))
    assert np.abs(tp - ref["true_peak"]).max() < 1e-3

    lra = float(M.loudness_range_lu(cfg, state))
    assert abs(lra - ref["lra"]) < 0.1


def test_chunk_boundaries_do_not_matter(rng):
    x = (rng.standard_normal((2, RATE * 3)) * 0.1).astype(np.float32)
    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=1000)
    s1 = _push_chunks(cfg, x, [RATE * 3])
    s2 = _push_chunks(cfg, x, [7, 16384, 101, 4800, 12345])
    for q in (M.integrated_lufs, M.shortterm_lufs, M.momentary_lufs):
        assert abs(float(q(cfg, s1)) - float(q(cfg, s2))) < 1e-3
    assert np.allclose(
        np.asarray(s1.true_peak), np.asarray(s2.true_peak), atol=1e-6
    )
    assert int(s1.subblocks_done) == int(s2.subblocks_done)
    assert int(s1.block_count) == int(s2.block_count)
    assert int(s1.lra_count) == int(s2.lra_count)


def test_histogram_mode_matches_exact(rng):
    x = stereo(
        segments([sine(997.0, 5.0, RATE, -18.0), sine(997.0, 5.0, RATE, -28.0)])
    )
    exact_cfg = MeterConfig(channels=2, rate=RATE, max_blocks=2000)
    hist_cfg = MeterConfig(channels=2, rate=RATE, max_blocks=0)
    se = _push_chunks(exact_cfg, x, [16384])
    sh = _push_chunks(hist_cfg, x, [16384])
    ie = float(M.integrated_lufs(exact_cfg, se))
    ih = float(M.integrated_lufs(hist_cfg, sh))
    assert abs(ie - ih) < 0.05  # histogram bin quantisation
    le = float(M.loudness_range_lu(exact_cfg, se))
    lh = float(M.loudness_range_lu(hist_cfg, sh))
    assert abs(le - lh) < 0.2


def test_streaming_vs_offline_engine(rng):
    x = (rng.standard_normal((2, RATE * 5)) * 0.05).astype(np.float32)
    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=1000)
    state = _push_chunks(cfg, x, [4800])
    res = analyze_array(x, cfg)
    assert abs(float(M.integrated_lufs(cfg, state)) - float(res.integrated_lufs)) < 1e-3
    assert np.allclose(
        np.asarray(state.true_peak), np.asarray(res.true_peak), atol=1e-6
    )


def test_momentary_shortterm_window_end_alignment():
    """M/S windows end at the last pushed sample (like the reference's raw
    audio ring), verified by a level step mid-sub-block."""
    cfg = MeterConfig(channels=1, rate=RATE, max_blocks=100)
    loud = sine(997.0, 3.5, RATE, -10.0)[None, :]
    state = _push_chunks(cfg, loud, [1111])
    m1 = float(M.momentary_lufs(cfg, state))
    # push 200 ms of silence: momentary (400 ms window) must drop ~3 dB
    step = jax.jit(M.meter_step(cfg))
    state2 = step(state, jnp.zeros((1, RATE // 5), jnp.float32))
    m2 = float(M.momentary_lufs(cfg, state2))
    assert 2.0 < (m1 - m2) < 4.0


def test_zero_state_queries():
    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=100)
    s = init_meter_state(cfg)
    assert float(M.integrated_lufs(cfg, s)) == -np.inf
    assert float(M.shortterm_lufs(cfg, s)) == -np.inf
    assert float(M.loudness_range_lu(cfg, s)) == 0.0
    assert float(np.asarray(M.true_peak_linear(s)).max()) == 0.0


def test_single_huge_push_is_slabbed(rng):
    """A 60 s push through the Analyzer facade must neither build a
    60 s-unrolled program (meter_step unrolls n//h+1 sub-block steps)
    nor change the result: the facade slabs internally at <= 1 s."""
    from soundscope_tpu.models.analyzer import Analyzer

    secs = 60
    x = (rng.standard_normal((2, RATE * secs)) * 0.05).astype(np.float32)
    interleaved = x.T.reshape(-1)

    a = Analyzer(channels=2, rate=RATE)
    a.add_samples(interleaved)

    cfg = a.config
    ref_state = _push_chunks(cfg, x, [RATE])
    assert abs(a.get_integrated_lufs()
               - float(M.integrated_lufs(cfg, ref_state))) < 1e-4
    assert abs(a.get_shortterm_lufs()
               - float(M.shortterm_lufs(cfg, ref_state))) < 1e-4
    # the largest program traced is the 1 s slab, not the full push
    assert int(a.state.frames_total) == RATE * secs
