"""BASELINE benchmark configs #3 and #4 at test scale.

Config 3: streaming mic simulation — chunked push API with 2048-point
Hann mid/side spectra at a 60 Hz hop cadence.
Config 4: library scan — many tracks vmapped in one program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import init_meter_state
from soundscope_tpu.models import meter as M
from soundscope_tpu.models.engine import analyze_batch_fn
from soundscope_tpu.ops.spectrum import spectrum_points
from soundscope_tpu.utils.synth import sine, stereo


def test_config3_streaming_mic_simulation():
    rate = 48000
    hop = rate // 60  # 60 Hz query cadence
    cfg = MeterConfig(channels=2, rate=rate, max_blocks=0)
    step = jax.jit(M.meter_step(cfg))
    state = init_meter_state(cfg)

    x = stereo(sine(1000.0, 1.0, rate, -20.0))
    mid = (x[0] + x[1]) * 0.5
    n_queries = 0
    for lo in range(0, x.shape[1] - hop, hop):
        state = step(state, jnp.asarray(x[:, lo: lo + hop]))
        if lo >= 2048:
            xs, vals = spectrum_points(jnp.asarray(mid[lo - 2048: lo]), rate)
            n_queries += 1
    assert n_queries > 50  # ~60 Hz worth of queries over 1 s
    # spectrum peak at 1 kHz
    peak_x = float(xs[int(np.argmax(np.asarray(vals)))])
    expect = (np.log10(1000) - np.log10(20)) / (np.log10(20000) - np.log10(20)) * 100
    assert abs(peak_x - expect) < 2.0
    # meter converged near -20 LUFS (1 kHz K-gain ~ +0.6 dB -> ~ -19.4+3)
    st = float(M.momentary_lufs(cfg, state))
    assert -21.0 < st < -16.0


def test_config4_library_scan_vmap(rng):
    """Many tracks, one compiled program (tiny lengths for CPU CI)."""
    rate = 16000
    b, n = 64, rate * 2
    cfg = MeterConfig(channels=2, rate=rate, max_blocks=0)
    levels = -40.0 + 20.0 * rng.random(b)
    x = np.zeros((b, 2, n), np.float32)
    for i in range(b):
        x[i] = stereo(sine(997.0, 2.0, rate, levels[i]))[:, :n]
    fn = jax.jit(analyze_batch_fn(cfg))
    res = fn(jnp.asarray(x), jnp.full((b,), n, np.int32))
    integ = np.asarray(res.integrated_lufs)
    assert np.abs(integ - levels).max() < 0.1
    tp = np.asarray(res.true_peak).max(-1)
    assert np.abs(20 * np.log10(tp) - levels).max() < 0.1
