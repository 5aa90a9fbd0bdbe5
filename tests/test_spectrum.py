"""Display-spectrum pipeline: pins the reference's numeric contracts
(reference unit tests at src/analyzer.rs:189-322)."""

import jax.numpy as jnp
import numpy as np
import pytest

from soundscope_tpu.ops.fft import rfft_mag
from soundscope_tpu.ops.spectrum import spectrum_points
from soundscope_tpu.utils.synth import sine

RATE = 44100
N = 16384


def _max_db(vals):
    return float(jnp.max(vals))


def test_fft_smoke_440hz():
    """440 Hz (off-bin) sine produces a non-empty spectrum."""
    samples = sine(440.0, N / RATE, RATE)
    xs, vals = spectrum_points(jnp.asarray(samples[:N]), RATE)
    assert xs.shape[0] > 0
    assert np.isfinite(_max_db(vals))


@pytest.mark.parametrize("impl", ["xla", "matmul"])
def test_dbfs_calibration(impl):
    """0 dBFS sine snapped to a bin near 1 kHz reads 0 +/- 1 dB
    (pins the val*4/N scaler, src/analyzer.rs:11-27)."""
    res = RATE / N
    freq = round(1000.0 / res) * res
    samples = sine(freq, N / RATE, RATE)[:N]
    _, vals = spectrum_points(jnp.asarray(samples), RATE, fft_impl=impl)
    assert -1.0 <= _max_db(vals) <= 1.0


def test_pink_noise_compensation():
    """125 Hz reads ~9 dB below 1 kHz (3 octaves x 3 dB/octave,
    src/analyzer.rs:67-85; reference tolerance [-10.5, -8.0])."""
    res = RATE / N
    f1k = round(1000.0 / res) * res
    f125 = round(125.0 / res) * res
    _, v1k = spectrum_points(jnp.asarray(sine(f1k, N / RATE, RATE)[:N]), RATE)
    _, v125 = spectrum_points(jnp.asarray(sine(f125, N / RATE, RATE)[:N]), RATE)
    diff = _max_db(v125) - _max_db(v1k)
    assert -10.5 <= diff <= -8.0


def test_log_frequency_mapping():
    """Chart x spans [0, 100] with 632.46 Hz at the midpoint
    (the reference's center label, src/tui.rs:795-799)."""
    samples = sine(440.0, N / RATE, RATE)[:N]
    xs, _ = spectrum_points(jnp.asarray(samples), RATE)
    assert xs[0] >= 0.0 and xs[-1] <= 100.0
    freqs = np.arange(N // 2 + 1) * RATE / N
    keep = (freqs >= 20.0) & (freqs <= 20000.0)
    f_mid = 10 ** ((np.log10(20) + np.log10(20000)) / 2)
    assert abs(f_mid - 632.455) < 0.01
    i_mid = np.argmin(np.abs(freqs[keep] - f_mid))
    assert abs(xs[i_mid] - 50.0) < 0.5


def test_zero_signal_floor():
    """All-zero window maps to the -150 dB floor, not -inf."""
    _, vals = spectrum_points(jnp.zeros(N), RATE)
    v = np.asarray(vals)
    assert np.isfinite(v).all()
    # floor + pink compensation stays way below any real signal
    assert v.max() < -100.0


def test_matmul_fft_matches_numpy(rng):
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    got = np.asarray(rfft_mag(jnp.asarray(x), impl="matmul"))
    ref = np.abs(np.fft.rfft(x.astype(np.float64), axis=-1))
    assert np.abs(got - ref).max() < 2e-3
    rel = np.abs(got - ref) / np.maximum(ref, 1e-2)
    assert rel.max() < 1e-3


def test_gain_compensation_applied():
    samples = jnp.asarray(sine(1000.0, N / RATE, RATE)[:N])
    _, v0 = spectrum_points(samples, RATE, gain_db=0.0)
    _, v6 = spectrum_points(samples, RATE, gain_db=6.0)
    assert np.allclose(np.asarray(v6) - np.asarray(v0), 6.0, atol=1e-4)
