"""Throughput STFT paths: XLA fused (ops/stft.py) and the Pallas kernel
(interpret mode) against the exact per-window spectrum pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from soundscope_tpu.ops.fft import fft_pack2
from soundscope_tpu.ops.pallas_stft import stft_pooled_pallas
from soundscope_tpu.ops.spectrum import spectrum_points
from soundscope_tpu.ops.stft import (
    _pooled_gain_plan,
    frame_signal,
    stft_midside_display,
)

RATE = 48000


def test_frame_signal_layout(rng):
    x = jnp.asarray(np.arange(2048 * 12, dtype=np.float32))
    frames = frame_signal(x, 16384, 2048)
    assert frames.shape == (5, 16384)
    # window w starts at sample w*2048
    assert float(frames[2, 0]) == 2 * 2048
    assert float(frames[2, -1]) == 2 * 2048 + 16383


def test_fft_pack2_recovers_both_spectra(rng):
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)
    ar, ai, br, bi = fft_pack2(jnp.asarray(a), jnp.asarray(b))
    fa = np.fft.fft(a.astype(np.float64))
    fb = np.fft.fft(b.astype(np.float64))
    assert np.abs(np.asarray(ar) - fa.real).max() < 2e-2
    assert np.abs(np.asarray(bi) - fb.imag).max() < 2e-2
    rel = np.abs(np.asarray(ar) + 1j * np.asarray(ai) - fa) / (np.abs(fa) + 1.0)
    assert rel.max() < 1e-3


def test_stft_matches_per_window_pipeline(rng):
    """Band max of the fused path == band max of the exact per-window
    spectrum (same gains, same pooling)."""
    n = 2048 * 24
    l = (rng.standard_normal(n) * 0.3).astype(np.float32)
    r = (rng.standard_normal(n) * 0.3).astype(np.float32)
    xs, mid_db, side_db = stft_midside_display(jnp.asarray(l), jnp.asarray(r), RATE)

    wins_l = np.asarray(frame_signal(jnp.asarray(l), 16384, 2048))
    wins_r = np.asarray(frame_signal(jnp.asarray(r), 16384, 2048))
    mid = (wins_l + wins_r) / 2
    _, vals = spectrum_points(jnp.asarray(mid), RATE)
    gain, per, centers = _pooled_gain_plan(16384, RATE, 128)
    # reconstruct band max from the exact unpooled display values
    lo = int(np.argmax(gain > 0))
    vals = np.asarray(vals)
    full = np.full((vals.shape[0], 16384), -np.inf)
    full[:, lo: lo + vals.shape[1]] = vals
    ref = np.maximum(full.reshape(-1, 128, 128).max(-1), -150.0)
    got = np.asarray(mid_db)
    assert np.abs(got - ref).max() < 1e-3


def test_pallas_stft_matches_xla(rng):
    n = 2048 * 40
    l = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    r = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    mid_pl, side_pl = stft_pooled_pallas(
        jnp.asarray(l), jnp.asarray(r), RATE, interpret=True
    )
    _, mid_ref, side_ref = stft_midside_display(jnp.asarray(l), jnp.asarray(r), RATE)
    nw = mid_pl.shape[1]
    assert np.abs(np.asarray(mid_pl) - np.asarray(mid_ref[:, :nw])).max() < 1e-3
    assert np.abs(np.asarray(side_pl) - np.asarray(side_ref[:, :nw])).max() < 1e-3


def test_bf16_display_accuracy(rng):
    n = 2048 * 24
    l = (rng.standard_normal(n) * 0.3).astype(np.float32)
    r = (rng.standard_normal(n) * 0.3).astype(np.float32)
    _, m32, _ = stft_midside_display(jnp.asarray(l), jnp.asarray(r), RATE)
    _, m16, _ = stft_midside_display(
        jnp.asarray(l), jnp.asarray(r), RATE, dtype=jnp.bfloat16
    )
    d = np.abs(np.asarray(m32) - np.asarray(m16))
    d = d[np.asarray(m32) > -140]  # ignore floor bands
    assert d.max() < 0.1  # dB — invisible at display resolution


@pytest.mark.parametrize("rate", [44100, 96000])
def test_pallas_stft_other_rates(rng, rate):
    """Gain plan (display range, pink comp) adapts per rate; the Pallas
    and XLA paths must agree at every supported rate."""
    n = 2048 * 24
    l = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)
    r = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)
    mid_pl, _ = stft_pooled_pallas(jnp.asarray(l), jnp.asarray(r), rate, interpret=True)
    _, mid_ref, _ = stft_midside_display(jnp.asarray(l), jnp.asarray(r), rate)
    nw = mid_pl.shape[1]
    assert np.abs(np.asarray(mid_pl) - np.asarray(mid_ref[:, :nw])).max() < 1e-3
