"""K-weighting design + blocked state-space filter correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

from soundscope_tpu.ops.biquad import block_iir, iir_reference, make_block_filter
from soundscope_tpu.ops.kweight import (
    channel_weights,
    kweight_cascade_ss,
    kweight_response_db,
)
from tests.reference_impl import k_filter, k_filter_slow


def test_response_pins_48k():
    """The discretised cascade must reproduce the standard's response:
    +0.691 dB at 997 Hz (exactly compensated by the loudness offset),
    ~+4 dB shelf at HF, steep low-frequency rolloff."""
    db = kweight_response_db(48000, np.array([997.0, 10000.0, 20.0]))
    assert abs(db[0] - 0.691) < 0.01
    assert abs(db[1] - 4.0) < 0.35
    assert db[2] < -10.0


@pytest.mark.parametrize("rate", [44100, 48000, 96000, 192000])
def test_response_rate_invariance(rate):
    """Bilinear re-discretisation keeps the 997 Hz calibration point at all
    supported rates (this is what makes -23 dBFS sines read -23 LUFS)."""
    db = kweight_response_db(rate, np.array([997.0]))
    # Bilinear frequency warping moves the point by ~0.03 dB at 192 kHz —
    # inherent to the design method (libebur128 behaves identically).
    assert abs(db[0] - 0.691) < 0.05


@pytest.mark.parametrize("n", [1, 100, 128, 513, 4096])
def test_block_iir_matches_per_sample(n, rng):
    from soundscope_tpu.ops.biquad import modal_form

    ss = kweight_cascade_ss(48000)
    bf = make_block_filter(ss, block=128)
    x = rng.standard_normal(n).astype(np.float32)
    y_ref, _ = iir_reference(ss, x)
    y, s = block_iir(bf, jnp.asarray(x), jnp.zeros(4))
    assert np.abs(np.asarray(y) - y_ref).max() < 2e-4
    # carried state lives in the modal basis
    _, s_modal = iir_reference(modal_form(ss), x)
    assert np.abs(np.asarray(s) - s_modal).max() < 2e-4


def test_block_iir_nonzero_state(rng):
    """block_iir states live in the modal basis — compare against the
    per-sample recurrence of the SAME (modal) realization."""
    from soundscope_tpu.ops.biquad import modal_form

    ss = modal_form(kweight_cascade_ss(44100))
    bf = make_block_filter(kweight_cascade_ss(44100), block=128)
    x = rng.standard_normal(777).astype(np.float32)
    s0 = (rng.standard_normal(4) * 5).astype(np.float32)
    y_ref, s_ref = iir_reference(ss, x, s0)
    y, s = block_iir(bf, jnp.asarray(x), jnp.asarray(s0))
    assert np.abs(np.asarray(y) - y_ref).max() < 2e-3
    assert np.abs(np.asarray(s) - s_ref).max() < 2e-3


def test_block_iir_chunked_continuity(rng):
    """Filtering in chunks with carried state == filtering in one shot."""
    ss = kweight_cascade_ss(48000)
    bf = make_block_filter(ss, block=128)
    x = rng.standard_normal(5000).astype(np.float32)
    y_full, _ = block_iir(bf, jnp.asarray(x), jnp.zeros(4))
    s = jnp.zeros(4)
    outs = []
    for lo, hi in [(0, 1234), (1234, 1300), (1300, 4096), (4096, 5000)]:
        y, s = block_iir(bf, jnp.asarray(x[lo:hi]), s)
        outs.append(np.asarray(y))
    y_chunks = np.concatenate(outs)
    assert np.abs(y_chunks - np.asarray(y_full)).max() < 1e-4


def test_fast_reference_filter_matches_slow(rng):
    x = rng.standard_normal((2, 3000))
    y_fast = k_filter(x, 48000)
    y_slow = k_filter_slow(x, 48000)
    assert np.abs(y_fast - y_slow).max() < 1e-9


def test_channel_weights():
    assert np.allclose(channel_weights(1), [1.0])
    assert np.allclose(channel_weights(2), [1.0, 1.0])
    assert np.allclose(channel_weights(4), [1.0, 1.0, 1.41, 1.41])
    assert np.allclose(channel_weights(5), [1.0, 1.0, 1.0, 1.41, 1.41])
    assert np.allclose(channel_weights(6), [1.0, 1.0, 1.0, 0.0, 1.41, 1.41])
