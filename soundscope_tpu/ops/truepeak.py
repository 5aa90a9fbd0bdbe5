"""True-peak measurement (ITU-R BS.1770-4 Annex 2).

The signal is oversampled with a 49-tap Hann-windowed-sinc polyphase FIR
(factor 4 below 96 kHz, 2 below 192 kHz, none above — the same rate law as
the reference's ebur128 backend, consumed at src/analyzer.rs:159-164) and
the true peak is the maximum absolute interpolated value. The reference
reports it as a LINEAR amplitude (tests assert 0..=1, src/analyzer.rs:379-384).

TPU-native: the polyphase filter is one `conv_general_dilated` with F
output channels (phases) — an MXU-friendly small convolution, batched over
channels/tracks — rather than a per-sample loop. Streaming exactness is
kept by carrying the last taps-1 raw samples as state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core import constants as C

_PREC = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _polyphase_taps(factor: int, taps: int = C.TRUE_PEAK_TAPS):
    """(factor, phase_len) float32 polyphase decomposition of the
    Hann-windowed sinc with cutoff at the input Nyquist."""
    j = np.arange(taps, dtype=np.float64)
    m = j - (taps - 1) / 2.0
    c = np.ones(taps)
    nz = np.abs(m) > 1e-6
    arg = m[nz] * np.pi / factor
    c[nz] = np.sin(arg) / arg
    c *= 0.5 * (1.0 - np.cos(2.0 * np.pi * j / (taps - 1)))
    phase_len = -(-taps // factor)
    h = np.zeros((factor, phase_len))
    for jj in range(taps):
        h[jj % factor, jj // factor] = c[jj]
    return h.astype(np.float32)


def sample_peak(x: jnp.ndarray) -> jnp.ndarray:
    """Max |x| along the last axis."""
    return jnp.max(jnp.abs(x), axis=-1)


def polyphase_outputs(g: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Oversampled outputs of the BS.1770 interpolator over g (..., M).

    g must include taps-per-phase - 1 samples of left context; returns
    (..., factor, M - (K-1)) where K is the per-phase tap count. The ONE
    conv definition shared by the streaming, masked and sharded paths.
    """
    h = jnp.asarray(_polyphase_taps(factor))      # (F, K)
    k = h.shape[1]
    batch = g.shape[:-1]
    lhs = g.reshape(int(np.prod(batch) or 1), 1, g.shape[-1])
    # conv output m: sum_t rev_h[p, t] * g[m + t]  == y_p[n], m = n.
    rhs = h[:, ::-1][:, None, :]                  # (F, 1, K)
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), precision=_PREC,
    )                                             # (b, F, M-K+1)
    return y.reshape(*batch, factor, g.shape[-1] - k + 1)


def oversampled_abs_peak(x: jnp.ndarray, tail: jnp.ndarray, factor: int):
    """Max absolute interpolated value for chunk x given carried tail.

    x: (..., N) raw samples; tail: (..., taps-1) the samples preceding x.
    Returns (peak (...,), new_tail (..., taps-1)).
    """
    taps = C.TRUE_PEAK_TAPS
    if factor == 1:
        peak = sample_peak(x)
    else:
        k = _polyphase_taps(factor).shape[1]
        g = jnp.concatenate([tail[..., -(k - 1):], x], axis=-1)
        y = polyphase_outputs(g, factor)
        peak = jnp.max(jnp.abs(y), axis=(-2, -1))
        peak = jnp.maximum(peak, sample_peak(x))
    new_tail = jnp.concatenate([tail, x], axis=-1)[..., -(taps - 1):]
    return peak, new_tail


def true_peak_kernel(x: jnp.ndarray, rate: int) -> jnp.ndarray:
    """One-shot true peak of (..., N) at `rate` (zero history)."""
    tail = jnp.zeros((*x.shape[:-1], C.TRUE_PEAK_TAPS - 1), x.dtype)
    peak, _ = oversampled_abs_peak(x, tail, C.true_peak_factor(rate))
    return peak


def true_peak_masked(x: jnp.ndarray, n_valid, rate: int):
    """(true_peak, sample_peak) over the first n_valid samples of (..., N).

    Interpolator outputs at positions >= n_valid are masked so padding can
    never ring above the real signal (a meter that stops at the last real
    sample never evaluates them).
    """
    n = x.shape[-1]
    valid = jnp.arange(n) < n_valid
    x = jnp.where(valid, x, 0.0)
    sp = sample_peak(x)
    factor = C.true_peak_factor(rate)
    if factor == 1:
        return sp, sp
    k = _polyphase_taps(factor).shape[1]
    tail = jnp.zeros((*x.shape[:-1], k - 1), x.dtype)
    g = jnp.concatenate([tail, x], axis=-1)
    y = polyphase_outputs(g, factor)
    y = jnp.where(valid[..., None, :], y, 0.0)
    tp = jnp.max(jnp.abs(y), axis=(-2, -1))
    return jnp.maximum(tp, sp), sp
