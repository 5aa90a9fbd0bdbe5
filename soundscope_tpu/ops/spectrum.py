"""Display spectrum pipeline.

Pins the reference's exact math (src/analyzer.rs:11-104):

1. Hann window.
2. Real FFT magnitude, bins limited to [20 Hz, 20 kHz].
3. dBFS scaling: val == 0 -> -150 dB, else 20*log10(val * 4 / N)
   (the `val*4/N` calibration makes a 0 dBFS sine read ~0 dB under a Hann
   window whose coherent gain is N/2 — src/analyzer.rs:11-27).
4. Pink-noise compensation: +10*log10(f / 1000) dB (+3 dB/octave, 0 dB at
   1 kHz — src/analyzer.rs:67-85).
5. Log-frequency chart mapping:
   x = (log10(f) - log10(20)) / (log10(20000) - log10(20)) * 100
   (src/analyzer.rs:87-104).

All steps are batched device math; bin selection is static per (N, rate).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core import constants as C
from soundscope_tpu.ops.fft import rfft_mag


@functools.lru_cache(maxsize=None)
def _hann_np(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def hann_window(n: int) -> jnp.ndarray:
    # NOTE: caches numpy, converts per call — caching jnp arrays would leak
    # tracers when first materialised inside a jit trace.
    return jnp.asarray(_hann_np(n))


@functools.lru_cache(maxsize=None)
def _bin_plan(n: int, rate: int, fmin: float, fmax: float):
    freqs = np.arange(n // 2 + 1, dtype=np.float64) * rate / n
    keep = (freqs >= fmin) & (freqs <= fmax)
    lo = int(np.argmax(keep))
    hi = lo + int(np.count_nonzero(keep))
    f = freqs[lo:hi]
    pink = C.PINK_SLOPE_DB_PER_DECADE * np.log10(f / C.PINK_REF_FREQ_HZ)
    xmap = (
        (np.log10(f) - math.log10(fmin))
        / (math.log10(fmax) - math.log10(fmin))
        * C.SPECTRUM_CHART_WIDTH
    )
    return lo, hi, f.astype(np.float32), pink.astype(np.float32), np.asarray(xmap)


def spectrum_points(
    samples: jnp.ndarray,
    rate: int,
    fmin: float = C.SPECTRUM_FMIN_HZ,
    fmax: float = C.SPECTRUM_FMAX_HZ,
    fft_impl: str = "xla",
    gain_db: jnp.ndarray | float = 0.0,
):
    """Full display-spectrum pipeline on (..., N) windows.

    Returns (chart_x: np.ndarray (K,), values_db: jnp.ndarray (..., K)).
    `gain_db` is the loudness-matched FFT gain compensation the app layer
    adds to every displayed point (reference: src/tui.rs:49,801-821).
    """
    n = samples.shape[-1]
    lo, hi, _, pink_np, xmap = _bin_plan(n, rate, fmin, fmax)
    pink = jnp.asarray(pink_np)
    xw = samples * hann_window(n)
    mag = rfft_mag(xw, impl=fft_impl)[..., lo:hi]
    scaled = jnp.where(
        mag == 0.0,
        jnp.float32(C.SPECTRUM_FLOOR_DB),
        20.0 * jnp.log10(jnp.maximum(mag, 1e-37) * (4.0 / n)),
    )
    vals = scaled + pink + gain_db
    return xmap, vals
