"""Min-max waveform decimation.

Pins the reference's bucket math exactly (src/analyzer.rs:107-137):
`window_secs * 1000` buckets; bucket i covers samples
[floor(i*spp), min(ceil((i+1)*spp), len)) with spp = len / buckets —
fractional boundaries, so adjacent buckets may share one sample. Empty
buckets yield (0.0, 0.0) (the reference's `unwrap_or(0.0)`); buckets whose
start >= len are truncated (we return a validity count instead of a
shorter list, keeping shapes static for jit/vmap).

TPU-native design: all bucket boundaries are trace-time Python ints
(shapes are static under jit), so the decimation becomes one gather into a
(buckets, max_width) matrix plus masked row min/max — no scatter, no
sequential loop, batchable with vmap.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bucket_plan(n: int, buckets: int):
    spp = n / buckets
    starts = np.minimum((np.arange(buckets) * spp).astype(np.int64), n)
    ends = np.minimum(np.ceil((np.arange(1, buckets + 1) * spp)).astype(np.int64), n)
    ends = np.maximum(ends, starts)
    valid = int(np.count_nonzero(starts < n))
    width = int(max(1, (ends - starts).max()))
    idx = starts[:, None] + np.arange(width)[None, :]
    mask = idx < ends[:, None]
    idx = np.clip(idx, 0, max(n - 1, 0))
    return idx.astype(np.int32), mask, valid


def minmax_decimate(samples: jnp.ndarray, window_secs: float):
    """Decimate (..., n) samples into `window_secs*1000` min/max buckets.

    Returns (mins (..., W), maxs (..., W), valid_buckets: int). The first
    `valid_buckets` entries correspond to the reference's emitted points
    (x = bucket index, then (x, min), (x, max) pairs).
    """
    n = samples.shape[-1]
    buckets = int(window_secs * 1000.0)
    if buckets <= 0 or n == 0:
        z = jnp.zeros((*samples.shape[:-1], max(buckets, 0)), samples.dtype)
        return z, z, 0
    idx_np, mask_np, valid = _bucket_plan(n, buckets)
    idx, mask = jnp.asarray(idx_np), jnp.asarray(mask_np)
    g = samples[..., idx]  # (..., W, width)
    mins = jnp.min(jnp.where(mask, g, jnp.inf), axis=-1)
    maxs = jnp.max(jnp.where(mask, g, -jnp.inf), axis=-1)
    any_valid = jnp.any(mask, axis=-1)
    mins = jnp.where(any_valid, mins, 0.0)
    maxs = jnp.where(any_valid, maxs, 0.0)
    return mins, maxs, valid


def waveform_points(samples, window_secs: float) -> np.ndarray:
    """Host convenience: (2*valid, 2) array of (x, y) points in the
    reference's emission order [(x, min), (x, max), ...]."""
    mins, maxs, valid = minmax_decimate(samples, window_secs)
    mins = np.asarray(mins)[..., :valid]
    maxs = np.asarray(maxs)[..., :valid]
    xs = np.arange(valid, dtype=np.float64)
    pts = np.empty((2 * valid, 2))
    pts[0::2, 0] = xs
    pts[1::2, 0] = xs
    pts[0::2, 1] = mins
    pts[1::2, 1] = maxs
    return pts
