"""BS.1770-4 / EBU R128 loudness math: block energies, gating, LRA.

Pure, batchable functions over the channel-weighted squared K-weighted
signal z[n] = sum_ch w_ch * y_ch[n]^2. Block energies are windowed means
of z; loudness is -0.691 + 10*log10(energy).

Gating (BS.1770-4 §4): 400 ms blocks at 100 ms hop; absolute gate at
-70 LUFS; relative gate 10 LU below the mean of absolutely-gated blocks;
integrated loudness is the mean energy of blocks passing both gates.

Loudness range (EBU Tech 3342): 3 s blocks at 1 s hop; absolute gate
-70 LUFS; relative gate 20 LU below; LRA = l(95th) - l(10th percentile).

Everything takes an optional validity mask so the same code serves static
fixed-capacity streaming histories and offline whole-file analysis.

Reference behavior consumed at: src/analyzer.rs:147-157 (shortterm /
integrated / range queries against the ebur128 meter).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core import constants as C

_ABS_GATE_ENERGY = float(10.0 ** ((C.ABSOLUTE_GATE_LUFS - C.LOUDNESS_OFFSET_DB) / 10.0))
NEG_INF = float("-inf")


def loudness_from_energy(e: jnp.ndarray) -> jnp.ndarray:
    """L = -0.691 + 10*log10(e), with e <= 0 mapping to -inf."""
    return jnp.where(
        e > 0.0,
        C.LOUDNESS_OFFSET_DB + 10.0 * jnp.log10(jnp.maximum(e, 1e-38)),
        NEG_INF,
    )


def energy_from_loudness(l: float) -> float:
    return float(10.0 ** ((l - C.LOUDNESS_OFFSET_DB) / 10.0))


def weighted_square(y: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(..., C, N) K-weighted samples -> z (..., N)."""
    w = weights.astype(y.dtype)
    return jnp.einsum("...cn,c->...n", y * y, w)


def subblock_sums(z: jnp.ndarray, h: int) -> jnp.ndarray:
    """Sum z over complete 100 ms sub-blocks: (..., N) -> (..., N // h)."""
    n = z.shape[-1]
    nb = n // h
    return z[..., : nb * h].reshape(*z.shape[:-1], nb, h).sum(axis=-1)


def _window_means(sums: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Mean energy over each trailing window of `w` sub-blocks.

    sums: (..., nb) -> (..., nb - w + 1); entry j is the energy of the
    block ending at sub-block j + w - 1.
    """
    if sums.shape[-1] < w:
        return sums[..., :0]
    c = jnp.cumsum(sums, axis=-1)
    lead = c[..., w - 1:]
    lag = jnp.concatenate(
        [jnp.zeros_like(c[..., :1]), c[..., : c.shape[-1] - w]], axis=-1
    )
    return (lead - lag) / (w * h)


def gating_energies(sums: jnp.ndarray, h: int) -> jnp.ndarray:
    """400 ms gating-block energies at 100 ms hop: (..., nb) -> (..., nb-3)."""
    return _window_means(sums, h, C.MOMENTARY_SUBBLOCKS)


def shortterm_energies(sums: jnp.ndarray, h: int) -> jnp.ndarray:
    """3 s short-term energies at 100 ms hop: (..., nb) -> (..., nb-29)."""
    return _window_means(sums, h, C.SHORTTERM_SUBBLOCKS)


def lra_energies(sums: jnp.ndarray, h: int) -> jnp.ndarray:
    """3 s energies at 1 s hop (the LRA block cadence): first block ends at
    sub-block 30, then every 10th."""
    st = shortterm_energies(sums, h)
    return st[..., :: C.LRA_HOP_SUBBLOCKS]


def gated_loudness(energies: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Integrated loudness (LUFS) of gating-block energies (..., n)."""
    e = energies
    m = jnp.ones(e.shape, bool) if mask is None else mask
    # '>=' on both gates matches libebur128 (and the histogram path, which
    # keeps l >= -70 by construction).
    m1 = m & (e >= _ABS_GATE_ENERGY)
    n1 = jnp.sum(m1, axis=-1)
    sum1 = jnp.sum(jnp.where(m1, e, 0.0), axis=-1)
    mean1 = sum1 / jnp.maximum(n1, 1)
    rel_gate = mean1 * 10.0 ** (C.RELATIVE_GATE_LU / 10.0)
    m2 = m1 & (e >= rel_gate[..., None])
    n2 = jnp.sum(m2, axis=-1)
    mean2 = jnp.sum(jnp.where(m2, e, 0.0), axis=-1) / jnp.maximum(n2, 1)
    return jnp.where((n1 > 0) & (n2 > 0), loudness_from_energy(mean2), NEG_INF)


def _masked_percentile_loudness(e, m2, n2, q: float):
    """Loudness at percentile q of the masked energies (libebur128 index
    convention: sorted[floor((n-1)*q + 0.5)])."""
    big = jnp.where(m2, e, jnp.inf)
    srt = jnp.sort(big, axis=-1)
    idx = jnp.floor((n2.astype(jnp.float32) - 1.0) * q + 0.5).astype(jnp.int32)
    idx = jnp.clip(idx, 0, e.shape[-1] - 1)
    val = jnp.take_along_axis(srt, idx[..., None], axis=-1)[..., 0]
    return loudness_from_energy(val)


def loudness_range(st_energies: jnp.ndarray, mask: jnp.ndarray | None = None):
    """EBU Tech 3342 loudness range (LU) from 3 s / 1 s-hop energies."""
    e = st_energies
    m = jnp.ones(e.shape, bool) if mask is None else mask
    m1 = m & (e >= _ABS_GATE_ENERGY)
    n1 = jnp.sum(m1, axis=-1)
    mean1 = jnp.sum(jnp.where(m1, e, 0.0), axis=-1) / jnp.maximum(n1, 1)
    rel_gate = mean1 * 10.0 ** (C.LRA_RELATIVE_GATE_LU / 10.0)
    m2 = m1 & (e >= rel_gate[..., None])
    n2 = jnp.sum(m2, axis=-1)
    l_low = _masked_percentile_loudness(e, m2, n2, C.LRA_LOW_PERCENTILE)
    l_high = _masked_percentile_loudness(e, m2, n2, C.LRA_HIGH_PERCENTILE)
    return jnp.where(n2 > 0, l_high - l_low, 0.0)


# --- histogram mode (unbounded-duration streaming) ---------------------------

@functools.lru_cache(maxsize=None)
def _hist_bin_energies() -> np.ndarray:
    l = C.HIST_MIN_LUFS + (np.arange(C.HIST_BINS) + 0.5) * (
        (C.HIST_MAX_LUFS - C.HIST_MIN_LUFS) / C.HIST_BINS
    )
    return (10.0 ** ((l - C.LOUDNESS_OFFSET_DB) / 10.0)).astype(np.float32)


def hist_bin_index(energies: jnp.ndarray) -> jnp.ndarray:
    """Histogram bin of each energy; -1 when below the absolute gate."""
    l = loudness_from_energy(energies)
    width = (C.HIST_MAX_LUFS - C.HIST_MIN_LUFS) / C.HIST_BINS
    idx = jnp.floor((l - C.HIST_MIN_LUFS) / width).astype(jnp.int32)
    idx = jnp.clip(idx, 0, C.HIST_BINS - 1)
    return jnp.where(l >= C.HIST_MIN_LUFS, idx, -1)


def gated_loudness_hist(hist: jnp.ndarray):
    """Integrated loudness from the gating histogram (counts per bin;
    bin-center energies — <=0.04 LU quantisation)."""
    hist = hist.astype(jnp.float32)
    e_bins = jnp.asarray(_hist_bin_energies())
    n1 = jnp.sum(hist, axis=-1)
    mean1 = jnp.sum(hist * e_bins, axis=-1) / jnp.maximum(n1, 1.0)
    rel_gate = mean1 * 10.0 ** (C.RELATIVE_GATE_LU / 10.0)
    keep = e_bins >= rel_gate[..., None]
    n2 = jnp.sum(jnp.where(keep, hist, 0.0), axis=-1)
    mean2 = jnp.sum(jnp.where(keep, hist * e_bins, 0.0), axis=-1) / jnp.maximum(n2, 1.0)
    return jnp.where((n1 > 0) & (n2 > 0), loudness_from_energy(mean2), NEG_INF)


def loudness_range_hist(hist: jnp.ndarray):
    """LRA from the short-term histogram (bin centers as energies)."""
    hist = hist.astype(jnp.float32)
    e_bins = jnp.asarray(_hist_bin_energies())
    n1 = jnp.sum(hist, axis=-1)
    mean1 = jnp.sum(hist * e_bins, axis=-1) / jnp.maximum(n1, 1.0)
    rel_gate = mean1 * 10.0 ** (C.LRA_RELATIVE_GATE_LU / 10.0)
    keep = e_bins >= rel_gate[..., None]
    counts = jnp.where(keep, hist, 0.0)
    n2 = jnp.sum(counts, axis=-1)
    cum = jnp.cumsum(counts, axis=-1)
    lo_target = jnp.floor((n2 - 1.0) * C.LRA_LOW_PERCENTILE + 0.5) + 1.0
    hi_target = jnp.floor((n2 - 1.0) * C.LRA_HIGH_PERCENTILE + 0.5) + 1.0
    width = (C.HIST_MAX_LUFS - C.HIST_MIN_LUFS) / C.HIST_BINS
    centers = C.HIST_MIN_LUFS + (jnp.arange(C.HIST_BINS) + 0.5) * width
    lo_idx = jnp.argmax(cum >= lo_target[..., None], axis=-1)
    hi_idx = jnp.argmax(cum >= hi_target[..., None], axis=-1)
    lra = centers[hi_idx] - centers[lo_idx]
    return jnp.where(n2 > 0, lra, 0.0)
