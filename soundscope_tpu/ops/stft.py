"""Throughput STFT: the display-spectrum pipeline over whole tracks.

The reference recomputes two 16384-point FFTs (mid + side) per playback
position update (src/tui.rs:1488-1524, ~21.5 Hz at 44.1 kHz — one update
per 2048 samples, src/audio_player.rs:65). The batch equivalent — a full
spectrogram at that hop over every track — is built TPU-first:

* window extraction by CONTIGUOUS slice-stacking (hop divides win), not
  gather — measured 8x faster on TPU;
* mid and side spectra from ONE complex FFT per window: pack z = l + i*r,
  split by conjugate symmetry, then Mid = (L+R)/2, Side = (L-R)/2 in the
  frequency domain (FFT linearity) — 4x less FFT work than four real FFTs;
* four-step matmul FFT on the MXU (ops/fft.py), optionally bfloat16 with
  f32 accumulation (~0.03 dB error, invisible at display resolution);
* pink-noise compensation and dBFS scaling folded into a per-bin LINEAR
  gain so band max-pooling commutes with the (monotonic) log — one log10
  per pooled band instead of per bin.

Exact per-bin display math for single windows lives in ops/spectrum.py;
this module is the bulk path (library scans, benchmarks, offline
spectrogram products).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core import constants as C
from soundscope_tpu.ops.fft import fft_pack2
from soundscope_tpu.ops.spectrum import _bin_plan, _hann_np


def frame_signal(x: jnp.ndarray, win: int, hop: int) -> jnp.ndarray:
    """(..., N) -> (..., nw, win) overlapping windows via slice-stacking.

    Requires win % hop == 0. nw = (N - win)//hop + 1, rounded down so all
    stacked slices share a length (bounded transient memory, no gather).
    """
    assert win % hop == 0, "hop must divide win"
    n = x.shape[-1]
    k = win // hop
    nhop = n // hop
    nw = max(nhop - k + 1, 0)
    if nw == 0:
        return jnp.zeros((*x.shape[:-1], 0, win), x.dtype)
    frames = x[..., : nhop * hop].reshape(*x.shape[:-1], nhop, hop)
    segs = [frames[..., i: i + nw, :] for i in range(k)]
    return jnp.concatenate(segs, axis=-1)


@functools.lru_cache(maxsize=None)
def _pooled_gain_plan(n: int, rate: int, pool: int):
    """Per-bin linear gain over ALL n bins (zero outside the 20 Hz-20 kHz
    display range), plus chart-x centers of the `pool` aligned bands.

    Bands are `n // pool` CONSECUTIVE natural-order bins — lane-aligned on
    TPU (the Pallas kernel reshapes (.., pool, per) with per a multiple of
    128), and out-of-range bins can never win the band max since their
    gain is exactly 0 and powers are non-negative.
    """
    lo, hi, freqs, pink_db, xmap = _bin_plan(
        n, rate, C.SPECTRUM_FMIN_HZ, C.SPECTRUM_FMAX_HZ
    )
    gain_full = np.zeros(n, np.float64)
    gain_full[lo:hi] = (4.0 / n) * 10.0 ** (pink_db.astype(np.float64) / 20.0)
    per = n // pool
    # chart x of each band = x of its center bin (clipped into range)
    centers = np.zeros(pool)
    for b in range(pool):
        c = b * per + per // 2
        c = min(max(c, lo), hi - 1)
        centers[b] = xmap[c - lo]
    return gain_full.astype(np.float32), per, centers


def spectrogram(samples_planar, rate: int, use_pallas: str = "auto"):
    """Host convenience: planar (C, N) -> dict of pooled display
    spectrograms (the batch/offline product; Pallas kernel on TPU).

    Returns {"chart_x": (pool,), "mid_db": (nw, pool), "side_db": ...,
    "hop": 2048, "win": 16384, "rate": rate} as numpy arrays.
    """
    import jax

    x = np.asarray(samples_planar, np.float32)
    if x.shape[0] >= 2:
        l, r = x[0], x[1]
    else:
        l = r = x[0]
    lj, rj = jnp.asarray(l[None]), jnp.asarray(r[None])
    from soundscope_tpu.ops.pallas_stft import pallas_supported

    on_tpu = jax.default_backend() == "tpu"
    _, per, centers = _pooled_gain_plan(C.DEFAULT_FFT_SIZE, rate, 128)
    if pallas_supported(rate) and (
        use_pallas == "yes" or (use_pallas == "auto" and on_tpu)
    ):
        from soundscope_tpu.ops.pallas_stft import stft_pooled_pallas

        mid, side = stft_pooled_pallas(lj, rj, rate)
        # the kernel truncates to whole window-chunks; compute the <=15
        # trailing windows with the XLA path so output shape matches the
        # CPU branch exactly
        hop, win = 2048, C.DEFAULT_FFT_SIZE
        nw_full = max(lj.shape[-1] // hop - win // hop + 1, 0)
        done = mid.shape[1]
        if nw_full > done:
            lo = done * hop
            _, mtail, stail = stft_midside_display(lj[:, lo:], rj[:, lo:], rate)
            mid = jnp.concatenate([mid, mtail], axis=1)
            side = jnp.concatenate([side, stail], axis=1)
    else:
        centers, mid, side = stft_midside_display(lj, rj, rate)
    return {
        "chart_x": np.asarray(centers),
        "mid_db": np.asarray(mid[0]),
        "side_db": np.asarray(side[0]),
        "hop": 2048,
        "win": C.DEFAULT_FFT_SIZE,
        "rate": rate,
    }


def stft_midside_display(
    l: jnp.ndarray,
    r: jnp.ndarray,
    rate: int,
    win: int = C.DEFAULT_FFT_SIZE,
    hop: int = 2048,
    pool: int = 128,
    dtype=jnp.float32,
    gain_db: float = 0.0,
):
    """(..., N) L/R -> (chart_x (pool,), mid_db, side_db (..., nw, pool)).

    Pooled (band-max) display spectrogram of mid and side channels with the
    reference's exact per-bin scaling folded in before pooling. Bands are
    aligned groups of win/pool natural-order bins (zero-gain outside the
    display range); bands fully outside read the -150 dB floor.
    """
    n = win
    gain, per, centers = _pooled_gain_plan(n, rate, pool)
    w = jnp.asarray(_hann_np(win))
    lw = frame_signal(l, win, hop) * w
    rw = frame_signal(r, win, hop) * w
    Ar, Ai, Br, Bi = fft_pack2(lw, rw, dtype=dtype)
    # frequency-domain mid/side (FFT linearity); keep all n bins, the
    # per-bin gain zeroes everything outside the display range
    mr, mi = 0.5 * (Ar + Br), 0.5 * (Ai + Bi)
    sr_, si = 0.5 * (Ar - Br), 0.5 * (Ai - Bi)
    g2 = jnp.asarray(gain) ** 2

    def pooled_db(re, im):
        p = (re * re + im * im) * g2
        pm = jnp.max(p.reshape(*p.shape[:-1], pool, per), axis=-1)
        return jnp.where(
            pm > 0.0,
            10.0 * jnp.log10(jnp.maximum(pm, 1e-38)) + gain_db,
            jnp.float32(C.SPECTRUM_FLOOR_DB) + gain_db,
        )

    return centers, pooled_db(mr, mi), pooled_db(sr_, si)
