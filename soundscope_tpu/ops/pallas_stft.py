"""Fused Pallas STFT kernel: frames -> pooled mid/side display spectra.

The XLA STFT path (ops/stft.py) materialises every intermediate in HBM —
windows (8x input redundancy), complex spectra, powers — so it runs
memory-bound far from the chip's ceiling. This kernel keeps the ENTIRE
per-window pipeline in VMEM:

    HBM:  overlapped frame tile  ──DMA──►  VMEM
    VMEM: build windows (shifted slices) → Hann → pack z = l + i·r
          → four-step matmul FFT (two 128x128 MXU stages + twiddles)
          → conjugate split powers |M|², |S|² → per-bin gain → band max
    HBM:  (wchunk, bands) pooled dB — the only write

Grid = (tracks, window-chunks); input stays in HBM (memory_space=ANY)
and each step DMAs its own overlapped tile (overlapping tiles cannot be
expressed with standard BlockSpec index maps).

Matches ops/stft.stft_midside_display pooled output (tested in interpret
mode); used by bench/engine on TPU for the throughput spectrogram path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core import constants as C
from soundscope_tpu.ops.spectrum import _hann_np
from soundscope_tpu.ops.stft import _pooled_gain_plan

WIN = 16384
HOP = 2048
K = WIN // HOP          # frames per window
N1 = 128                # four-step factorisation 16384 = 128 x 128
N2 = 128
BANDS = 128


def pallas_supported(rate: int) -> bool:
    """The kernel pools only the sub-Nyquist half of the spectrum, which
    requires the 20 kHz display ceiling to sit strictly below Nyquist."""
    return rate > 2 * C.SPECTRUM_FMAX_HZ


@functools.lru_cache(maxsize=None)
def _consts(rate: int):
    k1 = np.arange(N1)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / N1)
    k2 = np.arange(N2)
    f2 = np.exp(-2j * np.pi * np.outer(k2, k2) / N2)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / WIN)
    gain, per, centers = _pooled_gain_plan(WIN, rate, BANDS)
    g2 = (gain.astype(np.float64) ** 2).astype(np.float32)
    hann = _hann_np(WIN)
    exch = np.eye(N1, dtype=np.float32)[::-1].copy()
    # reverse-and-shift permutations (rolls folded into the matmul):
    # exs[n, k] = 1 iff k = (N1 - n) % N1
    exs = np.zeros((N1, N1), np.float32)
    for n_ in range(N1):
        exs[n_, (N1 - n_) % N1] = 1.0
    # with k = k1 + N1*k2, gain must be zero at and above Nyquist for the
    # kernel's half-spectrum pooling (callers gate on pallas_supported)
    if np.any(g2[WIN // 2:] > 0.0):
        raise ValueError(
            f"stft_pooled_pallas: display range reaches Nyquist at rate "
            f"{rate} (needs rate > {2 * C.SPECTRUM_FMAX_HZ}); use the XLA "
            "path (ops/stft.stft_midside_display)"
        )
    return (
        f1.real.astype(np.float32), f1.imag.astype(np.float32),
        f2.real.astype(np.float32), f2.imag.astype(np.float32),
        tw.real.astype(np.float32), tw.imag.astype(np.float32),
        hann, g2, exch, exs, per, centers,
    )


def _make_kernel(wchunk: int, per: int, dtype=jnp.float32):
    import os

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # "swapped" (default): keep every dot_general contraction on the LAST
    # axis (explicit swapaxes between stages; the DFT/twiddle/exchange
    # matrices are all symmetric, so no transposed constants are needed)
    # instead of contracting a middle axis — measured ~6% faster than
    # Mosaic's middle-axis lowering on v5e.
    layout = os.environ.get("SS_STFT_LAYOUT", "swapped")

    # rows of the contiguous HBM tile one chunk needs: wchunk windows at
    # 16-row hops plus the 112-row overlap tail of the last window
    rows_per_hop = HOP // N2  # 16
    TILE_ROWS = wchunk * rows_per_hop + (N1 - rows_per_hop)

    def kernel(l_hbm, r_hbm, f1r, f1i, f2r, f2i, twr, twi, hann, g2, exch,
               exs, mid_out, side_out, tile_l, tile_r, win_l, win_r,
               sem_tile, sem_win):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nwc = pl.num_programs(1)
        step = i * nwc + j
        total = pl.num_programs(0) * nwc
        slot = jax.lax.rem(step, 2)

        # Overlapped windows share 112 of their 128 rows with their
        # neighbours, so fetching per window re-reads every input byte
        # 8x from HBM. Each step instead DMAs ONE contiguous
        # (TILE_ROWS, 128) tile per channel (manual copies are not
        # pipelined by Mosaic, hence the hand-rolled double buffer), then
        # fans it out into the stacked (wchunk, 128, 128) window scratch
        # with VMEM->VMEM copies at local bandwidth. (Window w = tile
        # rows [16w, 16w+128); Mosaic cannot stack sublane-offset
        # *slices*, but local DMAs express the stacking fine.)
        def start_tile(slot_, ii, jj):
            src = pl.ds(jj * (wchunk * rows_per_hop), TILE_ROWS)
            pltpu.make_async_copy(
                l_hbm.at[ii, src, :], tile_l.at[slot_], sem_tile.at[slot_, 0]
            ).start()
            pltpu.make_async_copy(
                r_hbm.at[ii, src, :], tile_r.at[slot_], sem_tile.at[slot_, 1]
            ).start()

        def wait_tile(slot_):
            pltpu.make_async_copy(
                l_hbm.at[0, pl.ds(0, TILE_ROWS), :], tile_l.at[slot_],
                sem_tile.at[slot_, 0],
            ).wait()
            pltpu.make_async_copy(
                r_hbm.at[0, pl.ds(0, TILE_ROWS), :], tile_r.at[slot_],
                sem_tile.at[slot_, 1],
            ).wait()

        @pl.when(step == 0)
        def _():
            start_tile(0, i, j)

        @pl.when(step + 1 < total)
        def _():
            # successor in (tracks, chunks) iteration order
            nxt_i = jnp.where(j + 1 < nwc, i, i + 1)
            nxt_j = jnp.where(j + 1 < nwc, j + 1, 0)
            start_tile(1 - slot, nxt_i, nxt_j)

        wait_tile(slot)

        for w_ in range(wchunk):
            src = pl.ds(w_ * rows_per_hop, N1)
            pltpu.make_async_copy(
                tile_l.at[slot, src, :], win_l.at[w_], sem_win.at[w_]
            ).start()
            pltpu.make_async_copy(
                tile_r.at[slot, src, :], win_r.at[w_], sem_win.at[wchunk + w_]
            ).start()
        for w_ in range(wchunk):
            pltpu.make_async_copy(
                tile_l.at[slot, pl.ds(0, N1), :], win_l.at[w_],
                sem_win.at[w_],
            ).wait()
            pltpu.make_async_copy(
                tile_r.at[slot, pl.ds(0, N1), :], win_r.at[w_],
                sem_win.at[wchunk + w_],
            ).wait()

        w = hann[:].reshape(1, N1, N2)
        # time-domain mid/side, packed as z = mid + i*side: the conjugate
        # split below then yields |M|^2 and |S|^2 directly. The sum is
        # taken in f32 even when the scratch streams bf16.
        wl = win_l[:].astype(jnp.float32)
        wr = win_r[:].astype(jnp.float32)
        zr = (wl + wr) * (0.5 * w)                        # (wchunk, N1, N2)
        zi = (wl - wr) * (0.5 * w)

        hi = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
              else jax.lax.Precision.HIGHEST)

        def mxu(a):
            return a.astype(dtype)

        def mml(x, f):
            """Contract x's LAST axis with f (c, b), merging the leading
            dims first: one (w*128, 128) @ (128, 128) MXU matmul instead
            of w small ones (leading-dim merge is a free re-tiling)."""
            lead = x.shape[:-1]
            y = jax.lax.dot_general(
                mxu(x.reshape(-1, x.shape[-1])), mxu(f),
                (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32,
            )
            return y.reshape(*lead, f.shape[1])

        def fft_orig(xr, xi):

            def lmm(f, x):  # f (N1,N1) applied over x's N1 axis
                y = jax.lax.dot_general(
                    mxu(x), mxu(f.T), (((1,), (0,)), ((), ())),
                    precision=hi, preferred_element_type=jnp.float32,
                )                                          # (w, N2, N1)
                return jnp.swapaxes(y, 1, 2)

            ar = lmm(f1r[:], xr) - lmm(f1i[:], xi)
            ai = lmm(f1i[:], xr) + lmm(f1r[:], xi)
            br = ar * twr[:] - ai * twi[:]
            bi = ar * twi[:] + ai * twr[:]

            def rmm(x, f):  # contract x's N2 axis with f (N2,N2)
                return jax.lax.dot_general(
                    mxu(x), mxu(f), (((2,), (0,)), ((), ())),
                    precision=hi, preferred_element_type=jnp.float32,
                )                                          # (w, N1, N2->k2)

            yr = rmm(br, f2r[:]) - rmm(bi, f2i[:])
            yi = rmm(br, f2i[:]) + rmm(bi, f2r[:])
            return yr, yi  # (w, k1, k2)

        def fft_swapped(xr, xi):
            # f1/f2/tw are symmetric (value depends only on the index
            # product), so transposed layouts reuse the same constants
            xrt = jnp.swapaxes(xr, 1, 2)       # (w, n2, n1)
            xit = jnp.swapaxes(xi, 1, 2)
            ar = mml(xrt, f1r[:]) - mml(xit, f1i[:])   # (w, n2, k1)
            ai = mml(xit, f1r[:]) + mml(xrt, f1i[:])
            br = ar * twr[:] - ai * twi[:]     # tw[k1,n2] == tw[n2,k1]
            bi = ar * twi[:] + ai * twr[:]
            brt = jnp.swapaxes(br, 1, 2)       # (w, k1, n2)
            bit = jnp.swapaxes(bi, 1, 2)
            yr = mml(brt, f2r[:]) - mml(bit, f2i[:])   # (w, k1, k2)
            yi = mml(brt, f2i[:]) + mml(bit, f2r[:])
            return yr, yi

        fft = fft_swapped if layout == "swapped" else fft_orig

        HALF = WIN // 2
        HB = BANDS // 2  # bands covering k < WIN/2; gain is 0 above Nyquist

        def flatten_half(t):
            # k = k1 + N1*k2 -> (k2, k1)-major flatten, keeping k2 < N2/2
            # (the only bands with nonzero display gain)
            return jnp.swapaxes(t, 1, 2)[:, : N2 // 2, :].reshape(wchunk, HALF)

        def negate_freq_half(t):
            """Z[-k] for k < WIN/2 in (.., k1, k2) layout, without lax.rev
            (unsupported): k' = WIN - k maps k1 >= 1 to (N1-k1, N2-1-k2)
            and the k1 = 0 row to (0, (N2-k2) % N2). The +1 shifts are
            FOLDED into the reverse-shift matrix `exs` (one matmul per
            axis, no rolls); the k1 = 0 row gets its own tiny matmul."""
            # exchange matmuls are exact 0/1 permutations, so each pass is
            # a lossless gather of its bf16 operand; the hi+lo bf16 split
            # carries ~16 of f32's 24 mantissa bits (~2^-17 relative,
            # ≈1e-4 dB after pooling — far below display resolution) with
            # two native-speed passes vs 6 for a HIGHEST f32 matmul
            ex = exch[:].astype(jnp.bfloat16)
            exs_b = exs[:].astype(jnp.bfloat16)

            def perm(x, f):  # permute x's LAST axis by the 0/1 matrix f
                lead = x.shape[:-1]
                x2 = x.reshape(-1, x.shape[-1])  # merge: one big matmul
                dims = (((1,), (0,)), ((), ()))
                hi_part = x2.astype(jnp.bfloat16)
                lo_part = (x2 - hi_part.astype(jnp.float32)).astype(
                    jnp.bfloat16)
                y = jax.lax.dot_general(
                    hi_part, f, dims, preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    lo_part, f, dims, preferred_element_type=jnp.float32,
                )
                return y.reshape(*lead, f.shape[1])

            c1 = perm(jnp.swapaxes(t, 1, 2), exs_b)  # (2w, k2, k1->N1-k1)
            c1 = jnp.swapaxes(c1, 1, 2)              # (2w, k1', k2)
            c = perm(c1, ex)                         # k2 -> N2-1-k2 (k1'>=1)
            row0 = perm(c1[:, 0:1, :], exs_b)        # k1'=0: k2 -> (N2-k2)%N2
            k1_idx = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
            return jnp.where(k1_idx == 0, row0, c)

        yr3, yi3 = fft(zr, zi)
        zr_f = flatten_half(yr3)
        zi_f = flatten_half(yi3)
        # one negate pass for both tensors (stacked along the window axis)
        both = jnp.concatenate([yr3, yi3], axis=0)
        both_rev = negate_freq_half(both)
        zr_rev = flatten_half(both_rev[:wchunk])
        zi_rev = flatten_half(both_rev[wchunk:])
        p = zr_f * zr_f + zi_f * zi_f
        p_rev = zr_rev * zr_rev + zi_rev * zi_rev
        c = zr_f * zr_rev - zi_f * zi_rev
        g = g2[:, :HALF]
        mid_p = 0.25 * (p + p_rev + 2.0 * c) * g
        side_p = 0.25 * (p + p_rev - 2.0 * c) * g

        def pool(x):
            pm = jnp.max(x.reshape(wchunk, HB, per), axis=-1)
            db = jnp.where(
                pm > 0.0,
                10.0 * jnp.log10(jnp.maximum(pm, 1e-38)),
                jnp.float32(C.SPECTRUM_FLOOR_DB),
            )
            # bands >= HB have zero gain everywhere: emit the floor
            floor = jnp.full((wchunk, BANDS - HB), C.SPECTRUM_FLOOR_DB,
                             jnp.float32)
            return jnp.concatenate([db, floor], axis=-1)

        mid_out[0] = pool(mid_p)
        side_out[0] = pool(side_p)

    return kernel


@functools.partial(jax.jit, static_argnames=("rate", "wchunk", "interpret", "dtype"))
def stft_pooled_pallas(l, r, rate: int, wchunk: int | None = None,
                       interpret: bool = False, dtype=jnp.float32):
    """l, r: (B, N) channel signals -> (mid_db, side_db): (B, nw, BANDS).

    N must satisfy (N // HOP - K + 1) % wchunk == 0 after truncation; the
    trailing remainder windows are dropped (callers pad or accept — the
    bench and spectrogram products use aligned lengths).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if wchunk is None:
        # f32 intermediates are twice the size; 16 windows/chunk with the
        # double-buffered window scratch overflows the 16 MB VMEM budget
        wchunk = 16 if dtype == jnp.bfloat16 else 8
    import os as _os
    stream = _os.environ.get("SS_STFT_STREAM", "bf16")
    in_dtype = (jnp.bfloat16 if dtype == jnp.bfloat16 and stream == "bf16"
                else jnp.float32)

    (f1r, f1i, f2r, f2i, twr, twi, hann, g2, exch, exs, per, _) = _consts(rate)
    b, n = l.shape
    nhop = n // HOP
    nw_full = nhop - K + 1
    nw = (nw_full // wchunk) * wchunk
    nwc = nw // wchunk
    # (B, N/128, 128): window w = 128 rows starting at row 16*w (aligned)
    # in bf16 display mode the inputs stream as bf16: half the DMA bytes
    # and half the window-scratch footprint (the first matmul consumes
    # bf16 operands anyway; quantization lands ~2^-9 relative on inputs,
    # far below the 0.1 dB display budget — tools/tpu_conformance.py)
    frames_l = l[:, : nhop * HOP].reshape(b, nhop * HOP // N2, N2).astype(in_dtype)
    frames_r = r[:, : nhop * HOP].reshape(b, nhop * HOP // N2, N2).astype(in_dtype)

    kernel = _make_kernel(wchunk, per, dtype)
    smem = pl.ANY

    grid = (b, nwc)
    rows = nhop * HOP // N2
    in_specs = [
            # ANY-space blocks must be the full array with a trivial map;
            # the kernel DMA-slices its own (track, window) tiles.
            pl.BlockSpec((b, rows, N2), lambda i, j: (0, 0, 0), memory_space=smem),
            pl.BlockSpec((b, rows, N2), lambda i, j: (0, 0, 0), memory_space=smem),
            pl.BlockSpec((N1, N1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, N2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, N2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WIN), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WIN), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
            pl.BlockSpec((1, wchunk, BANDS), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wchunk, BANDS), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
    ]
    mid, side = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, nw, BANDS), jnp.float32),
            jax.ShapeDtypeStruct((b, nw, BANDS), jnp.float32),
        ],
        scratch_shapes=[
            # double-buffered contiguous chunk tiles (HBM-facing)
            pltpu.VMEM((2, wchunk * (HOP // N2) + N1 - HOP // N2, N2),
                       in_dtype),
            pltpu.VMEM((2, wchunk * (HOP // N2) + N1 - HOP // N2, N2),
                       in_dtype),
            # stacked windows, rebuilt locally every step
            pltpu.VMEM((wchunk, N1, N2), in_dtype),
            pltpu.VMEM((wchunk, N1, N2), in_dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2 * wchunk,)),
        ],
        interpret=interpret,
    )(frames_l, frames_r, f1r, f1i, f2r, f2i, twr, twi,
      hann.reshape(1, WIN), g2.reshape(1, WIN), exch, exs)
    return mid, side
