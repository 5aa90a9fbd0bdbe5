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
        hann, g2, per, centers,
    )


def _make_kernel(wchunk: int, per: int, dtype=jnp.float32):
    import os

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    karatsuba = os.environ.get("SS_STFT_K3", "1") != "0"

    # Every dot_general keeps its contraction on the LAST axis (explicit
    # swapaxes between stages; the DFT/twiddle matrices are symmetric, so
    # no transposed constants are needed) — measured ~6% faster than
    # Mosaic's middle-axis lowering on v5e.

    # rows of the contiguous HBM tile one chunk needs: wchunk windows at
    # 16-row hops plus the 112-row overlap tail of the last window
    rows_per_hop = HOP // N2  # 16
    TILE_ROWS = wchunk * rows_per_hop + (N1 - rows_per_hop)

    def kernel(x_hbm, f1r, f1i, f2r, f2a, f2b, twr, twi, hann, g2,
               mid_out, side_out, tile_l, tile_r, win_l, win_r,
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
                x_hbm.at[ii, 0, src, :], tile_l.at[slot_],
                sem_tile.at[slot_, 0],
            ).start()
            pltpu.make_async_copy(
                x_hbm.at[ii, 1, src, :], tile_r.at[slot_],
                sem_tile.at[slot_, 1],
            ).start()

        def wait_tile(slot_):
            pltpu.make_async_copy(
                x_hbm.at[0, 0, pl.ds(0, TILE_ROWS), :], tile_l.at[slot_],
                sem_tile.at[slot_, 0],
            ).wait()
            pltpu.make_async_copy(
                x_hbm.at[0, 1, pl.ds(0, TILE_ROWS), :], tile_r.at[slot_],
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
        # split below then yields |M|^2 and |S|^2 directly. The sums run
        # in f32; the packed operands convert to the matmul dtype ONCE
        # (per-mml conversion was ~1/3 of the kernel's VPU time).
        wl = win_l[:].astype(jnp.float32)
        wr = win_r[:].astype(jnp.float32)
        zr = ((wl + wr) * (0.5 * w)).astype(dtype)       # (wchunk, N1, N2)
        zi = ((wl - wr) * (0.5 * w)).astype(dtype)

        hi = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
              else jax.lax.Precision.HIGHEST)

        def mm1(x, f):
            """Contract the MIDDLE axis of (w, n1, n2) with f (n1, k):
            -> (w, n2, k). Mosaic's direct middle-axis lowering trades a
            few percent of MXU throughput for zero VPU transposes — and
            this kernel is VPU-bound, not MXU-bound (measured: halving
            the stage-2 matmul volume moved nothing)."""
            return jax.lax.dot_general(
                x, f.astype(dtype), (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32)

        def fft_both(xr, xi):
            """Z[k] AND Z[-k] in (w, k1, k2<64) layout, one shared
            stage 1, no transposes anywhere.

            Z[-k] is the transform with every constant conjugated (it
            never needs an index reversal). The conjugate path's stage 1
            recombines the SAME four matmul products as the forward path
            (sign flips only). f1/f2/tw are symmetric, so the (n2, k1)
            intermediate layout reuses the same constants, and stage 2
            contracts n2 in the middle axis directly."""
            p1 = mm1(xr, f1r[:])               # (w, n2, k1) shared
            p2 = mm1(xi, f1i[:])
            p3 = mm1(xi, f1r[:])
            p4 = mm1(xr, f1i[:])
            ar, ai = p1 - p2, p3 + p4          # forward
            cr, ci = p1 + p2, p3 - p4          # conj-constant path
            br = (ar * twr[:] - ai * twi[:]).astype(dtype)
            bi = (ar * twi[:] + ai * twr[:]).astype(dtype)
            dr = (cr * twr[:] + ci * twi[:]).astype(dtype)
            di = (ci * twr[:] - cr * twi[:]).astype(dtype)
            if karatsuba:
                # 3-multiplication complex matmuls (Karatsuba): with
                # f2a = f2r + f2i and f2b = f2i - f2r precomputed on host,
                # each path needs 3 MXU passes instead of 4 — stage 2
                # drops 8 -> 6 matmuls for two cheap bf16 adds per path.
                bs = br + bi
                ds = dr + di
                t1 = mm1(bs, f2r[:])
                yr = t1 - mm1(bi, f2a[:])            # (w, k1, k2)
                yi = t1 + mm1(br, f2b[:])
                t2 = mm1(ds, f2r[:])
                vr = t2 + mm1(di, f2b[:])            # x conj(f2)
                vi = t2 - mm1(dr, f2a[:])
            else:
                yr = mm1(br, f2r[:]) - mm1(bi, f2a[:])   # (w, k1, k2)
                yi = mm1(br, f2a[:]) + mm1(bi, f2r[:])
                vr = mm1(dr, f2r[:]) + mm1(di, f2a[:])   # x conj(f2)
                vi = mm1(di, f2r[:]) - mm1(dr, f2a[:])
            return yr, yi, vr, vi

        HB = BANDS // 2  # bands covering k < WIN/2; gain is 0 above

        yr3, yi3, vr3, vi3 = fft_both(zr, zi)
        p = yr3 * yr3 + yi3 * yi3                 # (w, k1, k2)
        p_rev = vr3 * vr3 + vi3 * vi3
        c = yr3 * vr3 - yi3 * vi3
        # g2 arrives as the (k1, k2) matrix; with per == N1, display
        # band b is EXACTLY column k2 = b (k = k1 + 128*k2), so pooling
        # is a plain max over the k1 axis — no flatten, no transpose.
        g = g2[:].reshape(1, N1, N2 // 2)
        mid_p = jnp.max(0.25 * (p + p_rev + 2.0 * c) * g, axis=1)
        side_p = jnp.max(0.25 * (p + p_rev - 2.0 * c) * g, axis=1)

        def pool(pm):
            db = jnp.where(
                pm > 0.0,
                10.0 * jnp.log10(jnp.maximum(pm, 1e-38)),
                jnp.float32(C.SPECTRUM_FLOOR_DB),
            )
            # bands >= HB have zero gain everywhere: emit the floor
            floor = jnp.full((wchunk, BANDS - HB), C.SPECTRUM_FLOOR_DB,
                             jnp.float32)
            return jnp.concatenate([db, floor], axis=-1)

        mid_p = pool(mid_p)
        side_p = pool(side_p)
        mid_out[0] = mid_p
        side_out[0] = side_p

    return kernel


@functools.partial(jax.jit, static_argnames=("rate", "wchunk", "interpret", "dtype"))
def stft_pooled_pallas_packed(x, rate: int, wchunk: int | None = None,
                              interpret: bool = False, dtype=jnp.float32):
    """x: (B, 2, N) planar stereo -> (mid_db, side_db): (B, nw, BANDS).

    The kernel DMAs per-channel tiles straight out of the packed array
    (any float dtype; operands convert to the matmul dtype in VMEM), so
    callers that already hold (B, 2, N) samples — the engine, the bench —
    pay NO XLA channel-split / dtype-convert / reshape passes on the
    GB-scale input (measured ~4.5 ms/iter of pure layout plumbing on the
    round-3 trace, docs/KERNELS.md). NOTE: XLA still retiles the
    T(2,128)-laid-out 3D parameter into the frame view's T(8,128)
    (4.6 ms/iter at 32x60 s, round-4 trace) — callers that can hold the
    4D frames array should call `stft_pooled_pallas_frames` directly.

    N must satisfy (N // HOP - K + 1) % wchunk == 0 after truncation; the
    trailing remainder windows are dropped (callers pad or accept — the
    bench and spectrogram products use aligned lengths).
    """
    b, ch, n = x.shape
    assert ch == 2, "packed STFT expects (B, 2, N) stereo"
    nhop = n // HOP
    rows = nhop * HOP // N2
    # (B, 2, N/128, 128): contiguous per channel, so this reshape is free
    # in index math (it is a relayout in memory); window w = 128 rows
    # starting at row 16*w (aligned)
    frames = x[:, :, : nhop * HOP].reshape(b, 2, rows, N2)
    return stft_pooled_pallas_frames(frames, rate, wchunk=wchunk,
                                     interpret=interpret, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("rate", "wchunk", "interpret", "dtype"))
def stft_pooled_pallas_frames(frames, rate: int, wchunk: int | None = None,
                              interpret: bool = False, dtype=jnp.float32):
    """frames: (B, 2, N/128, 128) planar stereo in the kernel's NATIVE
    tiling -> (mid_db, side_db): (B, nw, BANDS).

    This is the zero-relayout entry: a (B, 2, N/128, 128) device array is
    laid out T(8,128) by XLA exactly as the kernel's window DMAs want it,
    so the GB-scale input is consumed with no retile at all (the 3D entry
    pays 4.6 ms/iter at 32x60 s — round-4 trace, docs/KERNELS.md). The
    chunked energy kernel (ops/pallas_iir_chunked.py) consumes the SAME
    layout, making (B, 2, N/128, 128) the canonical device layout for
    batch analysis.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if wchunk is None:
        # f32 intermediates are twice the size; 16 windows/chunk with the
        # double-buffered window scratch overflows the 16 MB VMEM budget
        wchunk = 16 if dtype == jnp.bfloat16 else 8
    in_dtype = frames.dtype

    (f1r, f1i, f2r, f2i, twr, twi, hann, g2, per, _) = _consts(rate)
    b, ch, rows, n2 = frames.shape
    assert ch == 2 and n2 == N2, "frames STFT expects (B, 2, N/128, 128)"
    nhop = rows * N2 // HOP
    nw_full = nhop - K + 1
    nw = (nw_full // wchunk) * wchunk
    nwc = nw // wchunk

    kernel = _make_kernel(wchunk, per, dtype)

    grid = (b, nwc)
    in_specs = [
            # ANY-space blocks must be the full array with a trivial map;
            # the kernel DMA-slices its own (track, channel, window) tiles.
            pl.BlockSpec((b, 2, rows, N2), lambda i, j: (0, 0, 0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((N1, N1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            # stage-2 DFT matrices column-sliced to k2 < N2/2: outputs
            # k = k1 + 128*k2 >= WIN/2 have zero display gain, so the
            # second FFT stage needn't compute them (-1/3 of the
            # kernel's matmul volume). Three constants: f2r plus either
            # (f2i, f2i) or the Karatsuba pair (f2r+f2i, f2i-f2r).
            pl.BlockSpec((N2, N2 // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, N2 // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, N2 // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, N2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WIN), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            # g2 as the (k1, k2 < N2/2) matrix (band b == column k2 = b)
            pl.BlockSpec((N1, N2 // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_specs = [
            pl.BlockSpec((1, wchunk, BANDS), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wchunk, BANDS), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
    ]
    assert per == N1, "column pooling requires per-band width == N1"
    g2_mat = np.ascontiguousarray(
        np.asarray(g2)[: WIN // 2].reshape(N2 // 2, N1).T)  # (k1, k2)
    import os as _os
    f2rh = f2r[:, : N2 // 2]
    f2ih = f2i[:, : N2 // 2]
    if _os.environ.get("SS_STFT_K3", "1") != "0":
        f2a, f2b = f2rh + f2ih, f2ih - f2rh
    else:
        f2a, f2b = f2ih, f2ih
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
    )(frames, f1r, f1i, f2rh, f2a, f2b, twr, twi,
      hann.reshape(1, WIN), g2_mat)
    return mid, side


def stft_pooled_pallas(l, r, rate: int, wchunk: int | None = None,
                       interpret: bool = False, dtype=jnp.float32):
    """l, r: (B, N) channel signals -> (mid_db, side_db): (B, nw, BANDS).

    Separate-channel convenience over `stft_pooled_pallas_packed` (the
    stack is one copy; callers that already hold (B, 2, N) should use the
    packed entry directly)."""
    return stft_pooled_pallas_packed(
        jnp.stack([l, r], axis=1), rate, wchunk=wchunk,
        interpret=interpret, dtype=dtype)
