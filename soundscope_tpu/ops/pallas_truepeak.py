"""Pallas true-peak kernel (BS.1770-4 Annex 2) — nothing materialised.

The XLA path (ops/truepeak.py) writes the 4x-oversampled signal to HBM
(factor x N floats), reads it back for |.|/max, and spends two more
full passes on validity masking — ~10 bytes of HBM traffic per input
byte. This kernel streams input blocks through VMEM once:

    per grid step (sequential over blocks):
      x_masked = x * [pos < n_valid]
      for k in 0..12:   x_shift_k via pltpu.roll + carried-tail fixup
      y_p = sum_k h[p,k] * x_shift_k          (4 phases, VPU)
      running_max = max(running_max, |y_p| masked, |x_masked|)

State across blocks: the 12-sample tail (for the FIR context) and the
running per-row maxima — both tiny VMEM scratch. Output: (rows, 1)
true peak and sample peak, written at the last grid step.

Exact vs the XLA path (tests, interpret mode); rows = tracks x channels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core import constants as C
from soundscope_tpu.ops.truepeak import _polyphase_taps

BLK = 512  # preferred samples per grid step (lane-dim tile)


def pick_block(n: int) -> int | None:
    """Largest supported tile that divides n (None -> use the XLA path)."""
    for blk in (512, 384, 256, 128):
        if n % blk == 0:
            return blk
    return None


def _row_tile(rows: int) -> int:
    """Largest divisor of rows <= 256 that satisfies the 8-sublane tiling
    (VMEM budget for the shifted tiles); falls back to the full row count
    (block == array dim is always legal)."""
    if rows <= 256:
        return rows
    best = None
    for t in range(8, 257, 8):
        if rows % t == 0:
            best = t
    return best or rows


def _make_kernel(factor: int, nsteps: int, rows: int, blk: int, kpg: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h_np = _polyphase_taps(factor)          # (F, K)
    F, Kp = h_np.shape
    ctx = Kp - 1                             # left context samples (12)

    BLK = blk

    def kernel(x_ref, nv_ref, tp_ref, sp_ref, prev, run_tp, run_sp):
        # grid = (row_tiles, nsteps): j (time) iterates fastest, so the
        # carried scratch belongs to one row tile at a time and resets at
        # its first time block. Each step walks `kpg` BLK-sample sub-blocks
        # (fatter DMAs amortise per-step grid overhead; only the 12-sample
        # FIR context crosses sub-block edges).
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            prev[:] = jnp.zeros_like(prev)
            run_tp[:] = jnp.zeros_like(run_tp)
            run_sp[:] = jnp.zeros_like(run_sp)

        col = jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 1)
        xp = prev[:]
        tp_blk = jnp.zeros((rows, 1), jnp.float32)
        sp_blk = jnp.zeros((rows, 1), jnp.float32)
        for i in range(kpg):
            pos = (j * kpg + i) * BLK + col
            valid = pos < nv_ref[:]
            x = jnp.where(valid, x_ref[:, i * BLK: (i + 1) * BLK], 0.0)

            sp_blk = jnp.maximum(sp_blk, jnp.max(jnp.abs(x), axis=1, keepdims=True))

            # shifted-by-k block: roll(x, k) is right for n >= k; for n < k
            # the wrapped columns must come from the END of the PREVIOUS
            # block. Select BEFORE rolling: the last k columns of the
            # select come from prev, and rolling right by k lands them on
            # columns < k — identical values to selecting between two
            # rolls, one vector op cheaper per shift. The shifts depend
            # only on k, so they are built ONCE and shared by all F
            # phases (they dominated the VPU cost when recomputed inside
            # the phase loop).
            shifted = [x]
            for k in range(1, Kp):
                shifted.append(
                    pltpu.roll(jnp.where(col >= BLK - k, xp, x), k, 1))
            for p in range(F):
                acc = jnp.zeros((rows, BLK), jnp.float32)
                for k in range(Kp):
                    hk = float(h_np[p, k])
                    if hk == 0.0:
                        continue
                    acc = acc + hk * shifted[k]
                # outputs beyond the valid region must not count
                acc = jnp.where(valid, acc, 0.0)
                tp_blk = jnp.maximum(
                    tp_blk, jnp.max(jnp.abs(acc), axis=1, keepdims=True)
                )
            xp = x
        run_sp[:] = jnp.maximum(run_sp[:], sp_blk)
        run_tp[:] = jnp.maximum(run_tp[:], tp_blk)
        prev[:] = xp

        @pl.when(j == nsteps - 1)
        def _():
            tp_ref[:] = jnp.maximum(run_tp[:], run_sp[:])
            sp_ref[:] = run_sp[:]

    return kernel, ctx


@functools.partial(jax.jit, static_argnames=("rate", "interpret"))
def true_peak_pallas(x, n_valid, rate: int, interpret: bool = False):
    """x: (..., N) raw samples, n_valid broadcastable to rows.

    Returns (true_peak (...,), sample_peak (...,)). N % BLK == 0.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    factor = C.true_peak_factor(rate)
    batch = x.shape[:-1]
    n = x.shape[-1]
    rows = int(np.prod(batch) or 1)
    x2 = x.reshape(rows, n)
    nva = jnp.asarray(n_valid, jnp.int32)
    if nva.ndim == 0:
        nv = jnp.full((rows, 1), nva, jnp.int32)
    else:
        # per-track n_valid (leading batch dim) expands over the rest
        nv = jnp.repeat(nva.reshape(-1), rows // nva.size).reshape(rows, 1)
    if factor == 1:  # >=192 kHz: no oversampling, no tiling constraint
        pos = jnp.arange(n)[None, :]
        xm = jnp.where(pos < nv, x2, 0.0)
        sp = jnp.max(jnp.abs(xm), axis=-1).reshape(batch)
        return sp, sp

    blk = pick_block(n)
    assert blk is not None, "pallas true peak requires N divisible by 128"
    nblocks = n // blk

    rt = _row_tile(rows)
    # sub-blocks per grid step (x tile + shifted copies + prev scratch)
    from soundscope_tpu.ops.pallas_iir import pick_kpg

    kpg = pick_kpg(nblocks, rt * blk * 4 * 3, kmax=24)
    nsteps = nblocks // kpg
    kernel, ctx = _make_kernel(factor, nsteps, rt, blk, kpg)
    tp, sp = pl.pallas_call(
        kernel,
        grid=(rows // rt, nsteps),
        in_specs=[
            pl.BlockSpec((rt, kpg * blk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rt, blk), jnp.float32),  # prev sub-block (FIR context)
            pltpu.VMEM((rt, 1), jnp.float32),
            pltpu.VMEM((rt, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, nv)
    return tp.reshape(batch), sp.reshape(batch)
