"""Pallas TPU kernel for blocked state-space IIR filtering.

The XLA path (ops/biquad.py) resolves the inter-block state dependency
with `lax.associative_scan` — log-depth but O(nb) extra 4x4 matmul work
and a materialised (nb, 4, 4) cumulative-product tensor. On TPU, Pallas
grid steps execute IN ORDER, so the filter state can simply be CARRIED in
a VMEM scratch buffer across grid iterations:

    grid step j (block j):
        y_j = x_j @ T^T + s @ O^T        (MXU matmul, batch-major)
        s   = s @ A_B^T + x_j @ W^T      (tiny VMEM update)

One pass, no scan tree, no cumM tensor; the batch dimension makes every
grid step a full (BATCH, B) @ (B, B) MXU matmul while input/output blocks
stream HBM<->VMEM through the automatic pipeline.

Falls back to ops/biquad.block_iir off-TPU (the kernel also runs in
interpret mode for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.ops.biquad import BlockFilter


def _iir_kernel(x_ref, tt_ref, wt_ref, ot_ref, ab_ref, y_ref, s_scratch):
    import jax.experimental.pallas as pl

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        s_scratch[:] = jnp.zeros_like(s_scratch)

    x = x_ref[:]                       # (BATCH, B)
    s = s_scratch[:]                   # (BATCH, n)
    y_ref[:] = (
        jnp.dot(x, tt_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(s, ot_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    )
    s_scratch[:] = (
        jnp.dot(s, ab_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(x, wt_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(bf_Tt, bf_Wt, bf_Ot, bf_ABt, x2d, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, n_total = x2d.shape
    B = bf_Tt.shape[0]
    nb = n_total // B
    n_state = bf_Wt.shape[1]

    y = pl.pallas_call(
        _iir_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((batch, B), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n_state), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_state, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_state, n_state), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, B), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n_total), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch, n_state), jnp.float32)],
        interpret=interpret,
    )(x2d, bf_Tt, bf_Wt, bf_Ot, bf_ABt)
    return y


def _energy_kernel_factory(b, ch, weights, kpg, B):
    """kpg = IIR blocks per grid step. The state recurrence serialises the
    grid, so per-step overhead (grid bookkeeping + DMA latency) dominates
    with one 512-sample block per step; carrying the state through `kpg`
    blocks inside one step amortises it over a kpg-times-fatter DMA
    (measured grid/DMA-bound, commit 436173a)."""
    import os

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w_list = [float(v) for v in weights]
    # Toeplitz matmul mode. The f32 (64+, B)@(B, B) dot is the kernel's
    # floor: Mosaic lowers f32 operands to the full 6-pass MXU sequence
    # regardless of the `precision` flag (measured: DEFAULT == HIGHEST
    # wall time). "bf16x2" splits BOTH operands into hi+lo bf16 and keeps
    # the three significant cross terms — 3 native passes, ~21 of f32's
    # 24 mantissa bits, f32 accumulation. Error bound ~2^-21 relative on
    # y, orders of magnitude inside the 0.1 LU budget (the on-chip gate
    # tools/tpu_conformance.py re-verifies the shipped setting).
    mode = os.environ.get("SS_ENERGY_PREC", "bf16x2")
    hiP = jax.lax.Precision.HIGHEST

    def kernel(x_ref, nv_ref, tt_ref, ttlo_ref, wt_ref, ot_ref, ab_ref,
               z_ref, s_scratch):
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            s_scratch[:] = jnp.zeros_like(s_scratch)

        j = pl.program_id(0)
        s = s_scratch[:]
        wt, ot, ab = wt_ref[:], ot_ref[:], ab_ref[:]
        if mode == "bf16x2":
            tt_hi = tt_ref[:].astype(jnp.bfloat16)
            tt_lo = ttlo_ref[:].astype(jnp.bfloat16)
        else:
            tt = tt_ref[:]
        for i in range(kpg):
            x = x_ref[:, i * B: (i + 1) * B]  # (b*ch, B)
            if mode == "bf16x2":
                x_hi = x.astype(jnp.bfloat16)
                x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

                def bdot(a_, b_):
                    return jnp.dot(a_, b_, preferred_element_type=jnp.float32)

                y0 = bdot(x_hi, tt_hi) + bdot(x_hi, tt_lo) + bdot(x_lo, tt_hi)
            else:
                y0 = jnp.dot(x, tt, preferred_element_type=jnp.float32,
                             precision=hiP)
            y = y0 + jnp.dot(s, ot, preferred_element_type=jnp.float32,
                             precision=hiP)
            s = (
                jnp.dot(s, ab, preferred_element_type=jnp.float32,
                        precision=hiP)
                + jnp.dot(x, wt, preferred_element_type=jnp.float32,
                          precision=hiP)
            )
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (b, B), 1)
                + (j * kpg + i) * B
            )
            yc = y.reshape(b, ch, B)
            z = jnp.zeros((b, B), jnp.float32)
            for c in range(ch):
                if w_list[c] == 0.0:
                    continue
                z = z + w_list[c] * (yc[:, c] * yc[:, c])
            z_ref[:, i * B: (i + 1) * B] = jnp.where(col < nv_ref[:], z, 0.0)
        s_scratch[:] = s

    return kernel


@functools.partial(jax.jit, static_argnames=("weights", "interpret"))
def kweight_energy_pallas(bf_Tt, bf_Wt, bf_Ot, bf_ABt, x, n_valid, weights,
                          interpret=False):
    """Fused filter + mask + weighted-square + channel-sum.

    x: (b, ch, N) raw samples, n_valid: (b,), weights: static tuple of
    per-channel BS.1770 weights. Returns z: (b, N) — the channel-weighted
    squared K-weighted signal — without ever materialising y in HBM.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, ch, n = x.shape
    B = bf_Tt.shape[0]
    nb = n // B
    n_state = bf_Wt.shape[1]
    x2 = x.reshape(b * ch, n)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(b, 1)
    # blocks per grid step: the largest divisor of nb whose double-buffered
    # x+z tiles stay within a conservative VMEM budget
    vmem_cap = 8 << 20
    kpg = 1
    for k in range(min(nb, 32), 1, -1):
        if nb % k == 0 and (b * ch + b) * k * B * 4 * 2 <= vmem_cap:
            kpg = k
            break
    kernel = _energy_kernel_factory(b, ch, weights, kpg, B)
    # residual of the Toeplitz after bf16 truncation (the bf16x2 split's
    # low term); costs one extra (B, B) constant in VMEM
    tt_lo = bf_Tt - bf_Tt.astype(jnp.bfloat16).astype(jnp.float32)
    z = pl.pallas_call(
        kernel,
        grid=(nb // kpg,),
        in_specs=[
            pl.BlockSpec((b * ch, kpg * B), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n_state), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_state, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_state, n_state), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, kpg * B), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b * ch, n_state), jnp.float32)],
        interpret=interpret,
    )(x2, nv, bf_Tt, tt_lo, bf_Wt, bf_Ot, bf_ABt)
    return z


def block_iir_pallas(bf: BlockFilter, x: jnp.ndarray, interpret: bool = False):
    """Zero-initial-state filtering of (..., N) with N % block == 0.

    Returns y (..., N). State starts at zero (the offline whole-file
    case); for streaming with carried state use ops/biquad.block_iir.
    """
    B = bf.block
    n = x.shape[-1]
    assert n % B == 0, "pallas IIR requires N % block == 0"
    batch = x.shape[:-1]
    flat = int(np.prod(batch) or 1)
    x2d = x.reshape(flat, n)
    ABt = bf.A_pows[B].T
    y = _run(bf.Tt, bf.Wt, bf.Ot, ABt, x2d, interpret=interpret)
    return y.reshape(*batch, n)
