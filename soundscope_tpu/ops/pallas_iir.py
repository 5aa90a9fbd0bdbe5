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



def pick_kpg(nblocks: int, bytes_per_block: int, kmax: int = 32,
             vmem_cap: int = 8 << 20) -> int:
    """Blocks per grid step: the largest divisor of nblocks <= kmax whose
    per-step tile bytes stay within a conservative VMEM budget (shared
    policy for the energy and true-peak kernels)."""
    for k in range(min(nblocks, kmax), 1, -1):
        if nblocks % k == 0 and bytes_per_block * k <= vmem_cap:
            return k
    return 1


def _prefix_footprint(k, rows, b, B, ns, tp_kp: int = 0) -> int:
    """Total VMEM bytes the blocked-prefix kernel needs at kpg=k: the
    double-buffered x/z tiles PLUS the broadcast constants (wt_big and
    ot_big grow O(k^2), ~3.3 MB each at k=25/B=512/ns=4) and the
    (rows, k*B) y_state intermediate — the tile-only estimate undercounts
    by >2x at large k. `tp_kp` > 0 adds the fused true-peak variant's
    live buffers (per-phase accumulators + masked/context sub-blocks)."""
    tile = (rows + b) * k * B * 4 * 2          # x in + z out, double-buffered
    const = (2 * k * B * k * ns                # wt_big + ot_big
             + (k * ns) ** 2                   # t_big
             + (2 * k + 1) * ns * ns           # p_big + tend + ab_k
             + 2 * B * B) * 4                  # tt + tt_lo
    inter = rows * k * B * 4                   # y_state
    tp = 8 * rows * B * 4 if tp_kp else 0      # accs + xm/xp/shift temps
    return tile + const + inter + tp


def prefix_constants(bf_Wt, bf_Ot, A_pows, B, kpg, ns):
    """Precomputed operands shared by the blocked-prefix energy kernels
    (plain and fused-TP): block powers of A_B as right-multiplying
    transposes, assembled into the block-diagonal injection matrices and
    the strict-block-lower-triangular prefix/carry matrices.

    Returns (wt_big, ot_big, t_big, p_big, tend, ab_k). The per-block
    advance is A_pows[B] (the table is indexed by SAMPLES)."""
    ab_blk = A_pows[B]
    mats = [jnp.eye(ns, dtype=jnp.float32)]
    for _ in range(kpg):
        mats.append(mats[-1] @ ab_blk)
    abt = {k: jnp.transpose(mats[k]) for k in range(kpg + 1)}

    def _blockdiag(m, reps):
        out = jnp.zeros((reps * m.shape[0], reps * m.shape[1]), m.dtype)
        for i in range(reps):
            out = out.at[i * m.shape[0]:(i + 1) * m.shape[0],
                         i * m.shape[1]:(i + 1) * m.shape[1]].set(m)
        return out

    wt_big = _blockdiag(bf_Wt, kpg)                  # (kpg*B, kpg*ns)
    ot_big = _blockdiag(bf_Ot, kpg)                  # (kpg*ns, kpg*B)
    t_big = jnp.zeros((kpg * ns, kpg * ns), jnp.float32)
    p_big = jnp.zeros((ns, kpg * ns), jnp.float32)
    tend = jnp.zeros((kpg * ns, ns), jnp.float32)
    for i in range(kpg):
        for jb in range(i + 1, kpg):
            t_big = t_big.at[i * ns:(i + 1) * ns,
                             jb * ns:(jb + 1) * ns].set(abt[jb - 1 - i])
        tend = tend.at[i * ns:(i + 1) * ns, :].set(abt[kpg - 1 - i])
    for jb in range(kpg):
        p_big = p_big.at[:, jb * ns:(jb + 1) * ns].set(abt[jb])
    return wt_big, ot_big, t_big, p_big, tend, abt[kpg]


def pick_kpg_prefix(nb: int, rows: int, b: int, B: int, ns: int,
                    kmax: int = 32, vmem_cap: int = 14 << 20,
                    tp_kp: int = 0) -> int:
    """kpg for the blocked-prefix energy kernel: largest divisor of nb
    whose FULL footprint (tiles + block-diagonal constants +
    intermediates) fits the ~16 MB/core VMEM with headroom. The bench
    shape (rows=64, b=32, B=512, nb=5625) picks 15 (~13.0 MiB), same as
    the tile-only policy — but shapes whose constants blow the budget now
    step down instead of failing Mosaic allocation."""
    for k in range(min(nb, kmax), 1, -1):
        if nb % k == 0 and _prefix_footprint(k, rows, b, B, ns,
                                             tp_kp) <= vmem_cap:
            return k
    return 1


def toeplitz_dot(x, tt_ref, ttlo_ref, mode):
    """The kernels' Toeplitz product. f32 operands force Mosaic's 6-pass
    MXU sequence regardless of `precision` (measured: DEFAULT ==
    HIGHEST wall time); "bf16x2" splits both operands hi+lo and keeps
    the three significant cross terms — 3 native passes, ~21 of f32's
    24 mantissa bits, f32 accumulation (~2^-21 relative on y; the
    on-chip gate tools/tpu_conformance.py re-verifies)."""
    if mode == "bf16x2":
        tt_hi = tt_ref[:].astype(jnp.bfloat16)
        tt_lo = ttlo_ref[:].astype(jnp.bfloat16)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def bdot(a_, b_):
            return jnp.dot(a_, b_, preferred_element_type=jnp.float32)

        return bdot(x_hi, tt_hi) + bdot(x_hi, tt_lo) + bdot(x_lo, tt_hi)
    return jnp.dot(x, tt_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def weighted_square_rows(y, b, ch, B, w_list):
    """Channel-weighted squared energy: (b*ch, B) -> (b, B)."""
    yc = y.reshape(b, ch, B)
    z = jnp.zeros((b, B), jnp.float32)
    for c in range(ch):
        if w_list[c] == 0.0:
            continue
        z = z + w_list[c] * (yc[:, c] * yc[:, c])
    return z


def _masked_grouped(z, col, nv, group, b, B):
    """Mask z at sample granularity, then pre-reduce `group` samples.

    Emitting (b, B/group) instead of (b, B) cuts the kernel's HBM
    writes group-fold AND removes the layout-repack while-loop XLA
    otherwise emits for the downstream (b, nb, h) sub-block reduction
    (measured ~20% of bench device time in the round-3 chip trace).
    group must divide the 100 ms sub-block h so the regrouped sums
    stay exact."""
    z = jnp.where(col < nv, z, 0.0)
    if group == 1:
        return z
    # Mosaic rejects the (b, B/g, g) shape-cast on real TPUs; a 0/1
    # pooling matmul sums the lane groups on the MXU instead
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B // group), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B // group), 1)
    pool = (rows // group == cols).astype(jnp.float32)
    return jnp.dot(z, pool, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _energy_kernel_factory(b, ch, weights, kpg, B, group):
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
        for i in range(kpg):
            x = x_ref[:, i * B: (i + 1) * B]  # (b*ch, B)
            y0 = toeplitz_dot(x, tt_ref, ttlo_ref, mode)
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
            z = weighted_square_rows(y, b, ch, B, w_list)
            Bg = B // group
            z_ref[:, i * Bg: (i + 1) * Bg] = _masked_grouped(
                z, col, nv_ref[:], group, b, B)
        s_scratch[:] = s

    return kernel


@functools.partial(jax.jit, static_argnames=("weights", "interpret", "group"))
def kweight_energy_pallas(bf_Tt, bf_Wt, bf_Ot, bf_ABt, x, n_valid, weights,
                          interpret=False, group=1):
    """Fused filter + mask + weighted-square + channel-sum.

    x: (b, ch, N) raw samples, n_valid: (b,), weights: static tuple of
    per-channel BS.1770 weights. Returns z: (b, N // group) — the
    channel-weighted squared K-weighted signal, pre-summed over `group`
    samples (group=1 keeps raw z) — without ever materialising y in HBM.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if x.ndim == 2:  # rows layout: (b*ch, N), channel-minor
        ch = len(weights)
        b, n = x.shape[0] // ch, x.shape[1]
    else:
        b, ch, n = x.shape

    B = bf_Tt.shape[0]
    nb = n // B
    n_state = bf_Wt.shape[1]
    x2 = x.reshape(b * ch, n)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(b, 1)
    # blocks per grid step: double-buffered x+z tile bytes
    kpg = pick_kpg(nb, (b * ch + b) * B * 4 * 2)
    kernel = _energy_kernel_factory(b, ch, weights, kpg, B, group)
    # residual of the Toeplitz after bf16 truncation (the bf16x2 split's
    # low term); costs one extra (B, B) constant in VMEM
    tt_lo = bf_Tt - bf_Tt.astype(jnp.bfloat16).astype(jnp.float32)
    Bg = B // group
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
        out_specs=pl.BlockSpec((b, kpg * Bg), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n // group), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b * ch, n_state), jnp.float32)],
        interpret=interpret,
    )(x2, nv, bf_Tt, tt_lo, bf_Wt, bf_Ot, bf_ABt)
    return z


def _energy_prefix_kernel_factory(b, ch, weights, kpg, B, ns, group,
                                  tp_taps=None, nsteps=None):
    """When `tp_taps` (an (F, Kp) polyphase matrix) is given, the kernel
    additionally computes the BS.1770 true peak and sample peak on the
    SAME x sub-blocks. The FIR is pure VPU work (rolls + FMAs) while the
    energy prefix is MXU matmuls — the core dual-issues the two units,
    so the fused kernel hides most of the standalone true-peak kernel's
    wall time AND reads the GB-scale input from HBM once instead of
    twice."""
    import os

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w_list = [float(v) for v in weights]
    mode = os.environ.get("SS_ENERGY_PREC", "bf16x2")
    hiP = jax.lax.Precision.HIGHEST
    rows = b * ch
    if tp_taps is not None:
        F, Kp = tp_taps.shape

    def kernel(x_ref, nv_ref, *rest):
        if tp_taps is not None:
            (nvr_ref, tt_ref, ttlo_ref, wtb_ref, tbig_ref, pbig_ref,
             otb_ref, tend_ref, abk_ref, z_ref, tp_ref, sp_ref,
             s_carry, prev, run_tp, run_sp) = rest
        else:
            (tt_ref, ttlo_ref, wtb_ref, tbig_ref, pbig_ref,
             otb_ref, tend_ref, abk_ref, z_ref, s_carry) = rest
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            s_carry[:] = jnp.zeros_like(s_carry)
            if tp_taps is not None:
                prev[:] = jnp.zeros_like(prev)
                run_tp[:] = jnp.zeros_like(run_tp)
                run_sp[:] = jnp.zeros_like(run_sp)

        j = pl.program_id(0)
        x = x_ref[:]                               # (rows, kpg*B)
        sc = s_carry[:]                            # (rows, ns)

        # all kpg block states at once: W_all = x @ block-diag(Wt);
        # s_all = W_all @ T_big (strict block-lower powers of A_B)
        #       + s_carry @ P_big (A_B^j per block) — ONE issue each,
        # so the only cross-step dependency left is the tiny carry.
        w_all = jnp.dot(x, wtb_ref[:], preferred_element_type=jnp.float32,
                        precision=hiP)             # (rows, kpg*ns)
        s_all = (
            jnp.dot(w_all, tbig_ref[:], preferred_element_type=jnp.float32,
                    precision=hiP)
            + jnp.dot(sc, pbig_ref[:], preferred_element_type=jnp.float32,
                      precision=hiP)
        )
        # state-driven output for every block: block-diag(Ot)
        y_state = jnp.dot(s_all, otb_ref[:], preferred_element_type=jnp.float32,
                          precision=hiP)           # (rows, kpg*B)

        # carry to the next grid step (2 tiny matmuls, the whole chain)
        s_carry[:] = (
            jnp.dot(sc, abk_ref[:], preferred_element_type=jnp.float32,
                    precision=hiP)
            + jnp.dot(w_all, tend_ref[:], preferred_element_type=jnp.float32,
                      precision=hiP)
        )

        if tp_taps is not None:
            colL = jax.lax.broadcasted_iota(jnp.int32, (rows, B), 1)
            xp = prev[:]
            tp_blk = jnp.zeros((rows, 1), jnp.float32)
            sp_blk = jnp.zeros((rows, 1), jnp.float32)

        for i in range(kpg):
            xi = x[:, i * B: (i + 1) * B]
            y0 = toeplitz_dot(xi, tt_ref, ttlo_ref, mode)
            y = y0 + y_state[:, i * B: (i + 1) * B]
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (b, B), 1)
                + (j * kpg + i) * B
            )
            z = weighted_square_rows(y, b, ch, B, w_list)
            Bg = B // group
            z_ref[:, i * Bg: (i + 1) * Bg] = _masked_grouped(
                z, col, nv_ref[:], group, b, B)

            if tp_taps is not None:
                # --- fused true peak over the same sub-block (VPU) ---
                validr = colL + (j * kpg + i) * B < nvr_ref[:]
                xm = jnp.where(validr, xi, 0.0)
                sp_blk = jnp.maximum(
                    sp_blk, jnp.max(jnp.abs(xm), axis=1, keepdims=True))
                # shifted-by-k sub-block: roll(xm, k) except the first k
                # columns, which come from the END of the previous
                # sub-block (select the prev tail BEFORE rolling — one
                # vector op cheaper than selecting between two rolls).
                # Loop order (k outer, phases inner) keeps only F
                # accumulators + one shift live in VMEM.
                accs = [jnp.zeros((rows, B), jnp.float32)
                        for _ in range(F)]
                for k in range(Kp):
                    if k == 0:
                        sh = xm
                    else:
                        sh = pltpu.roll(
                            jnp.where(colL >= B - k, xp, xm), k, 1)
                    for p in range(F):
                        hk = float(tp_taps[p, k])
                        if hk != 0.0:
                            accs[p] = accs[p] + hk * sh
                for p in range(F):
                    acc = jnp.where(validr, accs[p], 0.0)
                    tp_blk = jnp.maximum(
                        tp_blk,
                        jnp.max(jnp.abs(acc), axis=1, keepdims=True))
                xp = xm

        if tp_taps is not None:
            run_sp[:] = jnp.maximum(run_sp[:], sp_blk)
            run_tp[:] = jnp.maximum(run_tp[:], tp_blk)
            prev[:] = xp

            @pl.when(j == nsteps - 1)
            def _():
                tp_ref[:] = jnp.maximum(run_tp[:], run_sp[:])
                sp_ref[:] = run_sp[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("weights", "interpret", "group"))
def kweight_energy_pallas_prefix(bf_Tt, bf_Wt, bf_Ot, A_pows, x, n_valid,
                                 weights, interpret=False, group=1):
    """Blocked-prefix variant of `kweight_energy_pallas`.

    The sequential kernel chains kpg state updates per grid step, so its
    wall time is bound by small-matmul issue latency, not FLOPs or HBM
    (measured ~11 ms for the 32x2x60 s bench shape at any block size).
    Here the per-step state prefix is ONE matmul against a precomputed
    strict-block-lower-triangular matrix of A_B powers, the per-block
    output injection is one block-diagonal matmul, and the only
    remaining cross-step dependency is a (rows, 4) carry — two tiny
    matmuls per step. Same algebra as the A_pows machinery elsewhere;
    numerics re-verified by tools/tpu_conformance.py on chip.

    `A_pows` is bf.A_pows — (block+1, ns, ns) with A_pows[k] = A_B^k (as
    left-multiplying matrices; states are row vectors, so the kernel
    uses transposes).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if x.ndim == 2:  # rows layout: (b*ch, N), channel-minor
        ch = len(weights)
        b, n = x.shape[0] // ch, x.shape[1]
    else:
        b, ch, n = x.shape
    B = bf_Tt.shape[0]
    nb = n // B
    ns = bf_Wt.shape[1]
    rows = b * ch
    x2 = x.reshape(rows, n)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(b, 1)

    kpg = pick_kpg_prefix(nb, rows, b, B, ns)

    wt_big, ot_big, t_big, p_big, tend, ab_k = prefix_constants(
        bf_Wt, bf_Ot, A_pows, B, kpg, ns)

    kernel = _energy_prefix_kernel_factory(b, ch, weights, kpg, B, ns, group)
    tt_lo = bf_Tt - bf_Tt.astype(jnp.bfloat16).astype(jnp.float32)
    Bg = B // group
    z = pl.pallas_call(
        kernel,
        grid=(nb // kpg,),
        in_specs=[
            pl.BlockSpec((rows, kpg * B), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * B, kpg * ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * ns, kpg * ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, kpg * ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * ns, kpg * B), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * ns, ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, kpg * Bg), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n // group), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, ns), jnp.float32)],
        interpret=interpret,
    )(x2, nv, bf_Tt, tt_lo, wt_big, t_big, p_big, ot_big, tend, ab_k)
    return z


@functools.partial(jax.jit,
                   static_argnames=("weights", "rate", "interpret", "group"))
def kweight_energy_tp_pallas_prefix(bf_Tt, bf_Wt, bf_Ot, A_pows, x, n_valid,
                                    weights, rate, interpret=False, group=1):
    """Fused blocked-prefix energy + BS.1770 true/sample peak.

    Same contract as `kweight_energy_pallas_prefix` plus the true-peak
    outputs of `ops.pallas_truepeak.true_peak_pallas`: returns
    (z (b, n // group), tp (rows,), sp (rows,)). One kernel reads the
    GB-scale input once; the FIR's VPU work overlaps the prefix matmuls'
    MXU work (the two standalone kernels serialise those units)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from soundscope_tpu.core import constants as C
    from soundscope_tpu.ops.truepeak import _polyphase_taps

    if x.ndim == 2:  # rows layout: (b*ch, N), channel-minor
        ch = len(weights)
        b, n = x.shape[0] // ch, x.shape[1]
    else:
        b, ch, n = x.shape
    factor = C.true_peak_factor(rate)
    assert factor > 1, "fused TP path needs an oversampling factor"
    tp_taps = _polyphase_taps(factor)
    B = bf_Tt.shape[0]
    nb = n // B
    ns = bf_Wt.shape[1]
    rows = b * ch
    x2 = x.reshape(rows, n)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(b, 1)
    # per-row validity for the peak (channel-minor rows share the track's
    # n_valid)
    nvr = jnp.repeat(nv, ch, axis=0)

    kpg = pick_kpg_prefix(nb, rows, b, B, ns, tp_kp=tp_taps.shape[1])

    wt_big, ot_big, t_big, p_big, tend, ab_k = prefix_constants(
        bf_Wt, bf_Ot, A_pows, B, kpg, ns)

    nsteps = nb // kpg
    kernel = _energy_prefix_kernel_factory(b, ch, weights, kpg, B, ns,
                                           group, tp_taps=tp_taps,
                                           nsteps=nsteps)
    tt_lo = bf_Tt - bf_Tt.astype(jnp.bfloat16).astype(jnp.float32)
    Bg = B // group
    z, tp, sp = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((rows, kpg * B), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * B, kpg * ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * ns, kpg * ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, kpg * ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * ns, kpg * B), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * ns, ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, kpg * Bg), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n // group), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, ns), jnp.float32),
            pltpu.VMEM((rows, B), jnp.float32),   # prev sub-block (FIR ctx)
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, nv, nvr, bf_Tt, tt_lo, wt_big, t_big, p_big, ot_big, tend, ab_k)
    return z, tp.reshape(rows), sp.reshape(rows)


def kweight_energy_tp_eligible(n, b, ch, B, ns, rate) -> bool:
    """The fused energy+true-peak kernel applies when the prefix variant
    would be chosen anyway and the rate needs oversampling.

    Output grouping is deliberately absent: it only SHRINKS the z tile,
    so the conservative footprint here stays valid for any group, and
    keeping the kpg policy identical to the kernels' own picks is what
    makes this predicate trustworthy."""
    from soundscope_tpu.core import constants as C
    from soundscope_tpu.ops.truepeak import _polyphase_taps

    factor = C.true_peak_factor(rate)
    if factor <= 1 or n % B != 0:
        return False
    # Row-count guard: _prefix_footprint undercounts the fused variant's
    # scoped VMEM at high row counts (measured: rows=128, B=512, kpg=8
    # -> Mosaic allocates 18.93M against the 16M scoped limit while the
    # model says 13.6M — liveness of the masked/context tile copies
    # scales with kpg in ways the static model misses). rows=64 (the
    # 32x60 s bench shape, kpg=15) is chip-validated; larger batches go
    # through the chunked frames kernel (bounded by chunked_plan) or
    # the standalone pair.
    if b * ch > 64:
        return False
    kpg = pick_kpg_prefix(n // B, b * ch, b, B, ns,
                          tp_kp=_polyphase_taps(factor).shape[1])
    return kpg >= 4


def kweight_energy_pallas_auto(bf_Tt, bf_Wt, bf_Ot, A_pows, x, n_valid,
                               weights, interpret=False, group=1):
    """Pick the energy kernel by shape: the blocked-prefix variant wins
    when several blocks share a grid step (its per-step prefix matmuls
    amortise), but at kpg == 1 — e.g. the 1000-track library scan,
    whose nb has no small divisors within the VMEM budget — it is pure
    overhead over the sequential chain (measured 180 ms vs 146 ms per
    scan), so fall back to the sequential kernel there."""
    if x.ndim == 2:  # rows layout: (b*ch, N), channel-minor
        ch = len(weights)
        b, n = x.shape[0] // ch, x.shape[1]
    else:
        b, ch, n = x.shape
    B = bf_Tt.shape[0]
    nb = n // B
    kpg = pick_kpg_prefix(nb, b * ch, b, B, bf_Wt.shape[1])
    if kpg >= 4:
        return kweight_energy_pallas_prefix(bf_Tt, bf_Wt, bf_Ot, A_pows,
                                            x, n_valid, weights,
                                            interpret=interpret, group=group)
    return kweight_energy_pallas(bf_Tt, bf_Wt, bf_Ot,
                                 jnp.transpose(A_pows[B]), x, n_valid,
                                 weights, interpret=interpret, group=group)


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
