"""Chunked-layout fused K-weight energy + true-peak Pallas kernel.

The round-4 chip trace (docs/KERNELS.md) showed 6.9 ms/iter of pure
layout work: XLA lays the (B, ch, N) parameter out T(2,128) and the two
consumers want two INCOMPATIBLE T(8,128) views — the STFT kernel's
frames view (8 consecutive 128-lane chunks of one row per tile) and the
energy/true-peak kernels' rows view (8 different rows per tile). Every
pure-layout escape was measured and loses.

This kernel dissolves the conflict by consuming the FRAMES view
natively: the canonical device array becomes (b, ch, N/128, 128), which
XLA tiles T(8,128) with no relayout, the STFT kernel reads it directly,
and this kernel treats the SUBLANE axis as the block-sequence axis:

    x tile (b, ch, S, 128)  ->  (rows*S, 128) free view
    one (rows*S, 128) @ (128, 128) Toeplitz matmul filters S chunks of
    every signal at once (4x less Toeplitz work than the B=512 rows
    kernel, in far fatter matmuls)

The inter-chunk IIR state dependency runs ALONG SUBLANES: a log-depth
doubling scan of sublane rolls + (.,4)@(4,4) matmuls resolves all S
per-chunk input states per grid step; the only cross-step carry is one
(rows, 4) register, exactly like the rows-layout prefix kernel
(ops/pallas_iir.py). The fused BS.1770 true-peak FIR gets its previous-
chunk context from a single sublane roll (chunk j-1 of signal r IS
sublane r*S+j-1) instead of a carried block.

Gating output: instead of a grouped z stream (whose 32-sample groups
only divide the 48 k-family's 100 ms sub-block), the kernel emits per
grid step and per row TWO scalars — the step's total energy and the
energy before the (at most one, since h >= S*128) 100 ms boundary
inside the step. `subblock_sums_from_steps` then reconstructs EXACT
h-sample sub-block sums for ANY rate with static gathers over the tiny
(rows, nsteps) arrays — this is what makes 44.1 kHz (h = 4410, the
reference's default rate, src/analyzer.rs:34-45) first-class.

Reference behavior: ebur128 `add_frames_f32` + true peak, consumed at
src/analyzer.rs:139-141,159-164.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _scan_shifts(S: int):
    """Doubling-scan shift schedule for group length S (power of two)."""
    assert S & (S - 1) == 0, "chunked kernel needs a power-of-two S"
    ks, k = [], 1
    while k < S:
        ks.append(k)
        k <<= 1
    return ks


def _footprint(rows: int, S: int, F: int) -> int:
    """Conservative VMEM bytes at group length S (f32): input tile
    (double-buffered), previous-chunk scratch, F FIR accumulators plus
    three live shift temps, the energy path's y/z transients, and the
    two (rows, rows*S) selector constants."""
    tile = rows * S * 128 * 4
    sel = 2 * rows * rows * S * 4
    return tile * (2 + 1 + F + 3 + 2) + sel + (2 * 128 * 128 * 4)


def chunked_plan(n: int, nc: int, rows: int, h: int, factor: int,
                 vmem_cap: int = 13 << 20):
    """Pick the sublane group length S, or None if the layout/rate can't
    use the chunked kernel. Constraints: N % 128 == 0, S | nc, S a power
    of two >= 8 (tile alignment), S*128 <= h (at most one 100 ms gating
    boundary per grid step), footprint within VMEM."""
    if n % 128 != 0 or nc * 128 != n:
        return None
    F = max(factor, 1)
    for S in (32, 16, 8):
        # rows*S <= 1024: Mosaic's scoped-stack usage for this kernel is
        # ~14 KB per rows*S unit (measured on chip: rows=80, S=16 ->
        # 17.4M scoped, over the 16M limit; rows*S = 1024 compiles at
        # both rows=64, S=16 — the 32x60 s bench — and rows=128, S=8 —
        # the 64-track CLI bucket). The analytic _footprint below models
        # the pipelined tiles/constants, which are budgeted separately
        # from the scoped stack.
        if (nc % S == 0 and S * 128 <= h and rows * S <= 1024
                and _footprint(rows, S, F) <= vmem_cap):
            return S
    return None


@functools.lru_cache(maxsize=None)
def _selectors(rows: int, S: int):
    """0/1 selector matrices for sublane-axis reductions (the one axis
    Mosaic can't reshape into lanes cheaply): group-sum (rows, rows*S),
    last-of-group (rows, rows*S), and first-of-group (rows, rows*S,
    contracted on the axis that makes each use transpose-free)."""
    m1 = np.zeros((rows, rows * S), np.float32)
    last = np.zeros((rows, rows * S), np.float32)
    first = np.zeros((rows, rows * S), np.float32)
    for r in range(rows):
        m1[r, r * S:(r + 1) * S] = 1.0
        last[r, r * S + S - 1] = 1.0
        first[r, r * S] = 1.0
    return m1, last, first


def _chunked_kernel_factory(b, ch, S, weights, h, ks, tp_taps, nsteps):
    """Kernel body. `ks` is the doubling-scan shift schedule; `tp_taps`
    is the (F, Kp) polyphase matrix or None (no oversampling)."""
    import os

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from soundscope_tpu.ops.pallas_iir import toeplitz_dot

    rows = b * ch
    RS = rows * S
    span = S * 128
    w_list = [float(v) for v in weights]
    uniform_w = all(w == 1.0 for w in w_list)
    mode = os.environ.get("SS_ENERGY_PREC", "bf16x2")
    # perf archaeology ONLY (tools/chunked_microbench.py): disable kernel
    # stages to attribute device time. Produces WRONG results.
    ablate = set(filter(None, os.environ.get(
        "SS_CHUNKED_ABLATE", "").split(",")))
    # SS_TP_MXU=1 (EXPERIMENTAL): compute the polyphase FIR as two bf16
    # MXU matmuls against banded (128, F*128) tap matrices instead of
    # the per-tap VPU roll/FMA schedule — leaves the VPU issue floor
    # (5.56 ms/iter measured) for MXU rate (~1.9 ms expected) at a
    # fidelity cost: single-rounded bf16 x and taps put the true peak
    # ~0.02 dB worst-case from exact (budget: 0.1 dB). Interpret-
    # validated; real-chip Mosaic compile is very slow at bench-scale
    # grids and is unbenchmarked (docs/KERNELS.md round-5 cont.).
    # Default OFF — the headline keeps the exact FIR.
    tp_mxu = os.environ.get("SS_TP_MXU", "0") == "1"
    hiP = jax.lax.Precision.HIGHEST
    if tp_taps is not None:
        F, Kp = tp_taps.shape

    use_mxu_fir = tp_mxu and tp_taps is not None

    def kernel(*refs):
        (x_ref, nvr_ref, tt_ref, ttlo_ref, wt_ref, ot_ref,
         abt_ref, m1_ref, last_ref, first_ref) = refs[:10]
        if use_mxu_fir:
            hm_ref, hp_ref = refs[10:12]
            rest = refs[12:]
        else:
            rest = refs[10:]
        sums_ref, tp_ref, sp_ref, carry, prev_x, run_tp, run_sp = rest
        j = pl.program_id(0)
        ns = wt_ref.shape[1]

        @pl.when(j == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)
            prev_x[:] = jnp.zeros_like(prev_x)
            run_tp[:] = jnp.zeros_like(run_tp)
            run_sp[:] = jnp.zeros_like(run_sp)

        x = x_ref[:].reshape(RS, 128)          # leading-dim merge (free)
        sub = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 1)
        jg = sub % S                           # chunk index within group
        # global sample index of every element this step
        g = (j * S + jg) * 128 + lane
        valid = g < nvr_ref[:]

        def dg(a, bb, dims):
            return jax.lax.dot_general(
                a, bb, (dims, ((), ())),
                preferred_element_type=jnp.float32, precision=hiP)

        # ---- K-weight filter: S chunks per signal in one batch -------
        # The inter-chunk state scan runs in TRANSPOSED (ns, RS) layout:
        # the chunk axis lives on LANES, so every roll in the doubling
        # scan is a cheap lane shift instead of a cross-sublane shuffle
        # (measured 7.6 ms/iter of the 32x60 s bench in the sublane
        # orientation — docs/KERNELS.md round 5). dot_general contraction
        # axes are picked so NOTHING is ever transposed in VMEM.
        y0 = toeplitz_dot(x, tt_ref, ttlo_ref, mode)      # (RS, 128)
        # w_inT[m, q] = sum_l x[q, l] Wt[l, m]            # (ns, RS)
        w_inT = dg(wt_ref[:], x, ((0,), (1,)))
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (ns, RS), 1) % S
        # V[j] = W[j-1] within the group; V[0] = the carried state,
        # scattered to group starts (carryT @ first)
        carry_rep = dg(carry[:], first_ref[:], ((1,), (0,)))  # (ns, RS)
        s = jnp.where(lane_q == 0, carry_rep, pltpu.roll(w_inT, 1, 1))
        if "scan" not in ablate:
            # doubling scan: s[:, q] <- sum_{i<=q} (A^128)^(q-i) V[:, i];
            # abt[k] = ((A^128)^(2^k))^T, so contracting its FIRST axis
            # applies the untransposed power on the left.
            for ki, k in enumerate(ks):
                adv = dg(abt_ref[ki], pltpu.roll(s, k, 1), ((0,), (0,)))
                s = s + jnp.where(lane_q >= k, adv, 0.0)
        # y = y0 + s^T Ot: contract the state axis of both (no transpose)
        y = y0 + dg(s, ot_ref[:], ((0,), (0,)))           # (RS, 128)
        # cross-step carry: state AFTER the group's last chunk
        s_out_last = dg(abt_ref[0], s, ((0,), (0,))) + w_inT
        if "carry" not in ablate:
            carry[:] = dg(s_out_last, last_ref[:], ((1,), (1,)))  # (ns, rows)

        # ---- gating energies: step totals + pre-boundary split -------
        z = y * y
        if not uniform_w:
            cidx = (sub // S) % ch
            wv = jnp.full((RS, 128), w_list[0], jnp.float32)
            for c in range(1, ch):
                wv = jnp.where(cidx == c, jnp.float32(w_list[c]), wv)
            z = z * wv
        z = jnp.where(valid, z, 0.0)
        # the unique 100 ms boundary inside [j*span, (j+1)*span), if any
        step_start = j * span
        bound = ((step_start + h - 1) // h) * h
        bound = jnp.minimum(bound, step_start + span)
        zs = jnp.sum(z, axis=1, keepdims=True)                    # (RS, 1)
        zl = jnp.sum(jnp.where(g < bound, z, 0.0), axis=1, keepdims=True)
        sums_ref[0, :, 0:1] = jnp.dot(m1_ref[:], zs,
                                      preferred_element_type=jnp.float32,
                                      precision=hiP)
        sums_ref[0, :, 1:2] = jnp.dot(m1_ref[:], zl,
                                      preferred_element_type=jnp.float32,
                                      precision=hiP)

        # ---- fused true peak / sample peak (VPU) ----------------------
        xm = jnp.where(valid, x, 0.0)
        run_sp[:] = jnp.maximum(
            run_sp[:], jnp.max(jnp.abs(xm), axis=1, keepdims=True))
        if tp_taps is not None and "fir" not in ablate:
            # previous 128-sample chunk per sublane: an in-step sublane
            # roll for j>0; the carried previous step's last chunk
            # (sublane r*S + S - 1 -> r*S) for j == 0
            if "xp" in ablate:
                xp = xm
            else:
                xp = jnp.where(
                    jg == 0,
                    pltpu.roll(prev_x[:], RS + 1 - S, 0),
                    pltpu.roll(xm, 1, 0),
                )
            if use_mxu_fir:
                # banded-matmul FIR: all F phases in one (RS, F*128)
                # output, current chunk against the in-band taps plus
                # the previous chunk against the wrap taps
                accf = (dg(xm.astype(jnp.bfloat16), hm_ref[:], ((1,), (0,)))
                        + dg(xp.astype(jnp.bfloat16), hp_ref[:],
                             ((1,), (0,))))
                lane4 = jax.lax.broadcasted_iota(
                    jnp.int32, (RS, F * 128), 1) % 128
                sub4 = jax.lax.broadcasted_iota(
                    jnp.int32, (RS, F * 128), 0)
                g4 = (j * S + sub4 % S) * 128 + lane4
                accf = jnp.where(g4 < nvr_ref[:], jnp.abs(accf), 0.0)
                run_tp[:] = jnp.maximum(
                    run_tp[:], jnp.max(accf, axis=1, keepdims=True))
            else:
                accs = [jnp.zeros((RS, 128), jnp.float32) for _ in range(F)]
                for k in range(Kp):
                    if k == 0:
                        sh = xm
                    else:
                        sh = pltpu.roll(
                            jnp.where(lane >= 128 - k, xp, xm), k, 1)
                    for p in range(F):
                        hk = float(tp_taps[p, k])
                        if hk != 0.0:
                            accs[p] = accs[p] + hk * sh
                tp_blk = run_tp[:]
                for p in range(F):
                    acc = jnp.where(valid, accs[p], 0.0)
                    tp_blk = jnp.maximum(
                        tp_blk, jnp.max(jnp.abs(acc), axis=1, keepdims=True))
                run_tp[:] = tp_blk
            prev_x[:] = xm

        @pl.when(j == nsteps - 1)
        def _():
            # group-max over the S sublanes of each signal (doubling
            # rolls), then extract the last-of-group entry
            t = run_tp[:]
            u = run_sp[:]
            sub1 = jax.lax.broadcasted_iota(jnp.int32, (RS, 1), 0) % S
            for k in ks:
                mk = sub1 >= k
                t = jnp.maximum(t, jnp.where(mk, pltpu.roll(t, k, 0), 0.0))
                u = jnp.maximum(u, jnp.where(mk, pltpu.roll(u, k, 0), 0.0))
            tpv = jnp.dot(last_ref[:], t,
                          preferred_element_type=jnp.float32, precision=hiP)
            spv = jnp.dot(last_ref[:], u,
                          preferred_element_type=jnp.float32, precision=hiP)
            tp_ref[:] = jnp.maximum(tpv, spv)
            sp_ref[:] = spv

    return kernel


@functools.partial(jax.jit, static_argnames=("weights", "rate", "h",
                                             "interpret", "S"))
def kweight_energy_tp_chunked(bf_Tt, bf_Wt, bf_Ot, A_pows, x4, n_valid,
                              weights, rate, h, interpret=False,
                              S: int | None = None):
    """Fused energy + true/sample peak over FRAMES-layout input.

    x4: (b, ch, nc, 128) f32 — the STFT kernel's native view of planar
    samples (chunk c of signal (b, ch) = x4[b, ch, c]). n_valid: (b,).
    h: the 100 ms sub-block length in samples (cfg.subblock). bf_* must
    be built with block == 128 (make_block_filter(ss, 128)).

    Returns (step_sums (rows, nsteps, 2), tp (rows,), sp (rows,)):
    step_sums[..., 0] = the step's total channel-weighted K-energy,
    [..., 1] = the part before the step's (unique) 100 ms boundary.
    Feed to `subblock_sums_from_steps` for exact h-sample sub-block sums.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from soundscope_tpu.core import constants as C
    from soundscope_tpu.ops.truepeak import _polyphase_taps

    b, ch, nc, w128 = x4.shape
    assert w128 == 128 and bf_Tt.shape[0] == 128, \
        "chunked kernel is built on 128-sample chunks"
    rows = b * ch
    n = nc * 128
    factor = C.true_peak_factor(rate)
    tp_taps = _polyphase_taps(factor) if factor > 1 else None
    if S is None:
        S = chunked_plan(n, nc, rows, h, factor)
    assert S is not None and nc % S == 0 and S * 128 <= h
    nsteps = nc // S
    ks = _scan_shifts(S)

    # (A^128)^k transposes for the scan shifts; abt[0] doubles as the
    # single-chunk advance used by the carry update (ks[0] == 1).
    # Built by repeated squaring on traced values (A_pows may be traced
    # under jit); these trace-time 4x4 matmuls are free at runtime.
    abt_list = [jnp.transpose(A_pows[128])]
    for _ in ks[1:]:
        m = jnp.transpose(abt_list[-1])
        abt_list.append(jnp.transpose(
            jnp.matmul(m, m, precision=jax.lax.Precision.HIGHEST)))
    abt = jnp.stack(abt_list)                    # (len(ks), ns, ns)

    m1, last, first = _selectors(rows, S)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(b, 1)
    nvr = jnp.repeat(jnp.repeat(nv, ch, axis=0), S, axis=0)  # (rows*S, 1)

    kernel = _chunked_kernel_factory(b, ch, S, weights, h, ks, tp_taps,
                                     nsteps)
    tt_lo = bf_Tt - bf_Tt.astype(jnp.bfloat16).astype(jnp.float32)
    ns = bf_Wt.shape[1]
    nks = len(ks)

    import os as _os
    use_mxu_fir = (tp_taps is not None
                   and _os.environ.get("SS_TP_MXU", "0") == "1")
    mxu_operands, mxu_specs = (), []
    if use_mxu_fir:
        F, Kp = tp_taps.shape
        Hm = np.zeros((128, F * 128), np.float32)
        Hp = np.zeros((128, F * 128), np.float32)
        for p in range(F):
            for k in range(Kp):
                hv = float(tp_taps[p, k])
                for lo in range(128):
                    m = lo - k
                    if m >= 0:
                        Hm[m, p * 128 + lo] = hv
                    else:
                        Hp[128 + m, p * 128 + lo] = hv
        mxu_operands = (jnp.asarray(Hm, jnp.bfloat16),
                        jnp.asarray(Hp, jnp.bfloat16))
        mxu_specs = [
            pl.BlockSpec((128, F * 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, F * 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    sums, tp, sp = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((b, ch, S, 128), lambda j: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows * S, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, ns), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nks, ns, ns), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, rows * S), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, rows * S), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, rows * S), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + mxu_specs,
        out_specs=[
            pl.BlockSpec((1, rows, 2), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps, rows, 2), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ns, rows), jnp.float32),          # carry (ns, rows)
            pltpu.VMEM((rows * S, 128), jnp.float32),     # prev chunk
            pltpu.VMEM((rows * S, 1), jnp.float32),       # running tp
            pltpu.VMEM((rows * S, 1), jnp.float32),       # running sp
        ],
        interpret=interpret,
    )(x4, nvr, bf_Tt, tt_lo, bf_Wt, bf_Ot, abt, jnp.asarray(m1),
      jnp.asarray(last), jnp.asarray(first), *mxu_operands)
    step_sums = jnp.transpose(sums, (1, 0, 2))   # (rows, nsteps, 2) — tiny
    return step_sums, tp.reshape(rows), sp.reshape(rows)


@functools.lru_cache(maxsize=None)
def _subblock_gather_plan(n: int, h: int, span: int):
    """Static gather indices decomposing each complete h-sample sub-block
    into (right part of its first step) + (full middle steps) + (left
    part of its last step)."""
    nb = n // h
    nsteps = n // span
    k = np.arange(nb, dtype=np.int64)
    b0 = k * h
    b1 = (k + 1) * h
    s0 = (b0 // span).astype(np.int32)
    s1 = (b1 // span).astype(np.int32)
    # s1 == nsteps happens when b1 == n exactly: the sub-block runs to the
    # stream end, so the "middle" must include the FINAL step (cum[nsteps]
    # is a valid index) and there is no partial last step.
    last_ok = s1 < nsteps
    s1c = np.minimum(s1, nsteps - 1).astype(np.int32)
    # NUMPY outputs only: this is an lru_cache, and a jnp.asarray built
    # while tracing is a tracer — reusing it in a later trace of the
    # same shape raises UnexpectedTracerError (hit by the CLI, which
    # traces the same (n, h, span) once for the warm batch and again
    # for each bucket size). NumPy indices fold into each trace as
    # constants.
    return s0, s1.astype(np.int32), s1c, last_ok[None].astype(np.float32)


def subblock_sums_from_steps(step_sums: jnp.ndarray, h: int, span: int,
                             n: int) -> jnp.ndarray:
    """Exact h-sample sub-block sums from the kernel's per-step outputs.

    step_sums: (..., nsteps, 2) with [..., 0] = step total, [..., 1] =
    energy before the step's unique 100 ms boundary (requires h >= span).
    Returns (..., n // h). Works for ANY h — no divisibility constraint —
    which is what keeps 44.1 kHz on the fast path.
    """
    full = step_sums[..., 0]
    left = step_sums[..., 1]
    s0, s1, s1c, ok = _subblock_gather_plan(n, h, span)
    # cum[s] = sum of full[0..s) — middle steps are cum[s1] - cum[s0+1];
    # s1 may be nsteps (sub-block ending exactly at the stream end), a
    # valid cum index covering the final step in full.
    cum = jnp.cumsum(full, axis=-1)
    zero = jnp.zeros_like(cum[..., :1])
    cum = jnp.concatenate([zero, cum], axis=-1)
    right0 = jnp.take(full, s0, axis=-1) - jnp.take(left, s0, axis=-1)
    mid = jnp.take(cum, s1, axis=-1) - jnp.take(cum, s0 + 1, axis=-1)
    left1 = jnp.take(left, s1c, axis=-1) * ok
    return right0 + mid + left1
