"""Sequence-sharded whole-file analysis (shard_map over the time axis).

For files too long for one chip (or to cut latency), the time axis is
split across the "seq" mesh axis. The K-weighting IIR carries state across
shard boundaries; we resolve it EXACTLY with the affine-map trick:

  1. every shard runs the blocked filter locally with zero initial state
     (all heavy MXU work, fully parallel), obtaining its zero-state output
     and its affine boundary map  s_out = s_in @ P_total + f
  2. the per-shard maps (4x4 + 4 floats) are all-gathered over "seq" — a
     tiny ICI collective — and each shard composes the prefix to learn its
     true incoming state
  3. each shard adds the state-response correction  (s0 @ P[j]) @ Ot
     per block — no recomputation of the Toeplitz matmuls.

True peak needs taps-1 = 48 samples of left context: shards receive their
left neighbor's boundary samples with one `ppermute`.

Gating sums (one float per 100 ms) are all-gathered so every shard (and
thus the caller) sees the exact global integrated/LRA/timeline results —
identical to the single-device engine. Requires the per-shard length to be
a multiple of lcm(block, subblock); pad_for_mesh() computes it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from soundscope_tpu.core import constants as C
from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.models.engine import AnalysisResult
from soundscope_tpu.ops import loudness as L
from soundscope_tpu.ops.biquad import block_iir_parts, make_block_filter
from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
from soundscope_tpu.ops.truepeak import _polyphase_taps, polyphase_outputs, sample_peak

_PREC = jax.lax.Precision.HIGHEST


def shard_granularity(cfg: MeterConfig) -> int:
    return math.lcm(cfg.block, cfg.subblock)


def pad_for_mesh(n: int, cfg: MeterConfig, n_seq: int) -> int:
    g = shard_granularity(cfg) * n_seq
    return -(-n // g) * g


def _true_peak_sharded(x, n_valid, cfg, axis):
    """Per-channel true peak with cross-shard left context via ppermute."""
    nloc = x.shape[-1]
    size = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    start = idx * nloc
    pos = start + jnp.arange(nloc)
    xv = jnp.where(pos < n_valid, x, 0.0)
    sp_local = sample_peak(xv)
    factor = C.true_peak_factor(cfg.rate)
    if factor == 1:
        tp_local = sp_local
    else:
        k = _polyphase_taps(factor).shape[1]
        boundary = xv[..., -(k - 1):]
        left = jax.lax.ppermute(
            boundary, axis, [(i, (i + 1) % size) for i in range(size)]
        )
        left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        g = jnp.concatenate([left, xv], axis=-1)
        y = polyphase_outputs(g, factor)
        y = jnp.where((pos < n_valid)[..., None, :], y, 0.0)
        tp_local = jnp.maximum(jnp.max(jnp.abs(y), axis=(-2, -1)), sp_local)
    tp = jax.lax.pmax(tp_local, axis)
    sp = jax.lax.pmax(sp_local, axis)
    return tp, sp


@functools.lru_cache(maxsize=None)
def sharded_analyze_fn(cfg: MeterConfig, mesh: Mesh):
    """Jittable (B, C, N) x (B,) -> AnalysisResult, sharded over
    ("data", None, "seq"). N must be a multiple of
    shard_granularity(cfg) * mesh.shape['seq']."""
    bf = make_block_filter(kweight_cascade_ss(cfg.rate), cfg.block)
    weights = jnp.asarray(channel_weights(cfg.channels), jnp.float32)
    h = cfg.subblock
    n_state = 4

    def local(x, n_valid):
        """x: (B_loc, C, N_loc) one seq shard; n_valid: (B_loc,)."""
        bsz, ch, nloc = x.shape
        size = jax.lax.axis_size("seq")
        idx = jax.lax.axis_index("seq")

        # 1) zero-state filtering + boundary affine maps.
        y0, Pmat, f0, P_total = block_iir_parts(bf, x)

        # 2) compose true incoming state from all shards' maps.
        allf = jax.lax.all_gather(f0, "seq")          # (S, B, C, n)
        # P_total is identical on every shard (same static length).
        # Exact prefix: s0(idx) = sum_{k<idx} allf[k] @ P_total^(idx-1-k).
        # size_static is small and static — unroll.
        size_static = mesh.shape["seq"]
        powers = [jnp.eye(n_state, dtype=x.dtype)]
        for _ in range(size_static - 1):
            powers.append(jnp.matmul(powers[-1], P_total, precision=_PREC))
        s0 = jnp.zeros((bsz, ch, n_state), x.dtype)
        for k in range(size_static - 1):
            contrib = jnp.einsum(
                "bcn,snm->sbcm", allf[k], jnp.stack(powers), precision=_PREC
            )
            take = jnp.clip(idx - 1 - k, 0, size_static - 1)
            s0 = s0 + jnp.where(idx > k, contrib[take], 0.0)

        # 3) state-response correction per block.
        corr = jnp.einsum("bcn,jnm,mB->bcjB", s0, Pmat, bf.Ot, precision=_PREC)
        y = y0 + corr.reshape(bsz, ch, nloc)

        # mask padding, square-and-weight, local sub-block sums
        start = idx * nloc
        pos = start + jnp.arange(nloc)
        y = jnp.where(pos[None, None, :] < n_valid[:, None, None], y, 0.0)
        z = L.weighted_square(y, weights)
        sums_loc = L.subblock_sums(z, h)              # (B, nb_loc)

        # 4) global gating over gathered 100 ms sums (tiny).
        allsums = jax.lax.all_gather(sums_loc, "seq", axis=1, tiled=True)
        nb_valid = n_valid // h

        e_gate = L.gating_energies(allsums, h)
        m_gate = jnp.arange(e_gate.shape[-1])[None] < (
            nb_valid[:, None] - (C.MOMENTARY_SUBBLOCKS - 1)
        )
        integrated = L.gated_loudness(e_gate, m_gate)
        momentary = jnp.where(m_gate, L.loudness_from_energy(e_gate), L.NEG_INF)
        n_mom = jnp.maximum(nb_valid - (C.MOMENTARY_SUBBLOCKS - 1), 0)

        e_st = L.shortterm_energies(allsums, h)
        m_st = jnp.arange(e_st.shape[-1])[None] < (
            nb_valid[:, None] - (C.SHORTTERM_SUBBLOCKS - 1)
        )
        shortterm = jnp.where(m_st, L.loudness_from_energy(e_st), L.NEG_INF)
        n_st = jnp.maximum(nb_valid - (C.SHORTTERM_SUBBLOCKS - 1), 0)
        lra = L.loudness_range(
            e_st[..., :: C.LRA_HOP_SUBBLOCKS], m_st[..., :: C.LRA_HOP_SUBBLOCKS]
        )

        tp, sp = _true_peak_sharded(x, n_valid[:, None, None], cfg, "seq")

        return AnalysisResult(
            integrated_lufs=integrated, lra=lra,
            momentary=momentary, shortterm=shortterm,
            n_momentary=n_mom, n_shortterm=n_st,
            true_peak=tp, sample_peak=sp,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None, "seq"), P("data")),
        out_specs=AnalysisResult(
            integrated_lufs=P("data"), lra=P("data"),
            momentary=P("data", None), shortterm=P("data", None),
            n_momentary=P("data"), n_shortterm=P("data"),
            true_peak=P("data", None), sample_peak=P("data", None),
        ),
        check_vma=False,
    )
    return fn
