"""Offline (whole-file) analysis engine — one fused jitted pass.

The reference's offline path feeds a fresh ebur128 meter 2 s chunks in a
Python-side loop (src/analyzer.rs:170-182) and separately min-max-decimates
the waveform (src/tui.rs:1207-1241). Here the entire file analysis —
K-weighting, block energies, gated integrated loudness, momentary /
short-term timelines, LRA, true & sample peaks — is a single jitted JAX
program over device-resident planar samples:

    result = analyze(cfg)(samples (C, N), n_valid)

Batch analysis is the same program under `vmap` (leading track axis), which
is the TPU-native replacement for the reference's one-file-at-a-time scan.

Padding: callers pad N up to a compile bucket and pass the true length as
`n_valid`; all gating/timeline quantities are masked so padded zeros can
never influence results (they would otherwise create one diluted boundary
block the reference doesn't have).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from soundscope_tpu.core import constants as C
from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.ops import loudness as L
from soundscope_tpu.ops.biquad import block_iir, make_block_filter
from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
from soundscope_tpu.ops.truepeak import true_peak_masked


@struct.dataclass
class AnalysisResult:
    """Whole-file analysis products (masked timelines at 100 ms cadence)."""

    integrated_lufs: jnp.ndarray   # scalar
    lra: jnp.ndarray               # scalar (LU)
    momentary: jnp.ndarray         # (nm,) LUFS, 400 ms @ 10 Hz
    shortterm: jnp.ndarray         # (nst,) LUFS, 3 s @ 10 Hz
    n_momentary: jnp.ndarray       # int32 valid prefix of `momentary`
    n_shortterm: jnp.ndarray       # int32 valid prefix of `shortterm`
    true_peak: jnp.ndarray         # (C,) linear
    sample_peak: jnp.ndarray       # (C,) linear


@functools.lru_cache(maxsize=None)
def analyze_batch_native(cfg: MeterConfig):
    """Natively-batched whole-file analysis: (B, C, N) x (B,) -> result.

    Functionally identical to `analyze_batch_fn` but written directly on
    the batch axis: the Pallas IIR then sees one big (B*C, N) call instead
    of being lifted through vmap's batching rule (measured 6x faster on
    v5e), and every mask broadcasts per track.
    """
    bf = make_block_filter(kweight_cascade_ss(cfg.rate), cfg.block)
    weights = jnp.asarray(channel_weights(cfg.channels), jnp.float32)
    h = cfg.subblock

    w_tuple = tuple(float(v) for v in channel_weights(cfg.channels))

    def _finish(samples, n_valid, sums, tp_fused, b, ch, n, use_pallas):
        """Gating/timeline/LRA/true-peak tail shared by every front-end
        layout path; `sums` is (b, nb) 100 ms sub-block energies."""
        h = cfg.subblock
        nb = sums.shape[-1]
        nb_valid = n_valid // h

        if nb >= C.MOMENTARY_SUBBLOCKS:
            e_gate = L.gating_energies(sums, h)
            m_gate = jnp.arange(e_gate.shape[-1])[None] < (
                nb_valid[:, None] - (C.MOMENTARY_SUBBLOCKS - 1)
            )
            integrated = L.gated_loudness(e_gate, m_gate)
            momentary = jnp.where(m_gate, L.loudness_from_energy(e_gate), L.NEG_INF)
            n_mom = jnp.maximum(nb_valid - (C.MOMENTARY_SUBBLOCKS - 1), 0)
        else:
            integrated = jnp.full((b,), L.NEG_INF, jnp.float32)
            momentary = jnp.zeros((b, 0), jnp.float32)
            n_mom = jnp.zeros((b,), jnp.int32)

        if nb >= C.SHORTTERM_SUBBLOCKS:
            e_st = L.shortterm_energies(sums, h)
            m_st = jnp.arange(e_st.shape[-1])[None] < (
                nb_valid[:, None] - (C.SHORTTERM_SUBBLOCKS - 1)
            )
            shortterm = jnp.where(m_st, L.loudness_from_energy(e_st), L.NEG_INF)
            n_st = jnp.maximum(nb_valid - (C.SHORTTERM_SUBBLOCKS - 1), 0)
            lra = L.loudness_range(
                e_st[..., :: C.LRA_HOP_SUBBLOCKS],
                m_st[..., :: C.LRA_HOP_SUBBLOCKS],
            )
        else:
            shortterm = jnp.zeros((b, 0), jnp.float32)
            n_st = jnp.zeros((b,), jnp.int32)
            lra = jnp.zeros((b,), jnp.float32)

        from soundscope_tpu.ops.pallas_truepeak import pick_block

        if use_pallas and tp_fused is not None:
            tp, sp = tp_fused
        elif use_pallas and pick_block(n) is not None:
            from soundscope_tpu.ops.pallas_truepeak import true_peak_pallas

            tp, sp = true_peak_pallas(samples, n_valid, cfg.rate)
            tp, sp = tp.reshape(b, ch), sp.reshape(b, ch)
        else:
            tp, sp = true_peak_masked(samples.reshape(b, ch, n),
                                      n_valid[:, None, None], cfg.rate)
        return AnalysisResult(
            integrated_lufs=integrated, lra=lra,
            momentary=momentary, shortterm=shortterm,
            n_momentary=n_mom, n_shortterm=n_st,
            true_peak=tp, sample_peak=sp,
        )

    def analyze(samples: jnp.ndarray, n_valid: jnp.ndarray) -> AnalysisResult:
        # Layouts, fastest first (round-4/5 chip traces, docs/KERNELS.md):
        #   4D frames (b, ch, N/128, 128): the canonical device layout —
        #     the display-STFT kernel's native view AND the chunked
        #     energy+true-peak kernel's native view, so the GB-scale
        #     input is never relaid out at all.
        #   2D rows (b*ch, N) channel-minor: native for the rows-layout
        #     energy kernels (but the STFT side then pays a cross-track
        #     gather, so batch CLI only).
        #   3D (b, ch, N): always works; XLA inserts T(2,128)->T(8,128)
        #     retiles in front of the kernels (~6.9 ms/iter at 32x60 s).
        use_pallas = cfg.iir_impl == "pallas" or (
            cfg.iir_impl == "auto" and jax.default_backend() == "tpu"
        )
        tp_fused = None
        h = cfg.subblock
        if samples.ndim == 4:
            from soundscope_tpu.ops.pallas_iir_chunked import (
                chunked_plan,
                kweight_energy_tp_chunked,
                subblock_sums_from_steps,
            )

            b, ch, nc, _ = samples.shape
            n = nc * 128
            S = (chunked_plan(n, nc, b * ch, h, cfg.true_peak_factor)
                 if use_pallas else None)
            if S is not None:
                bf128 = make_block_filter(kweight_cascade_ss(cfg.rate), 128)
                step_sums, tpr, spr = kweight_energy_tp_chunked(
                    bf128.Tt, bf128.Wt, bf128.Ot, bf128.A_pows,
                    samples, n_valid, w_tuple, cfg.rate, h, S=S)
                sums = subblock_sums_from_steps(
                    step_sums, h, S * 128, n).reshape(b, ch, -1).sum(axis=1)
                tp_fused = (tpr.reshape(b, ch), spr.reshape(b, ch))
                return _finish(samples, n_valid, sums, tp_fused, b, ch, n,
                               use_pallas)
            samples = samples.reshape(b, ch, n)
        if samples.ndim == 2:
            ch = cfg.channels
            b, n = samples.shape[0] // ch, samples.shape[1]
        else:
            b, ch, n = samples.shape
        if use_pallas and n % cfg.block == 0:
            # fused: filter + mask + weighted-square + channel-sum in one
            # Pallas pass; y never touches HBM. When the 100 ms sub-block
            # divides by 32 (48 k/32 k/24 k/16 k/12 k/8 k families) the
            # kernel also pre-sums 32-sample groups, shrinking its HBM
            # writes 32x and killing the layout-repack loop XLA otherwise
            # emits for the sub-block reduction (~20% of bench device
            # time, round-3 chip trace in docs/KERNELS.md).
            from soundscope_tpu.ops.pallas_iir import (
                kweight_energy_pallas_auto,
                kweight_energy_tp_eligible,
                kweight_energy_tp_pallas_prefix,
            )

            g = 32 if h % 32 == 0 and cfg.block % 32 == 0 else 1
            # Fused energy + true-peak kernel when the prefix variant
            # applies: the FIR's VPU work dual-issues with the prefix
            # matmuls' MXU work and the input streams from HBM once
            # (SS_FUSE_TP=0 reverts to the two standalone kernels).
            import os as _os

            fuse_tp = _os.environ.get("SS_FUSE_TP", "1") != "0" and (
                kweight_energy_tp_eligible(
                    n, b, ch, cfg.block, bf.Wt.shape[1], cfg.rate)
            )
            if fuse_tp:
                z, tpr, spr = kweight_energy_tp_pallas_prefix(
                    bf.Tt, bf.Wt, bf.Ot, bf.A_pows,
                    samples, n_valid, w_tuple, cfg.rate, group=g,
                )
                tp_fused = (tpr.reshape(b, ch), spr.reshape(b, ch))
            else:
                z = kweight_energy_pallas_auto(
                    bf.Tt, bf.Wt, bf.Ot, bf.A_pows,
                    samples, n_valid, w_tuple, group=g,
                )
            nb_sub = z.shape[-1] // (h // g)
            sums = z[..., : nb_sub * (h // g)].reshape(
                b, nb_sub, h // g).sum(axis=-1)
        else:
            s3 = samples.reshape(b, ch, n)
            nv = n_valid[:, None, None]
            y, _ = block_iir(bf, s3, jnp.zeros((b, ch, 4), jnp.float32))
            pos = jnp.arange(n)
            y = jnp.where(pos[None, None, :] < nv, y, 0.0)
            z = L.weighted_square(y, weights)
            sums = L.subblock_sums(z, h)
        return _finish(samples, n_valid, sums, tp_fused, b, ch, n,
                       use_pallas)

    return analyze


@functools.lru_cache(maxsize=None)
def analyze_fn(cfg: MeterConfig):
    """Jittable single-track whole-file analysis: (C, N) x () -> result.

    Thin wrapper over the natively-batched implementation (b = 1) so the
    two paths cannot drift; see `analyze_batch_native` for the body.
    """
    batched = analyze_batch_native(cfg)

    def analyze(samples: jnp.ndarray, n_valid: jnp.ndarray) -> AnalysisResult:
        res = batched(samples[None], jnp.reshape(n_valid, (1,)))
        return jax.tree_util.tree_map(lambda v: v[0], res)

    return analyze


def pad_bucket(n: int, minimum: int = 1 << 15) -> int:
    """Compile-bucket length: next power of two (caps distinct programs)."""
    b = minimum
    while b < n:
        b <<= 1
    return b


def analyze_array(samples: np.ndarray, cfg: MeterConfig) -> AnalysisResult:
    """Host convenience: planar (C, N) numpy -> AnalysisResult (device)."""
    ch, n = samples.shape
    npad = pad_bucket(n)
    x = np.zeros((ch, npad), np.float32)
    x[:, :n] = samples
    fn = jax.jit(analyze_fn(cfg))
    return fn(jnp.asarray(x), jnp.int32(n))


def analyze_batch_fn(cfg: MeterConfig):
    """vmapped analyze: (B, C, N) samples, (B,) n_valid -> batched result."""
    return jax.vmap(analyze_fn(cfg))


