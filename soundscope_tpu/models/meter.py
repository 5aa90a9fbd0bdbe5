"""Streaming BS.1770-4 meter: pure transition + pure queries.

The reference's live path pushes interleaved sample windows into a mutable
ebur128 meter and queries it each UI tick (src/tui.rs:1482-1552,
src/analyzer.rs:139-164). The TPU-native shape is

    state' = meter_step(cfg)(state, chunk (C, L))
    lufs   = shortterm(cfg)(state)          # etc.

with `state` an explicit pytree (core/state.py) — batchable with vmap,
shard-able, and directly checkpointable.

Exactness notes:
* momentary / short-term are computed from a device-resident ring of the
  channel-weighted squared K-weighted signal, so the 400 ms / 3 s windows
  end at the *last pushed sample* exactly like the reference backend
  (which measures over its raw audio ring), not quantised to 100 ms.
* gating & LRA histories are kept both exactly (fixed capacity
  cfg.max_blocks) and as libebur128-style histograms; queries use the
  exact history until it overflows, then the histogram (≤0.04 LU
  quantisation), giving unbounded stream duration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from soundscope_tpu.core import constants as C
from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import MeterState, init_meter_state
from soundscope_tpu.ops import loudness as L
from soundscope_tpu.ops.biquad import block_iir, make_block_filter
from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
from soundscope_tpu.ops.truepeak import oversampled_abs_peak, sample_peak

_PREC = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def meter_step(cfg: MeterConfig):
    """Build the jittable transition for a static config.

    The returned function handles any static chunk length L >= 1.
    """
    bf = make_block_filter(kweight_cascade_ss(cfg.rate), cfg.block)
    weights = jnp.asarray(channel_weights(cfg.channels), jnp.float32)
    h = cfg.subblock
    ring_n = cfg.shortterm_window
    cap = max(cfg.max_blocks, 1)
    lcap = max(cfg.max_lra_blocks, 1)
    exact = cfg.max_blocks > 0

    def step(state: MeterState, chunk: jnp.ndarray) -> MeterState:
        ch, n = chunk.shape
        y, filt_state = block_iir(bf, chunk, state.filt_state)
        z = L.weighted_square(y, weights)

        # --- z ring update (keep the most recent 3 s) ---
        if n >= ring_n:
            z_ring = z[-ring_n:]
            z_pos = (state.z_pos + n) % ring_n
            # Ring must stay aligned: ring[(z_pos + j) % R] is the j-th
            # oldest sample. Rebuild in that alignment.
            z_ring = jnp.roll(z_ring, state.z_pos + n)  # place newest at pos-1
        else:
            idx = (state.z_pos + jnp.arange(n)) % ring_n
            z_ring = state.z_ring.at[idx].set(z)
            z_pos = (state.z_pos + n) % ring_n

        # --- 100 ms sub-block accumulation ---
        k_max = n // h + 1
        g = state.subblock_fill + jnp.arange(n)
        b = g // h
        onehot = (b[:, None] == jnp.arange(k_max + 1)[None, :]).astype(jnp.float32)
        sums = jnp.matmul(z, onehot, precision=_PREC)
        sums = sums.at[0].add(state.subblock_partial)
        k_complete = (state.subblock_fill + n) // h
        new_fill = (state.subblock_fill + n) % h
        new_partial = sums[jnp.minimum(k_complete, k_max)]

        subblock_ring = state.subblock_ring
        block_energy, block_count = state.block_energy, state.block_count
        lra_energy, lra_count = state.lra_energy, state.lra_count
        block_hist = state.block_hist
        lra_hist = state.lra_hist

        for j in range(k_max):
            completes = j < k_complete
            s_j = sums[j]
            pos = (state.subblocks_done + j) % C.SHORTTERM_SUBBLOCKS
            subblock_ring = jnp.where(
                completes, subblock_ring.at[pos].set(s_j), subblock_ring
            )
            n_done = state.subblocks_done + j + 1

            # 400 ms gating block once 4 sub-blocks exist.
            emit_g = completes & (n_done >= C.MOMENTARY_SUBBLOCKS)
            idx4 = (n_done - 1 - jnp.arange(C.MOMENTARY_SUBBLOCKS)) % C.SHORTTERM_SUBBLOCKS
            e_g = jnp.sum(subblock_ring[idx4]) / (C.MOMENTARY_SUBBLOCKS * h)
            if exact:
                wr = emit_g & (block_count < cap)
                block_energy = jnp.where(
                    wr,
                    block_energy.at[jnp.minimum(block_count, cap - 1)].set(e_g),
                    block_energy,
                )
            block_count = block_count + emit_g.astype(jnp.int32)
            hbin = L.hist_bin_index(e_g)
            add_h = (emit_g & (hbin >= 0)).astype(jnp.int32)
            block_hist = block_hist.at[jnp.maximum(hbin, 0)].add(add_h)

            # 3 s LRA block at 1 s hop once 30 sub-blocks exist.
            emit_l = (
                completes
                & (n_done >= C.SHORTTERM_SUBBLOCKS)
                & ((n_done - C.SHORTTERM_SUBBLOCKS) % C.LRA_HOP_SUBBLOCKS == 0)
            )
            e_l = jnp.sum(subblock_ring) / (C.SHORTTERM_SUBBLOCKS * h)
            if exact:
                wl = emit_l & (lra_count < lcap)
                lra_energy = jnp.where(
                    wl,
                    lra_energy.at[jnp.minimum(lra_count, lcap - 1)].set(e_l),
                    lra_energy,
                )
            lra_count = lra_count + emit_l.astype(jnp.int32)
            lbin = L.hist_bin_index(e_l)
            add_l = (emit_l & (lbin >= 0)).astype(jnp.int32)
            lra_hist = lra_hist.at[jnp.maximum(lbin, 0)].add(add_l)

        # --- peaks ---
        tp, tp_tail = oversampled_abs_peak(chunk, state.tp_tail, cfg.true_peak_factor)
        return MeterState(
            filt_state=filt_state,
            z_ring=z_ring,
            z_pos=z_pos,
            frames_total=state.frames_total + n,
            subblock_partial=new_partial,
            subblock_fill=new_fill,
            subblock_ring=subblock_ring,
            subblocks_done=state.subblocks_done + k_complete,
            block_energy=block_energy,
            block_count=block_count,
            lra_energy=lra_energy,
            lra_count=lra_count,
            block_hist=block_hist,
            lra_hist=lra_hist,
            true_peak=jnp.maximum(state.true_peak, tp),
            sample_peak=jnp.maximum(state.sample_peak, sample_peak(chunk)),
            tp_tail=tp_tail,
        )

    return step


def _window_energy(cfg: MeterConfig, state: MeterState, window: int):
    ring_n = cfg.shortterm_window
    ordered = jnp.roll(state.z_ring, -state.z_pos)  # oldest-first
    return jnp.mean(ordered[-window:])


def momentary_lufs(cfg: MeterConfig, state: MeterState):
    return L.loudness_from_energy(_window_energy(cfg, state, cfg.momentary_window))


def shortterm_lufs(cfg: MeterConfig, state: MeterState):
    return L.loudness_from_energy(_window_energy(cfg, state, cfg.shortterm_window))


def integrated_lufs(cfg: MeterConfig, state: MeterState):
    hist_val = L.gated_loudness_hist(state.block_hist)
    if cfg.max_blocks == 0:
        return hist_val
    cap = cfg.max_blocks
    mask = jnp.arange(cap) < state.block_count
    exact_val = L.gated_loudness(state.block_energy, mask)
    return jnp.where(state.block_count <= cap, exact_val, hist_val)


def loudness_range_lu(cfg: MeterConfig, state: MeterState):
    hist_val = L.loudness_range_hist(state.lra_hist)
    if cfg.max_blocks == 0:
        return hist_val
    lcap = cfg.max_lra_blocks
    mask = jnp.arange(lcap) < state.lra_count
    exact_val = L.loudness_range(state.lra_energy, mask)
    return jnp.where(state.lra_count <= lcap, exact_val, hist_val)


def true_peak_linear(state: MeterState):
    return state.true_peak


__all__ = [
    "MeterState",
    "init_meter_state",
    "meter_step",
    "momentary_lufs",
    "shortterm_lufs",
    "integrated_lufs",
    "loudness_range_lu",
    "true_peak_linear",
]
