"""Meter state pytrees.

The reference meter (ebur128 crate) is a mutable object fed incrementally
(reference: src/analyzer.rs:139-145). The TPU-native analog is an explicit,
immutable pytree and a pure transition ``state' = meter_step(cfg, state, chunk)``:
this makes the meter trivially `vmap`-batchable, `jit`-fusable, shardable,
and checkpointable (the pytree IS the checkpoint surface).

All shapes are static, derived from :class:`MeterConfig`.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from soundscope_tpu.core import constants as C
from soundscope_tpu.core.config import MeterConfig


@struct.dataclass
class MeterState:
    """Carried state of one streaming BS.1770-4 meter.

    Energy bookkeeping uses "z" = sum_ch w_ch * y_ch^2, the channel-weighted
    squared K-weighted signal, so block energies are plain windowed means.
    """

    # K-weighting cascade state, per channel: (channels, 4).
    filt_state: jnp.ndarray

    # Ring of the most recent 3 s of z (exact momentary/short-term windows
    # ending at the last pushed sample): (30 * subblock,).
    z_ring: jnp.ndarray
    z_pos: jnp.ndarray          # int32 write cursor into z_ring
    frames_total: jnp.ndarray   # int32 total frames pushed since reset

    # 100 ms sub-block accumulator.
    subblock_partial: jnp.ndarray  # f32 partial sum of current sub-block
    subblock_fill: jnp.ndarray     # int32 samples in the partial sub-block
    subblock_ring: jnp.ndarray     # (30,) last completed sub-block sums
    subblocks_done: jnp.ndarray    # int32 completed sub-blocks since reset

    # Exact gating histories (present when cfg.max_blocks > 0).
    block_energy: jnp.ndarray      # (max_blocks,) 400 ms gating block energies
    block_count: jnp.ndarray       # int32
    lra_energy: jnp.ndarray        # (max_lra_blocks,) 3 s / 1 s-hop energies
    lra_count: jnp.ndarray         # int32

    # Histogram gating histories (always maintained; unbounded duration —
    # int32 counts so they do not saturate like f32 would at 2^24 blocks).
    block_hist: jnp.ndarray        # (HIST_BINS,) int32 counts
    lra_hist: jnp.ndarray          # (HIST_BINS,) int32 counts

    # Peaks.
    true_peak: jnp.ndarray         # (channels,) linear true peak since reset
    sample_peak: jnp.ndarray       # (channels,) linear sample peak since reset
    tp_tail: jnp.ndarray           # (channels, TRUE_PEAK_TAPS - 1) input tail


def init_meter_state(cfg: MeterConfig) -> MeterState:
    ch = cfg.channels
    max_b = max(cfg.max_blocks, 1)
    max_l = max(cfg.max_lra_blocks, 1)
    return MeterState(
        filt_state=jnp.zeros((ch, 4), jnp.float32),
        z_ring=jnp.zeros((cfg.shortterm_window,), jnp.float32),
        z_pos=jnp.zeros((), jnp.int32),
        frames_total=jnp.zeros((), jnp.int32),
        subblock_partial=jnp.zeros((), jnp.float32),
        subblock_fill=jnp.zeros((), jnp.int32),
        subblock_ring=jnp.zeros((C.SHORTTERM_SUBBLOCKS,), jnp.float32),
        subblocks_done=jnp.zeros((), jnp.int32),
        block_energy=jnp.zeros((max_b,), jnp.float32),
        block_count=jnp.zeros((), jnp.int32),
        lra_energy=jnp.zeros((max_l,), jnp.float32),
        lra_count=jnp.zeros((), jnp.int32),
        block_hist=jnp.zeros((C.HIST_BINS,), jnp.int32),
        lra_hist=jnp.zeros((C.HIST_BINS,), jnp.int32),
        true_peak=jnp.zeros((ch,), jnp.float32),
        sample_peak=jnp.zeros((ch,), jnp.float32),
        tp_tail=jnp.zeros((ch, C.TRUE_PEAK_TAPS - 1), jnp.float32),
    )
