"""Meter configuration.

The config is static (hashable) — it parameterises trace-time shapes:
sub-block length, ring sizes, gating-history capacity. One jitted program
exists per distinct config, mirroring how the reference recreates its
``EbuR128`` meter per (channels, rate) (reference: src/analyzer.rs:49-53).
"""

from __future__ import annotations

import dataclasses

from soundscope_tpu.core import constants as C


@dataclasses.dataclass(frozen=True)
class MeterConfig:
    """Static parameters of a BS.1770-4 meter.

    Attributes:
      channels: number of interleaved input channels.
      rate: sample rate in Hz.
      max_blocks: capacity of the exact gating-block energy history
        (100 ms cadence — 36_000 ≈ 1 hour). When 0, the meter runs in
        histogram mode only (unbounded duration, ≤0.04 LU quantisation).
      block: inner block length of the blocked state-space K-weighting
        filter (MXU matmul tile; see ops/biquad.py).
      iir_impl: "auto" (Pallas on TPU, XLA elsewhere), "xla"
        (associative-scan blocked filter) or "pallas" (sequential-grid
        Pallas kernel carrying state in VMEM, ops/pallas_iir.py —
        offline paths only; measured 1.6x faster on v5e).
    """

    channels: int = C.DEFAULT_CHANNELS
    rate: int = C.DEFAULT_RATE
    max_blocks: int = 36_000
    block: int = 128
    iir_impl: str = "auto"

    def __post_init__(self):
        if self.channels < 1:
            raise ValueError(f"channels must be >= 1, got {self.channels}")
        if self.rate < 16 or self.rate > 2_822_400:
            # same validity envelope as the reference backend (libebur128)
            raise ValueError(f"unsupported sample rate {self.rate}")

    @property
    def subblock(self) -> int:
        """Samples per 100 ms sub-block."""
        return C.samples_in_100ms(self.rate)

    @property
    def momentary_window(self) -> int:
        return self.subblock * C.MOMENTARY_SUBBLOCKS

    @property
    def shortterm_window(self) -> int:
        return self.subblock * C.SHORTTERM_SUBBLOCKS

    @property
    def max_lra_blocks(self) -> int:
        """Capacity of the exact short-term (LRA) history (1 s cadence)."""
        return 0 if self.max_blocks == 0 else max(self.max_blocks // C.LRA_HOP_SUBBLOCKS + 1, 16)

    @property
    def true_peak_factor(self) -> int:
        return C.true_peak_factor(self.rate)
