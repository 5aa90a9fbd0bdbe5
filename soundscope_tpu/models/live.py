"""Device-resident live analysis — the streaming mic/player hot path.

The reference's per-tick loop copies a 30 s host ring buffer, splits
mid/side on the CPU, and runs FFT + LUFS per tick (src/tui.rs:1427-1480).
The TPU-native shape keeps the ring ON DEVICE and makes each UI tick ONE
jitted program:

    state' = push(state, chunk)     # ring update + meter transition
    frame  = snapshot(state)        # spectrum (mid+side), waveform
                                    # min/max, short-term/momentary LUFS

No sample buffers cross the host boundary after decode/capture; the host
receives only display-sized products (a few KB per frame). This is the
"fixed 60 Hz query cadence over a device-resident ring buffer" design
from SURVEY.md §7.

LiveState extends the meter pytree with a raw pseudo-stereo ring
(interleaved, rate*seconds samples — same layout as the reference's
capture ring, main.rs:63-65).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from soundscope_tpu.core import constants as C
from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import MeterState, init_meter_state
from soundscope_tpu.models import meter as M
from soundscope_tpu.ops.decimate import minmax_decimate
from soundscope_tpu.ops.spectrum import spectrum_points


@struct.dataclass
class LiveState:
    meter: MeterState
    ring: jnp.ndarray      # (ring_n,) interleaved samples, device-resident
    pos: jnp.ndarray       # int32 write cursor


@struct.dataclass
class LiveFrame:
    """One display frame (everything the TUI renders per tick)."""

    fft_mid: jnp.ndarray       # (K,) dB values at the precomputed chart x
    fft_side: jnp.ndarray      # (K,)
    wf_min: jnp.ndarray        # (W,) waveform bucket minima (15 s window)
    wf_max: jnp.ndarray        # (W,)
    shortterm: jnp.ndarray     # () LUFS
    momentary: jnp.ndarray     # () LUFS
    integrated: jnp.ndarray    # () LUFS
    lra: jnp.ndarray           # () LU
    true_peak: jnp.ndarray     # (C,) linear


def init_live_state(cfg: MeterConfig, seconds: int = C.CAPTURE_RING_SECONDS) -> LiveState:
    return LiveState(
        meter=init_meter_state(cfg),
        ring=jnp.zeros((cfg.rate * seconds,), jnp.float32),
        pos=jnp.zeros((), jnp.int32),
    )


@functools.lru_cache(maxsize=None)
def live_push(cfg: MeterConfig):
    """Jittable (state, interleaved chunk) -> state (per static chunk len)."""
    step = M.meter_step(cfg)

    def push(state: LiveState, chunk: jnp.ndarray) -> LiveState:
        n = chunk.shape[-1]
        ring_n = state.ring.shape[0]
        idx = (state.pos + jnp.arange(n)) % ring_n
        ring = state.ring.at[idx].set(chunk)
        frames = n // cfg.channels
        planar = chunk[: frames * cfg.channels].reshape(frames, cfg.channels).T
        meter = step(state.meter, planar)
        return LiveState(meter=meter, ring=ring, pos=(state.pos + n) % ring_n)

    return push


@functools.lru_cache(maxsize=None)
def live_frame(cfg: MeterConfig, fft_impl: str = "xla"):
    """Jittable state -> LiveFrame, mirroring the reference's mic-mode
    analysis windows (src/tui.rs:1427-1480): FFT over samples
    [15s*sr - 2^14, 15s*sr) of mid/side, waveform over the first 15 s of
    mid, short-term over the meter."""
    n_fft = C.DEFAULT_FFT_SIZE

    def frame(state: LiveState, gain_db=0.0) -> LiveFrame:
        ordered = jnp.roll(state.ring, -state.pos)   # oldest-first
        # pseudo-stereo interleave: a rate*S-sample ring holds S/2 seconds
        # of frames; analyze the NEWEST end (reference: tui.rs:1431-1437)
        mid = (ordered[0::2] + ordered[1::2]) * 0.5
        side = (ordered[0::2] - ordered[1::2]) * 0.5
        n_frames = mid.shape[0]
        fft_lo = n_frames - n_fft
        _, v_mid = spectrum_points(
            jax.lax.dynamic_slice_in_dim(mid, fft_lo, n_fft),
            cfg.rate, fft_impl=fft_impl, gain_db=gain_db,
        )
        _, v_side = spectrum_points(
            jax.lax.dynamic_slice_in_dim(side, fft_lo, n_fft),
            cfg.rate, fft_impl=fft_impl, gain_db=gain_db,
        )
        wf_min, wf_max, _ = minmax_decimate(mid, 15.0)
        return LiveFrame(
            fft_mid=v_mid,
            fft_side=v_side,
            wf_min=wf_min,
            wf_max=wf_max,
            shortterm=M.shortterm_lufs(cfg, state.meter),
            momentary=M.momentary_lufs(cfg, state.meter),
            integrated=M.integrated_lufs(cfg, state.meter),
            lra=M.loudness_range_lu(cfg, state.meter),
            true_peak=state.meter.true_peak,
        )

    return frame


class LiveAnalyzer:
    """Host handle over the device-resident live pipeline.

    push() accepts any chunk length (jit cached per length); frame()
    returns numpy display products only.
    """

    def __init__(self, cfg: MeterConfig | None = None, fft_impl: str = "xla",
                 seconds: int = C.CAPTURE_RING_SECONDS):
        self.cfg = cfg or MeterConfig(max_blocks=0)
        self.fft_impl = fft_impl
        self.seconds = seconds
        self.state = init_live_state(self.cfg, seconds)
        self._push = jax.jit(live_push(self.cfg))
        self._frame = jax.jit(live_frame(self.cfg, fft_impl))

    def push(self, interleaved) -> None:
        x = jnp.asarray(np.asarray(interleaved, np.float32))
        if x.shape[-1] == 0:
            return
        self.state = self._push(self.state, x)

    def frame(self, gain_db: float = 0.0) -> LiveFrame:
        return jax.tree_util.tree_map(np.asarray, self._frame(self.state, gain_db))

    def reset(self) -> None:
        self.state = init_live_state(self.cfg, self.seconds)

    def save(self, path: str) -> None:
        """Checkpoint the full live pytree (ring + meter) to `path`."""
        from soundscope_tpu.utils.checkpoint import save_live

        save_live(path, self.cfg, self.state, self.seconds)

    @classmethod
    def restore(cls, path: str, fft_impl: str = "xla") -> "LiveAnalyzer":
        """Resume a mic session bit-exactly from a save() checkpoint."""
        from soundscope_tpu.utils.checkpoint import load_live

        cfg, seconds, state = load_live(path)
        self = cls(cfg, fft_impl=fft_impl, seconds=seconds)
        self.state = state
        return self

    @property
    def spectrum_chart_x(self) -> np.ndarray:
        from soundscope_tpu.ops.spectrum import _bin_plan

        _, _, _, _, xmap = _bin_plan(
            C.DEFAULT_FFT_SIZE, self.cfg.rate,
            C.SPECTRUM_FMIN_HZ, C.SPECTRUM_FMAX_HZ,
        )
        return xmap
