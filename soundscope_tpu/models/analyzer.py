"""Reference-compatible Analyzer facade.

Mirrors the public surface of the reference's ``Analyzer``
(src/analyzer.rs:47-183) so a user of the original can switch 1:1:

    create_loudness_meter(channels, rate)   src/analyzer.rs:49-53
    get_fft(samples)                        src/analyzer.rs:55-105
    get_waveform(samples, window_secs)      src/analyzer.rs:107-137 (static)
    add_samples(interleaved)                src/analyzer.rs:139-141
    reset()                                 src/analyzer.rs:143-145
    get_shortterm_lufs()                    src/analyzer.rs:147-149
    get_integrated_lufs()                   src/analyzer.rs:151-153
    get_loudness_range()                    src/analyzer.rs:155-157
    get_true_peak() -> (left, right)        src/analyzer.rs:159-164 (LINEAR)
    sample_rate()                           src/analyzer.rs:166-168
    calculate_integrated_lufs(ch, samples)  src/analyzer.rs:170-182

Host-side object holding a device-resident MeterState; all math happens in
jitted device programs (cached per chunk length). NumPy in / Python floats
and NumPy arrays out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core import constants as C, enable_compile_cache
from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import init_meter_state
from soundscope_tpu.models import meter as M
from soundscope_tpu.models.engine import analyze_array
from soundscope_tpu.ops.decimate import waveform_points
from soundscope_tpu.ops.midside import deinterleave
from soundscope_tpu.ops.spectrum import spectrum_points

# Every host that constructs an Analyzer (TUI, player, library code)
# gets the persistent compile cache — recompiling a same-shaped program
# in a fresh process costs ~90 s through the TPU tunnel.
enable_compile_cache()


@functools.lru_cache(maxsize=None)
def _jitted_step(cfg: MeterConfig):
    return jax.jit(M.meter_step(cfg))


@functools.lru_cache(maxsize=None)
def _jitted_queries(cfg: MeterConfig):
    return {
        "shortterm": jax.jit(lambda s: M.shortterm_lufs(cfg, s)),
        "momentary": jax.jit(lambda s: M.momentary_lufs(cfg, s)),
        "integrated": jax.jit(lambda s: M.integrated_lufs(cfg, s)),
        "range": jax.jit(lambda s: M.loudness_range_lu(cfg, s)),
    }


@functools.lru_cache(maxsize=None)
def _jitted_spectrum(rate: int, n: int, fft_impl: str):
    def fn(samples, gain_db):
        return spectrum_points(samples, rate, fft_impl=fft_impl, gain_db=gain_db)

    return jax.jit(fn)


class Analyzer:
    """Drop-in analog of the reference Analyzer (default: 2 ch, 44.1 kHz)."""

    def __init__(self, channels: int = 2, rate: int = C.DEFAULT_RATE,
                 max_blocks: int = 36_000, fft_impl: str = "xla"):
        self.fft_impl = fft_impl
        self._cfg = MeterConfig(channels=channels, rate=rate, max_blocks=max_blocks)
        self._state = init_meter_state(self._cfg)

    # -- meter lifecycle -----------------------------------------------------

    def create_loudness_meter(self, channels: int, rate: int) -> None:
        self._cfg = MeterConfig(
            channels=channels, rate=rate, max_blocks=self._cfg.max_blocks
        )
        self._state = init_meter_state(self._cfg)

    def reset(self) -> None:
        self._state = init_meter_state(self._cfg)

    @property
    def sample_rate(self) -> int:
        return self._cfg.rate

    @property
    def channels(self) -> int:
        return self._cfg.channels

    @property
    def config(self) -> MeterConfig:
        return self._cfg

    @property
    def state(self):
        """The meter state pytree — the checkpoint surface."""
        return self._state

    # -- streaming -------------------------------------------------------------

    def add_samples(self, interleaved) -> None:
        """Push interleaved f32 frames (length multiple of channels)."""
        x = jnp.asarray(np.asarray(interleaved, np.float32))
        planar = deinterleave(x, self._cfg.channels)
        n = int(planar.shape[-1])
        if n == 0:
            return
        step = _jitted_step(self._cfg)
        # Feed at most 1 s per jitted call: meter_step unrolls its 100 ms
        # sub-block loop n//h+1 times, so a single huge push (say a whole
        # 60 s file) would otherwise trace an unbounded program. Slab
        # boundaries are semantically invisible (chunk-boundary
        # invariance is pinned by tests/test_meter_stream.py) and full
        # slabs reuse one cached compile.
        slab = self._cfg.rate
        for i in range(0, n, slab):
            self._state = step(self._state, planar[:, i:i + slab])

    # -- queries ---------------------------------------------------------------

    def get_shortterm_lufs(self) -> float:
        return float(_jitted_queries(self._cfg)["shortterm"](self._state))

    def get_momentary_lufs(self) -> float:
        return float(_jitted_queries(self._cfg)["momentary"](self._state))

    def get_integrated_lufs(self) -> float:
        return float(_jitted_queries(self._cfg)["integrated"](self._state))

    def get_loudness_range(self) -> float:
        return float(_jitted_queries(self._cfg)["range"](self._state))

    def get_true_peak(self) -> tuple[float, float]:
        """Linear true peak of channels (0, 1), like the reference."""
        tp = np.asarray(self._state.true_peak)
        left = float(tp[0])
        right = float(tp[1]) if tp.shape[0] > 1 else left
        return left, right

    def get_sample_peak(self) -> tuple[float, float]:
        sp = np.asarray(self._state.sample_peak)
        left = float(sp[0])
        right = float(sp[1]) if sp.shape[0] > 1 else left
        return left, right

    # -- stateless analysis ------------------------------------------------------

    def get_fft(self, samples, gain_db: float = 0.0) -> np.ndarray:
        """Display spectrum of one window: (K, 2) array of (chart_x, dB).

        Matches the reference's Vec<(f64, f64)> of log-x chart coordinate
        and pink-compensated dBFS value (src/analyzer.rs:55-105).
        """
        x = jnp.asarray(np.asarray(samples, np.float32))
        xs, vals = _jitted_spectrum(self._cfg.rate, x.shape[-1], self.fft_impl)(
            x, jnp.float32(gain_db)
        )
        return np.stack([np.asarray(xs, np.float64), np.asarray(vals, np.float64)], axis=-1)

    @staticmethod
    def get_waveform(samples, window_secs: float) -> np.ndarray:
        """(2*valid, 2) of (x, min)/(x, max) pairs — src/analyzer.rs:107-137."""
        return waveform_points(jnp.asarray(np.asarray(samples, np.float32)), window_secs)

    def calculate_integrated_lufs(self, channels: int, samples) -> float | None:
        """Whole-buffer integrated LUFS of interleaved samples
        (reference: fresh meter fed 2 s chunks, src/analyzer.rs:170-182 —
        here one fused offline pass; chunking cannot change the result)."""
        x = np.asarray(samples, np.float32)
        frames = x.shape[-1] // channels
        if frames == 0:
            return None
        planar = x[: frames * channels].reshape(frames, channels).T
        cfg = MeterConfig(channels=channels, rate=self._cfg.rate, max_blocks=0)
        res = analyze_array(np.ascontiguousarray(planar), cfg)
        return float(res.integrated_lufs)
