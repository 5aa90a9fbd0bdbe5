"""soundscope_tpu — a TPU-native audio-analysis framework.

A from-scratch rebuild of the capabilities of ``bananaofhappiness/soundscope``
(a Rust/ratatui terminal audio analyzer) designed TPU-first:

* the ITU-R BS.1770-4 / EBU R128 loudness chain (K-weighting, gated
  integrated loudness, momentary/short-term, LRA, oversampled true peak)
  runs as fused, batched JAX computations — the per-sample IIR recurrence
  of the reference (ebur128 crate) becomes a blocked state-space filter
  whose heavy lifting is MXU matmuls;
* the Hann/rFFT spectrum pipeline (dBFS calibration, pink-noise
  compensation, log-frequency mapping — reference: src/analyzer.rs:11-104)
  is a batched device computation;
* waveform min-max decimation (reference: src/analyzer.rs:107-137) is a
  static-shape gather + reduction;
* batch = a leading axis (``vmap``), multi-chip = ``jax.sharding`` meshes.

Layout:
  core/      dtypes, configs, meter-state pytrees
  ops/       stateless DSP kernels (biquad blocks, fft, true peak, ...)
  models/    the meters/analyzers composed from ops (flagship: AnalyzerEngine)
  parallel/  mesh + sharding helpers, sequence-sharded scans
  utils/     io (decode), signal synthesis, themes, metrics
  apps/      CLI and TUI hosts
  native/    C++ runtime pieces (decoder, ring buffer) via ctypes
"""

__version__ = "0.1.0"

import os as _os

# Backend override: SOUNDSCOPE_TPU_PLATFORM=cpu|tpu forces the JAX
# platform before any computation. Needed because some environments
# register accelerator plugins in sitecustomize and ignore the standard
# JAX_PLATFORMS variable; it also gives every app entry point (CLI,
# TUI, bench) one documented knob when a chip/tunnel is unreachable.
_plat = _os.environ.get("SOUNDSCOPE_TPU_PLATFORM", "").strip().lower()
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

from soundscope_tpu.core.config import MeterConfig  # noqa: F401


def __getattr__(name):
    # Lazy to keep `import soundscope_tpu` cheap and cycle-free.
    if name == "Analyzer":
        from soundscope_tpu.models.analyzer import Analyzer

        return Analyzer
    raise AttributeError(name)
