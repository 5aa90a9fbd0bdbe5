"""BASELINE config #4: the 1,000-track library scan.

One vmapped/natively-batched device program analyses 1,000 x 15 s stereo
48 kHz tracks (integrated LUFS, LRA, true & sample peak each). Inputs are
generated on device; the timed region forces a host readback of a scalar
that depends on every output, so relay dispatch laziness cannot fake the
number (see bench.py for the methodology note).

Usage: python tools/library_scan_bench.py [tracks] [seconds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tracks = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    # honors SS_COMPILE_CACHE= (empty) to disable persistence in tests
    from soundscope_tpu.core import enable_compile_cache

    enable_compile_cache()

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_batch_native

    rate = 48000
    cfg = MeterConfig(channels=2, rate=rate, max_blocks=0)
    n = int(seconds * rate) // cfg.block * cfg.block
    print(f"device: {jax.devices()[0]}, tracks={tracks}, {seconds}s each",
          file=sys.stderr, flush=True)

    # rows layout (tracks*2, n): the relayout-free engine fast path
    x = jr.normal(jr.PRNGKey(0), (tracks * 2, n), jnp.float32) * 0.1
    nv = jnp.full((tracks,), n, jnp.int32)
    fn = jax.jit(analyze_batch_native(cfg))
    reduce_ = jax.jit(lambda r: (
        jnp.sum(jnp.where(jnp.isfinite(r.integrated_lufs), r.integrated_lufs, 0.0))
        + jnp.sum(r.lra) + jnp.sum(r.true_peak)
    ))

    t0 = time.time()
    v = float(reduce_(fn(x, nv)))
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    best = float("inf")
    R = 4
    for i in range(3):
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(R):
            acc = acc + reduce_(fn(x, nv))
        v = float(acc)
        dt = (time.time() - t0) / R
        best = min(best, dt)
        print(f"iter {i}: {dt * 1e3:.1f} ms/scan (acc={v:.1f})",
              file=sys.stderr, flush=True)

    audio = tracks * n / rate
    import json

    print(json.dumps({
        "metric": "library_scan_rt_factor",
        "tracks": tracks,
        "scan_ms": round(best * 1e3, 1),
        "rt_factor": round(audio / best, 1),
        "tracks_per_sec": round(tracks / best, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
