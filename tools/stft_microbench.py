"""Micro-bench the fused STFT kernel on the real chip.

Times `stft_pooled_pallas_frames` at the headline bench shape (32x60 s
stereo @48 kHz, bf16 matmul dtype, 4D frames layout). The SS_STFT_K3
knob is baked into the trace at kernel-build time, so A/B runs need
separate processes:

    SS_STFT_K3=0 python tools/stft_microbench.py   # 4-mult stage 2
    SS_STFT_K3=1 python tools/stft_microbench.py   # Karatsuba stage 2

Every iteration folds its outputs into a device scalar that is fetched
once per timed batch (relay laziness — docs/KERNELS.md round-2 #5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from soundscope_tpu.core import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from soundscope_tpu.ops.pallas_stft import HOP, stft_pooled_pallas_frames

    b, rate, seconds = 32, 48000, 60.0
    n = int(seconds * rate) // HOP * HOP
    nc = n // 128
    x4 = jr.normal(jr.PRNGKey(0), (b, 2, nc, 128), jnp.float32) * 0.1
    jax.block_until_ready(x4)
    audio_s = b * n / rate

    @jax.jit
    def run(xx):
        m, s = stft_pooled_pallas_frames(xx, rate, dtype=jnp.bfloat16)
        return jnp.sum(m) + jnp.sum(s)

    out = run(x4)
    jax.block_until_ready(out)
    reps, inner = 3, 8
    best = float("inf")
    for _ in range(reps):
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(inner):
            acc = acc + run(x4)
        float(acc)
        best = min(best, (time.time() - t0) / inner)
    ms = best * 1e3
    print(f"SS_STFT_K3={os.environ.get('SS_STFT_K3', '1')}: "
          f"{ms:.2f} ms/iter ({audio_s / best:,.0f}x RT)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
