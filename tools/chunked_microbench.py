"""Micro-bench the chunked energy+TP kernel's stages on the real chip.

Round-5 perf archaeology: the frames-layout chunked kernel removed the
6.9 ms/iter structural retile but itself runs ~7 ms/iter slower than the
rows-layout prefix kernel (docs/KERNELS.md round-5 section). This tool
times ablated variants (SS_CHUNKED_ABLATE) to attribute the gap.

Usage: python tools/chunked_microbench.py [variant ...]
Variants: full, nofir, noscan, noscancarry, nofirscan, bare, and 'prefix'
(the rows-layout fused kernel on the same workload, for reference).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATE = {
    "full": "",
    "nofir": "fir",
    "noxp": "xp",
    "noscan": "scan",
    "noscancarry": "scan,carry",
    "nofirscan": "fir,scan,carry",
}


def main() -> int:
    variants = sys.argv[1:] or ["full", "nofir", "noxp", "noscan",
                                "nofirscan", "prefix"]
    from soundscope_tpu.core import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.ops.biquad import make_block_filter
    from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss

    b, rate, seconds = 32, 48000, 60.0
    cfg = MeterConfig(channels=2, rate=rate, max_blocks=0)
    n = int(seconds * rate) // (cfg.block * 16) * (cfg.block * 16)
    nc = n // 128
    w = tuple(float(v) for v in channel_weights(2))
    bf = make_block_filter(kweight_cascade_ss(rate), 128)
    x4 = jr.normal(jr.PRNGKey(0), (b, 2, nc, 128), jnp.float32) * 0.1
    x3 = x4.reshape(b, 2, n)
    nv = jnp.full((b,), n, jnp.int32)
    jax.block_until_ready((x4, x3))
    print(f"shape: {x4.shape} (n={n}, nc={nc})", file=sys.stderr)

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        reps, inner = 3, 8
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            for _ in range(inner):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / inner)
        return best * 1e3

    for v in variants:
        if v == "prefix":
            from soundscope_tpu.ops.pallas_iir import (
                kweight_energy_tp_pallas_prefix,
            )

            @jax.jit
            def run_prefix(xx, nn):
                z, tp, sp = kweight_energy_tp_pallas_prefix(
                    bf.Tt, bf.Wt, bf.Ot, bf.A_pows, xx, nn, w, rate,
                    group=32)
                return jnp.sum(z), tp, sp

            ms = timeit(run_prefix, x3, nv)
            print(f"prefix(rows 3D)     : {ms:8.2f} ms")
            continue
        os.environ["SS_CHUNKED_ABLATE"] = ABLATE[v]
        # force retrace/recompile under the new ablation env
        import importlib

        import soundscope_tpu.ops.pallas_iir_chunked as PC
        importlib.reload(PC)

        @jax.jit
        def run_chunked(xx, nn):
            ss, tp, sp = PC.kweight_energy_tp_chunked(
                bf.Tt, bf.Wt, bf.Ot, bf.A_pows, xx, nn, w, rate,
                cfg.subblock)
            return jnp.sum(ss), tp, sp

        ms = timeit(run_chunked, x4, nv)
        print(f"chunked[{v:<11s}]: {ms:8.2f} ms")
    os.environ.pop("SS_CHUNKED_ABLATE", None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
