"""Benchmark: batched real-time factor for the full LUFS+STFT analysis.

Workload (per track, matching the reference's per-file work at its own
cadences): complete BS.1770-4 chain — K-weighting, gated integrated
loudness, momentary/short-term timelines, LRA, oversampled true peak —
plus the display STFT (16384-point Hann windows at 2048-sample hop, the
reference's playback-position cadence, src/audio_player.rs:65) over mid
and side channels with dBFS + pink-noise scaling.

Metric: processed audio seconds per wall second per chip.
Baseline: the north-star target from BASELINE.json (>= 10,000x real time);
the reference publishes no numbers (BASELINE.md).

Prints ONE JSON line to stdout. Details go to stderr.

Env knobs: BENCH_TRACKS, BENCH_SECONDS, BENCH_REPEATS, BENCH_RATE,
BENCH_STFT (pallas|chunked|oneshot — pipeline for the spectrogram stage),
BENCH_DTYPE (f32|bf16 for the STFT matmuls), BENCH_GANG (distinct track
batches per dispatch — amortises the relay enqueue latency).

`--check` gate mode: additionally runs tools/tpu_conformance.py and
compares the measured RT factor against tools/bench_baseline.json,
exiting nonzero on a conformance failure or a >10% RT regression.
"""

import json
import os
import sys
import time



def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_bench(b, seconds, rate, dtype_name="bf16"):
    import jax
    import jax.numpy as jnp

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_batch_native
    from soundscope_tpu.ops.stft import stft_midside_display

    cfg = MeterConfig(channels=2, rate=rate, max_blocks=0)
    n = int(seconds * rate)
    # round to 16 IIR blocks so the sequential-grid kernels can batch
    # blocks per step at any sample rate (nb divisible by 16)
    n = (n // (cfg.block * 16)) * (cfg.block * 16)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    analyze = jax.jit(analyze_batch_native(cfg))

    # STFT over window chunks: bounds transient memory (the slice-stacked
    # window tensor would otherwise be tracks x windows x 16384 floats) and
    # keeps the XLA program small enough to compile fast.
    hop, win = 2048, 16384
    nhop = n // hop
    k = win // hop
    nw = nhop - k + 1
    chunk_windows = min(256, nw)
    nchunks = max(nw // chunk_windows, 1)

    @jax.jit
    def stft_stage(x):
        frames = x[:, :, : nhop * hop].reshape(b, 2, nhop, hop)

        def one(cidx):
            lo = cidx * chunk_windows
            fr = jax.lax.dynamic_slice_in_dim(
                frames, lo, chunk_windows + k - 1, axis=2
            )
            seg_l = [fr[:, 0, i: i + chunk_windows] for i in range(k)]
            seg_r = [fr[:, 1, i: i + chunk_windows] for i in range(k)]
            lwin = jnp.concatenate(seg_l, axis=-1).reshape(b, chunk_windows, win)
            rwin = jnp.concatenate(seg_r, axis=-1).reshape(b, chunk_windows, win)
            # reuse the fused midside kernel on pre-framed windows
            from soundscope_tpu.ops.fft import fft_pack2
            from soundscope_tpu.ops.spectrum import _hann_np
            from soundscope_tpu.ops.stft import _pooled_gain_plan

            gain, per, _ = _pooled_gain_plan(win, rate, 128)
            w = jnp.asarray(_hann_np(win))
            Ar, Ai, Br, Bi = fft_pack2(lwin * w, rwin * w, dtype=dtype)
            mr, mi = 0.5 * (Ar + Br), 0.5 * (Ai + Bi)
            sr_, si = 0.5 * (Ar - Br), 0.5 * (Ai - Bi)
            g2 = jnp.asarray(gain) ** 2

            def pooled(re, im):
                p = (re * re + im * im) * g2
                pm = jnp.max(p.reshape(*p.shape[:-1], 128, per), axis=-1)
                return 10.0 * jnp.log10(jnp.maximum(pm, 1e-38))

            return jnp.max(pooled(mr, mi), axis=(-2, -1)), jnp.max(
                pooled(sr_, si), axis=(-2, -1)
            )

        mids, sides = jax.lax.map(one, jnp.arange(nchunks))
        return jnp.max(mids, axis=0), jnp.max(sides, axis=0)

    default_stft = "pallas" if jax.default_backend() == "tpu" else "chunked"
    stft_mode = os.environ.get("BENCH_STFT", default_stft)

    from soundscope_tpu.core import constants as CC
    from soundscope_tpu.ops.pallas_iir_chunked import chunked_plan

    use_frames = (
        stft_mode == "pallas"
        and n % 128 == 0
        and chunked_plan(n, n // 128, 2 * b, cfg.subblock,
                         CC.true_peak_factor(rate)) is not None
    )

    @jax.jit
    def stft_oneshot(x):
        _, mid_db, side_db = stft_midside_display(x[:, 0], x[:, 1], rate, dtype=dtype)
        return jnp.max(mid_db, axis=(-2, -1)), jnp.max(side_db, axis=(-2, -1))

    @jax.jit
    def stft_pallas(x):
        from soundscope_tpu.ops.pallas_stft import (
            stft_pooled_pallas_frames,
            stft_pooled_pallas_packed,
        )

        if x.ndim == 4:
            mid_db, side_db = stft_pooled_pallas_frames(x, rate, dtype=dtype)
        else:
            mid_db, side_db = stft_pooled_pallas_packed(x, rate, dtype=dtype)
        return jnp.max(mid_db, axis=(-2, -1)), jnp.max(side_db, axis=(-2, -1))

    stft = {"oneshot": stft_oneshot, "pallas": stft_pallas,
            "chunked": stft_stage}[stft_mode]

    def run(x, n_valid):
        res = analyze(x, n_valid)
        m, sde = stft(x)
        return (res.integrated_lufs, res.lra, res.true_peak, m, sde)

    # one fused program per iteration: analyze + stft + finite-sum
    # reduction in a single dispatch (three per-iteration dispatches
    # through the axon relay cost ~2 ms each in host latency)
    @jax.jit
    def step(x, n_valid):
        res = analyze(x, n_valid)
        m, sde = stft(x)
        out = (res.integrated_lufs, res.lra, res.true_peak, m, sde)
        return sum(jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0)) for v in out)

    # GANG dispatches: the device stream is fully packed inside one
    # program (round-4 trace: 34.87 ms span, 34.85 ms busy), so the
    # remaining wall/device gap is per-dispatch enqueue latency through
    # the axon relay (~4 ms each). One program carrying GANG distinct
    # track batches amortises that to noise. The batches are distinct
    # arrays (different PRNG streams), so no loop-invariant hoisting or
    # CSE can collapse the work.
    GANG = int(os.environ.get("BENCH_GANG", "4"))

    @jax.jit
    def step_gang(xs, n_valid):
        acc = jnp.float32(0.0)
        for x in xs:
            acc = acc + step(x, n_valid)
        return acc

    def make_inputs():
        # generate ON DEVICE: host->device transfer through the dev tunnel
        # is slow and is not what this benchmark measures. The canonical
        # layout is the 4D frames view (b, 2, N/128, 128): XLA tiles it
        # T(8,128) natively, which BOTH the STFT kernel and the chunked
        # energy+true-peak kernel consume with zero relayout (the round-4
        # trace showed 6.9 ms/iter of structural retiles feeding the two
        # kernels from a (b, 2, N) T(2,128) parameter; rows (b*ch, N) was
        # also measured worse — a 9.4 ms cross-track gather on the STFT
        # side). Fall back to 3D when the chunked kernel is ineligible
        # for this rate/shape.
        import jax.random as jr

        shape = (b, 2, n // 128, 128) if use_frames else (b, 2, n)
        log(f"input layout: {'4D frames' if use_frames else '3D packed'} "
            f"{shape}")
        xs = tuple(
            jr.normal(jr.PRNGKey(k), shape, jnp.float32) * 0.1
            for k in range(GANG)
        )
        n_valid = jnp.full((b,), n, jnp.int32)
        return xs, n_valid

    return run, step_gang, GANG, make_inputs, n, stft_mode, use_frames


def roofline(b, n, rate, stft_mode, use_frames):
    """Analytic per-iteration resource model -> utilization fields.

    Counts the flops/bytes the workload ISSUES per sustained iteration
    (VERDICT r4 #4: tie chip utilization to the headline number). The
    model matches the round-4/5 xprof traces (docs/KERNELS.md):

    - STFT kernel (ops/pallas_stft.py): per 16384-pt window, stage 1 =
      4 matmuls (128,128)@(128,128), stage 2 = 8 matmuls
      (128,128)@(128,64) (k2 < 64 only) -> 50.3 MFLOP/window on the MXU;
      twiddle/power/pool ~1 MFLOP/window on the VPU; input read once.
    - Fused K-weight energy + true peak (ops/pallas_iir_chunked.py /
      pallas_iir.py): bf16x2 Toeplitz = 512 MXU flops/sample, state/out
      matmuls ~24; FIR = 47 nonzero taps x ~4 VPU ops (roll+select+FMA)
      + ~10 square/mask/max -> ~200 VPU flops/sample; input read once.
    - 3D (non-frames) layout adds the two structural retiles: one
      read+write of the input each (round-4 trace, 6.9 ms/iter).

    Peaks (TPU v5e, public): 197 TFLOP/s bf16 MXU; VPU = 4 FMA ALUs x
    (8x128) lanes x 2 x ~1.5 GHz = 12.3 TFLOP/s f32; HBM 819 GB/s.
    `sol_frac` is the roofline bound: sum over stages of
    max(mxu, vpu, hbm) time, divided by the measured iteration time.
    """
    MXU_PEAK = 197e12
    VPU_PEAK = 12.3e12
    HBM_BW = 819e9

    ch = 2
    rows = b * ch
    in_bytes = rows * n * 4

    hop, win = 2048, 16384
    nw = (n // hop) - (win // hop - 1)
    stft_mxu = b * nw * (4 * 2 * 128**3 + 8 * 2 * 128 * 128 * 64)
    stft_vpu = b * nw * 1.0e6
    stft = (stft_mxu, stft_vpu, in_bytes)

    energy_mxu = rows * n * (512 + 24)
    energy_vpu = rows * n * 200.0
    energy = (energy_mxu, energy_vpu, in_bytes)

    stages = [stft, energy] if stft_mode == "pallas" else [energy]
    retile_bytes = 0 if use_frames or stft_mode != "pallas" else 4 * in_bytes

    mxu = sum(s[0] for s in stages)
    vpu = sum(s[1] for s in stages)
    hbm = sum(s[2] for s in stages) + retile_bytes
    sol_s = sum(
        max(s[0] / MXU_PEAK, s[1] / VPU_PEAK, s[2] / HBM_BW) for s in stages
    ) + retile_bytes / HBM_BW

    def fields(iter_s):
        return {
            "mxu_util": round(mxu / MXU_PEAK / iter_s, 3),
            "vpu_util": round(vpu / VPU_PEAK / iter_s, 3),
            "hbm_util": round(hbm / HBM_BW / iter_s, 3),
            "sol_frac": round(sol_s / iter_s, 3),
        }

    return fields


def _enable_compile_cache():
    """Persistent compilation cache: first-compile through the TPU tunnel
    costs minutes; repeat runs should not pay it again. Shared policy
    with every other entry point (soundscope_tpu.core)."""
    from soundscope_tpu.core import enable_compile_cache

    enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    b = int(os.environ.get("BENCH_TRACKS", "32"))
    seconds = float(os.environ.get("BENCH_SECONDS", "60"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bf16")
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    rate = int(os.environ.get("BENCH_RATE", "48000"))

    dev = jax.devices()[0]

    run, step_gang, gang, make_inputs, n, stft_mode, use_frames = build_bench(
        b, seconds, rate, dtype_name)
    log(f"device: {dev}, tracks={b}, seconds={seconds}, stft={stft_mode}, "
        f"dtype={dtype_name}, layout={'4D frames' if use_frames else '3D'}")
    t0 = time.time()
    xs, nd = make_inputs()
    jax.block_until_ready(xs)
    log(f"device input gen: {time.time() - t0:.1f}s")

    t0 = time.time()
    out = run(xs[0], nd)
    jax.block_until_ready(out)
    log(f"compile+first run: {time.time() - t0:.1f}s")

    # Throughput metric: dispatch a batch of iterations and force ONE host
    # readback of a scalar that depends on every iteration's outputs, so
    # (a) per-iteration host/tunnel dispatch+sync latency (~25-30 ms
    # through the axon relay on this dev box; negligible on a local chip)
    # is amortised out of the sustained audio-sec/sec measurement, and
    # (b) nothing can be lazily skipped — block_until_ready alone is NOT a
    # reliable completion barrier through the relay. A single synced
    # iteration is logged for reference.
    step_gang(xs, nd).block_until_ready()  # warm the gang step
    t0 = time.time()
    out = run(xs[0], nd)
    jax.block_until_ready(out)
    log(f"single synced iter: {(time.time() - t0) * 1e3:.1f} ms")

    if "--profile" in sys.argv:
        # xprof trace of a few steady-state iterations (SURVEY §5:
        # profiler hooks); view with tensorboard --logdir DIR
        from soundscope_tpu.utils.metrics import profile_trace

        idx = sys.argv.index("--profile") + 1
        if idx >= len(sys.argv) or sys.argv[idx].startswith("--"):
            log("usage: bench.py --profile DIR")
            raise SystemExit(2)
        prof_dir = sys.argv[idx]
        with profile_trace(prof_dir):
            acc = jnp.float32(0.0)
            for _ in range(3):
                acc = acc + step_gang(xs, nd)
            float(acc)
        log(f"xprof trace written to {prof_dir}")

    # The wall/device residual is ONE result-readback RTT through the
    # axon relay (~31 ms) per timing loop, amortised over inner*gang
    # iterations — 32 of them put the sustained figure within ~1 ms of
    # the 34.9 ms device-busy span.
    inner = 8  # gang dispatches per repeat (gang iterations each)
    best = float("inf")
    for i in range(repeats):
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(inner):
            acc = acc + step_gang(xs, nd)
        acc_host = float(acc)  # forces the full chain
        dt = (time.time() - t0) / (inner * gang)
        best = min(best, dt)
        log(f"iter {i}: {dt * 1e3:.1f} ms/iter (sustained over "
            f"{inner * gang}, acc={acc_host:.1f})")

    audio_sec = b * (n / rate)
    rt = audio_sec / best
    log(f"integrated[0]={float(out[0][0]):.2f} LUFS (sanity)")
    util = roofline(b, n, rate, stft_mode, use_frames)(best)
    log(f"roofline (analytic, v5e peaks): {util}")
    print(json.dumps({
        "metric": "rt_factor_lufs_stft",
        "value": round(rt, 1),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rt / 10000.0, 3),
        **util,
    }))
    return rt


def check(rt: float) -> int:
    """Gate mode: conformance sweep + RT-regression check (exit status)."""
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(here, "tools"))
    import tpu_conformance

    import jax

    conf_args = ["--json"]
    if jax.default_backend() != "tpu":
        conf_args += ["--interpret", "--levels", "4", "--stft-windows", "2"]
    conf_rc = tpu_conformance.main(conf_args)
    log(f"conformance: {'PASS' if conf_rc == 0 else 'FAIL'}")

    base_path = os.path.join(here, "tools", "bench_baseline.json")
    rt_ok = True
    if jax.default_backend() == "tpu" and os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)["rt_factor"]
        rt_ok = rt >= 0.9 * base
        log(f"rt check: {rt:.0f}x vs recorded {base:.0f}x "
            f"({'PASS' if rt_ok else 'FAIL: >10% regression'})")
    else:
        log("rt check: skipped (no TPU or no recorded baseline)")
    return 0 if (conf_rc == 0 and rt_ok) else 1


if __name__ == "__main__":
    rt_measured = main()
    if "--check" in sys.argv:
        raise SystemExit(check(rt_measured))
