"""Batch CLI host.

The reference binary is `soundscope [OPTIONS] [FILE]` with -h/-v
(src/main.rs:21-30,81-90) and opens straight into the TUI. This CLI keeps
that surface (`tui [FILE]`) and adds the batch commands the TPU engine is
built for:

    python -m soundscope_tpu.apps.cli analyze FILE... [--json]
    python -m soundscope_tpu.apps.cli scan DIR [--json]      # library scan
    python -m soundscope_tpu.apps.cli tui [FILE]
    python -m soundscope_tpu.apps.cli themes
    python -m soundscope_tpu.apps.cli bench

Files are decoded on host, grouped into (channels, rate, padded-length)
buckets, and each bucket is analyzed as ONE vmapped device program —
the library-scan path from BASELINE.json config #4.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from soundscope_tpu import __version__
from soundscope_tpu.utils.metrics import GLOBAL as RT


def _decode_workers(n_paths: int) -> int:
    """Decode thread count: SS_DECODE_THREADS overrides; default one per
    core (capped). The native decoders run outside the GIL (ctypes into
    libssnative), so threads give real core-parallel decode — the
    reference decodes one file at a time on one core
    (src/audio_player.rs:169-267)."""
    env = int(os.environ.get("SS_DECODE_THREADS", "0"))
    if env > 0:
        return min(env, max(n_paths, 1))
    return max(1, min(os.cpu_count() or 4, 16, n_paths))


def _analyze_paths(paths: list[str], spectrogram_dir: str | None = None,
                   timeline_dir: str | None = None) -> list[dict]:
    from concurrent.futures import ThreadPoolExecutor

    from soundscope_tpu.models.engine import pad_bucket
    from soundscope_tpu.utils.io import DecodeError, decode_file

    results = []
    # Bucket by (channels, rate, padded length) for one compile per bucket;
    # flush buckets incrementally so peak memory is bounded by the
    # in-flight decode window plus one bucket of decoded audio, not the
    # whole library.
    buckets: dict[tuple, list] = {}
    FLUSH_AT = 64

    used_names: dict = {}

    def flush(key):
        items = buckets.pop(key)
        _analyze_bucket(key, items, results, spectrogram_dir, timeline_dir,
                        used_names)

    def decode_one(p):
        try:
            with RT.measure("decode", 0.0):
                d = decode_file(p)
            RT.add_audio("decode", d.duration)
            return d
        except (DecodeError, OSError) as e:
            return e

    # Pipelined scan: a thread pool decodes ahead (core-parallel; the
    # native decoders drop the GIL) while the main thread consumes
    # futures IN SUBMISSION ORDER (deterministic bucket composition) and
    # flushes full buckets to the device. Device analysis of bucket k
    # overlaps host decode of bucket k+1 — the round-4 end-to-end scan
    # was serial-decode-bound by ~2 orders of magnitude (VERDICT r4 #3).
    workers = _decode_workers(len(paths))
    window = max(2 * FLUSH_AT, 4 * workers)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        import collections

        pending = collections.deque()
        it = iter(paths)

        def top_up():
            while len(pending) < window:
                p = next(it, None)
                if p is None:
                    return
                pending.append((p, ex.submit(decode_one, p)))

        top_up()
        while pending:
            p, fut = pending.popleft()
            d = fut.result()
            top_up()
            if isinstance(d, Exception):
                results.append({"file": p, "error": str(d)})
                continue
            key = (d.channels, d.rate, pad_bucket(d.samples.shape[1]))
            buckets.setdefault(key, []).append((p, d))
            if len(buckets[key]) >= FLUSH_AT:
                flush(key)
    for key in list(buckets):
        flush(key)
    order = {p: i for i, p in enumerate(paths)}
    return sorted(results, key=lambda r: order.get(r["file"], 1 << 30))


def _export_path(dir_: str, title: str, suffix: str, used: dict) -> str:
    """Collision-free export filename: same-titled tracks from different
    folders must not overwrite each other's products."""
    n = used.get((dir_, title, suffix), 0) + 1
    used[(dir_, title, suffix)] = n
    name = title if n == 1 else f"{title}-{n}"
    return os.path.join(dir_, name + suffix)


def _analyze_bucket(key, items, results, spectrogram_dir=None,
                    timeline_dir=None, used_names=None) -> None:
    import jax
    import jax.numpy as jnp

    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_batch_native

    (ch, rate, npad) = key
    cfg = MeterConfig(channels=ch, rate=rate, max_blocks=0)
    # 4D frames layout (b, ch, N/128, 128): the engine's canonical fast
    # path (chunked energy+true-peak kernel consumes it natively, zero
    # relayout of the batch — docs/KERNELS.md round 5). It also bounds
    # kernel VMEM by construction via chunked_plan: the previous rows
    # (b*ch, N) upload sent 64-track buckets into the fused prefix
    # kernel, whose scoped-VMEM footprint model undercounts at 128 rows
    # (Mosaic: 18.93M > 16M limit — compile failure on the first full
    # e2e library scan). pad_bucket sizes are 2^k >= 32768, so N/128 is
    # always divisible by the chunked kernel's group sizes.
    xs = np.zeros((len(items) * ch, npad), np.float32)
    nv = np.zeros(len(items), np.int32)
    for i, (_, d) in enumerate(items):
        xs[i * ch: i * ch + ch, : d.samples.shape[1]] = d.samples
        nv[i] = d.samples.shape[1]
    xs = xs.reshape(len(items), ch, npad // 128, 128)
    fn = jax.jit(analyze_batch_native(cfg))
    with RT.measure("analyze", float(nv.sum()) / rate):
        res = jax.block_until_ready(fn(jnp.asarray(xs), jnp.asarray(nv)))
    tp = np.asarray(res.true_peak)
    sp = np.asarray(res.sample_peak)
    integ = np.asarray(res.integrated_lufs)
    lra = np.asarray(res.lra)
    for i, (p, d) in enumerate(items):
        with np.errstate(divide="ignore"):
            tp_db = 20.0 * np.log10(tp[i].max())
        # silence -> -inf, which is not valid JSON; report null
        tp_db = float(tp_db) if np.isfinite(tp_db) else None
        integ_i = float(integ[i])
        integ_i = round(integ_i, 2) if np.isfinite(integ_i) else None
        row = {
            "file": p,
            "title": d.title,
            "channels": ch,
            "rate": rate,
            "duration_s": round(d.duration, 3),
            "integrated_lufs": integ_i,
            "lra_lu": round(float(lra[i]), 2),
            "true_peak": [round(float(v), 4) for v in tp[i]],
            "true_peak_dbtp": round(tp_db, 2) if tp_db is not None else None,
            "sample_peak": [round(float(v), 4) for v in sp[i]],
        }
        if spectrogram_dir is not None:
            # computed here, while the decoded samples are still in hand,
            # so each file is decoded exactly once
            from soundscope_tpu.ops.stft import spectrogram

            spec = spectrogram(d.samples, d.rate)
            out = _export_path(spectrogram_dir, d.title, ".spec.npz",
                               used_names if used_names is not None else {})
            np.savez_compressed(out, **spec)
            row["spectrogram"] = out
        if timeline_dir is not None:
            # momentary (400 ms) / short-term (3 s) loudness at 100 ms hop
            nm = int(res.n_momentary[i])
            nst = int(res.n_shortterm[i])
            out = _export_path(timeline_dir, d.title, ".loudness.npz",
                               used_names if used_names is not None else {})
            np.savez_compressed(
                out,
                momentary_lufs=np.asarray(res.momentary[i][:nm]),
                shortterm_lufs=np.asarray(res.shortterm[i][:nst]),
                hop_seconds=0.1,
                rate=rate,
            )
            row["timeline"] = out
        results.append(row)


def _print_table(rows: list[dict]) -> None:
    cols = ["file", "duration_s", "integrated_lufs", "lra_lu", "true_peak_dbtp"]
    hdr = ["FILE", "DUR(s)", "LUFS-I", "LRA", "dBTP"]
    widths = [max(len(h), *(len(str(r.get(c, "-"))) for r in rows)) for c, h in zip(cols, hdr)]
    print("  ".join(h.ljust(w) for h, w in zip(hdr, widths)))
    for r in rows:
        if "error" in r:
            print(f"{r['file']}: ERROR {r['error']}")
            continue
        print("  ".join(str(r.get(c, "-")).ljust(w) for c, w in zip(cols, widths)))


def cmd_analyze(args) -> int:
    import contextlib

    spec_dir = getattr(args, "spectrogram", None)
    if spec_dir:
        os.makedirs(spec_dir, exist_ok=True)
    tl_dir = getattr(args, "timeline", None)
    if tl_dir:
        os.makedirs(tl_dir, exist_ok=True)
    prof_dir = getattr(args, "profile", None)
    if prof_dir:
        from soundscope_tpu.utils.metrics import profile_trace

        prof_ctx = profile_trace(prof_dir)
    else:
        prof_ctx = contextlib.nullcontext()
    with prof_ctx:
        rows = _analyze_paths(args.files, spectrogram_dir=spec_dir,
                              timeline_dir=tl_dir)
    if prof_dir:
        print(f"xprof trace written to {prof_dir}", file=sys.stderr)
    if args.json:
        print(json.dumps(rows, indent=None if args.compact else 2))
    else:
        _print_table(rows)
    if getattr(args, "metrics", False):
        # per-op wall/audio/RT-factor report on stderr (keeps stdout parseable)
        print(json.dumps({"metrics": RT.report()}), file=sys.stderr)
    return 1 if any("error" in r for r in rows) else 0


def cmd_scan(args) -> int:
    from soundscope_tpu.utils.io import AUDIO_EXTENSIONS

    paths = []
    for root, _, names in os.walk(args.dir):
        for nm in sorted(names):
            if nm.rsplit(".", 1)[-1].lower() in AUDIO_EXTENSIONS:
                paths.append(os.path.join(root, nm))
    if not paths:
        print("no audio files found", file=sys.stderr)
        return 1
    args.files = paths
    return cmd_analyze(args)


def cmd_themes(_args) -> int:
    from soundscope_tpu.apps.themes import list_themes

    for name in list_themes():
        print(name)
    return 0


def cmd_tui(args) -> int:
    from soundscope_tpu.apps.tui import run_tui

    return run_tui(args.file)


def cmd_bench(_args) -> int:
    import runpy

    path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")
    )
    if not os.path.exists(path):
        print(
            "bench.py not found — the bench subcommand needs a source "
            "checkout (it lives at the repo root, not in the package)",
            file=sys.stderr,
        )
        return 1
    sys.argv = ["bench.py"]
    runpy.run_path(path, run_name="__main__")
    return 0


def cmd_warmup(args) -> int:
    """Prime the persistent compile cache for the common analyze shapes.

    First-touch compiles of a new (rate, bucket) shape can take minutes on
    a cold cache (the XLA pipeline, not the device, is the cost); a
    one-time `warmup` after install makes every later fresh-process
    `analyze` hit the persistent cache and start in seconds.
    """
    import time

    from concurrent.futures import ThreadPoolExecutor

    from soundscope_tpu.models.engine import pad_bucket
    from soundscope_tpu.utils.io import DecodedAudio

    rates = [int(r) for r in args.rates.split(",") if r.strip()]
    batches = [int(b) for b in args.batch.split(",") if b.strip()]
    t0 = time.time()
    tasks = []
    for rate in rates:
        n = pad_bucket(1)  # minimum bucket
        while True:
            for bsz in batches:
                tasks.append((rate, n, bsz))
            if n / rate >= args.max_seconds:
                break
            n <<= 1

    def compile_one(task):
        rate, n, bsz = task
        # Warm by running zero tracks through _analyze_bucket — the
        # EXACT runtime path. Nothing weaker matches: the program's
        # persistent-cache key covers the Pallas kernels' serialized
        # Mosaic payloads, which embed callsite-chained source
        # locations up to the jit entry, so an AOT .lower().compile()
        # or a warmup-local fn(zeros) call produces a different key
        # and the first real analyze still recompiles (measured; two
        # tpu_custom_call payloads were the only diff between the
        # "warmed" and runtime modules).
        t = time.time()
        items = [
            (f"<warmup-{i}>",
             DecodedAudio(np.zeros((2, n), np.float32), rate, "warmup"))
            for i in range(bsz)
        ]
        _analyze_bucket((2, rate, n), items, [])
        print(f"warmed rate={rate} samples={n} batch={bsz} "
              f"({time.time() - t:.1f}s)", flush=True)

    # XLA compilation happens in C++ with the GIL released, so the grid
    # compiles core-parallel; the persistent cache writes are atomic
    # (temp+rename), so concurrent fills are safe. Measured through the
    # TPU tunnel: the 24-program default grid cold-fills in roughly the
    # wall time of its ~3 slowest programs instead of their sum.
    jobs = max(1, args.jobs or min(os.cpu_count() or 4, 8))
    with ThreadPoolExecutor(max_workers=jobs) as ex:
        list(ex.map(compile_one, tasks))
    print(f"warmup: {len(tasks)} programs in {time.time() - t0:.1f}s "
          f"({jobs} parallel)")
    return 0


_SUBCOMMANDS = ("analyze", "scan", "tui", "themes", "bench", "warmup")


def _normalize_argv(argv: list[str]) -> list[str]:
    """Reference surface: `soundscope [OPTIONS] [FILE]` opens the TUI —
    with FILE, on that file; with no arguments, empty (src/main.rs:21-30).
    A bare path maps to `tui PATH`; no arguments map to `tui`."""
    if not argv:
        return ["tui"]
    if not argv[0].startswith("-") and argv[0] not in _SUBCOMMANDS:
        return ["tui"] + list(argv)
    return list(argv)


def main(argv=None) -> int:
    from soundscope_tpu.core import enable_compile_cache

    enable_compile_cache()
    argv = _normalize_argv(sys.argv[1:] if argv is None else argv)
    ap = argparse.ArgumentParser(
        prog="soundscope-tpu",
        description="TPU-native audio analyzer (soundscope rebuild)",
    )
    ap.add_argument("-v", "--version", action="version", version=__version__)
    sub = ap.add_subparsers(dest="cmd")

    a = sub.add_parser("analyze", help="analyze audio files (batch, one program per bucket)")
    a.add_argument("files", nargs="+")
    a.add_argument("--json", action="store_true")
    a.add_argument("--compact", action="store_true")
    a.add_argument("--spectrogram", metavar="DIR",
                   help="also write pooled mid/side spectrograms (.spec.npz)")
    a.add_argument("--timeline", metavar="DIR",
                   help="also write momentary/short-term timelines (.loudness.npz)")
    a.add_argument("--metrics", action="store_true",
                   help="print per-op RT-factor metrics JSON on stderr")
    a.add_argument("--profile", metavar="DIR",
                   help="write an xprof trace of the analysis to DIR")
    a.set_defaults(fn=cmd_analyze)

    s = sub.add_parser("scan", help="recursively analyze a directory")
    s.add_argument("dir")
    s.add_argument("--json", action="store_true")
    s.add_argument("--compact", action="store_true")
    s.add_argument("--timeline", metavar="DIR",
                   help="also write momentary/short-term timelines (.loudness.npz)")
    s.add_argument("--metrics", action="store_true",
                   help="print per-op RT-factor metrics JSON on stderr")
    s.add_argument("--profile", metavar="DIR",
                   help="write an xprof trace of the analysis to DIR")
    s.set_defaults(fn=cmd_scan)

    t = sub.add_parser("tui", help="interactive TUI (reference-compatible)")
    t.add_argument("file", nargs="?")
    t.set_defaults(fn=cmd_tui)

    sub.add_parser("themes", help="list built-in themes").set_defaults(fn=cmd_themes)
    sub.add_parser("bench", help="run the RT-factor benchmark").set_defaults(fn=cmd_bench)

    w = sub.add_parser(
        "warmup",
        help="prime the persistent compile cache for common analyze shapes",
    )
    w.add_argument("--rates", default="44100,48000",
                   help="comma-separated sample rates (default 44100,48000)")
    w.add_argument("--max-seconds", type=float, default=900.0,
                   dest="max_seconds",
                   help="warm buckets up to this audio duration (default 900)")
    w.add_argument("--batch", default="1",
                   help="comma-separated batch sizes to warm (default 1)")
    w.add_argument("--jobs", type=int, default=0,
                   help="parallel compile workers (default: min(cores, 8))")
    w.set_defaults(fn=cmd_warmup)

    args = ap.parse_args(argv)
    if not getattr(args, "fn", None):
        ap.print_help()
        return 2
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
