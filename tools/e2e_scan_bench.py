"""End-to-end library scan benchmark: ENCODED files -> JSON results.

BASELINE config #4 (tools/library_scan_bench.py) measures the device
analysis alone on pre-decoded arrays; this tool measures what a user
actually runs: a directory of compressed audio through decode (now
thread-parallel, pipelined against device analysis — apps/cli.py) and
the batched engine. Reference equivalent: opening files one at a time in
the TUI (src/audio_player.rs:169-267, single-core serial decode).

Usage: python tools/e2e_scan_bench.py [tracks] [seconds] [--keep DIR]
Prints one JSON line: tracks/s, decoded-audio x realtime, per-op split.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _lame_encode(path, x, rate, kbps=128):
    import ctypes

    lame = None
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            lame = ctypes.CDLL(name)
            break
        except OSError:
            pass
    if lame is None:
        return False
    lame.lame_init.restype = ctypes.c_void_p
    lame.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    lame.lame_encode_flush.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    g = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(g, ctypes.c_int(rate))
    lame.lame_set_out_samplerate(g, ctypes.c_int(rate))
    lame.lame_set_num_channels(g, ctypes.c_int(2))
    lame.lame_set_brate(g, ctypes.c_int(kbps))
    if lame.lame_init_params(g) < 0:
        return False
    li = np.ascontiguousarray((x[0] * 32767).clip(-32768, 32767), np.int16)
    ri = np.ascontiguousarray((x[1] * 32767).clip(-32768, 32767), np.int16)
    buf = ctypes.create_string_buffer(len(li) * 4 + (1 << 16))
    n = lame.lame_encode_buffer(g, li.ctypes.data, ri.ctypes.data,
                                len(li), buf, len(buf))
    out = buf.raw[:n]
    n2 = lame.lame_encode_flush(g, buf, len(buf))
    out += buf.raw[:n2]
    lame.lame_close(ctypes.c_void_p(g.value))
    with open(path, "wb") as f:
        f.write(out)
    return True


def make_corpus(d, tracks, seconds, rate=48000):
    import wave

    from soundscope_tpu.native import decoder as native
    from soundscope_tpu.utils.flacenc import encode_flac

    bridge = native.codecs_available()
    kinds = ["wav", "flac", "mp3"] + (["ogg", "m4a", "aac"] if bridge else [])
    rng = np.random.default_rng(7)
    t = np.arange(int(seconds * rate)) / rate
    made = []
    for i in range(tracks):
        # cheap, varied program material (tones + noise at mixed levels)
        f0 = 80.0 * (1 + (i % 37))
        amp = 10.0 ** (rng.uniform(-30.0, -8.0) / 20.0)
        x = np.stack([
            amp * (np.sin(2 * np.pi * f0 * t + c)
                   + 0.3 * rng.standard_normal(t.size))
            for c in range(2)
        ]).astype(np.float32).clip(-0.99, 0.99)
        kind = kinds[i % len(kinds)]
        p = os.path.join(d, f"track{i:04d}.{kind}")
        if kind == "wav":
            with wave.open(p, "wb") as w:
                w.setnchannels(2)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(
                    (x.T * 32767).astype("<i2").reshape(-1).tobytes())
        elif kind == "flac":
            with open(p, "wb") as f:
                f.write(encode_flac(x, rate))
        elif kind == "mp3":
            if not _lame_encode(p, x, rate):
                continue
        elif kind == "ogg":
            native.encode(p, x, rate, codec="vorbis")
        elif kind == "m4a":
            native.encode(p, x, rate, codec="alac")
        elif kind == "aac":
            native.encode(p, x, rate, codec="aac")
        made.append(p)
    return made


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tracks = int(args[0]) if args else 1000
    seconds = float(args[1]) if len(args) > 1 else 15.0
    keep = None
    if "--keep" in sys.argv:
        keep = sys.argv[sys.argv.index("--keep") + 1]

    from soundscope_tpu.core import enable_compile_cache

    enable_compile_cache()
    from soundscope_tpu.apps.cli import _analyze_paths
    from soundscope_tpu.utils.metrics import GLOBAL as RT

    d = keep or tempfile.mkdtemp(prefix="ss_e2e_")
    os.makedirs(d, exist_ok=True)
    t0 = time.time()
    existing = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("track"))
    if keep and len(existing) >= tracks:
        paths = existing[:tracks]
        print(f"corpus: reusing {len(paths)} files in {d}",
              file=sys.stderr, flush=True)
    else:
        paths = make_corpus(d, tracks, seconds)
        print(f"corpus: {len(paths)} files ({time.time() - t0:.1f}s) in {d}",
              file=sys.stderr, flush=True)

    # warm the analyze programs the scan will actually run (compile time
    # is measured separately by the warmup/cold-start story, not here):
    # one full 64-track bucket plus the final partial bucket's size.
    flush_at = 64
    warm = min(flush_at, len(paths)) + (len(paths) % flush_at or flush_at)
    _analyze_paths(paths[: min(warm, len(paths))])
    RT.reset()

    t0 = time.time()
    rows = _analyze_paths(paths)
    wall = time.time() - t0
    errs = [r for r in rows if "error" in r]
    audio = sum(r.get("duration_s", 0.0) for r in rows)
    rep = RT.report()
    out = {
        "metric": "e2e_scan_tracks_per_sec",
        "value": round(len(rows) / wall, 1),
        "unit": "encoded_tracks/sec",
        "tracks": len(rows),
        "errors": len(errs),
        "audio_sec": round(audio, 1),
        "rt_factor": round(audio / wall, 1),
        "wall_s": round(wall, 2),
        "decode_rt": rep.get("decode", {}).get("rt_factor"),
        "analyze_rt": rep.get("analyze", {}).get("rt_factor"),
        "decode_threads": int(os.environ.get("SS_DECODE_THREADS", "0"))
        or min(os.cpu_count() or 4, 16),
    }
    print(json.dumps(out))
    if not keep:
        shutil.rmtree(d, ignore_errors=True)
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
