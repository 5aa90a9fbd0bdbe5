"""Aggregate per-op device time from a JAX/xprof trace capture.

Usage:
    python bench.py --profile /tmp/prof            # capture on chip
    python tools/parse_xplane.py /tmp/prof/plugins/profile/*/\
*.xplane.pb [--top N] [--events]

Reads the XSpace proto from the TPU "XLA Ops" line and prints total
device-busy time plus a per-op-family breakdown (names grouped on the
first '.', i.e. `%stft_pooled_pallas_packed.8/.9/...` aggregate). With
--events, also prints the top individual events with their full HLO
names (shapes/layouts included) — that is where retile reshapes and
layout plumbing show up. This is the tool behind the "Where the time
goes" tables in docs/KERNELS.md.
"""

import argparse
import sys
from collections import defaultdict


def _parse_one(path: str, top: int, show_events: bool) -> None:
    # the proto ships inside the tensorflow wheel in this image; xprof's
    # own package does not expose it
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        # key on the map key, not XEventMetadata.id — producers may leave
        # the id field unset and rely on the map key alone
        ev_meta = {k: m.name for k, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = defaultdict(int)
            cnt = defaultdict(int)
            t0 = t1 = None
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps
                cnt[name] += 1
                s = line.timestamp_ns * 1000 + ev.offset_ps
                e = s + ev.duration_ps
                t0 = s if t0 is None else min(t0, s)
                t1 = e if t1 is None else max(t1, e)
            total = sum(tot.values())
            span = (t1 - t0) if t0 is not None else 0
            print(
                f"plane={plane.name} span={span / 1e9:.2f} ms "
                f"busy={total / 1e9:.2f} ms events={sum(cnt.values())}"
            )
            if not total:
                continue
            fam = defaultdict(int)
            famc = defaultdict(int)
            for name, d in tot.items():
                key = name.split(".")[0]
                fam[key] += d
                famc[key] += cnt[name]
            for key, d in sorted(fam.items(), key=lambda kv: -kv[1])[:top]:
                print(
                    f"  {d / 1e9:9.2f} ms  {100 * d / total:5.1f}%  "
                    f"x{famc[key]:<5d} {key[:120]}"
                )
            if show_events:
                print("-- top individual events --")
                for n, d in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                    print(f"  {d / 1e9:8.2f} ms x{cnt[n]:<4d} {n[:220]}")


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("paths", nargs="+", help="*.xplane.pb capture file(s)")
    ap.add_argument("--top", type=int, default=30, help="rows per table")
    ap.add_argument("--events", action="store_true",
                    help="also print top individual events (full HLO names)")
    args = ap.parse_args()
    for i, path in enumerate(args.paths):
        if len(args.paths) > 1:
            print(f"=== {path} ===" if i == 0 else f"\n=== {path} ===")
        _parse_one(path, args.top, args.events)
    return 0


if __name__ == "__main__":
    sys.exit(main())
