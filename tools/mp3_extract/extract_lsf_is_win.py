"""Pin the LSF intensity-stereo is_pos GEOMETRY for window-switched
(short/mixed) intensity channels against the strict mpg123 oracle —
the round-2 open corner.

Method (no synthesis basis needed): intensity rewrites a left-channel
spectral line l into (kl*l, kr*l), so when the LEFT channel's nonzero
spectrum is confined to ONE (band, window) segment and the RIGHT
channel is all-zero (everything in the intensity region), the two
output channels are exactly proportional: pcm_r = (kr/kl) * pcm_l.
Setting one intensity scalefactor FIELD at a time and scanning which
segment's ratio moves off 1.0 maps every transmitted field to its
segment; sweeping the field value on the diagonal confirms the k-map.

Output: lsf_is_win.json {
  "short": per-field segment index ("bB:wW"),
  "mixed": per-field segment ("lB" long band / "bB:wW" short),
  "value_ratios": measured kr/kl per field value on a diagonal sample,
  "uncovered": segments never hit by any field (inheritance candidates,
               probed separately below),
  "inherit": measured ratios for uncovered segments when the LAST
             mapped field of the same kind is set,
}

Usage: python extract_lsf_is_win.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import frames_lsf as FL  # noqa: E402
from frames_lsf import LsfGranule  # noqa: E402
from oracle_mpg123 import decode_frames_mpg123  # noqa: E402

RATE = 24000
# MPEG-2 rate index 1 tables (measured in round 2, mp3_tables.inc)
LSFB = [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162, 194,
        232, 278, 332, 394, 464, 540, 576]
SSFB = [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192]
MIXED_LONG = 3 * SSFB[3]  # 36

NR_IS = {"short": [12, 12, 12], "mixed": [6, 15, 12]}


def quad_bits(values):
    out = []
    for i in range(0, len(values), 4):
        q = list(values[i: i + 4]) + [0] * (4 - len(values[i: i + 4]))
        out.append("".join("0" if v else "1" for v in q))
        for v in q:
            if v:
                out.append("1" if v < 0 else "0")
    return "".join(out)


def segments(kind):
    """Transmission-position ranges per segment, in spectral layout
    order. Returns list of (label, start, end) line ranges."""
    segs = []
    if kind == "mixed":
        for b in range(6):  # long region: bands 0..5, all below line 36
            segs.append((f"l{b}", LSFB[b], LSFB[b + 1]))
        pos = MIXED_LONG
        first_short = 3
    else:
        pos = 0
        first_short = 0
    for b in range(first_short, 13):
        width = SSFB[b + 1] - SSFB[b]
        for w in range(3):
            segs.append((f"b{b}:w{w}", pos, pos + width))
            pos += width
    return segs


def left_granule(kind, lo, hi):
    """Content = +1 on transmission lines [lo, hi), short/mixed block."""
    vals = [0] * lo + [1] * (hi - lo)
    vals += [0] * ((-len(vals)) % 4)
    m = quad_bits(vals)
    g = LsfGranule(part2_3_length=len(m), count1table_select=1,
                   global_gain=210, window_switching=True, block_type=2,
                   mixed_block=1 if kind == "mixed" else 0)
    return g, m


def right_granule(kind, fields, slen=(2, 2, 2), io_lsb=0):
    isc = slen[0] * 36 + slen[1] * 6 + slen[2]
    nr = NR_IS[kind]
    nfields = sum(nr)
    fv = [0] * nfields
    for f, v in fields.items():
        fv[f] = v
    bits = ""
    k = 0
    for gi, cnt in enumerate(nr):
        for _ in range(cnt):
            bits += format(fv[k], f"0{slen[gi]}b")
            k += 1
    g = LsfGranule(part2_3_length=len(bits), scalefac_compress=isc * 2 + io_lsb,
                   window_switching=True, block_type=2,
                   mixed_block=1 if kind == "mixed" else 0)
    return g, bits


def batch_ratios(kind, fields, segs, io_lsb=0):
    """One mpg123 call: for every segment, a [Z, probe, Z] triple with
    the given right-channel fields; returns kr/kl per segment."""
    Z = FL.lsf_stereo_zero_frame(RATE, 1, 1)
    frames = []
    for (_, lo, hi) in segs:
        g0, m0 = left_granule(kind, lo, hi)
        g1, m1 = right_granule(kind, fields, io_lsb=io_lsb)
        frames += [Z, FL.make_lsf_stereo_frame(RATE, [g0, g1], [m0, m1], 1, 1), Z]
    pcm = decode_frames_mpg123(frames, rate=RATE, channels=2)
    assert pcm.shape[1] >= len(frames) * 576 - 576, pcm.shape
    ratios = []
    for i in range(len(segs)):
        s0, s1 = 3 * i * 576, (3 * i + 3) * 576
        l = pcm[0, s0:s1].astype(np.float64)
        r = pcm[1, s0:s1].astype(np.float64)
        denom = float(l @ l)
        ratios.append(float(r @ l) / denom if denom > 1e-12 else float("nan"))
    return ratios


def main(quick=False):
    out = {}
    for kind in ("short", "mixed"):
        segs = segments(kind)
        nfields = sum(NR_IS[kind])
        mapping = {}
        print(f"--- {kind}: {nfields} fields x {len(segs)} segments ---")
        for f in range(nfields):
            ratios = batch_ratios(kind, {f: 1}, segs)
            hits = [(segs[i][0], round(r, 4)) for i, r in enumerate(ratios)
                    if np.isfinite(r) and abs(r - 1.0) > 0.02]
            mapping[f] = hits
            print(f"field {f:2d} -> {hits}")
        out[kind] = mapping

        covered = {h[0] for hs in mapping.values() for h in hs}
        uncovered = [s[0] for s in segs if s[0] not in covered]
        out[f"{kind}_uncovered"] = uncovered
        print("uncovered segments:", uncovered)

        # inheritance probe: set EVERY field to 1 and read the ratio of
        # the uncovered segments (nonzero -> they inherit something)
        all1 = {f: 1 for f in range(nfields)}
        ratios = batch_ratios(kind, all1, segs)
        out[f"{kind}_allone"] = {segs[i][0]: round(r, 4)
                                 for i, r in enumerate(ratios)}
        print("all-fields-1 ratios:", out[f"{kind}_allone"])

        if not quick:
            # value sweep on one mapped diagonal field per kind
            probe_f = next(f for f, hs in mapping.items() if hs)
            seg_label = mapping[probe_f][0][0]
            seg = next(s for s in segs if s[0] == seg_label)
            sweep = {}
            for v in (1, 2, 3):
                for io_lsb in (0, 1):
                    r = batch_ratios(kind, {probe_f: v}, [seg], io_lsb=io_lsb)[0]
                    sweep[f"v{v}_io{io_lsb}"] = round(r, 4)
            out[f"{kind}_value_sweep"] = {"field": probe_f, "seg": seg_label,
                                          **sweep}
            print("value sweep:", out[f"{kind}_value_sweep"])

    with open(os.path.join(os.path.dirname(__file__), "lsf_is_win.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("wrote lsf_is_win.json")


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
