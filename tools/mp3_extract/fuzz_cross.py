"""Randomized structured cross-validation of the first-party MPEG
decoder against mpg123 (primary) and libav (arbiter).

Frames are structurally valid by construction: correct scalefactor bit
counts for every (block type, scalefac_compress) shape, quad-aligned
count1 content (the references disagree on quads that cross
part2_3_end, see test_count1_overrun_drop), random gains and
subblock_gains, all block shapes incl. start/stop and mixed, MPEG-1
and LSF, mono/joint with every mode_ext.

A case counts as a finding when the decoder differs from mpg123 beyond
1e-3 of peak; libav then arbitrates:
  * libav agrees with us   -> known-class mpg123 quirk (recorded)
  * libav agrees with mpg123 -> decoder bug (fails loudly)
  * three-way disagreement -> implementation-defined corner (recorded)

The LSF windowed-IS geometry (round 2's open corner) is now fully
measured and implemented (extract_lsf_is_win.py): per-window intensity
borders for short blocks (MPEG-1 and LSF), the mixed-block double
landscape — is_pos over EIGHT long bands in the line-interleaved
domain vs. short bands from band 3, mode-picked by whether the
intensity region starts below the short lines — incl. the sqrt(2)
MS-coupled k table and the is_pos==7 copy special of the li-overlap
region, plus the separate requantisation mapping. One residual
three-way shape is recorded, not open: LEFT channel window-switched
short while the RIGHT (intensity) channel is a long-geometry
start/stop block — there mpg123 indexes is_pos slots beyond the 21
transmitted long fields (uninitialised-buffer artifact, measured as
band-pattern divergence with uniform fields), libav diverges wildly on
all windowed IS, and no encoder emits the shape; all three decoders
disagree pairwise.

Usage: python fuzz_cross.py [N] [seed]  (failing blobs land in /tmp).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import frames_lsf as FL  # noqa: E402
from frames import GranuleSpec  # noqa: E402
from frames_lsf import LsfGranule  # noqa: E402
from frames_stereo import make_stereo_frame, zero_stereo_frame  # noqa: E402
from oracle_mpg123 import decode_frames_mpg123  # noqa: E402

SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]


def quad_bits(values):
    out = []
    for i in range(0, len(values), 4):
        q = values[i: i + 4]
        out.append("".join("0" if v else "1" for v in q))
        for v in q:
            if v:
                out.append("1" if v < 0 else "0")
    return "".join(out)


import json  # noqa: E402

with open(os.path.join(os.path.dirname(__file__),
                       "huffman_tables.json")) as _f:
    _C1A_CODES = {tuple(v): k
                  for k, v in json.load(_f)["count1A"]["codes"].items()}


def quad_bits_a(values):
    """count1 table-A encoding (extracted codes), quad-aligned like
    quad_bits: the campaign tests spec-shaped streams; quads crossing
    part2_3_end are the separately-pinned overrun corner
    (test_count1_overrun_drop) and must not leak in here, which is what
    happened when table-B bits were fed to table-A granules."""
    out = []
    for i in range(0, len(values), 4):
        q = values[i: i + 4]
        out.append(_C1A_CODES[tuple(1 if v else 0 for v in q)])
        for v in q:
            if v:
                out.append("1" if v < 0 else "0")
    return "".join(out)


class Gen:
    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)

    def content(self, c1t):
        n = int(self.rng.integers(8, 100)) * 4
        vals = [int(v) for v in self.rng.choice([-1, 0, 1],
                                                p=[0.3, 0.4, 0.3], size=n)]
        return quad_bits_a(vals) if c1t == 0 else quad_bits(vals)

    def block(self):
        if self.rng.random() < 0.4:
            return False, 0, 0
        bt = int(self.rng.choice([1, 2, 3]))
        mixed = int(self.rng.integers(0, 2)) if bt == 2 else 0
        return True, bt, mixed

    def m1_granule(self):
        ws, bt, mixed = self.block()
        scomp = int(self.rng.integers(0, 16))
        s1, s2 = SLEN[scomp]
        if ws and bt == 2:
            nsf = (8 * s1 + 9 * s1 + 18 * s2) if mixed else (18 * s1 + 18 * s2)
        else:
            nsf = 11 * s1 + 10 * s2
        sf = "".join(self.rng.choice(["0", "1"]) for _ in range(nsf))
        c1t = int(self.rng.integers(0, 2))
        content = self.content(c1t)
        g = GranuleSpec(
            part2_3_length=nsf + len(content), scalefac_compress=scomp,
            count1table_select=c1t,
            global_gain=int(self.rng.integers(190, 220)),
            scalefac_scale=int(self.rng.integers(0, 2)),
            window_switching=ws, block_type=bt, mixed_block=mixed,
            subblock_gain=tuple(int(v) for v in self.rng.integers(0, 4, 3)))
        return g, sf + content

    def lsf_granule(self, intensity):
        ws, bt, mixed = self.block()
        sc = int(self.rng.integers(0, 512))
        kind = 0 if not (ws and bt == 2) else (2 if mixed else 1)
        if intensity:
            isc = sc >> 1
            if isc < 180:
                sl = [isc // 36, (isc % 36) // 6, isc % 6, 0]
                row = 0
            elif isc < 244:
                j = isc - 180
                sl = [(j >> 4) & 3, (j >> 2) & 3, j & 3, 0]
                row = 1
            else:
                j = isc - 244
                sl = [j // 3, j % 3, 0, 0]
                row = 2
            nrs = ([[7, 7, 7, 0], [12, 12, 12, 0], [6, 15, 12, 0]],
                   [[6, 6, 6, 0], [12, 9, 9, 0], [6, 12, 9, 0]],
                   [[8, 8, 0, 0], [15, 12, 0, 0], [6, 18, 0, 0]])
            nr = nrs[row][kind]
        else:
            if sc < 400:
                sl = [(sc >> 4) // 5, (sc >> 4) % 5, (sc & 15) >> 2, sc & 3]
                row = 0
            elif sc < 500:
                s2 = sc - 400
                sl = [(s2 >> 2) // 5, (s2 >> 2) % 5, s2 & 3, 0]
                row = 1
            else:
                s2 = sc - 500
                sl = [s2 // 3, s2 % 3, 0, 0]
                row = 2
            nrs = ([[6, 5, 5, 5], [9, 9, 9, 9], [6, 9, 9, 9]],
                   [[6, 5, 7, 3], [9, 9, 12, 6], [6, 9, 12, 6]],
                   [[11, 10, 0, 0], [18, 18, 0, 0], [15, 18, 0, 0]])
            nr = nrs[row][kind]
        nsf = sum(s * r for s, r in zip(sl, nr))
        sf = "".join(self.rng.choice(["0", "1"]) for _ in range(nsf))
        c1t = int(self.rng.integers(0, 2))
        content = self.content(c1t)
        g = LsfGranule(
            part2_3_length=nsf + len(content), scalefac_compress=sc,
            count1table_select=c1t,
            global_gain=int(self.rng.integers(190, 220)),
            scalefac_scale=int(self.rng.integers(0, 2)),
            window_switching=ws, block_type=bt, mixed_block=mixed,
            subblock_gain=tuple(int(v) for v in self.rng.integers(0, 4, 3)))
        return g, sf + content

    def case(self):
        kind = str(self.rng.choice(["m1stereo", "lsfmono", "lsfstereo"]))
        if kind == "m1stereo":
            mode_ext = int(self.rng.integers(0, 4))
            gs, ms = [], []
            for gr in range(2):
                pg, pm = [], []
                for chn in range(2):
                    g, m = self.m1_granule()
                    pg.append(g)
                    pm.append(m)
                gs.append(pg)
                ms.append(pm)
            frames = [zero_stereo_frame(1, mode_ext),
                      make_stereo_frame(gs, ms, mode=1, mode_ext=mode_ext),
                      zero_stereo_frame(1, mode_ext)]
            return kind, 48000, 2, frames
        rate = 24000
        if kind == "lsfstereo":
            mode_ext = int(self.rng.integers(0, 4))
            Z = FL.lsf_stereo_zero_frame(rate, 1, mode_ext)
            pg, pm = [], []
            for chn in range(2):
                g, m = self.lsf_granule(chn == 1 and bool(mode_ext & 1))
                pg.append(g)
                pm.append(m)
            fr = FL.make_lsf_stereo_frame(rate, pg, pm, 1, mode_ext)
            return kind, rate, 2, [Z, fr, Z]
        Z = FL.lsf_zero_frame(rate)
        g, m = self.lsf_granule(False)
        return kind, rate, 1, [Z, FL.make_lsf_frame(rate, g, m), Z]


def main(n_trials=150, seed=2024):
    from soundscope_tpu.native import decoder

    gen = Gen(seed)
    quirks = bugs = threeway = skipped = 0
    for trial in range(n_trials):
        try:
            kind, rate, ch, frames = gen.case()
        except AssertionError:
            skipped += 1
            continue
        blob = b"".join(frames)
        path = "/tmp/fuzz_case.mp3"
        with open(path, "wb") as f:
            f.write(blob)
        try:
            mine = np.atleast_2d(np.asarray(decoder.decode_mp3(path).samples))
        except Exception as e:
            print(f"trial {trial} {kind}: NATIVE EXCEPTION {e}")
            bugs += 1
            continue
        ref = np.atleast_2d(decode_frames_mpg123(frames, rate=rate,
                                                 channels=ch))
        n = min(mine.shape[1], ref.shape[1])
        if n == 0 or float(np.max(np.abs(ref))) < 1e-9:
            skipped += 1
            continue   # mpg123 rejected the frame outright
        peak = max(float(np.max(np.abs(ref))), 1.0)
        err = float(np.max(np.abs(mine[:, :n] - ref[:, :n])))
        if err <= 1e-3 * peak:
            continue
        av = np.atleast_2d(np.asarray(decoder.decode_any(path).samples))
        nav = min(mine.shape[1], av.shape[1])
        av_err = float(np.max(np.abs(mine[:, :nav] - av[:, :nav])))
        ref_av = float(np.max(np.abs(ref[:, :n][:, :nav] - av[:, :nav])))
        if av_err <= 1e-3 * peak:
            quirks += 1       # we match libav; mpg123 is the outlier
        elif ref_av <= 1e-3 * peak:
            bugs += 1         # both references agree against us
            keep = f"/tmp/fuzz_bug_{trial}.mp3"
            os.replace(path, keep)
            print(f"trial {trial} {kind}: BUG err={err:.4f} "
                  f"peak={peak:.1f} saved {keep}")
        else:
            threeway += 1
    print(f"trials={n_trials} skipped={skipped} mpg123-quirks={quirks} "
          f"three-way={threeway} BUGS={bugs}")
    return bugs


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2024
    sys.exit(1 if main(n, seed) else 0)
