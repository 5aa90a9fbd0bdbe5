"""Measure how mpg123 interprets MPEG-2.5 8 kHz mixed-block granules.

The 8 kHz LSF band geometry is self-contradictory for mixed blocks: the
six long scalefactor bands span 72 lines, but the hybrid filterbank's
long region (2 subbands) holds only 36, and the short bands begin at
ssfb[3] = 24 (line-interleaved position 72).

Method (all against the mpg123 float oracle):
  1. single-line impulses (count1-table-B) on each TRANSMISSION line of
     a mixed granule;
  2. the same impulses on a pure-SHORT granule — whose transmission ->
     hybrid map is already validated (the first-party decoder matches
     mpg123 exactly on non-mixed 8 kHz short blocks);
  3. every mixed response is matched against the short-response
     dictionary by least squares. The match is always a single short
     response with coefficient 1.0, which reads off the placement:

       lines  0..35  long region (2 hybrid subbands, linear);
       lines 36..71  stay AT their line-interleaved positions
                     (identity: L = p/3, window = p%3, short windows);
       lines 72..    the normal short band-table reorder, starting at
                     band 3 exactly as in a pure short granule.

     i.e. the decoder's mixed requantise/reorder boundary is
     3*ssfb[3] = 72 lines (it is 36 at every other rate, where the two
     geometries agree), while the hybrid long region stays 2 subbands.

Writes mixed8k.json with the measured per-line placement.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import frames_lsf as FL  # noqa: E402
from extract_d import count1b_impulse_bits  # noqa: E402
from frames_lsf import LsfGranule  # noqa: E402
from oracle_mpg123 import decode_frames_mpg123  # noqa: E402

RATE = 8000
# validated 8 kHz short band edges (lsf.json short_spans widths)
SSFB = [0, 8, 16, 24, 32, 40, 48, 56, 64, 72, 84, 96, 108, 120]


def impulse_frame(line: int, mixed: int) -> bytes:
    bits = count1b_impulse_bits(line)
    g = LsfGranule(part2_3_length=len(bits), window_switching=True,
                   block_type=2, mixed_block=mixed, count1table_select=1)
    return FL.make_lsf_frame(RATE, g, bits)


def responses(lines, mixed):
    Z = FL.lsf_zero_frame(RATE)
    frames = [Z]
    for ln in lines:
        frames += [impulse_frame(ln, mixed), Z]
    out = decode_frames_mpg123(frames, rate=RATE, channels=1)
    assert len(out) == 576 * len(frames)
    return {ln: out[576 * (1 + 2 * i): 576 * (3 + 2 * i)].astype(np.float64)
            for i, ln in enumerate(lines)}


def short_line_to_li(q: int) -> int:
    """Transmission line of a pure short granule -> line-interleaved
    position 3L+w (band-major, window-minor transmission order)."""
    for band in range(13):
        lo, hi = SSFB[band], SSFB[band + 1]
        width = hi - lo
        base = 3 * lo
        if base <= q < base + 3 * width:
            off = q - base
            w, l = off // width, off % width
            return 3 * (lo + l) + w
    raise ValueError(q)


def main():
    lines = list(range(0, 150))
    S = responses(lines, mixed=0)
    M = responses(lines, mixed=1)
    D = np.stack([S[q] for q in lines], axis=1)
    pinv = np.linalg.pinv(D)

    mapping = {}
    for p in lines:
        m = M[p]
        if np.linalg.norm(m) < 1e-9:
            mapping[p] = None
            continue
        amp = pinv @ m
        resid = float(np.linalg.norm(m - D @ amp) / np.linalg.norm(m))
        top = int(np.argmax(np.abs(amp)))
        if p >= 36:
            # every mixed line >= 36 is dominated by exactly one short
            # response with unit coefficient (a few lines adjacent to
            # the long|short seam carry a small extra component — the
            # full-decoder sweep in tests/test_mp3_native.py pins those
            # at float precision)
            assert resid < 0.25 and abs(amp[top] - 1.0) < 0.05, (p, resid)
            li = short_line_to_li(lines[top])
            mapping[p] = li
            if 36 <= p < 72:
                assert li == p, (p, li)      # identity region
            else:
                assert li == short_line_to_li(p), (p, li)  # band-table
        else:
            mapping[p] = "long"
        if p % 12 == 0:
            print(f"line {p}: {mapping[p]} (resid {resid:.4f})", flush=True)

    path = os.path.join(os.path.dirname(__file__), "mixed8k.json")
    with open(path, "w") as f:
        json.dump({"placement": {str(k): v for k, v in mapping.items()}}, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
