"""Measure how mpg123 interprets MPEG-2.5 8 kHz mixed-block granules.

The 8 kHz LSF band geometry is self-contradictory for mixed blocks: the
six long scalefactor bands span 72 lines, but the hybrid filterbank's
long region (2 subbands) holds only 36. This rig puts a single ±1 on
one TRANSMISSION line per crafted frame (count1-table-B impulse),
decodes with mpg123, and fits the PCM against a dictionary of hybrid
impulse responses (every (subband, slot) position under the mixed-block
back half) — recovering, line by line, which hybrid position the
decoder assigns and with which window. Writes mixed8k.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import frames_lsf as FL  # noqa: E402
from backhalf import (  # noqa: E402
    Synth, alias_reduce, alias_reduce_bounds, freq_invert, imdct_granule,
    imdct_granule_mixed,
)
from extract_d import count1b_impulse_bits  # noqa: E402
from extract_huffman import _load_d  # noqa: E402
from frames_lsf import LsfGranule  # noqa: E402
from oracle_mpg123 import decode_frames_mpg123  # noqa: E402

RATE = 8000


def impulse_frame(line: int) -> bytes:
    bits = count1b_impulse_bits(line)
    g = LsfGranule(part2_3_length=len(bits), window_switching=True,
                   block_type=2, mixed_block=1, count1table_select=1)
    return FL.make_lsf_frame(RATE, g, bits)


def hybrid_dictionary(d: np.ndarray) -> np.ndarray:
    """B[h] = PCM (3*576) of a +1 at hybrid position h in a mixed
    granule sandwiched between long zero granules."""
    cols = []
    for h in range(576):
        xr = np.zeros(576)
        xr[h] = 1.0
        synth = Synth(d)
        overlap = np.zeros((32, 18))
        outs = []
        # granule 1: long zeros
        ts, overlap = imdct_granule(np.zeros(576), overlap)
        ts = freq_invert(ts)
        for t in range(18):
            outs.append(synth.step(ts[:, t]))
        # granule 2: the mixed impulse (alias only across the 0|1 edge)
        ts, overlap = imdct_granule_mixed(alias_reduce_bounds(xr, 1), overlap)
        ts = freq_invert(ts)
        for t in range(18):
            outs.append(synth.step(ts[:, t]))
        # granule 3: long zeros (rings out the overlap)
        ts, overlap = imdct_granule(np.zeros(576), overlap)
        ts = freq_invert(ts)
        for t in range(18):
            outs.append(synth.step(ts[:, t]))
        cols.append(np.concatenate(outs))
    return np.stack(cols, axis=1)        # (1728, 576)


def main():
    d = _load_d()
    print("building hybrid dictionary...", flush=True)
    B = hybrid_dictionary(d)
    pinv = np.linalg.pinv(B)

    Z = FL.lsf_zero_frame(RATE)
    lines = list(range(0, 120))
    frames = [Z]
    for ln in lines:
        frames += [impulse_frame(ln), Z]
    out = decode_frames_mpg123(frames, rate=RATE, channels=1)
    assert len(out) == 576 * len(frames), len(out)

    mapping = {}
    for idx, ln in enumerate(lines):
        pcm = out[576 * (1 + 2 * idx): 576 * (4 + 2 * idx)].astype(np.float64)
        if len(pcm) < 1728:
            pcm = np.pad(pcm, (0, 1728 - len(pcm)))
        amp = pinv @ pcm
        resid = float(np.max(np.abs(pcm - B @ amp)))
        top = np.argsort(-np.abs(amp))[:3]
        entry = [(int(h), round(float(amp[h]), 4)) for h in top
                 if abs(amp[h]) > 0.05]
        mapping[ln] = {"hybrid": entry, "resid": round(resid, 5),
                       "energy": round(float(np.max(np.abs(pcm))), 5)}
        print(ln, entry, "resid", round(resid, 5), flush=True)

    path = os.path.join(os.path.dirname(__file__), "mixed8k.json")
    with open(path, "w") as f:
        json.dump(mapping, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
