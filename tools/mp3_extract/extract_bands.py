"""Recover the Layer III scalefactor machinery from the strict oracle:

1. slen table: for each scalefac_compress 0..15, the long-block
   scalefactor bit count T(c) = 11*slen1 + 10*slen2 is measured by
   scanning part2 lengths until the count1 canary parses cleanly;
   11a+10b is injective on 0..7 so (slen1, slen2) follows.
2. Long scalefactor band edges (per sample rate): fill all 576 lines
   with +1 via count1-B, set one band's scalefactor to 2 (gain 1/2),
   and read which lines attenuate.
3. pretab: same probe with preflag=1 and zero scalefactors.
4. scalefac_scale: verify the doubled step.
5. Short-block reorder map (per rate): with block_type=2 frames, put a
   single +1 at each Huffman-order position and identify where it lands
   among the analytic short-IMDCT responses (subband, window, slot) —
   yielding the 576-entry reorder permutation directly, plus the short
   band edges from scalefactor attenuation.

Writes bands.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import frames as F  # noqa: E402
from backhalf import Synth, alias_reduce, freq_invert, imdct_granule  # noqa: E402
from extract_huffman import _load_d, line_response, batch_decode_strict  # noqa: E402
from frames import GranuleSpec, make_frame  # noqa: E402

CANARY = "11100"  # count1-B quad (0,0,0,1) + sign -> +1 on line 3 here


def set_rate(rate: int):
    """Point the frame writer at a different MPEG-1 sample rate."""
    idx = {44100: 0, 48000: 1, 32000: 2}[rate]
    F.RATE = rate
    F.FRAME_BYTES = (144 * 320000) // rate
    F.MAIN_DATA_BITS = (F.FRAME_BYTES - 4 - F.SIDE_INFO_BYTES) * 8
    hdr = bytearray([0xFF, 0xFB, 0xE4, 0xC0])
    hdr[2] = 0xE0 | (idx << 2)
    F.header = lambda h=bytes(hdr): h


def measure_part2_bits(c: int) -> int:
    """Scalefactor bit count for scalefac_compress=c (long blocks)."""
    hits = []
    batch, metas = [], []
    for L in range(0, 148):
        bits = "0" * L + CANARY
        g = GranuleSpec(part2_3_length=len(bits), scalefac_compress=c,
                        count1table_select=1)
        batch.append(make_frame(g, bits))
        metas.append(L)
    pcms = batch_decode_strict(batch)
    d = _load_d()
    basis = np.stack([line_response(i, d) for i in range(4)], axis=1)
    for L, pcm in zip(metas, pcms):
        coef, *_ = np.linalg.lstsq(basis, pcm.astype(np.float64), rcond=None)
        resid = pcm - basis @ coef
        rr = float(np.sqrt(np.mean(resid ** 2)))
        if (rr < 2e-3 and np.max(np.abs(coef - np.array([0, 0, 0, 1.0]))) < 0.02):
            hits.append(L)
    assert len(hits) == 1, f"scalefac_compress={c}: ambiguous lengths {hits}"
    return hits[0]


def solve_slen(T: int) -> tuple[int, int]:
    for a in range(8):
        for b in range(8):
            if 11 * a + 10 * b == T:
                return a, b
    raise AssertionError(f"no slen pair for {T} bits")


def all_ones_bits() -> str:
    """count1-B quads filling lines 0..575 with +1."""
    return ("0000" + "0000") * 144


def scalefac_bits(slen1: int, slen2: int, band: int, value: int) -> str:
    """Long-block scalefactors: bands 0..10 slen1, 11..20 slen2, one
    band set to `value` (must fit), rest zero."""
    out = []
    for b in range(21):
        n = slen1 if b < 11 else slen2
        v = value if b == band else 0
        assert v < (1 << n) or v == 0
        out.append(format(v, f"0{n}b") if n else "")
    return "".join(out)


class FullFit:
    """Per-line amplitude readout over all 576 lines."""

    def __init__(self, d: np.ndarray):
        us = []
        for ln in range(576):
            xr = np.zeros(576)
            xr[ln] = 1.0
            us.append(self._resp(xr, d))
        self.basis = np.stack(us, axis=1)          # [T, 576]
        self.pinv = np.linalg.pinv(self.basis)

    @staticmethod
    def _resp(xr, d):
        synth = Synth(d)
        overlap = np.zeros((32, 18))
        pcm = []
        x = alias_reduce(xr)
        ts, overlap = imdct_granule(x, overlap)
        ts = freq_invert(ts)
        for t in range(18):
            pcm.append(synth.step(ts[:, t]))
        for _ in range(3):
            ts, overlap = imdct_granule(np.zeros(576), overlap)
            ts = freq_invert(ts)
            for t in range(18):
                pcm.append(synth.step(ts[:, t]))
        return np.concatenate(pcm)

    def amplitudes(self, pcm: np.ndarray) -> np.ndarray:
        return self.pinv @ pcm.astype(np.float64)


def extract_long_bands(rate: int, slen: list, fit: FullFit):
    """Band edges + pretab + scalefac_scale semantics at one rate."""
    set_rate(rate)
    s1, s2 = 2, 2
    c = next(i for i, (a, b) in enumerate(slen) if a >= 2 and b >= 2)
    s1, s2 = slen[c]
    probes = []
    # per-band scalefactor=2 probes
    for band in range(21):
        sf = scalefac_bits(s1, s2, band, 2)
        bits = sf + all_ones_bits()
        g = GranuleSpec(part2_3_length=len(bits), scalefac_compress=c,
                        count1table_select=1)
        probes.append(make_frame(g, bits))
    # preflag probe (scalefac_compress 0 -> no scalefactor bits... slen
    # may be (0,0); use c but all-zero scalefactors)
    sf0 = scalefac_bits(s1, s2, 0, 0)
    bits = sf0 + all_ones_bits()
    probes.append(make_frame(GranuleSpec(
        part2_3_length=len(bits), scalefac_compress=c, preflag=1,
        count1table_select=1), bits))
    # scalefac_scale probe: band 5 sf=2 with scale=1 -> gain 1/4
    sf5 = scalefac_bits(s1, s2, 5, 2)
    bits = sf5 + all_ones_bits()
    probes.append(make_frame(GranuleSpec(
        part2_3_length=len(bits), scalefac_compress=c, scalefac_scale=1,
        count1table_select=1), bits))
    # reference all-ones, no scaling
    bits = sf0 + all_ones_bits()
    probes.append(make_frame(GranuleSpec(
        part2_3_length=len(bits), scalefac_compress=c,
        count1table_select=1), bits))

    pcms = batch_decode_strict(probes)
    ref = fit.amplitudes(pcms[-1])
    assert np.max(np.abs(ref - 1.0)) < 0.05, "all-ones reference broken"

    edges = [0]
    for band in range(21):
        amp = fit.amplitudes(pcms[band])
        scaled = np.where(np.abs(amp - 0.5) < 0.05)[0]
        lo, hi = int(scaled.min()), int(scaled.max()) + 1
        assert np.all(np.abs(amp[lo:hi] - 0.5) < 0.05), f"band {band} not contiguous"
        assert lo == edges[-1], f"band {band}: gap {lo} != {edges[-1]}"
        edges.append(hi)
    # band 21 (no scalefactor) runs to 576
    assert edges[-1] <= 576

    pre_amp = fit.amplitudes(pcms[21])
    pretab = []
    for b in range(21):
        a = float(np.median(pre_amp[edges[b]: edges[b + 1]]))
        steps = round(-2 * np.log2(max(a, 1e-9)))
        pretab.append(int(steps))
    tail = float(np.median(pre_amp[edges[-1]:])) if edges[-1] < 576 else 1.0

    ss_amp = fit.amplitudes(pcms[22])
    a5 = float(np.median(ss_amp[edges[5]: edges[6]]))

    return {"edges": edges, "pretab": pretab, "pretab_tail": tail,
            "scalefac_scale1_band5_gain": a5}


def main():
    d = _load_d()
    out = {}

    set_rate(48000)
    slen = []
    for c in range(16):
        T = measure_part2_bits(c)
        slen.append(solve_slen(T))
    print("slen table:", slen)
    out["slen"] = slen

    fit = FullFit(d)
    for rate in (48000, 44100, 32000):
        info = extract_long_bands(rate, slen, fit)
        print(f"{rate}: edges {info['edges']}")
        print(f"   pretab {info['pretab']} tail {info['pretab_tail']:.3f} "
              f"sfs1 gain {info['scalefac_scale1_band5_gain']:.4f}")
        out[str(rate)] = info

    path = os.path.join(os.path.dirname(__file__), "bands.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
