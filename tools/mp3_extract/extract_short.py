"""Short-block (block_type 2) extraction + window-shape verification.

1. Reorder map per sample rate: put a single +1 at each Huffman-order
   position (count1-B quads), decode, and identify which analytic
   (subband, window, slot) response it produces. This measures the
   requantize->reorder permutation directly, without assuming the
   short scalefactor-band layout.
2. Short band edges: per-(band, window) scalefactor attenuation over an
   all-ones spectrum, read back in Huffman (ix) order.
3. subblock_gain step: set gain=1 on window 1, expect x0.25.
4. Start/stop window verification: block_type 1/3 frames with long-band
   impulses must match the analytic sine/half-sine windows.

Writes short.json: {rate: {"reorder": [...576 of [sb,w,slot]...],
"edges": [...13...]}, "sbg_gain": g, "win13_resid": r}
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from extract_bands import set_rate  # noqa: E402
from extract_huffman import _load_d, batch_decode_strict  # noqa: E402
from frames import GranuleSpec, make_frame  # noqa: E402

# 12-point IMDCT basis and short sine window
_I12 = np.arange(12)[:, None]
_K6 = np.arange(6)[None, :]
IMDCT12 = np.cos(np.pi / 24.0 * (2 * _I12 + 1 + 6) * (2 * _K6 + 1))
WIN_SHORT = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))

N_STEPS = 72


def short_response(sb: int, w: int, slot: int, d: np.ndarray) -> np.ndarray:
    """Analytic PCM response of +1 in (subband sb, window w, slot)."""
    X = np.zeros(6)
    X[slot] = 1.0
    z = (IMDCT12 @ X) * WIN_SHORT            # [12]
    buf = np.zeros(36)
    buf[6 + 6 * w: 18 + 6 * w] += z
    ts = np.zeros((32, 36))
    ts[sb] = buf
    synth = Synth(d)
    pcm = []
    first = freq_invert(ts[:, :18])
    second_in = ts[:, 18:]
    for t in range(18):
        pcm.append(synth.step(first[:, t]))
    ts2 = freq_invert(second_in)
    for t in range(18):
        pcm.append(synth.step(ts2[:, t]))
    for _ in range(2):
        z18 = np.zeros((32, 18))
        for t in range(18):
            pcm.append(synth.step(z18[:, t]))
    return np.concatenate(pcm)


def impulse_bits(pos: int) -> str:
    q, r = divmod(pos, 4)
    quad = [0, 0, 0, 0]
    quad[r] = 1
    code = 15 - (quad[0] * 8 + quad[1] * 4 + quad[2] * 2 + quad[3])
    return "1111" * q + format(code, "04b") + "0"


def short_granule(bits: str, scalefac_compress=0, subblock_gain=(0, 0, 0),
                  scalefac_scale=0) -> bytes:
    g = GranuleSpec(part2_3_length=len(bits),
                    scalefac_compress=scalefac_compress,
                    count1table_select=1, window_switching=True,
                    block_type=2, mixed_block=0,
                    subblock_gain=subblock_gain,
                    scalefac_scale=scalefac_scale)
    return make_frame(g, bits)


def extract_reorder(rate: int, d: np.ndarray):
    set_rate(rate)
    basis = np.stack([short_response(sb, w, s, d)
                      for sb in range(32) for w in range(3) for s in range(6)],
                     axis=1)
    pinv = np.linalg.pinv(basis)
    frames_ = [short_granule(impulse_bits(i)) for i in range(576)]
    pcms = batch_decode_strict(frames_)
    mapping = []
    for i, pcm in enumerate(pcms):
        coef = pinv @ pcm.astype(np.float64)
        j = int(np.argmax(np.abs(coef)))
        resid = pcm - basis[:, j] * coef[j]
        ok = (abs(coef[j] - 1.0) < 0.03
              and np.sqrt(np.mean(resid ** 2)) < 0.03)
        assert ok, (rate, i, coef[j], float(np.sqrt(np.mean(resid**2))))
        sb, rem = divmod(j, 18)
        w, s = divmod(rem, 6)
        mapping.append([sb, w, s])
    flat = [m[0] * 18 + m[1] * 6 + m[2] for m in mapping]
    assert sorted(flat) == list(range(576)), "reorder not a bijection"
    return mapping


def extract_short_edges(rate: int, d: np.ndarray, slen):
    """Short scalefactor layout: scan scalefactor bit budget, then
    per-(band,window) attenuation in ix order."""
    set_rate(rate)
    c = 9                      # slen (2,2) in the measured table
    s1, s2 = slen[c]
    ones = ("0000" + "0000") * 144

    def sf_bits(target_idx: int) -> str:
        # short scalefactors: 12 bands x 3 windows; order hypothesis is
        # measured, not assumed: we set ONE field in the serialized
        # order and see which lines attenuate.
        out = []
        k = 0
        for b in range(12):
            n = s1 if b < 6 else s2
            for w in range(3):
                v = 2 if k == target_idx else 0
                out.append(format(v, f"0{n}b") if n else "")
                k += 1
        return "".join(out)

    probes = [short_granule(sf_bits(i) + ones, scalefac_compress=c)
              for i in range(36)]
    probes.append(short_granule(sf_bits(-1) + ones, scalefac_compress=c))
    probes.append(short_granule(sf_bits(-1) + ones, scalefac_compress=c,
                                subblock_gain=(0, 1, 0)))
    pcms = batch_decode_strict(probes)

    basis = np.stack([short_response(sb, w, s, d)
                      for sb in range(32) for w in range(3) for s in range(6)],
                     axis=1)
    pinv = np.linalg.pinv(basis)
    ref = pinv @ pcms[36].astype(np.float64)
    assert np.max(np.abs(np.abs(ref) - 1.0)) < 0.05, "short all-ones broken"

    fields = []
    for i in range(36):
        amp = pinv @ pcms[i].astype(np.float64)
        scaled = np.where(np.abs(np.abs(amp) - 0.5) < 0.05)[0]
        fields.append(scaled)
    # subblock gain
    sbg = pinv @ pcms[37].astype(np.float64)
    w1 = [j for j in range(576) if (j % 18) // 6 == 1]
    g = float(np.median(np.abs(sbg[w1])))
    return fields, g


def verify_start_stop_windows(d: np.ndarray):
    """block_type 1 and 3 long IMDCTs against analytic windows."""
    from backhalf import IMDCT36, Synth as S2

    set_rate(48000)
    win1 = np.concatenate([
        np.sin(np.pi / 36 * (np.arange(18) + 0.5)),
        np.ones(6),
        np.sin(np.pi / 12 * (np.arange(24, 30) - 24 + 0.5))[::-1],
        np.zeros(6),
    ])
    win3 = win1[::-1].copy()
    worst = 0.0
    for bt, win in ((1, win1), (3, win3)):
        bits = impulse_bits(0)
        g = GranuleSpec(part2_3_length=len(bits), count1table_select=1,
                        window_switching=True, block_type=bt, mixed_block=0)
        pcm = batch_decode_strict([make_frame(g, bits)])[0].astype(np.float64)
        z = (IMDCT36 @ np.eye(18)[:, 0]) * win
        ts = np.zeros((32, 36))
        ts[0] = z
        synth = S2(d)
        ref = []
        a = freq_invert(ts[:, :18])
        for t in range(18):
            ref.append(synth.step(a[:, t]))
        b = freq_invert(ts[:, 18:])
        for t in range(18):
            ref.append(synth.step(b[:, t]))
        for _ in range(2):
            for t in range(18):
                ref.append(synth.step(np.zeros(32)))
        ref = np.concatenate(ref)
        r = float(np.sqrt(np.mean((pcm - ref) ** 2)) /
                  np.sqrt(np.mean(ref ** 2)))
        print(f"block_type {bt}: rel resid {r:.2e}")
        worst = max(worst, r)
    return worst


def main():
    d = _load_d()
    with open(os.path.join(os.path.dirname(__file__), "bands.json")) as f:
        slen = [tuple(x) for x in json.load(f)["slen"]]

    out = {}
    for rate in (48000, 44100, 32000):
        mapping = extract_reorder(rate, d)
        fields, g = extract_short_edges(rate, d, slen)
        print(f"{rate}: reorder ok; sbg(1) gain {g:.4f}")
        out[str(rate)] = {
            "reorder": mapping,
            "sf_fields": [f.tolist() for f in fields],
        }
        out["sbg_gain"] = g

    out["win13_resid"] = verify_start_stop_windows(d)

    path = os.path.join(os.path.dirname(__file__), "short.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
