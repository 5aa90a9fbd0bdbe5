"""Verify the Layer II allocation tables, class constants, scfsi
semantics, and table selection against the strict mpg123 oracle.

For every (subband, alloc) of each candidate table, a crafted frame
carries codes 0/1/max in granule 0; the decoded subband step values are
fitted against analytic synthesis responses. A wrong nbal layout or
class width misaligns the whole frame (garbage fit), and the fitted
line s(v) = alpha*v + beta reveals nlevels via q = 1 - 2*beta/alpha.

Writes layer2.json: verified tables, per-class linear constants, scfsi
map, and the (rate, kbps, channels) -> table selection.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import frames_layer12 as F12  # noqa: E402
from backhalf import Synth  # noqa: E402
from extract_huffman import _load_d  # noqa: E402
from oracle_mpg123 import decode_frames_mpg123  # noqa: E402


def sb_step_basis(d, sblist, nsteps=72):
    cols = []
    for sb in sblist:
        for t in range(6):
            synth = Synth(d)
            out = []
            for tt in range(nsteps):
                s32 = np.zeros(32)
                if tt == t:
                    s32[sb] = 1.0
                out.append(synth.step(s32))
            cols.append(np.concatenate(out))
    return np.stack(cols, axis=1)


class Rig:
    def __init__(self, rate=48000, kbps=192, channels=1, mode_ext=0):
        self.rate, self.kbps, self.channels = rate, kbps, channels
        self.mode_ext = mode_ext

    def decode(self, table, frames_spec):
        """frames_spec: list of (alloc, scfsi, scf, samples); returns the
        PCM window after each crafted frame (zero-separated)."""
        Z = F12.l2_zero_frame(table, self.rate, self.kbps, self.channels)
        frames = [Z]
        for spec in frames_spec:
            frames += [F12.make_l2_frame(table, *spec, self.rate, self.kbps,
                                         self.channels, self.mode_ext), Z]
        out = decode_frames_mpg123(frames, rate=self.rate,
                                   channels=self.channels)
        n = 1152 * len(frames)
        if len(out) != n:
            return None
        return [out[1152 * (1 + 2 * j): 1152 * (3 + 2 * j)].astype(np.float64)
                for j in range(len(frames_spec))]


def one_sb_frame(table, sb, alloc_val, gr0_code):
    sblimit = table[0]
    alloc = [[0] * sblimit for _ in range(2)]
    alloc[0][sb] = alloc_val
    scfsi = [[0] * sblimit for _ in range(2)]
    scf = [[None] * sblimit for _ in range(2)]
    scf[0][sb] = [0, 0, 0]
    q = table[2][sb][alloc_val - 1]
    fill = 0 if q in F12.GROUPED else (0, 0, 0)
    samples = [[[fill] * 12 for _ in range(sblimit)] for _ in range(2)]
    samples[0][sb][0] = gr0_code
    return alloc, scfsi, scf, samples


def verify_table(rig: Rig, table, d, quick=False) -> dict | None:
    """Returns {q: (alpha, beta)} on success, None on any misparse."""
    sblimit, nbal, classes = table
    consts: dict[int, tuple[float, float]] = {}
    jobs = []
    for sb in range(sblimit):
        allocs = range(1, len(classes[sb]) + 1)
        if quick:
            allocs = (1, len(classes[sb]))
        for a in allocs:
            q = classes[sb][a - 1]
            if q in F12.GROUPED:
                codes = (0, 1)
            else:
                codes = ((0, 0, 0), (1, 0, 0))
            jobs.append((sb, a, q, codes))

    specs = []
    for sb, a, q, codes in jobs:
        specs.append(one_sb_frame(table, sb, a, codes[0]))
        specs.append(one_sb_frame(table, sb, a, codes[1]))
    pcms = []
    for i in range(0, len(specs), 40):
        out = rig.decode(table, specs[i: i + 40])
        if out is None:
            return None
        pcms.extend(out)

    d_basis_cache: dict[int, np.ndarray] = {}
    for idx, (sb, a, q, codes) in enumerate(jobs):
        if sb not in d_basis_cache:
            d_basis_cache[sb] = np.linalg.pinv(sb_step_basis(d, [sb]))
        pinv = d_basis_cache[sb]
        p0, p1 = pcms[2 * idx], pcms[2 * idx + 1]
        a0 = pinv @ p0[: pinv.shape[1]]
        a1 = pinv @ p1[: pinv.shape[1]]
        v0, v1 = float(a0[0]), float(a1[0])
        alpha = v1 - v0
        if abs(alpha) < 1e-6:   # q=65535 steps are ~6e-5
            return None
        qm = 1.0 - 2.0 * v0 / alpha
        if abs(qm - q) > 0.02 * q + 0.5:
            return None
        # steps 1..5 of granule 0/1 must hold code-0 values (no shift)
        for k in (1, 2):
            if abs(float(a1[k]) - v0) > 0.02 * max(abs(v0), 1.0):
                return None
        if q not in consts:
            consts[q] = (alpha / 2.0, v0 / 2.0)   # normalized to scf=1
    return consts


def verify_scfsi(rig: Rig, table, d):
    """Which granule third uses which transmitted scalefactor."""
    pinvs = np.linalg.pinv(sb_step_basis(d, [0], nsteps=72))
    # need values across all 36 steps: build basis for steps 0..35
    cols = []
    for t in range(36):
        synth = Synth(d)
        out = []
        for tt in range(72):
            s32 = np.zeros(32)
            if tt == t:
                s32[0] = 1.0
            out.append(synth.step(s32))
        cols.append(np.concatenate(out))
    basis = np.stack(cols, axis=1)
    pinv = np.linalg.pinv(basis)

    sblimit = table[0]
    results = {}
    nscf = {0: 3, 1: 2, 2: 1, 3: 2}
    for scfsi_val in (0, 1, 2, 3):
        alloc = [[0] * sblimit for _ in range(2)]
        alloc[0][0] = 1
        scfsi = [[0] * sblimit for _ in range(2)]
        scfsi[0][0] = scfsi_val
        scf = [[None] * sblimit for _ in range(2)]
        scf[0][0] = list(range(nscf[scfsi_val]))  # distinct indices 0,1,2
        samples = [[[26] * 12 for _ in range(sblimit)] for _ in range(2)]
        # q=3 group code 26 = (2,2,2) -> +value in every step
        out = rig.decode(table, [(alloc, scfsi, scf, samples)])[0]
        amp = pinv @ out[: basis.shape[0]]
        # value at step = 2*2^(-i/3) * (2/3); read i per third
        thirds = []
        for part in range(3):
            v = float(np.median(amp[part * 12: part * 12 + 12]))
            i = round(-3 * np.log2(max(v, 1e-9) / (2 * 2.0 / 3.0)))
            thirds.append(int(i))
        results[scfsi_val] = thirds
    return results


def main():
    d = _load_d()
    out = {}

    rig = Rig(48000, 192, 1)
    ta = F12.table_a()
    consts = verify_table(rig, ta, d)
    assert consts, "table a failed verification at 48k/192"
    print("table a verified at 48k/192 mono; classes:", sorted(consts))
    out["class_consts"] = {str(q): consts[q] for q in consts}

    scfsi_map = verify_scfsi(rig, ta, d)
    print("scfsi thirds map:", scfsi_map)
    out["scfsi_map"] = scfsi_map

    # table selection scan: which candidate parses at each (rate, kbps)?
    cands = {"a": F12.table_a(), "b": F12.table_b(),
             "c": F12.table_c(), "d": F12.table_d()}
    sel = {}
    for rate in (44100, 48000, 32000):
        for kbps in (32, 48, 56, 64, 80, 96, 112, 128, 160, 192):
            got = None
            for name, tab in cands.items():
                r = Rig(rate, kbps, 1)
                ok = verify_table(r, tab, d, quick=True)
                if ok:
                    got = name
                    break
            sel[f"{rate}/{kbps}"] = got
            print(f"{rate}/{kbps} mono -> table {got}")
    out["selection_mono"] = sel

    path = os.path.join(os.path.dirname(__file__), "layer2.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
