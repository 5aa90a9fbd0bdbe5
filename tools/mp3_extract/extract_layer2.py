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
    def __init__(self, rate=48000, kbps=192, channels=1, mode_ext=0,
                 mode=None):
        self.rate, self.kbps, self.channels = rate, kbps, channels
        self.mode_ext, self.mode = mode_ext, mode

    def decode(self, table, frames_spec):
        """frames_spec: list of (alloc, scfsi, scf, samples); returns the
        PCM window after each crafted frame (zero-separated). For
        channels == 2 the PCM is channel 0 only."""
        Z = F12.l2_zero_frame(table, self.rate, self.kbps, self.channels,
                              self.mode)
        frames = [Z]
        for spec in frames_spec:
            frames += [F12.make_l2_frame(table, *spec, self.rate, self.kbps,
                                         self.channels, self.mode_ext,
                                         self.mode), Z]
        out = decode_frames_mpg123(frames, rate=self.rate,
                                   channels=self.channels)
        if self.channels == 2:
            out = out[0] if out.ndim == 2 else out
        n = 1152 * len(frames)
        if out.shape[-1] != n:
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
    scf[1][sb] = [0, 0, 0]   # needed above a joint-stereo bound
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
                codes = (0, 1, q - 1)
            else:
                codes = ((0, 0, 0), (1, 0, 0), (q - 1, 0, 0))
            jobs.append((sb, a, q, codes))

    specs = []
    for sb, a, q, codes in jobs:
        for c in codes:
            specs.append(one_sb_frame(table, sb, a, c))
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
        p0, p1, pm = pcms[3 * idx], pcms[3 * idx + 1], pcms[3 * idx + 2]
        a0 = pinv @ p0[: pinv.shape[1]]
        a1 = pinv @ p1[: pinv.shape[1]]
        am = pinv @ pm[: pinv.shape[1]]
        v0, v1, vm = float(a0[0]), float(a1[0]), float(am[0])
        alpha = v1 - v0
        if abs(alpha) < 1e-6:   # q=65535 steps are ~6e-5
            return None
        qm = 1.0 - 2.0 * v0 / alpha
        if abs(qm - q) > 0.02 * q + 0.5:
            return None
        # the max code must land on the same line: v(q-1) = alpha(q-1)+v0.
        # This catches aliased class sizes (a q=2k+1 class misread as
        # q=k has alpha' = 2*alpha, which still fits the 0/1 line).
        want = alpha * (q - 1) + v0
        if abs(vm - want) > 0.02 * max(abs(want), 1.0):
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

    # 1. full per-(subband, alloc) verification of every table at a
    #    canonical (rate, kbps) that selects it
    tables = {"a": F12.table_a(), "b": F12.table_b(), "c": F12.table_c(),
              "d": F12.table_d(), "lsf": F12.table_lsf()}
    configs = {"a": (48000, 192, 1), "b": (44100, 192, 1),
               "c": (48000, 32, 1), "d": (32000, 32, 1),
               "lsf": (24000, 64, 1)}
    consts: dict[int, tuple[float, float]] = {}
    for name, tab in tables.items():
        rate, kbps, ch = configs[name]
        got = verify_table(Rig(rate, kbps, ch), tab, d)
        assert got, f"table {name} failed full verification at {rate}/{kbps}"
        consts.update(got)
        print(f"table {name} fully verified at {rate}/{kbps}", flush=True)
    out["tables"] = {k: {"sblimit": t[0], "nbal": list(t[1]),
                         "classes": [list(c) for c in t[2]]}
                    for k, t in tables.items()}
    out["class_consts"] = {str(q): consts[q] for q in sorted(consts)}

    # 2. scfsi semantics: which transmitted scalefactor serves each
    #    12-step third of the frame
    out["scfsi_map"] = verify_scfsi(Rig(48000, 192, 1), tables["a"], d)
    print("scfsi thirds map:", out["scfsi_map"], flush=True)

    # 3. table selection: scan every (rate, kbps, channels); the result
    #    collapses to a bitrate-per-channel rule (recorded raw)
    sel = {}
    for rate in (44100, 48000, 32000):
        for kbps in (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                     256, 320, 384):
            for ch, mode in ((1, 3), (2, 0)):
                got = None
                for name in ("a", "b", "c", "d"):
                    try:
                        if verify_table(Rig(rate, kbps, ch, mode=mode),
                                        tables[name], d, quick=True):
                            got = name
                            break
                    except AssertionError:
                        continue  # frame too small for this table
                key = f"{rate}/{kbps}/{'m' if ch == 1 else 's'}"
                sel[key] = got
                print(key, "->", got, flush=True)
    out["selection"] = sel
    # LSF: one table at every low rate (incl. MPEG-2.5) and in stereo
    for rate, kbps, ch, mode in ((22050, 64, 1, 3), (24000, 64, 1, 3),
                                 (16000, 32, 1, 3), (11025, 64, 1, 3),
                                 (12000, 64, 1, 3), (8000, 32, 1, 3),
                                 (24000, 128, 2, 0)):
        ok = verify_table(Rig(rate, kbps, ch, mode=mode), tables["lsf"], d,
                          quick=True)
        assert ok, f"lsf table rejected at {rate}/{kbps}/{ch}ch"
        print(f"lsf confirmed at {rate}/{kbps}/{ch}ch", flush=True)

    # 4. joint-stereo bound: above (mode_ext+1)*4 the sample data (and
    #    allocation) are shared, scalefactors stay per-channel
    tab = tables["a"]
    sblimit = tab[0]
    for sb, mode_ext, above in ((10, 1, True), (2, 1, False)):
        alloc = [[0] * sblimit for _ in range(2)]
        alloc[0][sb] = 1
        scfsi = [[0] * sblimit for _ in range(2)]
        scf = [[None] * sblimit for _ in range(2)]
        scf[0][sb] = [0, 0, 0]
        scf[1][sb] = [3, 3, 3]
        samples = [[[0] * 12 for _ in range(sblimit)] for _ in range(2)]
        samples[0][sb][0] = 2          # q=3 group code 2 -> c0 = 2 (+2/3)
        fr = F12.make_l2_frame(tab, alloc, scfsi, scf, samples, 48000, 192,
                               2, mode_ext)
        Z = F12.l2_zero_frame(tab, 48000, 192, 2)
        pcm = decode_frames_mpg123([Z, fr, Z], rate=48000, channels=2)
        pinv = np.linalg.pinv(sb_step_basis(d, [sb]))
        v = [float((pinv @ pcm[c][1152:1152 * 3][: pinv.shape[1]])[0])
             for c in range(2)]
        assert abs(v[0] - 4 / 3) < 0.01, v
        want1 = (4 / 3) * 2 ** -1 if above else 0.0
        assert abs(v[1] - want1) < 0.01, (sb, v)
        print(f"joint bound semantics ok at sb{sb} "
              f"({'above' if above else 'below'} bound)", flush=True)

    path = os.path.join(os.path.dirname(__file__), "layer2.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
