"""Recover the 512-tap synthesis window D from the libav oracle.

Method: craft frames whose granule-1 spectrum is a single ±1 impulse on
a chosen line (encoded purely with count1 table B, whose trivial 4-bit
complement code was established by hypothesis testing). The decode chain
spectrum -> PCM is linear; with the alias/IMDCT/matrixing stages computed
analytically (backhalf.py), every output sample is a known linear form in
D. The system decomposes mod 32 into 32 independent 16-unknown problems;
least squares over a few hundred probes recovers D to float64 accuracy,
and the residual doubles as a proof that the analytic conventions match.

Writes d_window.json: {"d": [...512 floats...], "resid": r}.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from backhalf import granule_u_matrix  # noqa: E402
from frames import GranuleSpec, make_frame, zero_frame  # noqa: E402
from oracle import decode_frames  # noqa: E402


def count1b_impulse_bits(line: int, negative: bool = False) -> str:
    """count1-table-B bits putting +/-1 on `line`, zeros elsewhere before."""
    q, pos = divmod(line, 4)
    bits = "1111" * q                    # (0,0,0,0) quads, code = ~0000
    quad = [0, 0, 0, 0]
    quad[pos] = 1
    code = 15 - (quad[0] * 8 + quad[1] * 4 + quad[2] * 2 + quad[3])
    bits += format(code, "04b") + ("1" if negative else "0")
    return bits


def impulse_frame(line: int) -> bytes:
    bits = count1b_impulse_bits(line)
    g = GranuleSpec(part2_3_length=len(bits), count1table_select=1)
    return make_frame(g, bits)


def collect(lines: list[int], batch: int = 48):
    """Oracle responses for single-line impulses; each probe = [T, Z]."""
    Z = zero_frame()
    resp = {}
    for i in range(0, len(lines), batch):
        chunk = lines[i: i + batch]
        frames = [Z]
        for ln in chunk:
            frames += [impulse_frame(ln), Z]
        out = decode_frames(frames)
        for j, ln in enumerate(chunk):
            start = 1152 * (1 + 2 * j)
            resp[ln] = out[start: start + 2304].astype(np.float64)
    return resp


def main():
    lines = list(range(576))
    print("collecting", len(lines), "oracle impulse responses ...")
    resp = collect(lines)

    # Design: for each probe, U matrix [72,512] and oracle PCM [72*32].
    A_by_col = [[] for _ in range(32)]   # rows of 16 U values
    b_by_col = [[] for _ in range(32)]
    for ln in lines:
        xr = np.zeros(576)
        xr[ln] = 1.0
        us = granule_u_matrix(xr, n_granules_tail=3)   # [72,512]
        pcm = resp[ln][: 72 * 32].reshape(72, 32)
        for j in range(32):
            A_by_col[j].append(us[:, j::32])           # [72,16]
            b_by_col[j].append(pcm[:, j])              # [72]

    d = np.zeros(512)
    worst = 0.0
    for j in range(32):
        A = np.concatenate(A_by_col[j])
        b = np.concatenate(b_by_col[j])
        sol, res, rank, _ = np.linalg.lstsq(A, b, rcond=None)
        d[j::32] = sol
        pred = A @ sol
        r = float(np.sqrt(np.mean((pred - b) ** 2)) / (np.sqrt(np.mean(b ** 2)) + 1e-30))
        worst = max(worst, r)
        if rank < 16:
            print(f"col {j}: rank deficient ({rank})")
    print(f"worst relative residual: {worst:.3e}")

    out = os.path.join(os.path.dirname(__file__), "d_window.json")
    with open(out, "w") as f:
        json.dump({"d": d.tolist(), "resid": worst}, f)
    print("wrote", out)

    # quick structure report: are taps ~multiples of 2^-16?
    q = d * 65536.0
    frac = np.abs(q - np.round(q))
    print("max |D*65536 - round|:", float(frac.max()))


if __name__ == "__main__":
    main()
