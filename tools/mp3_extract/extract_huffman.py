"""Recover the Layer III big-values Huffman code tables from the oracle.

For each table t, craft frames with big_values=1, table_select[0]=t and a
candidate prefix p as the Huffman data, followed by `e` zero bits (sign /
linbits hypotheses) and a fixed count1-table-B marker quad (+1,+1,+1,+1 on
lines 2..5). The decode chain is linear, so the oracle PCM is
  a0*R0 + a1*R1 + am*M
with R0/R1/M the precomputed responses of lines 0/1 and the marker
(backhalf.py + the recovered D window). Solving the 3-coefficient least
squares identifies the decoded pair magnitudes exactly; a prefix p is
accepted as the codeword for (x, y) iff the fit is tight, am==1, and the
extra-bit accounting is exact:
  e == (x>0) + (y>0) + linbits*[x==15] + linbits*[y==15].
Exact accounting makes false accepts impossible: if the true codeword
were p plus j>0 further zeros, the match would demand e-j extras, not e.

BFS over prefixes (shortest first) enumerates the complete code tree.
Writes huffman_tables.json: {table: {"linbits": n, "codes": {code: [x,y]}}}.

count1 table A is recovered the same way with quadruple fingerprints.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from frames import GranuleSpec, make_frame, zero_frame  # noqa: E402
from oracle import decode_frames  # noqa: E402

# Spec linbits per table (verified empirically per table by the linval
# check in verify_linbits below).
LINBITS = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
           24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13}
TABLES = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15,
          16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31]

# Marker after the big-values pair: count1-B zero quad ('1111', lines
# 2..5 = 0) then a (1,1,1,1) quad with NEGATIVE signs ('0000'+'1111',
# lines 6..9 = -1). Unlike an all-zeros marker, any codeword-boundary
# slip (extra zeros absorbed as signs/linbits, or marker bits eaten)
# misaligns the '1' bits and garbles the fingerprint, so acceptance
# pins the boundary exactly; the trailing '1111' also leaves no
# residual zeros for libav's silent partial-quad revert to hide.
MARKER = "1111" + "0000" + "1111"
MARKER_LINES = (6, 7, 8, 9)
MARKER_SIGN = -1.0
N_STEPS = 72               # 4 granules of synthesis steps per probe
Z = zero_frame()


def _load_d() -> np.ndarray:
    with open(os.path.join(os.path.dirname(__file__), "d_window.json")) as f:
        return np.asarray(json.load(f)["d"])


def line_response(line: int, d: np.ndarray) -> np.ndarray:
    xr = np.zeros(576)
    xr[line] = 1.0
    us = granule_u_matrix(xr, n_granules_tail=3)
    return (us * d).reshape(N_STEPS, 16, 32).sum(axis=1).reshape(-1)


class Fit:
    """Least-squares fit of oracle PCM onto span{R0, R1, M}."""

    def __init__(self, d: np.ndarray, marker_lines=MARKER_LINES):
        self.r0 = line_response(0, d)
        self.r1 = line_response(1, d)
        self.m = MARKER_SIGN * sum(line_response(i, d) for i in marker_lines)
        self.basis = np.stack([self.r0, self.r1, self.m], axis=1)
        self.scale = float(np.sqrt(np.mean(self.m ** 2)))

    def solve(self, pcm: np.ndarray):
        coef, *_ = np.linalg.lstsq(self.basis, pcm, rcond=None)
        resid = pcm - self.basis @ coef
        return coef, float(np.sqrt(np.mean(resid ** 2))) / self.scale


def probe_frame(table: int, bits: str) -> bytes:
    g = GranuleSpec(part2_3_length=len(bits), big_values=1,
                    table_select=(table, 0, 0), count1table_select=1)
    return make_frame(g, bits)


def batch_decode(frames_list: list[bytes]) -> list[np.ndarray]:
    """Decode probes [T,Z][T,Z]... with a leading Z; bisect on length
    mismatch (a probe libav refuses to decode shifts the output)."""
    def run(chunk: list[bytes]):
        frames = [Z]
        for t in chunk:
            frames += [t, Z]
        out = decode_frames(frames)
        want = 1152 * len(frames)
        if len(out) == want:
            return [out[1152 * (1 + 2 * j): 1152 * (1 + 2 * j) + 2304]
                    for j in range(len(chunk))]
        if len(chunk) == 1:
            return [None]
        mid = len(chunk) // 2
        return run(chunk[:mid]) + run(chunk[mid:])

    res = []
    for i in range(0, len(frames_list), 48):
        res.extend(run(frames_list[i: i + 48]))
    return res


def magnitude_to_symbol(a: float, linbits: int):
    """Invert x^(4/3); returns the integer symbol or None. We always send
    positive sign bits, so a negative coefficient means a boundary slip —
    reject it. With all-zero linval bits an escape decodes to magnitude
    15, same as symbol 15."""
    if abs(a) < 0.02:
        return 0
    if a < 0:
        return None
    x = round(a ** 0.75)
    if x < 1 or x > 15:
        return None
    return x if abs(a - float(x) ** (4.0 / 3.0)) < 0.02 * max(a, 1.0) else None


def extras_needed(x: int, y: int, linbits: int) -> int:
    e = (1 if x else 0) + (1 if y else 0)
    if linbits:
        e += linbits * ((1 if x == 15 else 0) + (1 if y == 15 else 0))
    return e


# count1-B canary appended after the expected parse end: code '1110' is
# quad (0,0,0,1) plus positive sign -> exactly +1 on line 5. mpg123
# parses strictly (undershoot -> "dequantization failed" -> silence), so
# a clean +1 on line 5 with lines 2..4 silent positively confirms the
# parse boundary — including for the (0,0) codeword, which would
# otherwise be indistinguishable from an error.
CANARY = "11100"


def batch_decode_strict(frames_list: list[bytes]) -> list[np.ndarray]:
    """mpg123 batch decode: [Z,T,Z,T,...,Z]; frames are independent
    (main_data_begin=0) and a failed frame decodes as silence in place."""
    from oracle_mpg123 import decode_frames_mpg123
    import frames as _F

    z = zero_frame()   # at the frame writer's CURRENT sample rate
    res = []
    for i in range(0, len(frames_list), 48):
        chunk = frames_list[i: i + 48]
        frames = [z]
        for t in chunk:
            frames += [t, z]
        out = decode_frames_mpg123(frames, rate=_F.RATE)
        assert len(out) == 1152 * len(frames), (len(out), len(frames))
        for j in range(len(chunk)):
            res.append(out[1152 * (1 + 2 * j): 1152 * (1 + 2 * j) + 2304])
    return res


def _snap(v: float):
    """|v| -> integer grid symbol via the 4/3 power, or None."""
    if abs(v) < 0.02:
        return 0
    m = abs(v) ** 0.75
    x = round(m)
    return x if abs(m - x) < 0.02 else None


class PairFit:
    """Fit onto span{R0, R1, R5(canary)}; anything on other lines (count1
    junk from a boundary slip) lands in the residual."""

    def __init__(self, d: np.ndarray):
        self.basis = np.stack([line_response(0, d), line_response(1, d),
                               line_response(5, d)], axis=1)
        self.scale = float(np.sqrt(np.mean(self.basis[:, 0] ** 2)))

    def solve(self, pcm: np.ndarray):
        coef, *_ = np.linalg.lstsq(self.basis, pcm, rcond=None)
        resid = pcm - self.basis @ coef
        return (float(coef[0]), float(coef[1]), float(coef[2]),
                float(np.sqrt(np.mean(resid ** 2))) / self.scale)


def extract_table(table: int, fit: PairFit, tol: float = 1e-3):
    """BFS the base codeword tree against the STRICT mpg123 oracle.

    For candidate prefix p and hypothesized extension length k (sign and
    linbits bits, all sent as '0' = positive / linval 0), probe
        p + '0'*k + CANARY        with part2_3_length = total bits.
    mpg123 parses exactly: an undershoot errors the granule to silence,
    an overshoot decodes stray count1 quads onto lines 2..4 (residual),
    and only the true boundary yields pair(+x,+y) on lines 0..1 plus the
    canary's clean +1 on line 5. Exact accounting
        k == (x>0) + (y>0) + linbits*[x==15] + linbits*[y==15]
    kills ancestor slips: a parse through codeword p+0^j (j>0) needs
    k = j + extras(pair), which the matched pair contradicts."""
    linbits = LINBITS.get(table, 0)
    e_set = sorted({extras_needed(x, y, linbits)
                    for x in (0, 1, 15) for y in (0, 1, 15)})
    codes: dict[str, tuple[int, int]] = {}
    frontier = ["0", "1"]
    depth = 1
    while frontier:
        if depth > 20:
            raise RuntimeError(f"table {table}: code deeper than 20 bits")
        tests = [(p, k) for p in frontier for k in e_set]
        pcms = batch_decode_strict(
            [probe_frame(table, p + "0" * k + CANARY) for p, k in tests])
        accepted: dict[str, tuple[int, int]] = {}
        for (p, k), pcm in zip(tests, pcms):
            if p in accepted:
                continue
            v0, v1, canary, resid = fit.solve(pcm.astype(np.float64))
            big = max(abs(v0), abs(v1), 1.0)
            if resid > tol * big or abs(canary - 1.0) > 0.02:
                continue
            if v0 < -0.02 or v1 < -0.02:
                continue
            x, y = _snap(v0), _snap(v1)
            if x is None or y is None:
                continue
            if extras_needed(x, y, linbits) == k:
                accepted[p] = (x, y)
        nxt = []
        for p in frontier:
            if p in accepted:
                codes[p] = accepted[p]
            else:
                nxt += [p + "0", p + "1"]
        frontier = nxt
        depth += 1
    kraft = sum(2.0 ** -len(c) for c in codes)
    pairs = list(codes.values())
    assert len(set(pairs)) == len(pairs), f"table {table}: duplicate symbols"
    xmax = max(p[0] for p in pairs)
    ymax = max(p[1] for p in pairs)
    assert len(pairs) == (xmax + 1) * (ymax + 1), (
        f"table {table}: {len(pairs)} codes != full {xmax + 1}x{ymax + 1} grid")
    return {"linbits": linbits, "codes": {c: list(v) for c, v in codes.items()},
            "kraft": kraft, "xlen": xmax + 1, "ylen": ymax + 1}


def extract_count1a(fit_quad, fit_quad8) -> dict:
    """count1 table A. No table-B marker is possible (count1table_select
    covers the whole region), and a truncated codeword decodes to silence
    — indistinguishable from the all-zeros quad by fingerprint alone. So:
    pass 1 finds every codeword with a NONZERO quad (truncation cannot
    fake those; exact sign accounting rejects boundary slips); pass 2
    re-tests the remaining prefixes with a discovered nonzero codeword
    appended as a trailing marker on lines 4..7."""
    codes: dict[str, tuple] = {}
    undecided: list[str] = []
    frontier = ["0", "1"]
    depth = 1
    while frontier:
        if depth > 8:
            raise RuntimeError("count1A deeper than 8 bits")
        tests = [(p, e) for p in frontier for e in (1, 2, 3, 4)]
        frames = []
        for p, e in tests:
            bits = p + "0" * e
            g = GranuleSpec(part2_3_length=len(bits), count1table_select=0)
            frames.append(make_frame(g, bits))
        pcms = batch_decode(frames)
        accepted = {}
        for (p, e), pcm in zip(tests, pcms):
            if p in accepted or pcm is None:
                continue
            coef, resid = fit_quad.solve(pcm.astype(np.float64))
            if resid > 2e-3:
                continue
            vals = []
            ok = True
            for a in coef:
                if abs(a) < 0.02:
                    vals.append(0)
                elif abs(a - 1.0) < 0.02:
                    vals.append(1)
                else:
                    ok = False
            if ok and sum(vals) == e and e > 0:
                accepted[p] = tuple(vals)
        nxt = []
        for p in frontier:
            if p in accepted:
                codes[p] = accepted[p]
            elif depth >= 6:
                undecided.append(p)   # count1 codes are at most 6 bits
            else:
                nxt += [p + "0", p + "1"]
        frontier = nxt
        depth += 1

    # pass 2: the zero-quad codeword is the root of the "dead" region of
    # the prefix tree — nodes that neither extend into nor descend from a
    # found codeword. Test the minimal dead nodes, shortest first.
    def dead(p: str) -> bool:
        if any(c.startswith(p) for c in codes):
            return False
        return not any(p.startswith(c) for c in codes)

    cand = sorted(
        (p for n in range(1, 7)
         for p in (format(i, f"0{n}b") for i in range(1 << n))
         if dead(p) and (len(p) == 1 or not dead(p[:-1]))),
        key=len,
    )
    mk, mv = next(iter(sorted(codes.items(), key=lambda kv: len(kv[0]))))
    msigns = "0" * sum(1 for v in mv if v)
    tests = [p for p in cand]
    frames = []
    for p in tests:
        bits = p + mk + msigns
        g = GranuleSpec(part2_3_length=len(bits), count1table_select=0)
        frames.append(make_frame(g, bits))
    pcms = batch_decode(frames)
    for p, pcm in zip(tests, pcms):
        if pcm is None:
            continue
        coef, resid = fit_quad8.solve(pcm.astype(np.float64))
        if resid > 2e-3:
            continue
        first4 = coef[:4]
        last4 = coef[4:]
        if (np.max(np.abs(first4)) < 0.02
                and np.max(np.abs(last4 - np.asarray(mv, float))) < 0.02):
            codes[p] = (0, 0, 0, 0)
            break
    kraft = sum(2.0 ** -len(c) for c in codes)
    return {"codes": {c: list(v) for c, v in codes.items()}, "kraft": kraft}


class QuadFit:
    """Fit onto span{R0..R(n-1)} for count1-A extraction."""

    def __init__(self, d: np.ndarray, n_lines: int = 4):
        rs = [line_response(i, d) for i in range(n_lines)]
        self.basis = np.stack(rs, axis=1)
        self.scale = float(np.sqrt(np.mean(rs[0] ** 2)))

    def solve(self, pcm: np.ndarray):
        coef, *_ = np.linalg.lstsq(self.basis, pcm, rcond=None)
        resid = pcm - self.basis @ coef
        return coef, float(np.sqrt(np.mean(resid ** 2))) / self.scale


def verify_linbits(table: int, codes: dict, fit: PairFit) -> None:
    """Confirm the table's linbits by setting linval=1 on a (15,0) escape:
    the decoded magnitude must be 16^(4/3)."""
    lb = LINBITS[table]
    cw = next(c for c, v in codes.items() if tuple(v) == (15, 0))
    bits = cw + "0" * (lb - 1) + "1" + "0" + CANARY
    pcm = batch_decode_strict([probe_frame(table, bits)])[0]
    v0, v1, canary, resid = fit.solve(pcm.astype(np.float64))
    want = 16.0 ** (4.0 / 3.0)
    assert abs(v0 - want) < 0.02 * want and abs(canary - 1.0) < 0.02, (
        f"table {table}: linbits != {lb} (v0={v0}, canary={canary})")


def verify_count1a(qa: dict, d: np.ndarray) -> None:
    """Re-check every count1-A codeword against the strict oracle, using
    the (0,0,1,0) quad as a second-quad canary on line 6."""
    basis = np.stack([line_response(i, d) for i in range(8)], axis=1)
    items = list(qa["codes"].items())
    frames = []
    for c, v in items:
        bits = c + "0" * sum(1 for x in v if x) + "0100" + "0"
        g = GranuleSpec(part2_3_length=len(bits), count1table_select=0)
        frames.append(make_frame(g, bits))
    pcms = batch_decode_strict(frames)
    for (c, v), pcm in zip(items, pcms):
        coef, *_ = np.linalg.lstsq(basis, pcm.astype(np.float64), rcond=None)
        want = list(v) + [0, 0, 1, 0]
        assert np.max(np.abs(coef - np.asarray(want, float))) < 0.02, (
            f"count1A code {c}: {coef} != {want}")


def main():
    d = _load_d()
    fit = PairFit(d)
    out = {}
    for t in TABLES:
        tab = extract_table(t, fit)
        n = len(tab["codes"])
        print(f"table {t:2d}: {n:3d} codewords, {tab['xlen']}x{tab['ylen']}, "
              f"kraft={tab['kraft']:.6f}, "
              f"maxlen={max(len(c) for c in tab['codes'])}")
        assert abs(tab["kraft"] - 1.0) < 1e-9, f"table {t} incomplete"
        if t in LINBITS:
            verify_linbits(t, tab["codes"], fit)
        out[str(t)] = tab
    qa = extract_count1a(QuadFit(d), QuadFit(d, 8))
    print(f"count1 A: {len(qa['codes'])} codewords, kraft={qa['kraft']:.6f}")
    assert abs(qa["kraft"] - 1.0) < 1e-9
    assert len(qa["codes"]) == 16
    verify_count1a(qa, d)
    print("count1 A verified against mpg123; linbits verified per table")
    out["count1A"] = qa
    path = os.path.join(os.path.dirname(__file__), "huffman_tables.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
