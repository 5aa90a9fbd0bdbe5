"""Extract AAC-LC spectral Huffman codebooks 1..10 from the libav
oracle, plus the per-line synthesis responses that pin the IMDCT
convention.

Per book: enumerate PARSE UNITS (codeword, plus trailing sign bits for
the unsigned books) with the strict DSE/frame-length oracle, then
decode each unit's steady-state PCM response and solve the tuple values
by projecting onto the rank-4 response space (SVD axes are identified
with MDCT lines by their spectral peaks; scales anchor on the smallest
nonzero magnitude = |q| 1, and the |q|^(4/3) dequantisation ladder is
verified from the measured amplitude ratios).

2-tuple books (5..10) cover a width-4 band with TWO units; the first is
pinned to the book's zero-tuple (found as the shortest self-parsing
pair) so the BFS enumerates the second unit alone.

Writes spectral_books.json. Usage: python extract_spectral.py [books...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "mp3_extract"))

from frames import BitWriter  # noqa: E402
from frames_aac import Ics, adts_frame  # noqa: E402

PAYLOADS = (b"\x5a\xc3\x99\x11\x22\x33", b"\xa5\x3c\x66\xee\xdd\x0f")
NF_PARSE = 3
NF_VALUE = 6
MAX_UNIT_LEN = 30

BOOKS = {
    1: dict(dims=4),
    2: dict(dims=4),
    3: dict(dims=4),
    4: dict(dims=4),
    5: dict(dims=2),
    6: dict(dims=2),
    7: dict(dims=2),
    8: dict(dims=2),
    9: dict(dims=2),
    10: dict(dims=2),
}


def _sce_dse(ics: Ics, payload: bytes) -> bytes:
    w = BitWriter()
    w.put(0, 3)
    w.put(0, 4)
    ics.write(w)
    w.put(4, 3)
    w.put(0, 4)
    w.put(0, 1)
    w.put(len(payload), 8)
    for b in payload:
        w.put(b, 8)
    w.put(7, 3)
    return adts_frame(w.to_bytes((len(w) + 7) // 8))


_PROBE_PATH = None


def _decode(blob: bytes):
    """Decode a crafted ADTS blob via the libav oracle.

    The scratch file is PER-PROCESS (pid-stamped): two concurrently
    running extraction scripts previously raced on a shared /tmp path,
    silently corrupting each other's parse verdicts."""
    global _PROBE_PATH
    from soundscope_tpu.native import decoder

    if _PROBE_PATH is None:
        _PROBE_PATH = f"/tmp/aacspec.{os.getpid()}.aac"
    open(_PROBE_PATH, "wb").write(blob)
    try:
        d = decoder.decode_any_fmt(_PROBE_PATH, "aac")
        return np.asarray(d.samples)
    except Exception:
        return None


def _frame(book: int, spec_bits: str, payload: bytes, nframes: int):
    ics = Ics(global_gain=140, max_sfb=8, sections=[(book, 1), (0, 7)],
              scf_bits="0", spectral_bits=spec_bits)
    return _decode(_sce_dse(ics, payload) * nframes)


def parses(book: int, spec_bits: str) -> bool:
    for p in PAYLOADS:
        x = _frame(book, spec_bits, p, NF_PARSE)
        if x is None or x.shape[1] != NF_PARSE * 1024:
            return False
    return True


def bfs_units(book: int, prefix: str = "", cap: int = MAX_UNIT_LEN):
    units = []
    stack = [prefix]
    probes = 0
    while stack:
        pfx = stack.pop()
        for b in "01":
            c = pfx + b
            if len(c) > cap:
                continue
            probes += 1
            if parses(book, c):
                units.append(c[len(prefix):])
            else:
                stack.append(c)
    print(f"book {book}: {len(units)} units from prefix {prefix!r} "
          f"({probes} probes)", file=sys.stderr)
    return sorted(units, key=lambda w: (len(w), w))


def response(book: int, spec_bits: str):
    """TRANSIENT response: one content frame between silence frames.
    Steady-state responses fold line pairs (2k-1, 2k) onto the same
    output frequency (measured), so constant-spectrum streams cannot
    separate them; the one-sided overlap-add transient keeps the true
    (k+0.5)-frequency content and separates every line."""
    from frames_aac import silence_frame

    ics = Ics(global_gain=140, max_sfb=8,
              sections=[(book, 1), (0, 7)] if BOOKS[book]["dims"] == 4
              else None, scf_bits="0", spectral_bits=spec_bits)
    raise RuntimeError("use response_ics")


def response_ics(ics: Ics):
    from frames_aac import silence_frame

    S = silence_frame()
    x = _decode(S * 2 + _sce_dse(ics, PAYLOADS[0]) + S * 3)
    if x is None:
        return None
    return x[0, 1024:5120].astype(np.float64)


def solve_values(units, resp, zero_unit):
    """Tuple values per unit via a measured single-line basis.

    SVD axes are useless here (the nonzero singular values are all
    equal, so any rotation of the line space is a valid basis). Instead
    the ATOMIC responses — units of minimal nonzero norm are
    single-line |q|=1 by the q^(8/3) energy law — are clustered into
    lines by their spectral component pair {k, k+1} (the per-frame
    alternation modulates line k onto those integer cycles; the pair is
    unique per line), signed against the analytic IMDCT reference, and
    every unit is least-squares solved in that basis."""
    R = np.stack([resp[u] for u in units])
    norms = np.linalg.norm(R, axis=1)
    nz = norms > 1e-3 * norms.max()
    # anchor the single-line cluster on the 5th-smallest nonzero norm:
    # robust to a few undersized outliers (decode hiccups)
    nz_sorted = np.sort(norms[nz])
    anchor = nz_sorted[min(4, len(nz_sorted) - 1)]
    atomic = [i for i in range(len(units))
              if nz[i] and norms[i] < 1.15 * anchor
              and norms[i] > 0.80 * anchor]
    n = np.arange(R.shape[1])
    by_line = {}
    for i in atomic:
        # dominant (k+0.5)-frequency projection identifies the line in
        # the transient response; sign pinned to the projection phase
        # (consistent per line; the absolute convention is carried by
        # the stored basis waveforms, which the decoder will be fit to)
        projs = [complex(R[i] @ np.exp(-2j * np.pi * (k + 0.5) * n / 2048))
                 for k in range(8)]
        k = int(np.argmax([abs(p) for p in projs]))
        s = 1.0 if projs[k].real >= 0 else -1.0
        by_line.setdefault(k, []).append(s * R[i])
    lines = sorted(by_line)
    assert len(lines) in (2, 4), (lines, len(atomic))
    B = np.stack([np.mean(by_line[k], axis=0) for k in lines])
    coords, *_ = np.linalg.lstsq(B.T, R.T, rcond=None)
    coords = coords.T  # units x len(lines)
    all_mags = np.abs(coords).ravel()
    M = float(all_mags.max())
    if M <= 0:
        return {u: (0, 0, 0, 0) for u in units}, lines, None
    sig = all_mags[all_mags > 0.10 * M]
    # smallest hypothesis that fits: larger m always "fits" because the
    # q^(4/3) lattice gets dense, so accept the first m where every
    # significant magnitude lands within 35% of its local lattice gap
    unit_scale = None
    for m in range(1, 17):  # hypothesis: the largest magnitude is q=m
        s = M / (m ** (4.0 / 3.0))
        ok = True
        for a in sig:
            q = round((a / s) ** 0.75)
            if q == 0:
                ok = False
                break
            gap = s * ((q + 1) ** (4.0 / 3.0) - q ** (4.0 / 3.0))
            if abs(a - s * q ** (4.0 / 3.0)) > 0.35 * gap:
                ok = False
                break
        if ok:
            unit_scale = s
            break
    assert unit_scale is not None, "no q-lattice hypothesis fits"
    out = {}
    for i, u in enumerate(units):
        vals = [0, 0, 0, 0]
        for a, k in enumerate(lines):
            amp = coords[i, a] / unit_scale
            q = np.sign(amp) * round(abs(amp) ** 0.75)
            vals[k] = int(q)
        out[u] = tuple(vals)
    return out, lines, unit_scale


def extract_book(book: int):
    dims = BOOKS[book]["dims"]
    if dims == 4:
        units = bfs_units(book)
        resp = {}
        for u in units:
            ics = Ics(global_gain=140, max_sfb=8,
                      sections=[(book, 1), (0, 7)], scf_bits="0",
                      spectral_bits=u)
            resp[u] = response_ics(ics)
        values, lines, scale = solve_values(units, resp, None)
        return {"dims": 4, "units": {u: list(v) for u, v in values.items()}}
    # 2-tuple books: find the zero pair first (shortest self-parse)
    pair = bfs_units(book, cap=12)  # the zero pair is short
    if not pair:
        print(f"book {book}: no short zero-pair found", file=sys.stderr)
        return None
    zz = min(pair, key=len)
    assert len(zz) % 2 == 0, (book, zz)
    z = zz[: len(zz) // 2]
    # all second-position units after the zero codeword
    units = bfs_units(book, prefix=z)
    resp = {}
    for u in units:
        ics = Ics(global_gain=140, max_sfb=8,
                  sections=[(book, 1), (0, 7)], scf_bits="0",
                  spectral_bits=z + u)
        resp[u] = response_ics(ics)
    try:
        # the first unit (z) need not be the zero tuple (the loud books'
        # shortest codeword is a nonzero pair): its constant response
        # part cancels in the mean because sign variants average out
        R = np.stack([resp[u] for u in units])
        base = R.mean(axis=0, keepdims=True)
        resp = {u: resp[u] - base[0] for u in units}
        values, lines, scale = solve_values(units, resp, z)
        folded = {}
        for u, v in values.items():
            assert v[0] == 0 and v[1] == 0, (book, u, v)
            folded[u] = [v[2], v[3]]
        return {"dims": 2, "zero_codeword_hint": z, "units": folded}
    except AssertionError as e:
        # values unresolved (round-4 work): still record the completed
        # codeword ENUMERATION — the expensive, parse-oracle-verified part
        print(f"book {book}: values unresolved ({e!r}); "
              f"recording enumeration only", file=sys.stderr)
        return {"dims": 2, "zero_codeword_hint": z,
                "units_enumerated": units, "units": {}}


def main():
    books = [int(a) for a in sys.argv[1:]] or list(BOOKS)
    out = {}
    path = os.path.join(os.path.dirname(__file__), "spectral_books.json")
    if os.path.exists(path):
        out = json.load(open(path))
    for b in books:
        try:
            r = extract_book(b)
        except Exception as e:
            print(f"book {b} FAILED: {e!r}", file=sys.stderr)
            r = None
        if r is not None:
            out[str(b)] = r
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote spectral_books.json", file=sys.stderr)


if __name__ == "__main__":
    main()
