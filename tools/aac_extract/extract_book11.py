"""Extract AAC-LC spectral codebook 11 (the escape book).

Book 11 is an unsigned 2-tuple book whose alphabet runs 0..16 per
element; magnitude 16 is an ESCAPE MARKER: the true magnitude follows
the sign bits as N leading 1-bits, a 0, then an (N+4)-bit mantissa,
decoding to 2^(N+4) + mantissa.  That structure is PROBED here, not
assumed.

A naive parse-BFS cannot enumerate this book: every escape mantissa
combination is its own parse-valid unit, so the unit count explodes
combinatorially (a first attempt passed 1M+ probes without
terminating).  Instead:

  1. BFS with a cap that covers every REGULAR unit (both magnitudes
     <= 15: codeword + sign bits).  Branches that need escape payloads
     to terminate mostly exceed the cap and drop out; short-escape
     units that do fit are solved like any other and recognised by
     their >15 magnitudes.
  2. Solve all units' line values in the book-7 single-line basis
     (transient responses, lstsq + q^(4/3) lattice snap).
  3. Group sign variants by codeword; check the magnitude bijection
     over {0..15}^2 ∪ {(16-ish escapes observed)}.
  4. Escape-law verification: targeted probes append "0"+4-bit and
     "10"+5-bit payloads to the (16, 0) codeword and check the decoded
     amplitude follows 2^(N+4) + mantissa exactly.

Writes book "11" into spectral_books.json:
  units: signed regular pairs (codeword+signs -> [a, b], |q| <= 15)
  esc_codewords: codeword -> [|a|, |b|] with 16 = escape marker
  escape_law: verified constants
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "mp3_extract"))

from extract_spectral import bfs_units, parses  # noqa: E402
from extract_loud_books import response, basis_from_book7  # noqa: E402

BOOK = 11
# longest regular codeword + 2 sign bits must fit; raised if the
# regular bijection comes back incomplete
CAP = 15


def snap(c):
    q = int(np.sign(c) * round(abs(c) ** 0.75))
    ideal = np.sign(q) * abs(q) ** (4.0 / 3.0)
    gap = (abs(q) + 1) ** (4.0 / 3.0) - abs(q) ** (4.0 / 3.0)
    return q, abs(c - ideal) / gap


def main():
    path = os.path.join(os.path.dirname(__file__), "spectral_books.json")
    out = json.load(open(path))

    # -- zero-pair prefix (shortest self-parsing unit twice = safest)
    pair = bfs_units(BOOK, cap=16)
    assert pair, "book 11: no short self-parsing pair"
    zz = min(pair, key=lambda w: (len(w), w))
    assert len(zz) % 2 == 0, zz
    z = zz[: len(zz) // 2]
    print(f"book 11 first-unit prefix: {z!r}", file=sys.stderr)

    cap = CAP
    units = None
    while cap <= 23:
        units = bfs_units(BOOK, prefix=z, cap=len(z) + cap)
        # regular signed alphabet: (1 + 2*15)^2 = 961 minus however many
        # escape-marker pairs leak in under the cap
        if len(units) >= 961:
            break
        cap += 2
    print(f"book 11: {len(units)} units at cap {cap}", file=sys.stderr)

    B = basis_from_book7([BOOK])
    R = []
    for k, u in enumerate(units):
        r = response(BOOK, z + u)
        assert r is not None, u
        R.append(r)
        if (k + 1) % 250 == 0:
            print(f"responses {k + 1}/{len(units)}", file=sys.stderr)
    R = np.stack(R)
    # shared first-unit content: the response closest to the subset mean
    # is the (0,0) unit (zero second unit)
    norms = np.linalg.norm(R - R.mean(axis=0, keepdims=True), axis=1)
    shared = R[int(np.argmin(norms))]
    Rc = R - shared[None, :]
    coords, *_ = np.linalg.lstsq(B.T, Rc.T, rcond=None)
    coords = coords.T
    # residual per-line offset: lattice-median correction per axis
    for axis in (0, 1):
        c = coords[:, axis]
        qs = np.sign(c) * np.round(np.abs(c) ** 0.75)
        ideal = np.sign(qs) * np.abs(qs) ** (4.0 / 3.0)
        off = np.median(c - ideal)
        coords[:, axis] = c - off
        print(f"axis {axis}: shared-content offset {off:.4f}",
              file=sys.stderr)

    vals = {}
    worst = 0.0
    for u, (a, bb) in zip(units, coords):
        qa, ra = snap(a)
        qb, rb = snap(bb)
        worst = max(worst, ra, rb)
        vals[u] = (qa, qb)
    print(f"worst lattice residual {worst:.3f} gap", file=sys.stderr)
    assert worst < 0.35, "values off the q^(4/3) lattice"

    # measured -> position-independent truth: 2-tuple basis lines (2,3)
    # carry flips (-1, +1) (same convention as books 8-10; see
    # gen_tables_aac.py) — sign-bit layout checks need TRUE signs
    def true_vals(qa, qb):
        return -qa, qb

    regular = {u: v for u, v in vals.items()
               if abs(v[0]) <= 15 and abs(v[1]) <= 15}
    escaped = {u: v for u, v in vals.items()
               if abs(v[0]) > 15 or abs(v[1]) > 15}
    print(f"regular {len(regular)}, escaped-in-cap {len(escaped)}",
          file=sys.stderr)

    # regular signed bijection over |q| <= 15
    seen = sorted(regular.values())
    want = sorted(
        (sa * i, sb * j) for i in range(16) for j in range(16)
        for sa in ((1,) if i == 0 else (1, -1))
        for sb in ((1,) if j == 0 else (1, -1)))
    assert len(seen) == len(set(regular.values())), "duplicate value pairs"
    missing = set(want) - set(seen)
    extra = set(seen) - set(want)
    print(f"regular bijection: missing {len(missing)} extra {len(extra)}",
          file=sys.stderr)
    assert not missing and not extra, (sorted(missing)[:8],
                                       sorted(extra)[:8])

    # ---- codeword factoring: unit = codeword + one sign bit per
    # nonzero element (measured: the +,+ variant is the shortest of the
    # four sign variants of the same magnitudes and is their common
    # prefix with appended 0-bits; escapes are handled separately)
    cw_by_mag = {}
    for u, (qa, qb) in regular.items():
        nsign = (qa != 0) + (qb != 0)
        cw = u[: len(u) - nsign] if nsign else u
        key = (abs(qa), abs(qb))
        prev = cw_by_mag.get(key)
        if prev is None:
            cw_by_mag[key] = cw
        else:
            assert prev == cw, (key, prev, cw)
        # sign-bit layout check: bits after the codeword are, in
        # element order, 1 for negative and 0 for positive — in the
        # position-independent TRUE domain
        bits = u[len(cw):]
        want_bits = "".join("1" if q < 0 else "0"
                            for q in true_vals(qa, qb) if q != 0)
        assert bits == want_bits, (u, qa, qb, bits, want_bits)
    assert len(cw_by_mag) == 256, len(cw_by_mag)

    # ---- escape-marker codewords: 33 classes ((16, m), (m, 16),
    # (16, 16)).  Some short ones were enumerated inside the cap; the
    # rest are found by descending the UNCOVERED prefix space of the
    # (prefix-free) codebook: any bit string that neither extends nor
    # prefixes a known codeword must be (or split into) an escape
    # codeword.  Each candidate is identified by appending sign bits
    # and a minimal N=0 escape payload per class hypothesis and letting
    # the value solver name the magnitudes.
    def solve_unit(unit):
        r = response(BOOK, z + unit)
        if r is None:
            return None
        rc = r - shared
        c, *_ = np.linalg.lstsq(B.T, rc[:, None], rcond=None)
        qa, ra = snap(float(c[0]))
        qb, rb = snap(float(c[1]))
        if max(ra, rb) > 0.35:
            return None
        return true_vals(qa, qb)

    def esc_suffix(cls, mag_payload="00000"):
        """sign bits (all-positive) + N=0 escape payloads per class."""
        a, bb = cls
        signs = ("0" if a else "") + ("0" if bb else "")
        pay = ""
        if a == 16:
            pay += mag_payload
        if bb == 16:
            pay += mag_payload
        return signs + pay

    classes = ([(16, m) for m in range(16)] + [(m, 16) for m in range(16)]
               + [(16, 16)])

    esc_codewords = {}
    for u, (qa, qb) in escaped.items():
        ta, tb = true_vals(qa, qb)
        key = (16 if abs(ta) > 15 else abs(ta),
               16 if abs(tb) > 15 else abs(tb))
        if key in esc_codewords:
            continue
        # factor by reconstructing the exact payload for this unit
        nsign = (ta != 0) + (tb != 0)
        pay = ""
        for q in (ta, tb):
            if abs(q) <= 15:
                continue
            n = abs(q).bit_length() - 5
            mant = abs(q) - (1 << (n + 4))
            pay += "1" * n + "0" + format(mant, f"0{n + 4}b")
        cut = len(u) - nsign - len(pay)
        assert cut > 0, (u, qa, qb)
        esc_codewords[key] = u[:cut]

    known = set(cw_by_mag.values()) | set(esc_codewords.values())

    def covered(p):
        return any(k == p or p.startswith(k) for k in known)

    def prefixes_known(p):
        return any(k.startswith(p) for k in known)

    stack = [""]
    probes = 0
    while stack and len(esc_codewords) < 33:
        p = stack.pop()
        if covered(p):
            continue
        if prefixes_known(p):
            stack += [p + "0", p + "1"]
            continue
        # candidate codeword: try every unresolved class hypothesis
        hit = None
        for cls in classes:
            if cls in esc_codewords:
                continue
            unit = p + esc_suffix(cls)
            probes += 1
            if not parses(BOOK, z + unit):
                continue
            got = solve_unit(unit)  # TRUE-domain values
            want = tuple(16 if c == 16 else c for c in cls)
            if got == want:
                hit = cls
                break
        if hit is not None:
            esc_codewords[hit] = p
            known.add(p)
        elif len(p) < len(z) + 24:
            stack += [p + "0", p + "1"]
    print(f"escape codewords: {len(esc_codewords)}/33 "
          f"({probes} discovery probes)", file=sys.stderr)
    assert len(esc_codewords) == 33, sorted(esc_codewords)

    # ---- targeted law probes on the (16, 0) codeword: N = 0..3 with
    # a few mantissas each must decode to 2^(N+4) + mantissa
    cw160 = esc_codewords.get((16, 0))
    assert cw160 is not None, "no (16,0) escape codeword within cap"
    checks = 0
    for n in range(0, 4):
        for mant in (0, 1, (1 << (n + 4)) - 1):
            unit = cw160 + "0" + "1" * n + "0" + format(mant, f"0{n + 4}b")
            r = response(BOOK, z + unit)
            assert r is not None, (n, mant)
            rc = r - shared
            c, *_ = np.linalg.lstsq(B.T, rc[:, None], rcond=None)
            a = -float(c[0])  # measured -> true flip on the first line
            q, resid = snap(a)
            wantq = (1 << (n + 4)) + mant
            assert q == wantq and resid < 0.35, (n, mant, q, wantq, a)
            checks += 1
    print(f"escape law verified on {checks} targeted probes",
          file=sys.stderr)

    out["11"] = {
        "dims": 2,
        "zero_codeword_hint": z,
        "units": {u: list(v) for u, v in regular.items()},
        "esc_codewords": {f"{k[0]},{k[1]}": v
                          for k, v in sorted(esc_codewords.items())},
        "escape_law": {"marker": 16, "prefix_ones_then_zero": True,
                       "mantissa_bits": "N+4", "value": "2^(N+4)+mantissa",
                       "checks": checks},
    }
    with open(path, "w") as f:
        json.dump(out, f)
    print("book 11 written", file=sys.stderr)


if __name__ == "__main__":
    main()
