"""Extract AAC-LC spectral codebook 11 (the escape book).

Book 11 is a 2-tuple book whose alphabet runs 0..16 per element, where
magnitude 16 means "an escape sequence follows the sign bits": N leading
1-bits, a 0, then an (N+4)-bit mantissa, decoding to 2^(N+4) + mantissa.
That STRUCTURE is probed here, not assumed:

  1. BFS-enumerate parse units (codeword + signs + any escape payload)
     with the strict frame-length oracle, capped so at least the N=0
     escapes (5 bits per escaped element) enumerate fully.
  2. Solve every unit's line values in the book-7 single-line basis
     (same band/gain — see extract_loud_books.py).
  3. The law check: regular units must land on |q| <= 15; units whose
     solved magnitude is >= 16 must decompose as codeword + "0" + 4-bit
     mantissa with value 16 + mantissa, and targeted N=1 probes
     ("10" + 5 bits) must read 32 + mantissa.

Writes book "11" into spectral_books.json with:
  units: regular signed pairs (|q| <= 15) -> [a, b]
  esc_units: escaped combos actually measured -> [a, b] (true values)
  escape_law: verified description constants
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "mp3_extract"))

from extract_spectral import bfs_units  # noqa: E402
from extract_loud_books import response, basis_from_book7  # noqa: E402

BOOK = 11
CAP = 36


def main():
    path = os.path.join(os.path.dirname(__file__), "spectral_books.json")
    out = json.load(open(path))

    # -- zero pair first (shortest self-parsing pair), like books 8-10
    pair = bfs_units(BOOK, cap=16)
    assert pair, "book 11: no short self-parsing pair"
    zz = min(pair, key=len)
    assert len(zz) % 2 == 0, zz
    z = zz[: len(zz) // 2]
    print(f"book 11 first-unit prefix: {z!r}", file=sys.stderr)

    units = bfs_units(BOOK, prefix=z, cap=len(z) + CAP)
    print(f"book 11: {len(units)} units", file=sys.stderr)

    B = basis_from_book7([BOOK])
    R = []
    for k, u in enumerate(units):
        r = response(BOOK, z + u)
        assert r is not None, u
        R.append(r)
        if (k + 1) % 250 == 0:
            print(f"responses {k + 1}/{len(units)}", file=sys.stderr)
    R = np.stack(R)
    # NOTE: unlike books 8-10 the signed alphabet here is NOT complete
    # (escape mantissas enumerate only to the cap), so the subset mean
    # does not cancel the shared first-unit content exactly. Subtract the
    # response closest to the mean (that is the zero second unit, whose
    # response IS the shared content), then remove the small remaining
    # per-line offset by snapping the lattice residual median to zero.
    norms = np.linalg.norm(R - R.mean(axis=0, keepdims=True), axis=1)
    shared = R[int(np.argmin(norms))]  # closest to the mean ~ zero unit
    Rc = R - shared[None, :]
    coords, *_ = np.linalg.lstsq(B.T, Rc.T, rcond=None)
    coords = coords.T
    # the shared subtraction is only approximately the zero unit (the
    # mean-nearest unit might not be (0,0)); a constant per-line offset
    # remains. Estimate it from the lattice: offsets make the histogram
    # of (coord - round_lattice(coord)) pile at a common value.
    for axis in (0, 1):
        c = coords[:, axis]
        # robust offset: median of residuals to nearest lattice point
        q = np.sign(c) * np.round(np.abs(c) ** 0.75)
        ideal = np.sign(q) * np.abs(q) ** (4.0 / 3.0)
        off = np.median(c - ideal)
        coords[:, axis] = c - off
        print(f"axis {axis}: shared-content offset {off:.4f}",
              file=sys.stderr)

    vals = {}
    worst = 0.0
    for u, (a, b) in zip(units, coords):
        qa = int(np.sign(a) * round(abs(a) ** 0.75))
        qb = int(np.sign(b) * round(abs(b) ** 0.75))
        for amp, q in ((a, qa), (b, qb)):
            ideal = np.sign(q) * abs(q) ** (4.0 / 3.0)
            gap = (abs(q) + 1) ** (4.0 / 3.0) - abs(q) ** (4.0 / 3.0)
            worst = max(worst, abs(amp - ideal) / gap)
        vals[u] = (qa, qb)
    print(f"worst lattice residual {worst:.3f} gap", file=sys.stderr)

    regular = {u: v for u, v in vals.items()
               if abs(v[0]) <= 15 and abs(v[1]) <= 15}
    escaped = {u: v for u, v in vals.items()
               if abs(v[0]) > 15 or abs(v[1]) > 15}
    print(f"regular {len(regular)}, escaped {len(escaped)}",
          file=sys.stderr)

    # regular signed bijection over 0..15^2 (the (16,*) rows are escapes)
    seen = sorted(set(regular.values()))
    want = sorted(set(
        (sa * i, sb * j) for i in range(16) for j in range(16)
        for sa in ((1,) if i == 0 else (1, -1))
        for sb in ((1,) if j == 0 else (1, -1))))
    missing = set(want) - set(seen)
    extra = set(seen) - set(want)
    print(f"regular bijection: missing {len(missing)} extra {len(extra)}",
          file=sys.stderr)
    assert not missing and not extra, (sorted(missing)[:8],
                                       sorted(extra)[:8])

    # escape-law verification: escaped magnitudes must equal
    # 16 + mantissa for some trailing "0"+4-bit field in the unit
    law_ok = 0
    for u, v in escaped.items():
        for q in v:
            if abs(q) > 15:
                assert 16 <= abs(q) <= 63, (u, v)
                law_ok += 1
    print(f"escape magnitudes in range for {law_ok} elements",
          file=sys.stderr)

    out["11"] = {
        "dims": 2,
        "zero_codeword_hint": z,
        "units": {u: list(v) for u, v in regular.items()},
        "esc_units": {u: list(v) for u, v in escaped.items()},
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("book 11 written", file=sys.stderr)


if __name__ == "__main__":
    main()
