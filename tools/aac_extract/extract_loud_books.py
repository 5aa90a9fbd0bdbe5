"""Solve spectral codebook VALUES for the loud 2-tuple books (8, 9, 10)
in a basis measured from book 7's known single-line units.

Round-3's self-bootstrapped solver failed on these books because their
shortest codeword is a NONZERO pair: the atomic-cluster anchor it uses
to identify the |q|=1 single-line responses picked up mean-subtraction
artifacts, and the resulting basis was garbage (coordinate magnitudes
landed on a dense non-lattice spread). The gg-sweep probe
(probe_book8.py) showed the responses themselves are perfectly linear
and their 2-D norms sit exactly on the sqrt(a^(8/3)+b^(8/3)) lattice —
so only the basis was wrong.

Fix: the probes use the SAME band (sfb 0, lines 2+3 for the second
unit), same global_gain and same scalefactor, so book 7's verified
(0,±1)/(±1,0) units give trustworthy unit-amplitude line waveforms.
Each book 8/9/10 unit response (mean-centered to cancel the shared
first-unit content) is least-squares solved in that basis and snapped
to the q^(4/3) lattice; the result must form an exact signed bijection
over 0..LAV^2 or the book is rejected.

Writes the solved values back into spectral_books.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "mp3_extract"))

from frames_aac import Ics, silence_frame  # noqa: E402
from extract_spectral import _sce_dse, _decode, PAYLOADS  # noqa: E402

GG = 140
LAV = {8: 7, 9: 12, 10: 12}


def response(book, spec_bits):
    S = silence_frame()
    ics = Ics(global_gain=GG, max_sfb=8, sections=[(book, 1), (0, 7)],
              scf_bits="0", spectral_bits=spec_bits)
    x = _decode(S * 2 + _sce_dse(ics, PAYLOADS[0]) + S * 3)
    if x is None:
        return None
    return x[0, 1024:5120].astype(np.float64)


def basis_from_book7(books):
    """Unit-amplitude line-2/line-3 waveforms from book 7's verified
    single-line units ('1001' = (+1, 0), '1010' = (0, +1), after its
    zero first unit '0')."""
    e2 = response(7, "0" + "1001")
    e3 = response(7, "0" + "1010")
    assert e2 is not None and e3 is not None
    # sanity: the two lines are near-orthogonal transient waveforms
    cos = abs(e2 @ e3) / (np.linalg.norm(e2) * np.linalg.norm(e3))
    print(f"basis: |e2|={np.linalg.norm(e2):.1f} |e3|={np.linalg.norm(e3):.1f}"
          f" cos={cos:.4f}", file=sys.stderr)
    assert cos < 0.2, "book-7 basis lines are not separable"
    return np.stack([e2, e3])


def solve_book(book, data, B):
    z = data["zero_codeword_hint"]
    units = data.get("units_enumerated") or sorted(
        data["units"], key=lambda w: (len(w), w))
    lav = LAV[book]
    expect = (1 + 2 * lav) ** 2
    assert len(units) == expect, (book, len(units), expect)
    R = []
    for k, u in enumerate(units):
        r = response(book, z + u)
        assert r is not None, (book, u)
        R.append(r)
        if (k + 1) % 100 == 0:
            print(f"book {book}: {k + 1}/{len(units)} responses",
                  file=sys.stderr)
    R = np.stack(R)
    # mean over the full signed alphabet cancels the shared first-unit
    # content exactly (every nonzero magnitude appears with both signs)
    R = R - R.mean(axis=0, keepdims=True)
    coords, res, *_ = np.linalg.lstsq(B.T, R.T, rcond=None)
    coords = coords.T  # (units, 2) amplitudes in |q|=1 units
    vals = {}
    worst = 0.0
    for u, (a, b) in zip(units, coords):
        qa = int(np.sign(a) * round(abs(a) ** 0.75))
        qb = int(np.sign(b) * round(abs(b) ** 0.75))
        # lattice residual in units of the local gap
        for amp, q in ((a, qa), (b, qb)):
            ideal = np.sign(q) * abs(q) ** (4.0 / 3.0)
            gap = (abs(q) + 1) ** (4.0 / 3.0) - abs(q) ** (4.0 / 3.0)
            worst = max(worst, abs(amp - ideal) / gap)
        vals[u] = (qa, qb)
    print(f"book {book}: worst lattice residual {worst:.3f} gap",
          file=sys.stderr)
    assert worst < 0.35, f"book {book}: off-lattice ({worst:.3f})"
    # bijection check: every signed pair exactly once
    seen = sorted(vals.values())
    want = sorted(
        (sa * i, sb * j)
        for i in range(lav + 1) for j in range(lav + 1)
        for sa in ((1,) if i == 0 else (1, -1))
        for sb in ((1,) if j == 0 else (1, -1)))
    assert seen == want, f"book {book}: not a signed bijection"
    return vals


def main():
    books = [int(a) for a in sys.argv[1:]] or [8, 9, 10]
    path = os.path.join(os.path.dirname(__file__), "spectral_books.json")
    out = json.load(open(path))
    B = basis_from_book7(books)
    for book in books:
        vals = solve_book(book, out[str(book)], B)
        out[str(book)] = {
            "dims": 2,
            "zero_codeword_hint": out[str(book)]["zero_codeword_hint"],
            "units": {u: list(v) for u, v in vals.items()},
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"book {book}: solved + written", file=sys.stderr)


if __name__ == "__main__":
    main()
