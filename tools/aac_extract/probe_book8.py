"""Diagnose why books 8-10 magnitudes fall off the q^(4/3) lattice.

Round-3 finding: at global_gain=140 the solved coordinate magnitudes for
book 8 span a dense 0.46..1.0 range instead of the 27.5:1 spread the
|q|^(4/3) law predicts for |q| in 1..7. Hypotheses to separate:
  (a) amplitude clamp somewhere in the oracle chain (lower gg fixes it);
  (b) misaligned first-unit prefix (gg-independent garbage);
  (c) wrong atomic anchor (the smallest nonzero unit is not |q|=1).

This probe re-measures a SUBSET of book-8 units at several global_gain
values and prints the normalized magnitude spectra side by side.

Usage: python probe_book8.py [book] [gg ...]
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


def response_at(book, spec_bits, gg):
    S = silence_frame()
    ics = Ics(global_gain=gg, max_sfb=8, sections=[(book, 1), (0, 7)],
              scf_bits="0", spectral_bits=spec_bits)
    x = _decode(S * 2 + _sce_dse(ics, PAYLOADS[0]) + S * 3)
    if x is None:
        return None
    return x[0, 1024:5120].astype(np.float64)


def main():
    book = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ggs = [int(g) for g in sys.argv[2:]] or [80, 100, 120, 140]
    d = json.load(open(os.path.join(os.path.dirname(__file__),
                                    "spectral_books.json")))[str(book)]
    z = d["zero_codeword_hint"]
    units = d.get("units_enumerated") or sorted(d["units"],
                                                key=lambda w: (len(w), w))
    # subset: the shortest 40 units (most distinct codewords, fewest
    # sign-bit variants) is enough to see the lattice structure
    sub = units[:40]
    for gg in ggs:
        R = []
        for u in sub:
            r = response_at(book, z + u, gg)
            R.append(r)
        R = np.stack(R)
        base = R.mean(axis=0, keepdims=True)
        Rc = R - base
        norms = np.linalg.norm(Rc, axis=1)
        nz = norms[norms > 1e-3 * norms.max()]
        print(f"gg={gg}: {len(sub)} units, norm spectrum "
              f"(normalized, sorted):")
        s = np.sort(nz / nz.max())
        print("  " + " ".join(f"{v:.3f}" for v in s))
        # lattice check: ratios to the smallest
        print(f"  max/min {s[-1]/s[0]:.2f}  "
              f"(q^(4/3) law for 1..7 predicts 13.39)")


if __name__ == "__main__":
    main()
