"""Extract AAC-LC scalefactor-band (swb) offset tables for every ADTS
sample rate, for both long (2048) and short (256) window sequences.

Method — pure parse-counting, no values needed:
  * num_swb: the largest max_sfb for which an all-zero-book frame still
    decodes (libav rejects max_sfb > num_swb).
  * band widths: code band k with 2-tuple book 5 and sweep the number of
    appended zero-pair units until the frame parses at the exact length;
    band k's width (in spectral lines) is 2 * units. Offsets are the
    running sum; the final offset must land on 1024 (long) / 128 (short)
    or below (the remainder is the implicit upper band libav fills with
    zeros).
  * spot-verification: the first coded unit of a band at offset o must
    respond at transient frequency (o + 0.5)/2048 — checked for a few
    bands at 48 kHz.

Short windows use scale_factor_grouping=0x7F (all eight 128-sample
windows in one group), so one section run covers each sfb once and a
band of width w consumes 8*w/2 book-5 units (lines interleave
window-major within the group — the parse count measures w directly).

Writes swb_tables.json: {rate: {"long": [offsets...], "short": [...]}}.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "mp3_extract"))

from frames_aac import Ics, RATE_INDEX  # noqa: E402
from extract_spectral import _sce_dse, _decode, PAYLOADS, NF_PARSE  # noqa: E402

B5_ONE = "1000"   # book-5 unit (+1, 0) — first line of its 2-line pair
B5_ZERO = "0"     # book-5 zero-pair codeword


def _sce_dse_rate(ics, payload, rate):
    """Like extract_spectral._sce_dse but at an arbitrary ADTS rate."""
    from frames_aac import BitWriter, adts_frame

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
    return adts_frame(w.to_bytes((len(w) + 7) // 8), rate=rate)


def parses_ics(ics, rate):
    for p in PAYLOADS:
        x = _decode(_sce_dse_rate(ics, p, rate) * NF_PARSE)
        if x is None or x.shape[1] != NF_PARSE * 1024:
            return False
    return True


def zero_ics(max_sfb, short, rate):
    if short:
        return Ics(window_sequence=2, scale_factor_grouping=0x7F,
                   max_sfb=max_sfb, sections=[(0, max_sfb)] if max_sfb else [])
    return Ics(max_sfb=max_sfb, sections=[(0, max_sfb)] if max_sfb else [])


def find_num_swb(rate, short):
    cap = 16 if short else 64
    last_ok = 0
    for n in range(1, cap):
        if parses_ics(zero_ics(n, short, rate), rate):
            last_ok = n
        else:
            break
    return last_ok


def band_units(rate, short, k, num_swb, max_units=256):
    """Number of book-5 units band k consumes (width = 2*units, or
    2*units/8 per window for grouped short blocks)."""
    rest = num_swb - k - 1
    for m in range(1, max_units + 1):
        bits = B5_ONE + B5_ZERO * (m - 1)
        sections = ([(0, k)] if k else []) + [(5, 1)] + \
            ([(0, rest)] if rest else [])
        if short:
            ics = Ics(window_sequence=2, scale_factor_grouping=0x7F,
                      max_sfb=num_swb, sections=sections, scf_bits="0",
                      spectral_bits=bits)
        else:
            ics = Ics(max_sfb=num_swb, sections=sections, scf_bits="0",
                      spectral_bits=bits)
        if parses_ics(ics, rate):
            return m
    raise AssertionError(f"rate {rate} short={short} band {k}: "
                         f"no unit count <= {max_units} parses")


def extract_rate(rate):
    out = {}
    for short in (False, True):
        n = find_num_swb(rate, short)
        assert n > 0, (rate, short)
        widths = []
        for k in range(n):
            m = band_units(rate, short, k, n)
            w = 2 * m // (8 if short else 1)
            assert not short or (2 * m) % 8 == 0, (rate, k, m)
            widths.append(w)
        offs = [0]
        for w in widths:
            offs.append(offs[-1] + w)
        total = 128 if short else 1024
        assert offs[-1] <= total, (rate, short, offs[-1])
        key = "short" if short else "long"
        out[key] = offs
        print(f"rate {rate} {key}: num_swb={n} last_offset={offs[-1]}",
              file=sys.stderr)
    return out


def verify_line_positions(tables):
    """Transient-frequency spot check at 48 kHz: band k's first line must
    respond at (offset[k] + 0.5) cycles/2048."""
    from frames_aac import silence_frame

    offs = tables[48000]["long"]
    S = silence_frame()
    nmax = len(offs) - 1
    for k in (0, 5, 10, min(20, nmax - 1), min(40, nmax - 1)):
        rest = nmax - k - 1
        sections = ([(0, k)] if k else []) + [(5, 1)] + \
            ([(0, rest)] if rest else [])
        ics = Ics(global_gain=140, max_sfb=nmax, sections=sections,
                  scf_bits="0",
                  spectral_bits=B5_ONE + B5_ZERO * (band_units(
                      48000, False, k, nmax) - 1))
        x = _decode(S * 2 + _sce_dse(ics, PAYLOADS[0]) + S * 3)
        r = x[0, 1024:5120].astype(np.float64)
        n = np.arange(r.size)
        lines = [abs(r @ np.exp(-2j * np.pi * (j + 0.5) * n / 2048))
                 for j in range(max(0, offs[k] - 3), offs[k] + 4)]
        got = int(np.argmax(lines)) + max(0, offs[k] - 3)
        assert got == offs[k], (k, got, offs[k])
        print(f"verify 48k band {k}: first line at {got} == offset ✓",
              file=sys.stderr)


def main():
    rates = sorted(RATE_INDEX, reverse=True)
    path = os.path.join(os.path.dirname(__file__), "swb_tables.json")
    tables = {}
    if os.path.exists(path):
        tables = {int(k): v for k, v in json.load(open(path)).items()}
    for rate in rates:
        if rate in tables and len(sys.argv) == 1:
            continue
        tables[rate] = extract_rate(rate)
        with open(path, "w") as f:
            json.dump({str(k): v for k, v in tables.items()}, f, indent=1)
    verify_line_positions(tables)
    print("swb_tables.json written", file=sys.stderr)


if __name__ == "__main__":
    main()
