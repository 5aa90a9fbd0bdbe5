"""Extract the AAC scalefactor Huffman codebook from the libav oracle.

Two independent black-box signals:
  * PARSE ORACLE — libav's raw_data_block parser is strict about the
    END element position: a candidate bitstring placed where exactly one
    scf codeword belongs parses iff it IS exactly one codeword
    (under-reads pull END bits into the codeword, over-reads push junk
    into the element stream; both error). BFS over the binary tree
    enumerates every codeword without knowing any table.
  * ENERGY ORACLE — in a frame of PNS (noise) bands, the scf codeword
    is the band's dpcm noise-energy delta, and measured band amplitude
    doubles per +4 delta (law pinned against the 9-bit raw first-band
    field). Deltas too negative to measure directly are CHAINED: a
    following band with a known positive-delta codeword lifts the
    running energy back into the measurable range.

Writes scf.json: {codeword_bits: dpcm_delta} plus the measured law.

Usage: python extract_scf.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


RATE = 48000
MAX_SFB = 8
MAX_CODE_LEN = 22
# Operating point: libav clamps the internal noise scale index (measured
# saturation at +21 above nrg0=380, i.e. an internal cap near 155);
# nrg0=280 leaves ~+120 of headroom so the +60 extreme stays measurable.
NRG0 = 280


def _decode(blob: bytes):
    """Forced-format decode: candidate bitstrings with long 1-runs embed
    fake ADTS syncwords that defeat libav's format PROBE (measured: the
    probe, not the decoder, rejected such frames) — so the rig always
    forces the adts demuxer."""
    from soundscope_tpu.native import decoder

    path = f"/tmp/aacprobe.{os.getpid()}.aac"
    open(path, "wb").write(blob)
    try:
        d = decoder.decode_any_fmt(path, "aac")
        return np.asarray(d.samples)
    except Exception:
        return None


GAP = 6  # zero sfbs between the anchor band and each probe band


from frames import BitWriter  # noqa: E402

_DSE_PAYLOADS = (b"\x5a\xc3\x99\x11\x22\x33", b"\xa5\x3c\x66\xee\xdd\x0f")


def _sce_dse_frame(ics: Ics, dse_payload: bytes, rate: int = RATE) -> bytes:
    """SCE + a DSE with attacker-chosen payload + END. A mis-parsed scf
    codeword shifts the element stream into the DSE header/payload, so
    requiring the frame to parse under multiple payloads rejects
    coincidental accepts (measured: the plain flags+END tail is constant
    enough that wrong codeword lengths sometimes still parse)."""
    from frames_aac import adts_frame

    w = BitWriter()
    w.put(0, 3)
    w.put(0, 4)
    ics.write(w)
    w.put(4, 3)
    w.put(0, 4)
    w.put(0, 1)
    w.put(len(dse_payload), 8)
    for byt in dse_payload:
        w.put(byt, 8)
    w.put(7, 3)
    return adts_frame(w.to_bytes((len(w) + 7) // 8), rate=rate)


def frame(noise_bands: int, scf_bits: str, nframes: int = 6,
          dse: bytes = _DSE_PAYLOADS[0]):
    """Anchor noise band at sfb 0, then `noise_bands - 1` probe bands
    each separated by GAP zero bands (the dpcm chain skips zero bands;
    the separation moves each band out of the previous one's spectral
    leakage skirt so deep-negative deltas stay measurable)."""
    secs = [(13, 1)]
    for _ in range(noise_bands - 1):
        secs += [(0, GAP), (13, 1)]
    used = 1 + (noise_bands - 1) * (GAP + 1)
    max_sfb = used + 1
    secs.append((0, max_sfb - used))
    ics = Ics(global_gain=100, max_sfb=max_sfb, sections=secs,
              scf_bits=format(NRG0, "09b") + scf_bits)
    return _decode(_sce_dse_frame(ics, dse) * nframes)


def parses(scf_bits: str, noise_bands: int) -> bool:
    return all(frame(noise_bands, scf_bits, nframes=2, dse=p) is not None
               for p in _DSE_PAYLOADS)


def band_energy_db(x, noise_idx: int) -> float:
    """Per-bin PSD (dB) at the core of the noise band with chain index
    `noise_idx` (sfb = idx * (GAP+1); low 48 kHz swb bands are 4 lines
    wide -> rfft bin ~ 2*sfb+1). Blackman-Harris window: ~-92 dB
    sidelobes keep the anchor's leakage below deep-negative deltas."""
    sfb = noise_idx * (GAP + 1)
    lo = 2 * sfb
    hi = lo + 2
    win = np.blackman(1024)  # -58 dB sidelobes; averaging adds margin
    acc, cnt = 0.0, 0
    for f0 in range(2048, x.shape[1] - 1024, 1024):
        seg = x[0, f0:f0 + 1024]
        p = np.abs(np.fft.rfft(seg * win)) ** 2
        acc += float(p[lo:hi + 1].max())
        cnt += 1
    return 10.0 * math.log10(max(acc / cnt, 1e-300))


def enumerate_codewords() -> list[str]:
    """BFS with the two-noise-band parse probe."""
    words: list[str] = []
    stack = [""]
    probes = 0
    while stack:
        prefix = stack.pop()
        for b in "01":
            cand = prefix + b
            if len(cand) > MAX_CODE_LEN:
                continue
            probes += 1
            if parses(cand, 2):
                words.append(cand)
            else:
                stack.append(cand)
    print(f"enumerated {len(words)} codewords in {probes} parse probes",
          file=sys.stderr)
    return sorted(words, key=lambda w: (len(w), w))


DB_PER_STEP = 20.0 * math.log10(2.0) / 4.0  # 1.505 dB per dpcm step


def measure_values_v2(words: list[str]) -> dict[str, int]:
    """Clamp-aware two-protocol measurement.

    libav clamps the internal noise index near [floor, 155]; every
    probe therefore picks an operating point keeping the whole chain
    inside the linear range:
      * v >= -25: direct 2-band read at NRG0=280 (internal ~34; +60
        stays at 94, far from the cap);
      * v < -25: 4-band chain [w][+60][0] at NRG0=320 — band3 sits at
        v+60 >= -39, clear of the ~-45 dB leakage floor, and the
        running index never exceeds 134.
    Readings whose fractional part exceeds 0.3 steps are re-measured
    with more frames before rounding."""
    import extract_scf as E  # self, for the NRG0 knob

    def direct(w, nframes=6):
        E.NRG0 = 280
        ref = frame(2, "0", nframes=nframes)
        e_ref = band_energy_db(ref, 1)
        x = frame(2, w, nframes=nframes)
        if x is None:
            return None
        return (band_energy_db(x, 1) - e_ref) / DB_PER_STEP

    # find the +60 lift first: the direct maximum
    raw = {}
    for w in words:
        raw[w] = direct(w)
    lift = max((w for w in words if raw[w] is not None),
               key=lambda w: raw[w])
    assert round(raw[lift]) == 60, raw[lift]

    def chained(w, nframes=8):
        E.NRG0 = 320
        ref = frame(4, "0" + "0" + "0", nframes=nframes)
        e_ref = band_energy_db(ref, 3)
        x = frame(4, w + lift + "0", nframes=nframes)
        if x is None:
            return None
        return (band_energy_db(x, 3) - e_ref) / DB_PER_STEP - 60.0

    values = {}
    for w in words:
        v = raw[w]
        if v is None or v < -25.0:
            v = chained(w)
        if v is None:
            values[w] = None
            continue
        if abs(v - round(v)) > 0.3:
            v2 = chained(w, nframes=16) if v < -25 else direct(w, nframes=16)
            v = v2 if v2 is not None else v
        values[w] = round(v)
    return values


def measure_values(words: list[str]) -> dict[str, int]:
    """dpcm delta per codeword via band-energy ratios.

    All energies calibrate against the 1-bit codeword '0' (delta 0 —
    confirmed post-hoc by the extracted book covering a contiguous
    delta range exactly once): band widths differ per sfb, so each
    chain position gets its own '0...0' reference frame. Deep-negative
    deltas are floored by the anchor's window-leakage skirt (~-45 dB)
    and are re-measured through a chain with the largest known positive
    codeword lifting the running energy back into range."""
    assert words[0] == "0", "expected the canonical 1-bit codeword"
    ref1 = frame(2, "0")
    assert ref1 is not None
    e1_ref = band_energy_db(ref1, 1)
    values: dict[str, int] = {}
    unresolved: list[str] = []
    for w in words:
        x = frame(2, w)
        if x is None:
            unresolved.append(w)
            continue
        d_db = band_energy_db(x, 1) - e1_ref
        if d_db > -35.0:
            values[w] = round(d_db / DB_PER_STEP)
        else:
            unresolved.append(w)
    lift_w = max(values, key=lambda w: values[w])
    lift_v = values[lift_w]
    print(f"direct: {len(values)} values; lifting {len(unresolved)} "
          f"via +{lift_v} codeword", file=sys.stderr)
    ref2 = frame(3, "0" + "0")
    e2_ref = band_energy_db(ref2, 2) if ref2 is not None else None
    for w in unresolved:
        # bands: [nrg0][w][lift] -> band2 energy ~ v + lift
        x = frame(3, w + lift_w)
        if x is None or e2_ref is None:
            values[w] = None
            continue
        d_db = band_energy_db(x, 2) - e2_ref
        values[w] = round(d_db / DB_PER_STEP) - lift_v
    return values


def main():
    words = enumerate_codewords()
    values = measure_values_v2(words)
    got = sorted(v for v in values.values() if v is not None)
    print(f"value range: {got[0]}..{got[-1]}, {len(got)} resolved / "
          f"{len(words)} codewords", file=sys.stderr)
    # sanity: a huffman dpcm book should cover a contiguous range once
    dupes = len(got) - len(set(got))
    print(f"duplicate values: {dupes}", file=sys.stderr)
    out = {"law": "amplitude = 2^(delta/4); first noise band raw 9 bits, "
                  "dpcm anchored at global_gain-like base (measured)",
           "codewords": values}
    with open(os.path.join(os.path.dirname(__file__), "scf.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote scf.json", file=sys.stderr)


if __name__ == "__main__":
    main()
