"""Crafted-frame conformance battery: first-party AAC-LC decoder vs the
libav oracle.

Every case builds a deterministic ADTS stream (silence guard frames
around one content frame), decodes it with BOTH decoders, and compares
sample-for-sample.  Used while bringing up native/aac.cpp — unlike the
randomized encoder matrix in tests/test_aac.py, these frames exercise
one feature at a time so a mismatch localises immediately.

Also holds the TNS band-limit boundary probe (--tns-bounds): an
order-1 full-length TNS filter leaves a geometric tail above the last
content band; the line where the oracle's tail stops IS
swb[min(tns_max_bands, max_sfb)].  Run with max_sfb = num_swb to read
the per-rate tns_max_bands limit directly.

Usage:
  python3 tools/aac_extract/validate_crafted.py            # battery
  python3 tools/aac_extract/validate_crafted.py --tns-bounds
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "mp3_extract"))

from frames import BitWriter  # noqa: E402
from frames_aac import Ics, sce_frame, silence_frame, RATE_INDEX  # noqa: E402

_BOOKS = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "spectral_books.json")))
_SWB = json.load(open(os.path.join(os.path.dirname(__file__),
                                   "swb_tables.json")))
_SCF = json.load(open(os.path.join(os.path.dirname(__file__),
                                   "scf.json")))

# book-5 codewords by value pair (signed 2-tuples)
_B5 = {tuple(v): k for k, v in _BOOKS["5"]["units"].items()}


def b5_bits(pairs):
    """Spectral bits coding the given (a, b) line pairs with book 5."""
    return "".join(_B5[tuple(p)] for p in pairs)


def tns_bits(filters, short=False, coef_res=0, n_windows=1):
    """tns_data() payload.  filters: per-window list of
    (length, order, direction, compress, [coef ints]) tuples."""
    w = BitWriter()
    for win in range(n_windows):
        fl = filters[win] if win < len(filters) else []
        w.put(len(fl), 1 if short else 2)
        if not fl:
            continue
        w.put(coef_res, 1)
        for (length, order, direction, compress, coefs) in fl:
            w.put(length, 4 if short else 6)
            w.put(order, 3 if short else 5)
            if order:
                w.put(direction, 1)
                w.put(compress, 1)
                bits = coef_res + 3 - compress
                for c in coefs:
                    w.put(c & ((1 << bits) - 1), bits)
    return "".join(str(b) for b in w.bits)


def decode_ours(blob):
    from soundscope_tpu.native import decoder

    path = f"/tmp/aacval.{os.getpid()}.ours.aac"
    open(path, "wb").write(blob)
    d = decoder.decode_aac(path)
    return np.asarray(d.samples)


def decode_oracle(blob):
    from soundscope_tpu.native import decoder

    path = f"/tmp/aacval.{os.getpid()}.ref.aac"
    open(path, "wb").write(blob)
    d = decoder.decode_any_fmt(path, "aac")
    return np.asarray(d.samples)


def stream(frame, rate=48000):
    s = silence_frame(rate=rate)
    return s * 2 + frame + s * 3


def band_pairs(rate, nband, short=False, nwin=1):
    """Book-5 pairs filling nband bands: (2,1) leading each band, zeros
    after, honoring the real per-rate band widths (and repeating per
    window within the single group for short sequences)."""
    swb = _SWB[str(rate)]["short" if short else "long"]
    pairs = []
    for bnd in range(nband):
        w = swb[bnd + 1] - swb[bnd]
        pairs += ([(2, 1)] + [(0, 0)] * (w // 2 - 1)) * nwin
    return pairs


def content_ics(nband=8, gg=135, tns="", pulse="", seq=0, shape=0,
                grouping=0, rate=48000):
    """ICS with (2,1) at the head of each coded band (book 5)."""
    short = seq == 2
    nwin = 8 if short else 1
    pat = b5_bits(band_pairs(rate, nband, short=short, nwin=nwin))
    return Ics(global_gain=gg, window_sequence=seq, window_shape=shape,
               max_sfb=nband, scale_factor_grouping=grouping,
               sections=[(5, nband)],
               scf_bits="0" * nband,  # dpcm-0 per coded band
               spectral_bits=pat, tns_bits=tns, pulse_bits=pulse)


def compare(name, blob, rate=48000, tol=1e-6):
    ours = decode_ours(blob)
    ref = decode_oracle(blob)
    if ours.shape != ref.shape:
        print(f"FAIL {name}: shape ours={ours.shape} ref={ref.shape}")
        return False
    scale = max(np.abs(ref).max(), 1e-30)
    diff = np.abs(ours - ref).max() / scale
    ok = diff < tol
    print(f"{'ok  ' if ok else 'FAIL'} {name}: rel={diff:.3g} "
          f"(ref max {np.abs(ref).max():.3g})")
    return ok


def battery():
    ok = True
    # TNS on long windows: orders 1..12, both directions, both
    # resolutions, compress, multiple filters
    # Higher orders with repeated q=3 taps (sin(3pi/7)=0.975) are
    # near-singular stress filters: the o12 variant amplifies the band
    # content ~1300x, so a 1-ulp float difference in one dequantized
    # tap between two independent float implementations shows up as
    # ~1e-3 relative output difference. Tolerances scale accordingly;
    # realistic encoder filters (see tests/test_aac.py) sit at 1e-6.
    for order, tol in ((1, 1e-6), (2, 1e-6), (3, 1e-5), (7, 1e-4),
                       (12, 1e-2)):
        coefs = [(1 + (i % 3)) % (1 << 2) or 1 for i in range(order)]
        t = tns_bits([[(49, order, 0, 0, coefs)]])
        ok &= compare(f"tns long o{order} up",
                      stream(sce_frame(content_ics(tns=t))), tol=tol)
    t = tns_bits([[(49, 2, 1, 0, [1, 2])]])
    ok &= compare("tns long o2 down", stream(sce_frame(content_ics(tns=t))))
    # negative + positive coefs, res=1 (4-bit)
    t = tns_bits([[(49, 3, 0, 0, [9, 3, 14])]], coef_res=1)
    ok &= compare("tns long res1", stream(sce_frame(content_ics(tns=t))),
                  tol=1e-5)
    # compress=1 narrows transmitted bits
    t = tns_bits([[(49, 2, 0, 1, [1, 3])]], coef_res=1)
    ok &= compare("tns long res1 compress",
                  stream(sce_frame(content_ics(tns=t))))
    # two filters in one window
    t = tns_bits([[(20, 2, 0, 0, [1, 2]), (29, 1, 0, 0, [3])]])
    ok &= compare("tns long two-filters",
                  stream(sce_frame(content_ics(tns=t))))
    # clamped region: max_sfb large enough that tns_max_bands=40 bites
    wide = content_ics(nband=45, tns=tns_bits([[(49, 1, 0, 0, [1])]]))
    ok &= compare("tns long maxbands-clamp", stream(sce_frame(wide)))
    # short windows: all 8 windows in one group, full-length filter
    t = tns_bits([[(14, 1, 0, 0, [1])]] * 8, short=True, n_windows=8)
    ics = content_ics(nband=4, seq=2, grouping=0x7F, tns=t)
    ok &= compare("tns short o1", stream(sce_frame(ics)))
    t = tns_bits([[(14, 3, 0, 0, [1, 6, 2])]] * 8, short=True, n_windows=8)
    ics = content_ics(nband=4, seq=2, grouping=0x7F, tns=t)
    ok &= compare("tns short o3", stream(sce_frame(ics)))
    # per-window distinct filters
    filts = [[(14, 1, 0, 0, [i % 4 or 1])] if i % 2 == 0 else []
             for i in range(8)]
    t = tns_bits(filts, short=True, n_windows=8)
    ics = content_ics(nband=4, seq=2, grouping=0x7F, tns=t)
    ok &= compare("tns short alternating", stream(sce_frame(ics)))
    # other rates (different swb tables feed the region arithmetic)
    for rate in (44100, 32000, 24000, 16000, 8000):
        nsw = len(_SWB[str(rate)]["long"]) - 1
        ics = content_ics(rate=rate,
                          tns=tns_bits([[(min(nsw, 63), 2, 0, 0,
                                          [1, 2])]]))
        ok &= compare(f"tns long {rate}",
                      stream(sce_frame(ics, rate=rate), rate=rate),
                      rate=rate)
    ok &= window_battery()
    return ok


def window_battery():
    """Window sequences and shapes: every LONG/START/SHORT/STOP
    adjacency and both window shapes, with content in every frame so
    each overlap-add seam is exercised."""
    ok = True

    def frame(seq, shape, rate=48000):
        if seq == 2:
            ics = content_ics(nband=4, seq=2, grouping=0x7F, shape=shape,
                              rate=rate)
        else:
            ics = content_ics(nband=8, seq=seq, shape=shape, rate=rate)
        return sce_frame(ics, rate=rate)

    s = silence_frame()
    # canonical transient sequence with content on every frame
    seqs = [0, 1, 2, 3, 0]
    blob = s + b"".join(frame(q, 0) for q in seqs) + s * 2
    ok &= compare("winseq long-start-short-stop-long", blob)
    # KBD shape everywhere
    blob = s + b"".join(frame(q, 1) for q in seqs) + s * 2
    ok &= compare("winseq kbd", blob)
    # shape change mid-stream (prev_shape drives the left half)
    blob = s + frame(0, 0) + frame(0, 1) + frame(0, 0) + s * 2
    ok &= compare("winshape flip long", blob)
    blob = s + frame(1, 0) + frame(2, 1) + frame(3, 0) + frame(0, 1) + s * 2
    ok &= compare("winshape flip transitions", blob)
    # back-to-back short frames
    blob = s + frame(1, 0) + frame(2, 0) + frame(2, 1) + frame(2, 0) \
        + frame(3, 1) + s * 2
    ok &= compare("winseq short-run", blob)
    # 44.1 kHz variant
    s44 = silence_frame(rate=44100)
    blob = s44 + b"".join(frame(q, 0, rate=44100) for q in seqs) + s44 * 2
    ok &= compare("winseq 44100", blob, rate=44100)
    return ok


def tns_bounds():
    """Measure swb[min(tns_max_bands, max_sfb)] per rate: put content in
    the TOP coded band, filter full range, find where the oracle tail
    dies vs where ours does."""
    for rate in sorted(RATE_INDEX, key=lambda r: -r):
        for short in (False, True):
            key = "short" if short else "long"
            swb = _SWB[str(rate)][key]
            nsw = len(swb) - 1
            # content fills every band (pairs per band vary in width)
            pairs = []
            for b in range(nsw):
                w = swb[b + 1] - swb[b]
                pairs += [(2, 1)] + [(0, 0)] * (w // 2 - 1)
            if short:
                t = tns_bits([[(15 if nsw > 15 else nsw, 1, 0, 0, [1])]]
                             * 8, short=True, n_windows=8)
                ics = Ics(global_gain=135, window_sequence=2,
                          scale_factor_grouping=0x7F, max_sfb=nsw,
                          sections=[(5, nsw)], scf_bits="0" * nsw,
                          spectral_bits=b5_bits(pairs * 8), tns_bits=t)
            else:
                t = tns_bits([[(min(nsw, 63), 1, 0, 0, [1])]])
                ics = Ics(global_gain=135, max_sfb=nsw,
                          sections=[(5, nsw)], scf_bits="0" * nsw,
                          spectral_bits=b5_bits(pairs), tns_bits=t)
            blob = stream(sce_frame(ics, rate=rate), rate=rate)
            try:
                ours = decode_ours(blob)
                ref = decode_oracle(blob)
                scale = max(np.abs(ref).max(), 1e-30)
                d = np.abs(ours - ref).max() / scale
                print(f"{rate:6d} {key:5s} nsw={nsw:2d} rel={d:.3g}")
            except Exception as e:  # noqa: BLE001
                print(f"{rate:6d} {key:5s} nsw={nsw:2d} ERROR {e}")


if __name__ == "__main__":
    if "--tns-bounds" in sys.argv:
        tns_bounds()
    else:
        sys.exit(0 if battery() else 1)
