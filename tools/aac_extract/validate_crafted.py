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
from frames_aac import (Ics, adts_frame, sce_frame, silence_frame,  # noqa: E402
                        RATE_INDEX)

_BOOKS = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "spectral_books.json")))
_SWB = json.load(open(os.path.join(os.path.dirname(__file__),
                                   "swb_tables.json")))
_SCF = json.load(open(os.path.join(os.path.dirname(__file__),
                                   "scf.json")))

# book-5 codewords by value pair (signed 2-tuples)
_B5 = {tuple(v): k for k, v in _BOOKS["5"]["units"].items()}
# scalefactor codewords by dpcm delta
_SCF_CW = {v: k for k, v in _SCF["codewords"].items()}


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


def cpe_frame(ics_l, ics_r, ms_mask=0, ms_bits="", rate=48000,
              common=True):
    """channel_pair_element with common_window; ics_l/ics_r carry the
    per-channel gains/sections/scf/spectral, ics_l's ics_info is
    shared."""
    w = BitWriter()
    w.put(1, 3)                    # CPE
    w.put(0, 4)                    # tag
    w.put(1 if common else 0, 1)
    short = ics_l.window_sequence == 2

    def write_info(ics):
        w.put(0, 1)
        w.put(ics.window_sequence, 2)
        w.put(ics.window_shape, 1)
        if short:
            w.put(ics.max_sfb, 4)
            w.put(ics.scale_factor_grouping, 7)
        else:
            w.put(ics.max_sfb, 6)
            w.put(0, 1)

    def write_body(ics):
        w.put(ics.global_gain, 8)
        sect_bits = 3 if short else 5
        esc = (1 << sect_bits) - 1
        ngroups = 1
        if short:
            ngroups = 1 + bin(~ics.scale_factor_grouping & 0x7F).count("1")
        sections = list(ics.sections)
        covered = sum(run for _, run in sections)
        if covered == ics.max_sfb and ngroups > 1:
            sections = sections * ngroups
        for cb, run in sections:
            w.put(cb, 4)
            r = run
            while r >= esc:
                w.put(esc, sect_bits)
                r -= esc
            w.put(r, sect_bits)
        w.put_bits(ics.scf_bits)
        w.put(1 if ics.pulse_bits else 0, 1)
        w.put_bits(ics.pulse_bits)
        w.put(1 if ics.tns_bits else 0, 1)
        w.put_bits(ics.tns_bits)
        w.put(0, 1)
        w.put_bits(ics.spectral_bits)

    if common:
        write_info(ics_l)
        w.put(ms_mask, 2)
        if ms_mask == 1:
            w.put_bits(ms_bits)
        write_body(ics_l)
        write_body(ics_r)
    else:
        # each channel carries its own full ICS (gain + ics_info +
        # sections + scf + flags + spectral) — Ics.write emits exactly
        # that layout
        ics_l.write(w)
        ics_r.write(w)
    w.put(7, 3)                    # END
    payload = w.to_bytes((len(w) + 7) // 8)
    return adts_frame(payload, rate=rate, channels=2)


def silence2(rate=48000):
    """Stereo silence frame (CPE, max_sfb=0)."""
    z = Ics(max_sfb=0)
    return cpe_frame(z, z, rate=rate)


def stream2(frame, rate=48000):
    s = silence2(rate=rate)
    return s * 2 + frame + s * 3


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
    ok &= pulse_battery()
    ok &= window_battery()
    ok &= cpe_battery()
    return ok


def pulse_battery():
    """pulse_data(): number_pulse(2)+1 pulses from start_sfb(6), each
    offset(5) amp(4); amplitudes ADD to the quantized magnitude (away
    from zero) before dequantisation. Long windows only."""
    ok = True

    def pulse_bits(start_sfb, pulses):
        w = BitWriter()
        w.put(len(pulses) - 1, 2)
        w.put(start_sfb, 6)
        for off, amp in pulses:
            w.put(off, 5)
            w.put(amp, 4)
        return "".join(str(b) for b in w.bits)

    # single pulse on a zero line; on a nonzero positive line; on a
    # NEGATIVE line (amplitude must grow away from zero); several
    # pulses chaining offsets across bands
    cyc = [(2, 1), (-1, 0), (0, -2), (1, 1)]
    pairs = []
    swb = _SWB["48000"]["long"]
    for b in range(8):
        wdt = swb[b + 1] - swb[b]
        pairs += [cyc[i % len(cyc)] for i in range(wdt // 2)]
    spec = b5_bits(pairs)

    def ics_with(pb):
        return Ics(global_gain=135, max_sfb=8, sections=[(5, 8)],
                   scf_bits="0" * 8, spectral_bits=spec, pulse_bits=pb)

    cases = [
        ("pulse zero-line", pulse_bits(0, [(1, 3)])),
        ("pulse pos-line", pulse_bits(0, [(0, 5)])),
        ("pulse neg-line", pulse_bits(1, [(1, 4)])),
        ("pulse multi", pulse_bits(2, [(0, 2), (3, 7), (10, 1), (2, 15)])),
        # start_sfb beyond the band table: both decoders must REJECT the
        # frame (decode to silence), not index past swb
        ("pulse bad start_sfb", pulse_bits(63, [(0, 3)])),
    ]
    for name, pb in cases:
        ok &= compare(name, stream(sce_frame(ics_with(pb))))
    return ok


def cpe_battery():
    """Stereo tools under common_window: M/S (full + masked), intensity
    (both phases, with and without ms interaction), per-channel TNS,
    and the combination that broke on real encodes: SHORT sequences
    with irregular grouping + per-(group, band) M/S mask."""
    ok = True
    cyc_l = [(2, 1), (1, -1), (-2, 1), (3, 0)]
    cyc_r = [(0, 2), (-1, 1), (1, 1), (-2, -1)]

    def content(rate, nband, short=False, cyc=None):
        swb = _SWB[str(rate)]["short" if short else "long"]
        nwin = 8 if short else 1
        pairs = []
        i = 0
        for b in range(nband):
            wdt = swb[b + 1] - swb[b]
            for _ in range(wdt // 2 * nwin):
                pairs.append(cyc[i % len(cyc)])
                i += 1
        return b5_bits(pairs)

    def mk(nband=8, short=False, grouping=0, gg=135, cyc=cyc_l, tns=""):
        ng = (1 + bin(~grouping & 0x7F).count("1")) if short else 1
        return Ics(global_gain=gg, window_sequence=2 if short else 0,
                   scale_factor_grouping=grouping, max_sfb=nband,
                   sections=[(5, nband)], scf_bits="0" * (nband * ng),
                   spectral_bits=content(48000, nband, short, cyc),
                   tns_bits=tns)

    # long-window M/S: off, all, masked
    for mask, bits, name in ((0, "", "off"), (2, "", "all"),
                             (1, "10101010", "masked")):
        blob = stream2(cpe_frame(mk(), mk(cyc=cyc_r), ms_mask=mask,
                                 ms_bits=bits))
        ok &= compare(f"cpe ms {name}", blob)
    # short grouped + per-(group, band) M/S mask — the real-encode case
    for grouping in (0x33, 0x6D):
        ng = 1 + bin(~grouping & 0x7F).count("1")
        bits = "".join("10"[(g + k) % 2] for g in range(ng)
                       for k in range(4))
        l = mk(nband=4, short=True, grouping=grouping)
        r = mk(nband=4, short=True, grouping=grouping, cyc=cyc_r)
        blob = stream2(cpe_frame(l, r, ms_mask=1, ms_bits=bits))
        ok &= compare(f"cpe short grouped ms 0x{grouping:02x}", blob)
    # per-channel TNS on a CPE (left only, then both, different orders)
    t1 = tns_bits([[(49, 1, 0, 0, [1])]])
    t2 = tns_bits([[(49, 2, 0, 0, [2, 1])]])
    blob = stream2(cpe_frame(mk(tns=t1), mk(cyc=cyc_r), ms_mask=0))
    ok &= compare("cpe tns left-only", blob)
    blob = stream2(cpe_frame(mk(tns=t1), mk(cyc=cyc_r, tns=t2), ms_mask=2))
    ok &= compare("cpe tns both + ms all", blob)
    # intensity stereo: right bands ride book 15 (in-phase) / 14 (out),
    # is_pos dpcm via the scf book; no right spectral data
    dp0 = _SCF_CW[0]
    dp2 = _SCF_CW[2]
    for book, name in ((15, "in"), (14, "out")):
        l = mk(nband=8)
        r = Ics(global_gain=135, max_sfb=8, sections=[(book, 8)],
                scf_bits=dp2 + dp0 * 7, spectral_bits="")
        blob = stream2(cpe_frame(l, r, ms_mask=0))
        ok &= compare(f"cpe intensity {name}", blob)
    # intensity + ms_mask=1 (mask bit flips intensity sign)
    l = mk(nband=8)
    r = Ics(global_gain=135, max_sfb=8, sections=[(15, 8)],
            scf_bits=dp2 + dp0 * 7, spectral_bits="")
    blob = stream2(cpe_frame(l, r, ms_mask=1, ms_bits="11110000"))
    ok &= compare("cpe intensity + mask", blob)
    # intensity WITHOUT common_window (each channel its own ics_info;
    # intensity indexes by the right channel's band layout)
    l = mk(nband=8)
    r = Ics(global_gain=135, max_sfb=8, sections=[(15, 8)],
            scf_bits=dp2 + dp0 * 7, spectral_bits="")
    blob = stream2(cpe_frame(l, r, common=False))
    ok &= compare("cpe intensity non-common", blob)
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
    # short sequences with NON-TRIVIAL window grouping (real encoders
    # group transient frames irregularly; grouping bit g set means
    # window g+1 joins the previous group)
    # content VARIES per unit (a value cycle), so the group-dependent
    # (group, band, window-interleaved) line ordering is actually
    # exercised — uniform content is grouping-invariant and vacuous
    cycle = [(2, 1), (1, -1), (-2, 1), (3, 0), (0, -3), (-1, -1),
             (4, 2), (-3, 2)]
    swb_s = _SWB["48000"]["short"]
    npairs = sum((swb_s[b + 1] - swb_s[b]) // 2 for b in range(4)) * 8
    varied = b5_bits([cycle[i % len(cycle)] for i in range(npairs)])
    for grouping in (0x00, 0x33, 0x55, 0x6D, 0x70):
        ngroups = 1 + bin(~grouping & 0x7F).count("1")
        ics = Ics(global_gain=135, window_sequence=2,
                  scale_factor_grouping=grouping, max_sfb=4,
                  sections=[(5, 4)], scf_bits="0" * (4 * ngroups),
                  spectral_bits=varied, tns_bits="")
        blob = s + sce_frame(ics) + s * 2
        ok &= compare(f"winseq grouping 0x{grouping:02x}", blob)
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
