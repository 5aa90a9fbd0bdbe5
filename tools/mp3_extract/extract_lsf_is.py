"""Extract LSF (MPEG-2/2.5) intensity-stereo behavior from the strict
mpg123 oracle: the intensity channel's scalefactor serialization (bit
counts and band partitions per scalefac_compress), the is_pos ->
(k_left, k_right) ratio map with its io base selection, the no-intensity
sentinel, and the MS interaction.

Method:
  1. part2_3-undershoot threshold scan: mpg123 refuses a granule whose
     scalefactor read crosses part2_3_length, so the minimal length that
     decodes reveals the intensity channel's total scalefactor bits for
     every scalefac_compress value.
  2. one-bit probes: setting a single scalefactor bit and fitting the
     decoded stereo PCM against per-band back-half bases (backhalf.py,
     all closed-form except the recovered D window) shows which band the
     bit belongs to and the k-ratios its is_pos produces.

Writes lsf_is.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import frames_lsf as FL  # noqa: E402
from backhalf import Synth, alias_reduce, freq_invert, imdct_granule  # noqa: E402
from extract_huffman import _load_d  # noqa: E402
from frames_lsf import LsfGranule  # noqa: E402
from oracle_mpg123 import decode_frames_mpg123  # noqa: E402

RATE = 24000
N_QUADS = 72                      # ch0: 288 lines of +1
CH0_BITS = 8 * N_QUADS


def ch0_granule():
    g = LsfGranule(part2_3_length=CH0_BITS, count1table_select=1)
    return g, ("0000" + "0000") * N_QUADS


def probe_frame(sc: int, length: int, bits: str | None = None,
                mode_ext: int = 1) -> bytes:
    g0, m0 = ch0_granule()
    g1 = LsfGranule(part2_3_length=length, scalefac_compress=sc)
    m1 = (bits or "") + "0" * (length - len(bits or ""))
    return FL.make_lsf_stereo_frame(RATE, [g0, g1], [m0, m1],
                                    mode=1, mode_ext=mode_ext)


def decode_probe(frame: bytes) -> np.ndarray:
    Z = FL.lsf_stereo_zero_frame(RATE)
    pcm = decode_frames_mpg123([Z, frame, Z], rate=RATE, channels=2)
    if pcm.ndim != 2 or pcm.shape[1] != 3 * 576:
        return np.zeros((2, 3 * 576))
    return pcm.astype(np.float64)


def scan_bit_counts() -> list[int]:
    """Per scalefac_compress: the intensity channel's total scalefactor
    bit count. Payload is all '1' bits — any surplus past the
    scalefactor region decodes as count1-A zero quads (code '1'), so the
    spectrum stays zero and no overrun can trip; mpg123 strictly rejects
    the granule while part2_3_length < the scalefactor bits (except the
    L=0 silent-granule special case), so the minimal decodable L >= 1 is
    the bit count (n=0 vs n=1 disambiguated against the L=0 baseline)."""
    counts = []
    for sc in range(512):
        def ok(L: int) -> bool:
            got = decode_probe(probe_frame(sc, L, "1" * L))
            return float(np.max(np.abs(got[0][576:2 * 576]))) > 0.05

        lo, hi = 1, 280
        assert ok(hi), sc
        while lo < hi:
            mid = (lo + hi) // 2
            if ok(mid):
                hi = mid
            else:
                lo = mid + 1
        if lo == 1:
            base = decode_probe(probe_frame(sc, 0))
            got = decode_probe(probe_frame(sc, 1, "1"))
            if float(np.max(np.abs(got - base))) < 1e-6:
                lo = 0
        counts.append(lo)
        if sc % 32 == 0:
            print(f"sc={sc}: {lo} scf bits", flush=True)
    return counts


# ---------------------------------------------------------------------------
# per-band stereo readout: fit decoded PCM against back-half bases

def band_edges():
    with open(os.path.join(os.path.dirname(__file__), "lsf.json")) as f:
        lsf = json.load(f)
    return lsf[str(RATE)]["long_edges"] + [576]


def simulate(xr576: np.ndarray, d: np.ndarray) -> np.ndarray:
    """[zero, probe, zero] granules -> PCM for the probe+tail window."""
    synth = Synth(d)
    overlap = np.zeros((32, 18))
    outs = []
    for g, xr in enumerate((np.zeros(576), xr576, np.zeros(576))):
        ts, overlap = imdct_granule(alias_reduce(xr), overlap)
        ts = freq_invert(ts)
        for t in range(18):
            outs.append(synth.step(ts[:, t]))
    return np.concatenate(outs)[576:]            # [1152]


_BASIS = None


def band_basis(d: np.ndarray):
    """A[b] = PCM of band b's lines at +1 (bands covered by ch0)."""
    global _BASIS
    if _BASIS is None:
        edges = band_edges()
        nlines = 4 * N_QUADS
        cols, bands = [], []
        for b in range(len(edges) - 1):
            lo, hi = edges[b], min(edges[b + 1], nlines)
            if lo >= nlines:
                break
            xr = np.zeros(576)
            xr[lo:hi] = 1.0
            cols.append(simulate(xr, d))
            bands.append(b)
        A = np.stack(cols, axis=1)
        _BASIS = (bands, A, np.linalg.pinv(A))
    return _BASIS


def fit_bands(pcm_lr: np.ndarray, d: np.ndarray):
    """Decoded [2, 3*576] probe sandwich -> per-band (k_left, k_right)."""
    bands, A, pinv = band_basis(d)
    kl = pinv @ pcm_lr[0][576:]
    kr = pinv @ pcm_lr[1][576:]
    resid_l = float(np.max(np.abs(pcm_lr[0][576:] - A @ kl)))
    resid_r = float(np.max(np.abs(pcm_lr[1][576:] - A @ kr)))
    return bands, kl, kr, max(resid_l, resid_r)


def probe_frame_bt(sc: int, length: int, bits: str | None = None,
                   block_type: int = 0, mixed: int = 0,
                   mode_ext: int = 1) -> bytes:
    g0, m0 = ch0_granule()
    g1 = LsfGranule(part2_3_length=length, scalefac_compress=sc,
                    window_switching=block_type != 0, block_type=block_type,
                    mixed_block=mixed)
    m1 = (bits or "") + "1" * (length - len(bits or ""))
    return FL.make_lsf_stereo_frame(RATE, [g0, g1], [m0, m1], 1, mode_ext)


def min_scf_len(sc: int, block_type: int = 0, mixed: int = 0) -> int:
    def ok(L: int) -> bool:
        got = decode_probe(probe_frame_bt(sc, L, "1" * L, block_type, mixed))
        return float(np.max(np.abs(got[0][576:2 * 576]))) > 0.05

    lo, hi = 1, 280
    assert ok(hi), sc
    while lo < hi:
        mid = (lo + hi) // 2
        if ok(mid):
            hi = mid
        else:
            lo = mid + 1
    return lo


def model_counts(counts: list[int]) -> None:
    """Verify the three-region slen model against all 512 measured
    counts (pairs equal -> int_sc = sc >> 1; long-block group size 7/6/8
    per region; the slen==0 case measures 1 from the L=0-vs-L=1
    disambiguation edge, see the quirk probe)."""
    assert all(counts[2 * i] == counts[2 * i + 1] for i in range(256))
    for s in range(256):
        if s < 180:
            n = 7 * (s // 36) + 7 * ((s % 36) // 6) + 7 * (s % 6)
        elif s < 244:
            j = s - 180
            n = 6 * (j >> 4) + 6 * ((j >> 2) & 3) + 6 * (j & 3)
        else:
            j = s - 244
            n = 8 * (j // 3) + 8 * (j % 3)
        assert counts[2 * s] == (n if n else 1), (s, counts[2 * s], n)
    print("three-region slen model verified for all 512 sc", flush=True)


def main():
    d = _load_d()
    out = {}

    # 1. total scalefactor bits per scalefac_compress (long blocks)
    counts = scan_bit_counts()
    out["scf_bits"] = counts
    model_counts(counts)

    # 2. long-block field -> band maps per region (single-bit probes)
    field_maps = {}
    for sc, n, tag in ((72, 7, "r1-g0"), (12, 7, "r1-g1"), (2, 7, "r1-g2"),
                       ((180 + 16) * 2, 6, "r2-g0"), ((180 + 4) * 2, 6, "r2-g1"),
                       ((180 + 1) * 2, 6, "r2-g2"),
                       ((244 + 3) * 2, 8, "r3-g0"), ((244 + 1) * 2, 8, "r3-g1")):
        base_l, base_r = None, None
        bandlist = []
        for p in range(n):
            bits = "0" * p + "1" + "0" * (n - 1 - p)
            _, kl, kr, _ = fit_bands(decode_probe(probe_frame(sc, n, bits)), d)
            if base_l is None:
                _, base_l, base_r, _ = fit_bands(
                    decode_probe(probe_frame(sc, n, "0" * n)), d)
            ch = [b for b in range(len(kl))
                  if abs(kl[b] - base_l[b]) > 1e-3
                  or abs(kr[b] - base_r[b]) > 1e-3]
            bandlist.append(ch[0] if len(ch) == 1 else ch)
        field_maps[tag] = bandlist
        print(tag, "->", bandlist, flush=True)
    out["field_maps"] = field_maps
    # each group covers consecutive bands; groups are contiguous
    assert field_maps["r1-g0"] == [0, 1, 2, 3, 4, 5, 6]
    assert field_maps["r1-g1"] == [7, 8, 9, 10, 11, 12, 13]
    assert field_maps["r1-g2"][:4] == [14, 15, 16, 17]

    # 3. is_pos -> (k_left, k_right) for both io selections; sentinel
    kmaps = {}
    for sc, tag in ((10, "io_even"), (11, "io_odd")):
        res = {}
        for v in range(32 if tag == "io_even" else 8):
            bits = format(v, "05b") + "0" * 30
            _, kl, kr, _ = fit_bands(
                decode_probe(probe_frame(sc, 35, bits)), d)
            res[v] = (round(float(kl[14]), 6), round(float(kr[14]), 6))
        kmaps[tag] = res
        print(tag, {v: res[v] for v in (0, 1, 2, 7) if v in res},
              flush=True)
    out["k_maps"] = kmaps
    io = {"io_even": 2.0 ** -0.25, "io_odd": 2.0 ** -0.5}
    for tag, res in kmaps.items():
        for v, (k0, k1) in res.items():
            if v == 7:
                want = (1.0, 0.0)       # sentinel: no intensity
            elif v == 0:
                want = (1.0, 1.0)
            elif v & 1:
                want = (io[tag] ** ((v + 1) // 2), 1.0)
            else:
                want = (1.0, io[tag] ** (v // 2))
            assert abs(k0 - want[0]) < 1e-3 and abs(k1 - want[1]) < 1e-3, \
                (tag, v, k0, k1, want)
    print("k map model verified (sentinel is_pos == 7)", flush=True)

    # 4. MS interaction (mode_ext = 3): intensity still applies per the k
    #    map; only sentinel bands get the MS butterfly
    for v, want in ((0, (1.0, 1.0)), (1, (2.0 ** -0.25, 1.0)),
                    (7, (2.0 ** -0.5, 2.0 ** -0.5))):
        bits = format(v, "05b") + "0" * 30
        _, kl, kr, _ = fit_bands(
            decode_probe(probe_frame(10, 35, bits, mode_ext=3)), d)
        assert abs(kl[14] - want[0]) < 1e-3 and abs(kr[14] - want[1]) < 1e-3, \
            (v, kl[14], kr[14])
    print("MS+IS semantics verified", flush=True)

    # 5. short/mixed-block group sizes (bits per slen unit and group)
    short_mixed = {}
    # per region: the int_sc that sets exactly one slen unit per group
    one_unit = ((36, 6, 1), (180 + 16, 180 + 4, 180 + 1),
                (244 + 3, 244 + 1, None))
    for bt, mx, tag in ((2, 0, "short"), (2, 1, "mixed")):
        rows = []
        for units in one_unit:
            rows.append([0 if u is None else min_scf_len(2 * u, bt, mx)
                         for u in units])
        short_mixed[tag] = rows
        print(tag, rows, flush=True)
    out["short_mixed_nr"] = short_mixed
    assert short_mixed["short"] == [[12, 12, 12], [12, 9, 9], [15, 12, 0]]
    assert short_mixed["mixed"] == [[6, 15, 12], [6, 12, 9], [6, 18, 0]]

    path = os.path.join(os.path.dirname(__file__), "lsf_is.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
