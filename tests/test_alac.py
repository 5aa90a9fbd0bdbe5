"""ALAC: the first-party decoder + MP4/CAF demux (native/alac.cpp,
native/demux.cpp) must match the independent libav decoder BIT-EXACTLY
on bridge-encoded fixtures (lossless codec => no tolerance), cover both
containers, survive truncation/corruption, and win the io dispatch.

Reference surface: symphonia-decoded ALAC/M4A/CAF playback
(/root/reference/src/audio_player.rs:169-267, Cargo.toml:21)."""

import os
import struct

import numpy as np
import pytest

from soundscope_tpu.utils.io import DecodeError, decode_file

RATE = 44100


def _native():
    from soundscope_tpu.native import decoder

    if not decoder.available():
        pytest.skip("native runtime unavailable")
    return decoder


def _bridge(dec):
    if not dec.codecs_available():
        pytest.skip("codec bridge not compiled in (fixture encoder)")
    return dec


def _signal(kind, seconds=1.0, channels=2, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    if kind == "tonal":
        base = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        x = np.stack([base * (0.9 + 0.1 * c) for c in range(channels)])
    elif kind == "noise":
        # near-incompressible: exercises escape/verbatim paths
        x = rng.uniform(-0.99, 0.99, (channels, n))
    elif kind == "quiet":
        # long zero stretches: exercises the rice zero-run path
        x = np.zeros((channels, n))
        x[:, ::311] = 0.002
    elif kind == "mixed":
        x = 0.4 * np.sin(2 * np.pi * 997.0 * t) + 0.05 * rng.standard_normal(n)
        x = np.stack([x + 0.02 * rng.standard_normal(n) for _ in range(channels)])
    else:
        raise ValueError(kind)
    return np.clip(x, -0.999, 0.999).astype(np.float32)


def _fixture(dec, tmp_path, x, ext, name="fx"):
    p = str(tmp_path / f"{name}.{ext}")
    dec.encode(p, x, RATE, codec="alac")
    return p


@pytest.mark.parametrize("kind", ["tonal", "noise", "quiet", "mixed"])
@pytest.mark.parametrize("ext", ["m4a", "caf"])
def test_bit_exact_vs_libav(tmp_path, kind, ext):
    dec = _bridge(_native())
    x = _signal(kind)
    p = _fixture(dec, tmp_path, x, ext, kind)
    ours = dec.decode_alac(p)
    libav = dec.decode_any(p)
    assert ours.rate == libav.rate == RATE
    assert ours.samples.shape == libav.samples.shape
    np.testing.assert_array_equal(ours.samples, libav.samples)


def test_mono_bit_exact(tmp_path):
    dec = _bridge(_native())
    x = _signal("mixed", channels=1)
    p = _fixture(dec, tmp_path, x, "m4a", "mono")
    ours = dec.decode_alac(p)
    libav = dec.decode_any(p)
    np.testing.assert_array_equal(ours.samples, libav.samples)
    assert ours.channels == 1


def test_non_frame_multiple_length(tmp_path):
    """A length far from a 4096 multiple pins the partial-frame path."""
    dec = _bridge(_native())
    x = _signal("tonal", seconds=0.337)
    p = _fixture(dec, tmp_path, x, "m4a", "partial")
    ours = dec.decode_alac(p)
    libav = dec.decode_any(p)
    assert ours.samples.shape == libav.samples.shape == x.shape
    np.testing.assert_array_equal(ours.samples, libav.samples)


def test_dispatch_prefers_first_party(tmp_path, monkeypatch):
    """decode_file must route .m4a/.caf ALAC through the first-party
    decoder even with the bridge compiled in."""
    dec = _bridge(_native())
    x = _signal("tonal")
    p = _fixture(dec, tmp_path, x, "m4a")
    calls = []
    orig = dec.decode_alac
    monkeypatch.setattr(dec, "decode_alac",
                        staticmethod(lambda q: calls.append(q) or orig(q)))
    d = decode_file(p)
    assert calls == [p]
    assert d.rate == RATE and d.channels == 2


def test_aac_m4a_not_alacs_job(tmp_path):
    """An AAC-bearing MP4 is not ALAC's job: decode_alac must signal
    cleanly, and decode_file still produces audio (via the first-party
    AAC-LC decoder since round 4; see tests/test_aac.py)."""
    dec = _bridge(_native())
    x = _signal("tonal")
    p = str(tmp_path / "a.m4a")
    dec.encode(p, x, RATE, codec="aac")
    with pytest.raises(DecodeError):
        dec.decode_alac(p)
    d = decode_file(p)
    assert d.rate == RATE and d.samples.shape[1] > 0


def test_caf_lpcm_first_party(tmp_path):
    """CAF holding plain PCM decodes without the bridge."""
    dec = _bridge(_native())
    x = _signal("tonal")
    p = str(tmp_path / "pcm.caf")
    dec.encode(p, x, RATE, codec="pcm_s16le")
    ours = dec.decode_alac(p)
    libav = dec.decode_any(p)
    assert ours.samples.shape == libav.samples.shape
    np.testing.assert_allclose(ours.samples, libav.samples, atol=1e-7)


def test_truncated_degrades_gracefully(tmp_path):
    dec = _bridge(_native())
    x = _signal("mixed", seconds=2.0)
    p = _fixture(dec, tmp_path, x, "m4a", "trunc")
    full = open(p, "rb").read()
    ref = dec.decode_alac(p).samples
    for frac in (0.9, 0.6, 0.3):
        with open(p, "wb") as f:
            f.write(full[: int(len(full) * frac)])
        try:
            got = dec.decode_alac(p)
            n = got.samples.shape[1]
            assert 0 < n <= ref.shape[1]
            # whatever prefix decodes must be the true prefix
            np.testing.assert_array_equal(got.samples, ref[:, :n])
        except DecodeError:
            pass  # clean rejection is fine; crashing is not
    # note: mp4 metadata (moov) sits at the file tail with faststart off,
    # so deep truncation may legitimately drop the whole index


def test_fuzz_bitflips_never_crash(tmp_path):
    dec = _bridge(_native())
    x = _signal("mixed", seconds=0.7)
    p = _fixture(dec, tmp_path, x, "m4a", "fuzz")
    full = bytearray(open(p, "rb").read())
    rng = np.random.default_rng(13)
    for _ in range(40):
        bad = bytearray(full)
        for pos in rng.integers(0, len(bad), size=12):
            bad[pos] ^= 1 << int(rng.integers(0, 8))
        with open(p, "wb") as f:
            f.write(bytes(bad))
        try:
            got = dec.decode_alac(p)
            assert got.samples.shape[1] <= x.shape[1] + (1 << 20)
        except DecodeError:
            pass


def test_garbage_rejected(tmp_path):
    dec = _native()
    p = str(tmp_path / "junk.m4a")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64 + os.urandom(256))
    with pytest.raises(DecodeError):
        dec.decode_alac(p)


def test_caf_pakt_trim_and_apple_kuki(tmp_path):
    """A CAF whose pakt declares fewer valid frames than decoded (the
    Apple-muxed shape: full final packet + remainder trim) is trimmed."""
    dec = _bridge(_native())
    x = _signal("tonal", seconds=1.0)
    src = _fixture(dec, tmp_path, x, "caf", "trim")
    data = bytearray(open(src, "rb").read())
    # locate the pakt chunk and shrink mNumberValidFrames by 100
    i = data.find(b"pakt")
    assert i > 0
    body = i + 12
    (valid,) = struct.unpack(">q", data[body + 8: body + 16])
    want = x.shape[1] - 100
    assert valid >= x.shape[1]
    data[body + 8: body + 16] = struct.pack(">q", want)
    p = str(tmp_path / "trimmed.caf")
    with open(p, "wb") as f:
        f.write(bytes(data))
    got = dec.decode_alac(p)
    ref = dec.decode_alac(src)
    assert got.samples.shape[1] == want
    np.testing.assert_array_equal(got.samples, ref.samples[:, :want])


def test_random_matrix_bit_exact(tmp_path):
    """Randomized sweep: lengths/content/seeds across both containers."""
    dec = _bridge(_native())
    rng = np.random.default_rng(99)
    for i in range(6):
        seconds = float(rng.uniform(0.1, 1.5))
        kind = ["tonal", "noise", "quiet", "mixed"][int(rng.integers(4))]
        ch = int(rng.integers(1, 3))
        ext = ["m4a", "caf"][int(rng.integers(2))]
        x = _signal(kind, seconds=seconds, channels=ch, rng_seed=100 + i)
        p = _fixture(dec, tmp_path, x, ext, f"r{i}")
        ours = dec.decode_alac(p)
        libav = dec.decode_any(p)
        assert ours.samples.shape == libav.samples.shape, (kind, seconds, ch, ext)
        np.testing.assert_array_equal(ours.samples, libav.samples)


def test_crafted_caf_headers_rejected_not_crash(tmp_path):
    """Hostile desc/stsz fields must DecodeError, never abort the
    process (allocation-by-header guard)."""
    dec = _native()
    # CAF with lpcm desc claiming 2^32-1 channels
    desc = struct.pack(">d4sIIIII", 44100.0, b"lpcm", 0, 4, 1, 0xFFFFFFFF, 16)
    caf = (b"caff" + struct.pack(">HH", 1, 0)
           + b"desc" + struct.pack(">q", len(desc)) + desc
           + b"data" + struct.pack(">q", 12) + b"\x00" * 12)
    p = str(tmp_path / "evil.caf")
    with open(p, "wb") as f:
        f.write(caf)
    with pytest.raises(DecodeError):
        dec.decode_alac(p)

    # minimal mp4 whose stsz claims 2^28 fixed-size samples
    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    entry = (struct.pack(">I", 36 + 8) + b"alac" + b"\x00" * 16
             + struct.pack(">HHII", 2, 16, 0, 44100 << 16)
             + box(b"alac", b"\x00" * 4 + bytes(24)))
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stsz = box(b"stsz", struct.pack(">III", 0, 4096, 1 << 28))
    stsc = box(b"stsc", struct.pack(">II", 0, 0))
    stco = box(b"stco", struct.pack(">II", 0, 0))
    stbl = box(b"stbl", stsd + stsz + stsc + stco)
    moov = box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
    p = str(tmp_path / "evil.m4a")
    with open(p, "wb") as f:
        f.write(box(b"ftyp", b"M4A \x00\x00\x00\x00") + moov)
    with pytest.raises(DecodeError):
        dec.decode_alac(p)


def test_multichannel_canonical_order(tmp_path):
    """4/5/6-channel ALAC decodes bit-exactly vs libav INCLUDING channel
    order (ALAC layouts are MPEG element order, C first; the emitted
    order is the canonical L/R-leading one)."""
    dec = _bridge(_native())
    for nch in (4, 5, 6):
        n = RATE
        t = np.arange(n) / RATE
        x = np.stack([0.2 * np.sin(2 * np.pi * (250 + 150 * i) * t + i)
                      for i in range(nch)]).astype(np.float32)
        p = str(tmp_path / f"mc{nch}.m4a")
        try:
            dec.encode(p, x, RATE, codec="alac")
        except Exception:
            continue  # encoder layout unsupported in this libav build
        ref = np.asarray(dec.decode_any(p).samples)
        ours = np.asarray(dec.decode_alac(p).samples)
        assert ours.shape == ref.shape, (nch, ours.shape, ref.shape)
        np.testing.assert_array_equal(ours, ref)
