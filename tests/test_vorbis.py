"""Vorbis: the first-party Ogg Vorbis decoder (native/vorbis.cpp) is
validated against the REFERENCE implementation (libvorbisfile, via
ctypes) in its float output mode, across encoders (libvorbis and
ffmpeg's native encoder), rates, channel counts, and bitrates; plus
truncation/corruption robustness and io dispatch routing.

One measured libav quirk is pinned: for ffmpeg-native-encoded files,
libav's own decoder diverges on the angle (second) channel while this
decoder agrees with libvorbis — so libvorbisfile, not the bridge, is
the oracle here.

Reference surface: symphonia-decoded ogg/vorbis playback
(/root/reference/src/audio_player.rs:169-267, Cargo.toml:21)."""

import ctypes
import ctypes.util
import os

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


def _libvorbisfile():
    for name in ("libvorbisfile.so.3", "libvorbisfile.so",
                 ctypes.util.find_library("vorbisfile")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    pytest.skip("libvorbisfile not present (oracle)")


class _OVF(ctypes.Structure):
    _fields_ = [("opaque", ctypes.c_char * 2048)]  # oversized blob


def lv_decode(path: str) -> np.ndarray:
    """Reference decode via libvorbisfile's float API -> planar (C, N)."""
    vf = _libvorbisfile()
    ovf = _OVF()
    assert vf.ov_fopen(path.encode(), ctypes.byref(ovf)) == 0
    vf.ov_read_float.restype = ctypes.c_long
    vf.ov_read_float.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float))),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
    bs = ctypes.c_int(0)
    chans: list = []
    try:
        while True:
            n = vf.ov_read_float(ctypes.byref(ovf), ctypes.byref(pcm), 4096,
                                 ctypes.byref(bs))
            if n <= 0:
                break
            ch = 1
            # channel count from the info struct is awkward via ctypes;
            # infer once from the id header instead
            if not chans:
                with open(path, "rb") as f:
                    head = f.read(4096)
                i = head.find(b"\x01vorbis")
                ch = head[i + 11]
                chans = [[] for _ in range(ch)]
            for c in range(len(chans)):
                chans[c].append(np.ctypeslib.as_array(pcm[c], shape=(n,)).copy())
    finally:
        vf.ov_clear(ctypes.byref(ovf))
    return np.stack([np.concatenate(c) for c in chans])


def _signal(kind, seconds=1.0, channels=2, rate=RATE, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    n = int(rate * seconds)
    t = np.arange(n) / rate
    if kind == "tonal":
        x = np.stack([0.4 * np.sin(2 * np.pi * (440.0 + 220 * c) * t)
                      for c in range(channels)])
    elif kind == "noise":
        x = 0.3 * rng.standard_normal((channels, n))
    elif kind == "sweep":
        ph = 2 * np.pi * (200 * t + (4000 - 200) / (2 * seconds) * t * t)
        x = np.stack([0.4 * np.sin(ph)] * channels)
    else:  # mixed
        base = 0.3 * np.sin(2 * np.pi * 997.0 * t)
        x = np.stack([base + 0.05 * rng.standard_normal(n)
                      for _ in range(channels)])
    return np.clip(x, -0.999, 0.999).astype(np.float32)


def _fixture(dec, tmp_path, x, rate=RATE, name="fx", codec="libvorbis",
             bitrate=0):
    p = str(tmp_path / f"{name}.ogg")
    dec.encode(p, x, rate, codec=codec, bitrate=bitrate)
    return p


def _check_vs_reference(dec, p, atol=2e-6):
    ours = dec.decode_vorbis(p)
    ref = lv_decode(p)
    assert ours.samples.shape == ref.shape, (ours.samples.shape, ref.shape)
    np.testing.assert_allclose(ours.samples, ref, atol=atol)
    return ours


@pytest.mark.parametrize("kind", ["tonal", "noise", "sweep", "mixed"])
def test_matches_reference_decoder(tmp_path, kind):
    dec = _bridge(_native())
    p = _fixture(dec, tmp_path, _signal(kind), name=kind)
    _check_vs_reference(dec, p)


@pytest.mark.parametrize("rate", [22050, 44100, 48000])
def test_rates(tmp_path, rate):
    dec = _bridge(_native())
    x = _signal("mixed", rate=rate)
    p = _fixture(dec, tmp_path, x, rate=rate, name=f"r{rate}")
    got = _check_vs_reference(dec, p)
    assert got.rate == rate


def test_mono(tmp_path):
    dec = _bridge(_native())
    p = _fixture(dec, tmp_path, _signal("mixed", channels=1), name="mono")
    got = _check_vs_reference(dec, p)
    assert got.channels == 1


@pytest.mark.parametrize("bitrate", [48_000, 128_000, 320_000])
def test_bitrates(tmp_path, bitrate):
    """Different rate-control points exercise different codebook/floor
    setups inside libvorbis."""
    dec = _bridge(_native())
    p = _fixture(dec, tmp_path, _signal("mixed"), name=f"b{bitrate}",
                 bitrate=bitrate)
    _check_vs_reference(dec, p)


def test_ffmpeg_native_encoder_and_libav_quirk(tmp_path):
    """ffmpeg's own Vorbis encoder produces streams where libav's
    decoder diverges on the angle channel; the spec-correct output
    (matching libvorbis) is what we must produce."""
    dec = _bridge(_native())
    x = _signal("mixed")
    p = _fixture(dec, tmp_path, x, name="ffenc", codec="vorbis")
    ours = _check_vs_reference(dec, p)
    libav = dec.decode_any(p)
    n = min(ours.samples.shape[1], libav.samples.shape[1])
    d = np.abs(ours.samples[:, :n] - libav.samples[:, :n]).max(axis=1)
    # channel 0 (magnitude) agrees with libav too; if the libav quirk is
    # ever fixed both channels will agree — accept either way
    assert d[0] < 1e-4


def test_long_file_granule_exact(tmp_path):
    """Output length must equal the encoder's granulepos exactly."""
    dec = _bridge(_native())
    x = _signal("tonal", seconds=3.217)
    p = _fixture(dec, tmp_path, x, name="long")
    got = dec.decode_vorbis(p)
    assert got.samples.shape[1] == x.shape[1]


def test_dispatch_prefers_first_party(tmp_path, monkeypatch):
    dec = _bridge(_native())
    p = _fixture(dec, tmp_path, _signal("tonal"), name="disp")
    calls = []
    orig = dec.decode_vorbis
    monkeypatch.setattr(dec, "decode_vorbis",
                        staticmethod(lambda q: calls.append(q) or orig(q)))
    d = decode_file(p)
    assert calls == [p]
    assert d.rate == RATE and d.channels == 2


def test_non_vorbis_ogg_falls_back(tmp_path):
    """Opus-in-Ogg is not Vorbis's job: clean error + bridge fallback."""
    dec = _bridge(_native())
    x = _signal("tonal", rate=48000)
    p = str(tmp_path / "op.ogg")
    try:
        dec.encode(p, x, 48000, codec="libopus")
    except DecodeError:
        pytest.skip("no opus encoder for the fixture")
    with pytest.raises(DecodeError):
        dec.decode_vorbis(p)
    d = decode_file(p)  # bridge fallback
    assert d.samples.shape[1] > 0


def test_truncated_degrades_gracefully(tmp_path):
    dec = _bridge(_native())
    p = _fixture(dec, tmp_path, _signal("mixed", seconds=2.0), name="tr")
    full = open(p, "rb").read()
    ref = dec.decode_vorbis(p).samples
    for frac in (0.9, 0.6, 0.3):
        with open(p, "wb") as f:
            f.write(full[: int(len(full) * frac)])
        try:
            got = dec.decode_vorbis(p)
            n = got.samples.shape[1]
            assert 0 < n <= ref.shape[1]
            # the final frames may come from a mid-packet cut (EOP ->
            # partially-decoded residue, spec-legal); the earlier prefix
            # must be exact
            n_solid = max(0, n - 8192)
            np.testing.assert_allclose(got.samples[:, :n_solid],
                                       ref[:, :n_solid], atol=1e-6)
        except DecodeError:
            pass


def test_fuzz_bitflips_never_crash(tmp_path):
    dec = _bridge(_native())
    p = _fixture(dec, tmp_path, _signal("mixed", seconds=0.7), name="fz")
    full = bytearray(open(p, "rb").read())
    rng = np.random.default_rng(23)
    for _ in range(40):
        bad = bytearray(full)
        for pos in rng.integers(0, len(bad), size=12):
            bad[pos] ^= 1 << int(rng.integers(0, 8))
        with open(p, "wb") as f:
            f.write(bytes(bad))
        try:
            got = dec.decode_vorbis(p)
            assert got.samples.shape[1] <= 60 * RATE
        except DecodeError:
            pass


def test_garbage_rejected(tmp_path):
    dec = _native()
    p = str(tmp_path / "junk.ogg")
    with open(p, "wb") as f:
        f.write(b"OggS" + os.urandom(500))
    with pytest.raises(DecodeError):
        dec.decode_vorbis(p)


def test_random_matrix_vs_reference(tmp_path):
    dec = _bridge(_native())
    rng = np.random.default_rng(55)
    for i in range(5):
        seconds = float(rng.uniform(0.2, 1.5))
        kind = ["tonal", "noise", "sweep", "mixed"][int(rng.integers(4))]
        ch = int(rng.integers(1, 3))
        rate = [22050, 44100, 48000][int(rng.integers(3))]
        x = _signal(kind, seconds=seconds, channels=ch, rate=rate,
                    rng_seed=200 + i)
        p = _fixture(dec, tmp_path, x, rate=rate, name=f"m{i}")
        _check_vs_reference(dec, p)


def test_multichannel_canonical_order(tmp_path):
    """3-8 channel Vorbis matches libav including channel order (the
    Vorbis spec order L C R ... LFE-last maps to the canonical
    L/R-leading order)."""
    import numpy as np

    dec = _bridge(_native())
    rate = 48000
    for nch in (3, 4, 5, 6, 7, 8):
        n = rate
        t = np.arange(n) / rate
        x = np.stack([0.2 * np.sin(2 * np.pi * (250 + 150 * i) * t + i)
                      for i in range(nch)]).astype(np.float32)
        p = str(tmp_path / f"mc{nch}.ogg")
        try:
            dec.encode(p, x, rate)
        except Exception:
            continue
        ref = np.asarray(dec.decode_any(p).samples)
        ours = np.asarray(dec.decode_vorbis(p).samples)
        assert ours.shape[0] == ref.shape[0], (nch, ours.shape, ref.shape)
        # the bridge occasionally drops the last partial block; the
        # assertion here is channel ORDER, on the common span
        nm = min(ours.shape[1], ref.shape[1])
        assert abs(ours.shape[1] - ref.shape[1]) <= 1024
        d = float(np.abs(ours[:, :nm] - ref[:, :nm]).max())
        assert d < 1e-5, (nch, d)
