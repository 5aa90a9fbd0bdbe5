"""FLAC: first-party encoder (utils/flacenc.py) and decoder
(native/flac.cpp) round-trip bit-exactly across subframe types, channel
modes, and block edges; the decoder is cross-validated against the
independent libav codec bridge; truncated streams degrade gracefully.

Reference surface: symphonia-decoded FLAC playback
(/root/reference/src/audio_player.rs:169-267)."""

import numpy as np
import pytest

from soundscope_tpu.utils.flacenc import encode_flac, write_flac
from soundscope_tpu.utils.io import DecodeError, decode_file
from soundscope_tpu.utils.synth import sine, stereo

RATE = 48000


def _native():
    from soundscope_tpu.native import decoder

    if not decoder.available():
        pytest.skip("native runtime unavailable")
    return decoder


def _quantized(x):
    """The 16-bit grid the encoder snaps to, as float32 planar."""
    ints = np.clip(np.round(np.asarray(x, np.float32) * 32768.0), -32768, 32767)
    return (ints / 32768.0).astype(np.float32)


def _roundtrip(tmp_path, x, rate=RATE, **kw):
    dec = _native()
    p = str(tmp_path / "t.flac")
    write_flac(p, x, rate, **kw)
    got = dec.decode_flac(p)
    assert got.rate == rate
    assert got.samples.shape == x.shape
    np.testing.assert_array_equal(got.samples, _quantized(x))
    return p


def test_roundtrip_stereo_midside(tmp_path):
    x = stereo(sine(997.0, 2.0, RATE, -6.0))
    x[1] *= 0.7  # give the side channel real content
    _roundtrip(tmp_path, x)  # auto -> mid/side


@pytest.mark.parametrize("mode", ["independent", "ms", "ls", "rs"])
def test_roundtrip_all_stereo_modes(tmp_path, mode):
    rng = np.random.default_rng(3)
    x = np.stack([
        0.5 * np.sin(2 * np.pi * 440.0 * np.arange(9000) / RATE),
        0.3 * rng.standard_normal(9000),
    ]).astype(np.float32)
    _roundtrip(tmp_path, x, stereo_mode=mode)


def test_roundtrip_mono_and_verbatim(tmp_path):
    x = sine(1000.0, 0.5, RATE, -12.0)[None, :]
    _roundtrip(tmp_path, x)
    _roundtrip(tmp_path, x, force_subframe="verbatim")


def test_roundtrip_constant_and_partial_block(tmp_path):
    # silence -> CONSTANT subframes; length 10000 = 2 full 4096 blocks +
    # one 1808-sample partial (8/16-bit blocksize header paths)
    x = np.zeros((2, 10000), np.float32)
    x[:, 9000:] = 0.25  # constant, but different per block
    _roundtrip(tmp_path, x)
    _roundtrip(tmp_path, x, block=200)  # 8-bit blocksize-1 code path


def test_roundtrip_noise_hits_escape(tmp_path):
    # full-scale noise makes Rice coding lose to raw escape partitions
    rng = np.random.default_rng(11)
    x = rng.uniform(-0.999, 0.999, (2, 6000)).astype(np.float32)
    _roundtrip(tmp_path, x)


def test_roundtrip_unusual_rate(tmp_path):
    x = stereo(sine(440.0, 0.3, 11025, -10.0))
    _roundtrip(tmp_path, x, rate=11025)  # 16-bit Hz header path


def test_decode_file_dispatch(tmp_path):
    _native()
    x = stereo(sine(500.0, 1.0, 44100, -10.0))
    p = str(tmp_path / "song.flac")
    write_flac(p, x, 44100)
    d = decode_file(p)
    assert d.rate == 44100 and d.channels == 2
    np.testing.assert_array_equal(d.samples, _quantized(x))


def test_cross_validate_against_codec_bridge(tmp_path):
    """The independent libav FLAC decoder must produce the identical
    samples — validating encoder AND first-party decoder at once."""
    dec = _native()
    if not dec.codecs_available():
        pytest.skip("codec bridge not compiled in")
    rng = np.random.default_rng(5)
    x = np.stack([
        0.8 * np.sin(2 * np.pi * 997.0 * np.arange(20000) / RATE),
        0.2 * rng.standard_normal(20000),
    ]).astype(np.float32)
    for mode in ["independent", "ms", "ls", "rs"]:
        p = str(tmp_path / f"x_{mode}.flac")
        write_flac(p, x, RATE, stereo_mode=mode)
        ours = dec.decode_flac(p)
        libav = dec.decode_any(p)
        assert libav.rate == ours.rate
        np.testing.assert_array_equal(ours.samples, libav.samples)


def test_truncated_stream_degrades_gracefully(tmp_path):
    dec = _native()
    x = stereo(sine(440.0, 2.0, RATE, -10.0))
    full = encode_flac(x, RATE)
    p = str(tmp_path / "trunc.flac")
    # cut mid-frame at several points: decoded prefix or clean error
    for frac in (0.9, 0.6, 0.3):
        with open(p, "wb") as f:
            f.write(full[: int(len(full) * frac)])
        try:
            got = dec.decode_flac(p)
            assert 0 < got.samples.shape[1] <= x.shape[1]
            n = got.samples.shape[1]
            np.testing.assert_array_equal(got.samples, _quantized(x)[:, :n])
        except DecodeError:
            pass
    # garbage header
    with open(p, "wb") as f:
        f.write(b"fLaC" + bytes(30))
    with pytest.raises(DecodeError):
        dec.decode_flac(p)


def test_fuzz_bitflips_never_crash(tmp_path):
    dec = _native()
    x = stereo(sine(440.0, 0.5, RATE, -10.0))
    full = bytearray(encode_flac(x, RATE))
    rng = np.random.default_rng(7)
    p = str(tmp_path / "fuzz.flac")
    for _ in range(25):
        bad = bytearray(full)
        for pos in rng.integers(42, len(bad), size=8):
            bad[pos] ^= 1 << int(rng.integers(0, 8))
        with open(p, "wb") as f:
            f.write(bytes(bad))
        try:
            got = dec.decode_flac(p)
            assert got.samples.shape[1] <= x.shape[1] + 65536
        except DecodeError:
            pass  # rejecting corrupt input is fine; crashing is not


def test_id3_prefixed_flac(tmp_path):
    """FLAC files with a leading ID3v2 tag (common in the wild) decode."""
    dec = _native()
    x = stereo(sine(440.0, 0.5, RATE, -10.0))
    body = encode_flac(x, RATE)
    payload = b"junkmetadata" * 10
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(len(payload) >> 21) & 0x7F, (len(payload) >> 14) & 0x7F,
         (len(payload) >> 7) & 0x7F, len(payload) & 0x7F]
    ) + payload
    p = str(tmp_path / "tagged.flac")
    with open(p, "wb") as f:
        f.write(id3 + body)
    got = dec.decode_flac(p)
    np.testing.assert_array_equal(got.samples, _quantized(x))
    # and through the dispatcher
    d = decode_file(p)
    np.testing.assert_array_equal(d.samples, _quantized(x))
