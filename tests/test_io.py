"""Audio IO: WAV/AIFF decoders (NumPy + native C++) and the native ring."""

import numpy as np
import pytest

from soundscope_tpu.utils.io import (
    DecodeError,
    decode_aiff,
    decode_file,
    decode_wav,
    write_wav,
)


@pytest.fixture
def sine_planar():
    t = np.arange(4800) / 48000
    l = 0.5 * np.sin(2 * np.pi * 440 * t)
    r = 0.25 * np.sin(2 * np.pi * 880 * t)
    return np.stack([l, r]).astype(np.float32)


@pytest.mark.parametrize("bits", [16, 32])
def test_wav_roundtrip(tmp_path, sine_planar, bits):
    p = str(tmp_path / "t.wav")
    write_wav(p, sine_planar, 48000, bits=bits)
    dec = decode_wav(p)
    assert dec.rate == 48000 and dec.channels == 2
    tol = 1e-4 if bits == 16 else 1e-7
    assert np.abs(dec.samples - sine_planar).max() < tol
    assert abs(dec.duration - 0.1) < 1e-9


def test_wav_24bit(tmp_path, sine_planar):
    import struct

    inter = np.ascontiguousarray(sine_planar.T).reshape(-1)
    x = (np.clip(inter, -1, 1) * (2**23 - 1)).astype(np.int32)
    raw = bytearray()
    for v in x:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 48000, 48000 * 6, 6, 24)
    hdr += b"data" + struct.pack("<I", len(raw))
    p = str(tmp_path / "t24.wav")
    open(p, "wb").write(hdr + bytes(raw))
    dec = decode_wav(p)
    assert np.abs(dec.samples - sine_planar).max() < 1e-6


def test_aiff_roundtrip(tmp_path, sine_planar):
    import struct

    inter = np.ascontiguousarray(sine_planar.T).reshape(-1)
    pcm = (np.clip(inter, -1, 1) * 32767).astype(">i2").tobytes()
    # 80-bit float 48000 = 0x400E BB80000000000000
    f80 = bytes.fromhex("400EBB80000000000000")
    comm = struct.pack(">HIH", 2, sine_planar.shape[1], 16) + f80
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = b"AIFF"
    body += b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    p = str(tmp_path / "t.aiff")
    open(p, "wb").write(b"FORM" + struct.pack(">I", len(body)) + body)
    dec = decode_aiff(p)
    assert dec.rate == 48000 and dec.channels == 2
    assert np.abs(dec.samples - sine_planar).max() < 1e-4


def test_native_decoder_matches_numpy(tmp_path, sine_planar):
    from soundscope_tpu.native import decoder

    if not decoder.available():
        pytest.skip("native toolchain unavailable")
    p = str(tmp_path / "t.wav")
    write_wav(p, sine_planar, 48000, bits=16)
    a = decoder.decode(p)
    b = decode_wav(p)
    assert a.rate == b.rate
    assert np.array_equal(a.samples, b.samples)


def test_native_ring():
    from soundscope_tpu.native import NativeRing, available

    if not available():
        pytest.skip("native toolchain unavailable")
    r = NativeRing(10)
    r.push(np.arange(4, dtype=np.float32))
    snap = r.snapshot()
    assert list(snap[-4:]) == [0, 1, 2, 3]
    r.push(np.arange(8, dtype=np.float32) + 10)
    snap = r.snapshot()
    assert list(snap[-8:]) == [10, 11, 12, 13, 14, 15, 16, 17]
    assert list(snap[:2]) == [2, 3]
    r.push(np.arange(25, dtype=np.float32))  # > capacity
    assert list(r.snapshot()) == list(np.arange(15, 25, dtype=np.float32))
    assert r.total_pushed == 37


def test_decode_errors(tmp_path):
    p = str(tmp_path / "bad.wav")
    open(p, "wb").write(b"not audio at all")
    with pytest.raises(DecodeError):
        decode_wav(p)
    p2 = str(tmp_path / "x.mp3")
    open(p2, "wb").write(b"\xff\xfb junk")
    with pytest.raises(DecodeError):
        decode_file(p2)  # no ffmpeg in this image -> gated error


def test_mid_side(tmp_path, sine_planar):
    p = str(tmp_path / "t.wav")
    write_wav(p, sine_planar, 48000, bits=32)
    dec = decode_file(p, prefer_native=False)
    mid, side = dec.mid_side()
    assert np.allclose(mid, (sine_planar[0] + sine_planar[1]) / 2, atol=1e-7)
    assert np.allclose(side, (sine_planar[0] - sine_planar[1]) / 2, atol=1e-7)


def test_decoder_fuzz_no_crashes(rng):
    """Random/truncated bytes must raise DecodeError, never crash."""
    from soundscope_tpu.utils.io import decode_aiff, decode_wav

    for i in range(60):
        blob = rng.integers(0, 256, rng.integers(0, 400), dtype=np.uint8).tobytes()
        if i % 3 == 0:
            blob = b"RIFF" + blob
        elif i % 3 == 1:
            blob = b"FORM" + blob[:4] + b"AIFF" + blob
        import tempfile, os as _os

        fd, p = tempfile.mkstemp()
        _os.write(fd, blob)
        _os.close(fd)
        try:
            for fn in (decode_wav, decode_aiff):
                try:
                    fn(p)
                except Exception as e:
                    assert isinstance(e, Exception)  # no segfault/hang
        finally:
            _os.unlink(p)


def test_truncated_real_wav(tmp_path, sine_planar):
    from soundscope_tpu.utils.io import decode_file, write_wav

    p = str(tmp_path / "t.wav")
    write_wav(p, sine_planar, 48000)
    data = open(p, "rb").read()
    # truncate mid-data: decoder should return the frames that exist
    open(p, "wb").write(data[: len(data) // 2])
    dec = decode_file(p, prefer_native=False)
    assert 0 < dec.samples.shape[1] < sine_planar.shape[1]
