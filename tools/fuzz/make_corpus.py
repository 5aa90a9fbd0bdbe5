"""Generate the seed corpus for the decoder sanitizer battery.

Two kinds of seeds land in tools/fuzz/corpus/:
- tiny VALID files in every first-party codec (mutation fodder — the
  mutator in fuzz_decoders.cpp needs real structure to corrupt), built
  with the repo's own encoders (FLAC) and the libav bridge (mp3, aac,
  alac/m4a, vorbis/ogg) when present;
- hand-crafted HOSTILE headers (absurd sizes, truncations, zero rates)
  checked in directly by this script.

Deterministic: re-running reproduces byte-identical hostile seeds (the
encoded ones depend on the system encoder build, which is why the
generated corpus is checked in rather than rebuilt in CI).
"""

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

CORPUS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "corpus")


def _tone(seconds=0.35, rate=16000, ch=2):
    t = np.arange(int(seconds * rate)) / rate
    x = np.stack([0.4 * np.sin(2 * np.pi * (440 + 110 * c) * t)
                  for c in range(ch)])
    return x.astype(np.float32), rate


def make_valid():
    import wave

    from soundscope_tpu.native import decoder as native
    from soundscope_tpu.utils.flacenc import encode_flac

    x, rate = _tone()
    # WAV (int16)
    with wave.open(os.path.join(CORPUS, "seed.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((x.T * 32767).astype("<i2").tobytes())
    # FLAC via the first-party encoder
    with open(os.path.join(CORPUS, "seed.flac"), "wb") as f:
        f.write(encode_flac(x, rate))
    # bridge-encoded payloads (mp3/aac/m4a-alac/ogg) when libav is in
    if native.codecs_available():
        for name, codec in [("seed.mp3", "mp3"), ("seed.aac", "aac"),
                            ("seed.m4a", "alac"), ("seed.ogg", "vorbis")]:
            try:
                native.encode(os.path.join(CORPUS, name), x, rate,
                              codec=codec)
            except Exception as e:  # keep generating the rest
                print(f"  skip {name}: {e}", file=sys.stderr)


def make_hostile():
    H = {}
    # WAV: fmt chunk claims 0 channels / 0 rate; data size overflows file
    H["hostile_wav_zero.wav"] = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 0, 0, 0, 0, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFF0))
    # WAV: chunk size larger than file, odd padding walk-off
    H["hostile_wav_chunks.wav"] = (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + b"junk" + struct.pack("<I", 0x7FFFFFFF) + b"AB")
    # FLAC: header only, STREAMINFO truncated mid-field
    H["hostile_flac_trunc.flac"] = b"fLaC" + b"\x00\x00\x00\x22" + b"\x10" * 9
    # FLAC: STREAMINFO claims 0 sample rate / 8 channels, then garbage
    H["hostile_flac_zero.flac"] = (
        b"fLaC" + b"\x80\x00\x00\x22" + b"\x00" * 34 + b"\xff\xf8" + b"\x00" * 16)
    # MP3: valid sync then free-format bitrate + truncated side info
    H["hostile_mp3_free.mp3"] = b"\xff\xfb\x00\x00" + b"\x00" * 8
    # MP3: layer/bitrate/samplerate index edge values
    H["hostile_mp3_edges.mp3"] = b"\xff\xe6\xfc\xc0" + b"\xaa" * 24
    # Ogg: valid capture pattern, absurd segment table
    H["hostile_ogg_seg.ogg"] = (
        b"OggS" + b"\x00\x02" + b"\x00" * 8 + b"\x01\x00\x00\x00"
        + b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00" + b"\xff"
        + b"\xff" * 3)
    # MP4: ftyp then a box with size 1 (64-bit) but no payload
    H["hostile_mp4_box64.m4a"] = (
        struct.pack(">I", 16) + b"ftypM4A " + b"\x00" * 4
        + struct.pack(">I", 1) + b"mdat")
    # MP4: moov with nested boxes whose sizes loop (size 0 inner box)
    H["hostile_mp4_loop.m4a"] = (
        struct.pack(">I", 24) + b"ftypM4A " + b"\x00" * 8
        + struct.pack(">I", 0) + b"moov")
    # ADTS AAC: syncword, profile edge, frame length spanning past EOF
    H["hostile_aac_len.aac"] = b"\xff\xf1\x4c\x80\xff\xff\xfc" + b"\x00" * 5
    # CAF: desc chunk with zero-size fields
    H["hostile_caf_zero.caf"] = (
        b"caff\x00\x01\x00\x00" + b"desc" + struct.pack(">q", 32)
        + b"\x00" * 32)
    # empty and 1-byte files
    H["hostile_empty.bin"] = b""
    H["hostile_one.bin"] = b"\xff"
    for name, data in H.items():
        with open(os.path.join(CORPUS, name), "wb") as f:
            f.write(data)


def main():
    os.makedirs(CORPUS, exist_ok=True)
    make_hostile()
    make_valid()
    sizes = {n: os.path.getsize(os.path.join(CORPUS, n))
             for n in sorted(os.listdir(CORPUS))}
    for n, s in sizes.items():
        print(f"  {n}: {s} bytes")
    print(f"{len(sizes)} corpus files, {sum(sizes.values())} bytes total")


if __name__ == "__main__":
    main()
