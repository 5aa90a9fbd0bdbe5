"""Crafted MPEG-1 Layer III STEREO frames — used to validate the joint
stereo (MS / intensity) decode paths that LAME never emits."""

from __future__ import annotations

from frames import RATE, BitWriter, GranuleSpec, SIDE_INFO_BYTES  # noqa: F401

FRAME_BYTES = 960  # 48 kHz, 320 kbps
SIDE_STEREO = 32


def stereo_header(mode: int, mode_ext: int) -> bytes:
    """mode: 0 stereo, 1 joint; mode_ext: bit1 = MS, bit0 = intensity."""
    b4 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, 0xFB, 0xE4, b4])


def make_stereo_frame(grs, mains, mode=1, mode_ext=0, scfsi=(0, 0)) -> bytes:
    """grs[granule][channel] -> GranuleSpec; mains likewise (bitstrings)."""
    side = BitWriter()
    side.put(0, 9)
    side.put(0, 3)
    for ch in range(2):
        side.put(scfsi[ch], 4)
    for gr in range(2):
        for ch in range(2):
            grs[gr][ch].write(side)
    assert len(side) == SIDE_STEREO * 8, len(side)
    main = BitWriter()
    for gr in range(2):
        for ch in range(2):
            main.put_bits(mains[gr][ch])
            assert len(mains[gr][ch]) == grs[gr][ch].part2_3_length
    return (stereo_header(mode, mode_ext) + side.to_bytes()
            + main.to_bytes(FRAME_BYTES - 4 - SIDE_STEREO))


def zero_stereo_frame(mode=1, mode_ext=0) -> bytes:
    g = [[GranuleSpec(), GranuleSpec()], [GranuleSpec(), GranuleSpec()]]
    m = [["", ""], ["", ""]]
    return make_stereo_frame(g, m, mode=mode, mode_ext=mode_ext)
