"""Crafted MPEG-2/2.5 (LSF) Layer III frames for table extraction.

LSF differences vs MPEG-1: one granule (576 samples/frame), 8-bit
main_data_begin, no scfsi, 9-bit scalefac_compress, frame size
72*bitrate/rate, and its own scalefactor-band tables + scalefactor
serialization (extracted by probing, like everything else).
"""

from __future__ import annotations

from frames import BitWriter

# sample rate -> (version bits, rate index)
LSF_RATES = {
    22050: (2, 0), 24000: (2, 1), 16000: (2, 2),
    11025: (0, 0), 12000: (0, 1), 8000: (0, 2),
}
BITRATE_KBPS = 160          # V2 index 14
BITRATE_IDX = 14


def lsf_header(rate: int) -> bytes:
    ver, ridx = LSF_RATES[rate]
    b1 = 0xFF
    b2 = 0xE0 | (ver << 3) | (1 << 1) | 1   # sync|version|layer III|no CRC
    b3 = (BITRATE_IDX << 4) | (ridx << 2)
    b4 = 0xC0                                # mono
    return bytes([b1, b2, b3, b4])


def frame_bytes(rate: int) -> int:
    return 72 * BITRATE_KBPS * 1000 // rate


class LsfGranule:
    def __init__(self, part2_3_length=0, big_values=0, global_gain=210,
                 scalefac_compress=0, table_select=(0, 0, 0),
                 region0_count=0, region1_count=0,
                 scalefac_scale=0, count1table_select=0,
                 window_switching=False, block_type=0, mixed_block=0,
                 subblock_gain=(0, 0, 0)):
        self.__dict__.update(locals())

    def write(self, w: BitWriter):
        w.put(self.part2_3_length, 12)
        w.put(self.big_values, 9)
        w.put(self.global_gain, 8)
        w.put(self.scalefac_compress, 9)
        w.put(1 if self.window_switching else 0, 1)
        if self.window_switching:
            w.put(self.block_type, 2)
            w.put(self.mixed_block, 1)
            w.put(self.table_select[0], 5)
            w.put(self.table_select[1], 5)
            for g in self.subblock_gain:
                w.put(g, 3)
        else:
            for t in self.table_select:
                w.put(t, 5)
            w.put(self.region0_count, 4)
            w.put(self.region1_count, 3)
        w.put(self.scalefac_scale, 1)
        w.put(self.count1table_select, 1)


def make_lsf_frame(rate: int, g: LsfGranule, main: str) -> bytes:
    side = BitWriter()
    side.put(0, 8)   # main_data_begin
    side.put(0, 1)   # private (mono)
    g.write(side)
    assert len(side) == 9 * 8, len(side)
    body = BitWriter()
    body.put_bits(main)
    assert len(main) == g.part2_3_length
    fb = frame_bytes(rate)
    return lsf_header(rate) + side.to_bytes() + body.to_bytes(fb - 4 - 9)


def lsf_zero_frame(rate: int) -> bytes:
    return make_lsf_frame(rate, LsfGranule(), "")


# ---------------------------------------------------------------------------
# stereo (joint) LSF frames — for the intensity-stereo extraction

SIDE_STEREO_LSF = 17


def lsf_stereo_header(rate: int, mode: int = 1, mode_ext: int = 1) -> bytes:
    ver, ridx = LSF_RATES[rate]
    b2 = 0xE0 | (ver << 3) | (1 << 1) | 1
    b3 = (BITRATE_IDX << 4) | (ridx << 2)
    b4 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, b2, b3, b4])


def make_lsf_stereo_frame(rate: int, grs, mains, mode: int = 1,
                          mode_ext: int = 1) -> bytes:
    """grs[ch] -> LsfGranule, mains[ch] -> bitstring (one granule/frame)."""
    side = BitWriter()
    side.put(0, 8)   # main_data_begin
    side.put(0, 2)   # private bits
    for ch in range(2):
        grs[ch].write(side)
    assert len(side) == SIDE_STEREO_LSF * 8, len(side)
    body = BitWriter()
    for ch in range(2):
        body.put_bits(mains[ch])
        assert len(mains[ch]) == grs[ch].part2_3_length
    fb = frame_bytes(rate)
    return (lsf_stereo_header(rate, mode, mode_ext) + side.to_bytes()
            + body.to_bytes(fb - 4 - SIDE_STEREO_LSF))


def lsf_stereo_zero_frame(rate: int, mode: int = 1,
                          mode_ext: int = 1) -> bytes:
    return make_lsf_stereo_frame(rate, [LsfGranule(), LsfGranule()],
                                 ["", ""], mode, mode_ext)
