"""Crafted MPEG-1 Layer III bitstreams for clean-room table extraction.

This module writes syntactically valid MP3 frames from scratch (header,
side info, main data) so the system's libav decoder can be used as a
black-box ORACLE: we feed it bit patterns we control and observe the PCM
it produces. From those observations the arbitrary spec tables (count1
conventions, the 32 big-values Huffman code tables, the 512-tap synthesis
window) are derived — no reference decoder source is consulted.

Frame geometry used throughout: MPEG-1, Layer III, 48 kHz, 320 kbps,
mono, no CRC → 960-byte frames, 17-byte side info, main_data_begin = 0
(no bit reservoir), so each frame is fully self-contained.

Reference surface being reproduced: symphonia's mp3 decode in
/root/reference/src/audio_player.rs:169-267.
"""

from __future__ import annotations


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_bits(self, bitstring: str):
        for ch in bitstring:
            self.bits.append(1 if ch == "1" else 0)

    def __len__(self):
        return len(self.bits)

    def to_bytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            assert len(out) <= pad_to, f"{len(out)} > {pad_to}"
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


RATE = 48000
FRAME_BYTES = 960          # 144 * 320000 / 48000
SIDE_INFO_BYTES = 17       # mono, MPEG-1
MAIN_DATA_BITS = (FRAME_BYTES - 4 - SIDE_INFO_BYTES) * 8


def header() -> bytes:
    """MPEG-1 Layer III, 320 kbps, 48 kHz, mono, no CRC, no padding."""
    return bytes([0xFF, 0xFB, 0xE4, 0xC0])


class GranuleSpec:
    """Side-info fields for one granule (mono channel)."""

    def __init__(self, part2_3_length=0, big_values=0, global_gain=210,
                 scalefac_compress=0, table_select=(0, 0, 0),
                 region0_count=0, region1_count=0, preflag=0,
                 scalefac_scale=0, count1table_select=0,
                 window_switching=False, block_type=0, mixed_block=0,
                 subblock_gain=(0, 0, 0)):
        self.part2_3_length = part2_3_length
        self.big_values = big_values
        self.global_gain = global_gain
        self.scalefac_compress = scalefac_compress
        self.table_select = table_select
        self.region0_count = region0_count
        self.region1_count = region1_count
        self.preflag = preflag
        self.scalefac_scale = scalefac_scale
        self.count1table_select = count1table_select
        self.window_switching = window_switching
        self.block_type = block_type
        self.mixed_block = mixed_block
        self.subblock_gain = subblock_gain

    def write(self, w: BitWriter):
        w.put(self.part2_3_length, 12)
        w.put(self.big_values, 9)
        w.put(self.global_gain, 8)
        w.put(self.scalefac_compress, 4)
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
        w.put(self.preflag, 1)
        w.put(self.scalefac_scale, 1)
        w.put(self.count1table_select, 1)


def make_frame(g1: GranuleSpec, g1_main: str,
               g2: GranuleSpec | None = None, g2_main: str = "",
               scfsi: int = 0) -> bytes:
    """One mono MPEG-1 frame; main-data bitstrings are raw part2+part3."""
    if g2 is None:
        g2 = GranuleSpec()
    side = BitWriter()
    side.put(0, 9)     # main_data_begin
    side.put(0, 5)     # private_bits (mono)
    side.put(scfsi, 4)
    g1.write(side)
    g2.write(side)
    assert len(side) == SIDE_INFO_BYTES * 8, len(side)

    main = BitWriter()
    main.put_bits(g1_main)
    main.put_bits(g2_main)
    assert len(g1_main) == g1.part2_3_length, (len(g1_main), g1.part2_3_length)
    assert len(g2_main) == g2.part2_3_length
    assert len(main) <= MAIN_DATA_BITS

    return header() + side.to_bytes() + main.to_bytes(FRAME_BYTES - 4 - SIDE_INFO_BYTES)


def zero_frame() -> bytes:
    return make_frame(GranuleSpec(), "")


def count1_quad_bits(quads: list[tuple[int, int, int, int, tuple]],
                     code_of_quad) -> str:
    """Huffman bits for a count1 region: for each (v,w,x,y,signs) append
    code_of_quad(v,w,x,y) then one sign bit per nonzero value in v,w,x,y
    order (sign bit taken from `signs`, 1 assumed = negative until the
    oracle says otherwise)."""
    s = []
    for (v, w, x, y, signs) in quads:
        s.append(code_of_quad(v, w, x, y))
        si = iter(signs)
        for val in (v, w, x, y):
            if val:
                s.append("1" if next(si) else "0")
    return "".join(s)
