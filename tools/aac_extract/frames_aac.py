"""Crafted AAC-LC ADTS frames for clean-room table extraction.

Like tools/mp3_extract/frames*.py: only the SYNTAX SKELETON of the
bitstream (field widths and ordering) is assumed; every numeric
semantic — scalefactor codebook, spectral codebooks, band tables,
dequantisation laws — is measured by probing the system decoder as a
black-box oracle (libavcodec via the native bridge; no second AAC
decoder exists in this image, so cross-checks use encoder round-trips).

Bootstrap order (see extract_* scripts):
  1. silence frames (max_sfb = 0) pin the header/element/padding layout;
  2. PNS (noise) bands need NO spectral codewords and their FIRST
     noise energy is a raw 9-bit field — deterministic output energy
     with zero codebook knowledge;
  3. a SECOND noise band exposes the scalefactor Huffman codebook one
     codeword at a time through output-energy ratios;
  4. with the scf book known, spectral codebooks 1..11 are enumerated
     the same way MP3's were (canary-terminated BFS).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "mp3_extract"))

from frames import BitWriter  # noqa: E402  (MSb-first writer)

RATE_INDEX = {96000: 0, 88200: 1, 64000: 2, 48000: 3, 44100: 4, 32000: 5,
              24000: 6, 22050: 7, 16000: 8, 12000: 9, 11025: 10, 8000: 11}


def adts_frame(payload: bytes, rate: int = 48000, channels: int = 1) -> bytes:
    """7-byte ADTS header (no CRC) + raw_data_block payload bytes."""
    w = BitWriter()
    w.put(0xFFF, 12)               # syncword
    w.put(0, 1)                    # ID: MPEG-4
    w.put(0, 2)                    # layer
    w.put(1, 1)                    # protection_absent
    w.put(1, 2)                    # profile: AAC LC (object type 2 - 1)
    w.put(RATE_INDEX[rate], 4)
    w.put(0, 1)                    # private
    w.put(channels, 3)             # channel_configuration
    w.put(0, 1)                    # original/copy
    w.put(0, 1)                    # home
    w.put(0, 1)                    # copyright id bit
    w.put(0, 1)                    # copyright id start
    w.put(7 + len(payload), 13)    # frame_length incl. header
    w.put(0x7FF, 11)               # buffer fullness: VBR
    w.put(0, 2)                    # one raw_data_block
    hdr = w.to_bytes(7)
    return hdr + payload


class Ics:
    """One individual_channel_stream worth of crafted fields."""

    def __init__(self, global_gain=100, window_sequence=0, window_shape=0,
                 max_sfb=0, scale_factor_grouping=0,
                 sections=(), scf_bits="", spectral_bits="",
                 tns_bits="", pulse_bits=""):
        # sections: list of (codebook, run_length_in_sfbs)
        self.global_gain = global_gain
        self.window_sequence = window_sequence
        self.window_shape = window_shape
        self.max_sfb = max_sfb
        self.scale_factor_grouping = scale_factor_grouping
        self.sections = list(sections)
        self.scf_bits = scf_bits
        self.spectral_bits = spectral_bits
        # raw tns_data()/pulse_data() payloads (without the present
        # flag); non-empty sets the corresponding present flag
        self.tns_bits = tns_bits
        self.pulse_bits = pulse_bits

    def write(self, w: BitWriter):
        w.put(self.global_gain, 8)
        # ics_info
        w.put(0, 1)                         # ics_reserved
        w.put(self.window_sequence, 2)
        w.put(self.window_shape, 1)
        short = self.window_sequence == 2
        if short:
            w.put(self.max_sfb, 4)
            w.put(self.scale_factor_grouping, 7)
        else:
            w.put(self.max_sfb, 6)
            w.put(0, 1)                     # predictor_data_present
        # section_data — sections repeat per GROUP for short sequences
        # (num_groups = popcount(~grouping) + 1); crafted frames pass
        # either a flat per-group-repeated list or one group's worth
        # that is reused for every group
        sect_bits = 3 if short else 5
        esc = (1 << sect_bits) - 1
        n_groups = 1
        if short:
            n_groups = 1 + bin(~self.scale_factor_grouping & 0x7F).count("1")
        sections = list(self.sections)
        covered = sum(run for _, run in sections)
        if covered == self.max_sfb and n_groups > 1:
            sections = sections * n_groups
            covered *= n_groups
        for cb, run in sections:
            w.put(cb, 4)
            r = run
            while r >= esc:
                w.put(esc, sect_bits)
                r -= esc
            w.put(r, sect_bits)
        assert covered == self.max_sfb * n_groups, (covered, self.max_sfb,
                                                   n_groups)
        # scale_factor_data: caller-supplied raw bits (measured layouts)
        w.put_bits(self.scf_bits)
        w.put(1 if self.pulse_bits else 0, 1)   # pulse_data_present
        w.put_bits(self.pulse_bits)
        w.put(1 if self.tns_bits else 0, 1)     # tns_data_present
        w.put_bits(self.tns_bits)
        w.put(0, 1)                         # gain_control_data_present
        w.put_bits(self.spectral_bits)


def sce_frame(ics: Ics, rate: int = 48000) -> bytes:
    w = BitWriter()
    w.put(0, 3)                    # SCE
    w.put(0, 4)                    # element_instance_tag
    ics.write(w)
    w.put(7, 3)                    # END
    # byte-align with zero bits
    payload = w.to_bytes((len(w) + 7) // 8)
    return adts_frame(payload, rate=rate, channels=1)


def silence_frame(rate: int = 48000) -> bytes:
    return sce_frame(Ics(max_sfb=0), rate=rate)
