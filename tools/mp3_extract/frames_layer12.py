"""Crafted MPEG-1 Layer I / Layer II frames for table extraction and
first-party decoder validation (no system encoder exists for Layer I,
and LAME only does Layer III)."""

from __future__ import annotations

from frames import BitWriter

L1_BITRATE = 448   # index 14
L2_BITRATE = 384   # index 14
RATE = 48000


def l1_header(channels: int = 1, mode_ext: int = 0,
              mode: int | None = None) -> bytes:
    b2 = 0xE0 | (3 << 3) | (3 << 1) | 1          # MPEG-1, Layer I, no CRC
    b3 = (14 << 4) | (1 << 2)                    # 448 kbps, 48 kHz
    if mode is None:
        mode = 3 if channels == 1 else 1
    b4 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, b2, b3, b4])


def l1_frame_bytes() -> int:
    return (12 * L1_BITRATE * 1000 // RATE) * 4


def make_l1_frame(alloc, scf, samples, channels: int = 1,
                  mode_ext: int = 0, mode: int | None = None) -> bytes:
    """alloc[ch][32] in 0..14 (0 = silent, a -> a+1 bits); scf[ch][32]
    scalefactor indices; samples[ch][32][12] integer codes.
    Joint stereo (mode 1): subbands >= bound share sample data from
    channel 0 but keep per-channel scalefactors."""
    if mode is None:
        mode = 3 if channels == 1 else 1
    bound = 32 if channels == 1 or mode != 1 else (mode_ext + 1) * 4
    w = BitWriter()
    for sb in range(32):
        for ch in range(channels if sb < bound or channels == 1 else 1):
            w.put(alloc[ch][sb], 4)
    for sb in range(32):
        for ch in range(channels):
            if alloc[ch if sb < bound else 0][sb]:
                w.put(scf[ch][sb], 6)
    for s in range(12):
        for sb in range(32):
            for ch in range(channels if sb < bound else 1):
                a = alloc[ch][sb]
                if a:
                    w.put(samples[ch][sb][s], a + 1)
    return (l1_header(channels, mode_ext, mode)
            + w.to_bytes(l1_frame_bytes() - 4))


def l1_zero_frame(channels: int = 1, mode: int | None = None) -> bytes:
    alloc = [[0] * 32 for _ in range(2)]
    scf = [[0] * 32 for _ in range(2)]
    samples = [[[0] * 12 for _ in range(32)] for _ in range(2)]
    return make_l1_frame(alloc, scf, samples, channels, mode=mode)


# ---------------------------------------------------------------------------
# Layer II

# Candidate allocation tables (hypotheses to be VERIFIED by probing).
# Each entry: (sblimit, nbal[sb], classes[sb] = tuple of nlevels for
# alloc values 1..(2^nbal - 1)).
_L15 = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
        32767, 65535)
_L15B = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
         65535)
_L7 = (3, 5, 7, 9, 15, 31, 65535)
_L3 = (3, 5, 65535)
_LC = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
       16383, 32767)

def table_a():
    nbal, classes = [], []
    for sb in range(27):
        if sb < 3:
            nbal.append(4); classes.append(_L15)
        elif sb < 11:
            nbal.append(4); classes.append(_L15B)
        elif sb < 23:
            nbal.append(3); classes.append(_L7)
        else:
            nbal.append(2); classes.append(_L3)
    return 27, nbal, classes

def table_b():
    sblimit, nbal, classes = table_a()
    for sb in range(27, 30):
        nbal.append(2); classes.append(_L3)
    return 30, nbal, classes

def table_c(sblimit=8):
    # measured geometry (extract_layer2 alloc-region scan): nbal 4 for
    # subbands 0-1, 3 for the rest; classes 3,5,9,15,... (no 7)
    nbal = [4, 4] + [3] * (sblimit - 2)
    classes = [_LC] * 2 + [_LC[:7]] * (sblimit - 2)
    return sblimit, nbal, classes

def table_d():
    return table_c(12)

GROUPED = {3: 5, 5: 7, 9: 10}          # nlevels -> group code bits
def sample_bits(q: int) -> int:
    if q in GROUPED:
        return GROUPED[q]
    return (q + 1).bit_length() - 1     # q = 2^b - 1 -> b


def l2_header(rate=48000, kbps=384, channels=1, mode_ext=0,
              mode: int | None = None) -> bytes:
    if rate >= 32000:                            # MPEG-1
        ridx = {44100: 0, 48000: 1, 32000: 2}[rate]
        bidx = {32:1,48:2,56:3,64:4,80:5,96:6,112:7,128:8,160:9,192:10,
                224:11,256:12,320:13,384:14}[kbps]
        ver = 3
    else:                                        # MPEG-2 / 2.5 (LSF)
        ridx = {22050: 0, 24000: 1, 16000: 2,
                11025: 0, 12000: 1, 8000: 2}[rate]
        bidx = {8:1,16:2,24:3,32:4,40:5,48:6,56:7,64:8,80:9,96:10,
                112:11,128:12,144:13,160:14}[kbps]
        ver = 2 if rate >= 16000 else 0
    if mode is None:
        mode = 3 if channels == 1 else 1
    b2 = 0xE0 | (ver << 3) | (2 << 1) | 1        # Layer II, no CRC
    b3 = (bidx << 4) | (ridx << 2)
    b4 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, b2, b3, b4])


def l2_frame_bytes(rate=48000, kbps=384) -> int:
    return 144 * kbps * 1000 // rate


_LLSF = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
         16383)
_LMID = (3, 5, 9, 15, 31, 63, 127)

def table_lsf():
    # lower-sampling-frequency table (one table for all LSF Layer II
    # streams); geometry and classes measured by the extract_layer2
    # scans: 75-bit alloc region; sb0-3 includes 7 and tops at 16383,
    # sb4-10 drops the 7, sb11-29 is (3,5,9)
    nbal = [4] * 4 + [3] * 7 + [2] * 19
    classes = ([_LLSF] * 4 + [_LMID] * 7 + [_LMID[:3]] * 19)
    return 30, nbal, classes


def make_l2_frame(table, alloc, scfsi, scf, samples, rate=48000, kbps=384,
                  channels=1, mode_ext=0, mode: int | None = None) -> bytes:
    """table = (sblimit, nbal, classes); alloc[ch][sb] (0 = silent);
    scfsi[ch][sb] in 0..3; scf[ch][sb] = list of the TRANSMITTED
    scalefactor indices (3/2/1/2 of them for scfsi 0/1/2/3);
    samples[ch][sb][gr] = for grouped classes one group code, else a
    tuple of 3 codes."""
    sblimit, nbal, classes = table
    if mode is None:
        mode = 3 if channels == 1 else 1
    if channels == 1 or mode != 1:
        bound = sblimit
    else:
        bound = min((mode_ext + 1) * 4, sblimit)
    w = BitWriter()
    for sb in range(sblimit):
        for ch in range(channels if sb < bound else 1):
            w.put(alloc[ch][sb], nbal[sb])
    for sb in range(sblimit):
        for ch in range(channels):
            a = alloc[ch if sb < bound else 0][sb]
            if a:
                w.put(scfsi[ch][sb], 2)
    nscf = {0: 3, 1: 2, 2: 1, 3: 2}
    for sb in range(sblimit):
        for ch in range(channels):
            a = alloc[ch if sb < bound else 0][sb]
            if a:
                vals = scf[ch][sb]
                assert len(vals) == nscf[scfsi[ch][sb]]
                for v in vals:
                    w.put(v, 6)
    for gr in range(12):
        for sb in range(sblimit):
            for ch in range(channels if sb < bound else 1):
                a = alloc[ch][sb]
                if not a:
                    continue
                q = classes[sb][a - 1]
                bits = sample_bits(q)
                s = samples[ch][sb][gr]
                if q in GROUPED:
                    w.put(s, bits)
                else:
                    for v in s:
                        w.put(v, bits)
    return (l2_header(rate, kbps, channels, mode_ext, mode)
            + w.to_bytes(l2_frame_bytes(rate, kbps) - 4))


def l2_zero_frame(table, rate=48000, kbps=384, channels=1,
                  mode: int | None = None) -> bytes:
    sblimit = table[0]
    alloc = [[0] * sblimit for _ in range(2)]
    z = [[None] * sblimit for _ in range(2)]
    return make_l2_frame(table, alloc, z, z, z, rate, kbps, channels,
                         mode=mode)
