"""AAC-LC: the first-party decoder (native/aac.cpp) against the
independent libav decoder on real encoder output.

AAC is lossy but decoding is deterministic, so two correct decoders
agree to float roundoff — EXCEPT on PNS (perceptual noise substitution)
bands, where the spec mandates only the band ENERGY: each decoder runs
its own PRNG, so noise-carrying frames are compared by energy envelope
instead of sample-exactly. Real encoders emit PNS on near-silent
content (fade-in/out frames), which is exactly where the energy rule
takes over.

The bit-level feature validation (TNS orders/directions/resolutions,
window sequences and shapes, grouping, M/S, intensity, escapes) lives
in tools/aac_extract/validate_crafted.py, which drives crafted
single-feature frames against the oracle; this file covers the
end-to-end surface on encoder-produced streams.

Reference surface: symphonia-codec-aac playback
(/root/reference/Cargo.toml:21, src/audio_player.rs:169-267;
.aac/.m4a/.m4b/.mp4 whitelist src/tui.rs:40-47)."""

import numpy as np
import pytest

from soundscope_tpu.utils.io import DecodeError, decode_file


def _native():
    from soundscope_tpu.native import decoder

    if not decoder.available():
        pytest.skip("native runtime unavailable")
    return decoder


def _bridge(dec):
    if not dec.codecs_available():
        pytest.skip("codec bridge not compiled in (fixture encoder)")
    return dec


def _signal(kind, rate, seconds=2.0, channels=2, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    n = int(rate * seconds)
    t = np.arange(n) / rate
    if kind == "tonal":
        x = 0.22 * np.sin(2 * np.pi * 997.0 * t) \
            + 0.1 * np.sin(2 * np.pi * 3313.0 * t + 0.3)
        chans = [x] + [0.8 * np.roll(x, 7 * c) for c in range(1, channels)]
        x = np.stack(chans)
    elif kind == "noisy":
        x = np.stack([0.1 * rng.standard_normal(n)
                      + 0.15 * np.sin(2 * np.pi * 520.0 * t + c)
                      for c in range(channels)])
    elif kind == "transient":
        x = np.zeros((channels, n))
        for s in range(0, n, rate // 3):
            x[:, s: s + 200] = rng.uniform(-0.6, 0.6, (channels,
                                                       min(200, n - s)))
    else:
        raise ValueError(kind)
    return np.clip(x, -0.999, 0.999).astype(np.float32)


def _compare(ours, ref, where, min_exact=0.7):
    """Exact-or-energy comparison (see module docstring).

    min_exact: required fraction of sample-exact frames. Tonal content
    decodes mostly exact; noise-dominated content is near-fully PNS'd
    by the encoder (verified: band energies match libav to 0.1% while
    every sample differs), so callers pass 0 and add a spectral
    check."""
    a, b = np.asarray(ours), np.asarray(ref)
    assert a.shape[0] == b.shape[0], (a.shape, b.shape, where)
    n = min(a.shape[1], b.shape[1])
    # container trims may differ by up to two frames of tail padding
    assert abs(a.shape[1] - b.shape[1]) <= 2 * 1024, (a.shape, b.shape)
    d = np.abs(a[:, :n] - b[:, :n]).max(axis=0)
    nfr = n // 1024
    fr = d[: nfr * 1024].reshape(nfr, 1024).max(axis=1)
    exact = fr < 1e-4
    # PNS frames: energy must still agree (noise substitution keeps the
    # band energy; a decode bug would not)
    scale = max(np.abs(b).max(), 1e-9)
    for i in np.flatnonzero(~exact):
        sa = a[:, i * 1024: (i + 1) * 1024]
        sb = b[:, i * 1024: (i + 1) * 1024]
        ra = float(np.sqrt(np.mean(sa ** 2)))
        rb = float(np.sqrt(np.mean(sb ** 2)))
        assert abs(ra - rb) < 0.15 * max(rb, 0.02 * scale), (
            where, i, ra, rb)
    # the tonal body must dominate: most frames decode sample-exactly
    assert exact.mean() >= min_exact, (where, int(exact.sum()), nfr)


RATES = [8000, 16000, 22050, 32000, 44100, 48000, 96000]


@pytest.mark.parametrize("rate", RATES)
def test_adts_stereo_matrix(tmp_path, rate):
    dec = _bridge(_native())
    x = _signal("tonal", rate)
    p = str(tmp_path / f"s{rate}.aac")
    dec.encode(p, x, rate)
    ours = dec.decode_aac(p)
    ref = dec.decode_any_fmt(p, "aac")
    assert ours.rate == rate
    _compare(ours.samples, ref.samples, f"adts {rate}")


@pytest.mark.parametrize("kind", ["tonal", "noisy", "transient"])
def test_adts_signal_kinds(tmp_path, kind):
    dec = _bridge(_native())
    x = _signal(kind, 48000, rng_seed=3)
    p = str(tmp_path / f"{kind}.aac")
    dec.encode(p, x, 48000)
    ours = dec.decode_aac(p)
    ref = dec.decode_any_fmt(p, "aac")
    # the encoder substitutes most of a noise floor with PNS, so no
    # frame is sample-exact there; the spectral check below pins it
    _compare(ours.samples, ref.samples, kind,
             min_exact=0.0 if kind == "noisy" else 0.7)
    if kind == "noisy":
        a, b = np.asarray(ours.samples), np.asarray(ref.samples)
        n = min(a.shape[1], b.shape[1])
        w = np.hanning(n)
        sa = np.abs(np.fft.rfft(a[0, :n] * w))
        sb = np.abs(np.fft.rfft(b[0, :n] * w))
        f = np.fft.rfftfreq(n, 1 / 48000)
        for lo, hi in ((50, 200), (200, 800), (800, 3200),
                       (3200, 12800), (12800, 20000)):
            m = (f >= lo) & (f < hi)
            ea = float(np.sqrt((sa[m] ** 2).sum()))
            eb = float(np.sqrt((sb[m] ** 2).sum()))
            assert abs(ea - eb) < 0.02 * eb, (lo, hi, ea, eb)


def test_adts_mono(tmp_path):
    dec = _bridge(_native())
    x = _signal("tonal", 48000, channels=1)
    p = str(tmp_path / "m.aac")
    dec.encode(p, x, 48000)
    ours = dec.decode_aac(p)
    ref = dec.decode_any_fmt(p, "aac")
    assert ours.channels == 1
    _compare(ours.samples, ref.samples, "mono")


def test_m4a_priming_trim(tmp_path):
    """The MP4 edit list must trim the encoder delay so the decoded
    length equals the AUTHORED length exactly."""
    dec = _bridge(_native())
    rate, seconds = 44100, 2.0
    x = _signal("tonal", rate, seconds=seconds)
    p = str(tmp_path / "t.m4a")
    dec.encode(p, x, rate)
    ours = dec.decode_aac(p)
    a = np.asarray(ours.samples)
    assert a.shape == (2, int(rate * seconds))
    # and the samples line up with the bridge decode (which trims
    # priming but not the tail padding)
    ref = np.asarray(dec.decode_any(p).samples)
    _compare(a, ref, "m4a")


def test_dispatch_prefers_first_party(tmp_path, monkeypatch):
    """decode_file must route .aac and AAC-bearing .m4a through the
    first-party decoder."""
    dec = _bridge(_native())
    x = _signal("tonal", 44100)
    for ext in ("aac", "m4a"):
        p = str(tmp_path / f"d.{ext}")
        dec.encode(p, x, 44100)
        calls = []
        orig = dec.decode_aac
        monkeypatch.setattr(dec, "decode_aac",
                            staticmethod(lambda q: calls.append(q)
                                         or orig(q)))
        d = decode_file(p)
        monkeypatch.undo()
        assert calls == [p], ext
        assert d.rate == 44100 and d.channels == 2


def test_truncated_stream_degrades(tmp_path):
    """Mid-stream truncation: decode what is intact, never crash."""
    dec = _bridge(_native())
    x = _signal("tonal", 48000)
    p = str(tmp_path / "t.aac")
    dec.encode(p, x, 48000)
    blob = open(p, "rb").read()
    q = str(tmp_path / "trunc.aac")
    open(q, "wb").write(blob[: len(blob) * 2 // 3])
    d = dec.decode_aac(q)
    a = np.asarray(d.samples)
    assert a.shape[1] > 48000 // 2


def test_garbage_rejected(tmp_path):
    dec = _native()
    p = str(tmp_path / "junk.aac")
    rng = np.random.default_rng(7)
    open(p, "wb").write(rng.bytes(8192))
    with pytest.raises(DecodeError):
        dec.decode_aac(p)


def test_bitflip_fuzz_never_crashes(tmp_path):
    """Random single-byte corruptions: frames may be skipped (like the
    reference's decode-error skip) but the process must survive and the
    skip-ratio gate must keep truncated junk from passing as success."""
    dec = _bridge(_native())
    x = _signal("tonal", 48000, seconds=1.0)
    p = str(tmp_path / "f.aac")
    dec.encode(p, x, 48000)
    blob = bytearray(open(p, "rb").read())
    rng = np.random.default_rng(11)
    for trial in range(40):
        q = bytearray(blob)
        for _ in range(rng.integers(1, 6)):
            q[rng.integers(7, len(q))] ^= int(rng.integers(1, 256))
        f = str(tmp_path / "fz.aac")
        open(f, "wb").write(bytes(q))
        try:
            dec.decode_aac(f)
        except DecodeError:
            pass


def _rig():
    """Import the crafted-frame rig (tools/aac_extract) like the
    feature battery does."""
    import os
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    for sub in ("tools/aac_extract", "tools/mp3_extract"):
        p = os.path.join(root, sub)
        if p not in sys.path:
            sys.path.insert(0, p)
    import validate_crafted

    return validate_crafted


def test_hostile_element_flood_rejected(tmp_path):
    """A crafted frame packed with minimal SCE elements (~29 bits each)
    must hit the channel-slot cap and be rejected — without the cap it
    allocates a Channel + pcm vector per element (memory DoS)."""
    vc = _rig()
    from frames import BitWriter
    from frames_aac import Ics, adts_frame

    w = BitWriter()
    for _ in range(100):
        w.put(0, 3)                      # SCE
        w.put(0, 4)                      # element_instance_tag
        Ics(max_sfb=0).write(w)
    w.put(7, 3)                          # END
    payload = w.to_bytes((len(w) + 7) // 8)
    blob = adts_frame(payload, channels=1) * 4
    p = str(tmp_path / "flood.aac")
    open(p, "wb").write(blob)
    dec = _native()
    with pytest.raises(DecodeError):
        dec.decode_aac(p)
    del vc


def test_corrupt_block_extra_channels_dont_poison(tmp_path):
    """A corrupt CPE block that announces new channel slots before
    failing must not leave permanently-empty channels behind — one bad
    frame must not collapse the whole file's min(frames) to zero."""
    vc = _rig()
    from frames import BitWriter
    from frames_aac import adts_frame, silence_frame

    w = BitWriter()
    w.put(1, 3)                          # CPE (creates two slots)
    w.put(0, 4)                          # element_instance_tag
    w.put(1, 1)                          # common_window
    w.put(0, 1)                          # ics_reserved
    w.put(0, 2)                          # window_sequence = long
    w.put(0, 1)                          # window_shape
    w.put(0, 6)                          # max_sfb
    w.put(1, 1)                          # predictor_data_present -> fail
    bad = adts_frame(w.to_bytes((len(w) + 7) // 8), channels=2)
    good = silence_frame()
    p = str(tmp_path / "poison.aac")
    open(p, "wb").write(good * 4 + bad + good * 4)
    dec = _native()
    d = dec.decode_aac(p)
    a = np.asarray(d.samples)
    assert a.shape == (1, 8 * 1024)
    del vc


def test_adts_multiple_raw_data_blocks(tmp_path):
    """ADTS frames may carry up to four byte-aligned raw_data_blocks
    (number_of_raw_data_blocks_in_frame > 0); every block must be
    decoded, not just the first. libav decodes only the first, so this
    is pinned by construction: N frames x 2 silence blocks."""
    _rig()
    from frames import BitWriter
    from frames_aac import Ics, adts_frame

    def rdb():
        w = BitWriter()
        w.put(0, 3)                      # SCE
        w.put(0, 4)                      # element_instance_tag
        Ics(max_sfb=0).write(w)
        w.put(7, 3)                      # END
        return w.to_bytes((len(w) + 7) // 8)

    f = bytearray(adts_frame(rdb() + rdb(), channels=1))
    f[6] |= 1                            # two raw_data_blocks per frame
    p = str(tmp_path / "rdb2.aac")
    open(p, "wb").write(bytes(f) * 4)
    dec = _native()
    d = dec.decode_aac(p)
    assert np.asarray(d.samples).shape == (1, 8 * 1024)


def test_hostile_intensity_runaway_stays_finite(tmp_path):
    """Intensity-stereo dpcm positions accumulated to a huge negative
    value give a 2^735 scale on a zero left band — inf * 0 = NaN unless
    the accumulator is clamped. The output must stay finite."""
    vc = _rig()

    from frames_aac import Ics

    nsw = 49                             # num_swb, long window @48 kHz
    left = Ics(max_sfb=nsw, sections=[(0, nsw)])
    right = Ics(max_sfb=nsw, sections=[(15, nsw)],
                scf_bits=vc._SCF_CW[-60] * nsw)
    blob = vc.stream2(vc.cpe_frame(left, right, ms_mask=0))
    p = str(tmp_path / "isrun.aac")
    open(p, "wb").write(blob)
    dec = _native()
    d = dec.decode_aac(p)
    assert np.isfinite(np.asarray(d.samples)).all()


def test_crafted_feature_battery():
    """Run the oracle-driven single-feature conformance battery
    (TNS, window sequences/shapes/grouping, CPE stereo tools)."""
    import os
    import sys

    dec = _bridge(_native())
    root = os.path.join(os.path.dirname(__file__), "..")
    for sub in ("tools/aac_extract", "tools/mp3_extract"):
        sys.path.insert(0, os.path.join(root, sub))
    try:
        import validate_crafted

        assert validate_crafted.battery()
    finally:
        for sub in ("tools/aac_extract", "tools/mp3_extract"):
            sys.path.remove(os.path.join(root, sub))


@pytest.mark.parametrize("nch", [6, 8])
def test_multichannel_element_order(tmp_path, nch):
    """5.1 / 7.1 streams decode every element and emit the canonical
    L/R-leading channel order the independent decoders use (element
    order is C-first; 7.1's FIRST CPE is the front pair)."""
    dec = _bridge(_native())
    rate, n = 48000, 48000 * 2
    t = np.arange(n) / rate
    x = np.stack([0.2 * np.sin(2 * np.pi * (250 + 130 * i) * t + i)
                  for i in range(nch)]).astype(np.float32)
    p = str(tmp_path / f"m{nch}.aac")
    dec.encode(p, x, rate)
    ours = dec.decode_aac(p)
    ref = dec.decode_any_fmt(p, "aac")
    a, b = np.asarray(ours.samples), np.asarray(ref.samples)
    assert a.shape[0] == nch and b.shape[0] == nch
    nm = min(a.shape[1], b.shape[1])
    d = np.abs(a[:, :nm] - b[:, :nm]).max(axis=1)
    # channel-for-channel agreement (PNS-scale residuals only); any
    # ordering mistake would show ~full-scale differences
    assert (d < 0.05).all(), d


@pytest.mark.parametrize("bitrate", [24000, 96000])
def test_bitrate_sweep(tmp_path, bitrate):
    """Low bitrates force the aggressive tools (intensity everywhere at
    24k, PNS over most of the floor at 96k): every frame must be
    sample-exact or PNS-energy-consistent."""
    dec = _bridge(_native())
    rate, n = 44100, 44100 * 2
    t = np.arange(n) / rate
    rng = np.random.default_rng(1)
    x = (0.2 * np.sin(2 * np.pi * 997 * t)
         + 0.08 * np.sin(2 * np.pi * 3313 * t + 0.4)
         + 0.04 * rng.standard_normal(n))
    xs = np.clip(np.stack([x, 0.85 * np.roll(x, 11)]),
                 -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / f"br{bitrate}.aac")
    dec.encode(p, xs, rate, bitrate=bitrate)
    ours = dec.decode_aac(p)
    ref = dec.decode_any_fmt(p, "aac")
    a, b = np.asarray(ours.samples), np.asarray(ref.samples)
    nm = min(a.shape[1], b.shape[1])
    d = np.abs(a[:, :nm] - b[:, :nm]).max(axis=0)
    nfr = nm // 1024
    fr = d[: nfr * 1024].reshape(nfr, 1024).max(axis=1)
    for i in np.flatnonzero(fr >= 1e-4):
        sa = a[:, i * 1024: (i + 1) * 1024]
        sb = b[:, i * 1024: (i + 1) * 1024]
        ra = float(np.sqrt((sa ** 2).mean()))
        rb = float(np.sqrt((sb ** 2).mean()))
        assert abs(ra - rb) < 0.05 * max(rb, 1e-3), (bitrate, i, ra, rb)
