"""Reference-compatible Analyzer facade (mirrors the reference's own unit
tests, src/analyzer.rs:189-398)."""

import numpy as np
import pytest

from soundscope_tpu import Analyzer
from soundscope_tpu.utils.synth import interleaved, sine, stereo


def test_get_fft_smoke():
    a = Analyzer()
    samples = sine(440.0, 16384 / 44100, 44100)[:16384]
    pts = a.get_fft(samples)
    assert pts.shape[0] > 0
    assert np.isfinite(pts[:, 1]).any()


def test_dbfs_calibration_via_facade():
    a = Analyzer()
    res = 44100 / 16384
    freq = round(1000.0 / res) * res
    pts = a.get_fft(sine(freq, 16384 / 44100, 44100)[:16384])
    mx = pts[:, 1].max()
    assert -1.0 <= mx <= 1.0


def test_waveform_via_facade():
    samples = np.sin(np.arange(44100) / 44100.0).astype(np.float32)
    pts = Analyzer.get_waveform(samples, 15.0)
    assert pts.shape == (30000, 2)


def test_loudness_measurements():
    """2 s of quiet stereo sine: integrated in (-100, 0), true peak in [0, 1]
    LINEAR (the reference's contract, src/analyzer.rs:360-385)."""
    a = Analyzer()
    x = interleaved(stereo(sine(440.0, 1.0, 44100, -20.0)))
    a.add_samples(x)
    lufs = a.get_integrated_lufs()
    assert -100.0 < lufs < 0.0
    left, right = a.get_true_peak()
    assert 0.0 <= left <= 1.0
    assert 0.0 <= right <= 1.0


def test_meter_reinit():
    a = Analyzer()
    a.create_loudness_meter(1, 48000)
    assert a.sample_rate == 48000 and a.channels == 1
    a.create_loudness_meter(6, 96000)
    assert a.sample_rate == 96000 and a.channels == 6


def test_reset_clears_state():
    a = Analyzer()
    a.add_samples(interleaved(stereo(sine(997.0, 1.0, 44100, -10.0))))
    assert a.get_true_peak()[0] > 0.1
    a.reset()
    assert a.get_true_peak()[0] == 0.0
    assert a.get_integrated_lufs() == -np.inf


def test_calculate_integrated_lufs_offline():
    a = Analyzer(rate=48000)
    x = interleaved(stereo(sine(997.0, 8.0, 48000, -23.0)))
    lufs = a.calculate_integrated_lufs(2, x)
    assert lufs is not None
    assert abs(lufs + 23.0) < 0.1
    assert a.calculate_integrated_lufs(2, np.zeros(0, np.float32)) is None


def test_streaming_shortterm_matches_conformance():
    a = Analyzer(rate=48000)
    x = interleaved(stereo(sine(997.0, 4.0, 48000, -23.0)))
    a.add_samples(x)
    assert abs(a.get_shortterm_lufs() + 23.0) < 0.1


@pytest.mark.parametrize("rate", [44100, 48000, 96000])
def test_mic_analysis_pseudo_stereo(rate):
    """The reference's mic path pushes mono-as-[x, 0] pseudo-stereo
    (src/audio_capture.rs:37-52) — spectrum shows the 500 Hz tone and the
    meter still reads sane values."""
    a = Analyzer(rate=rate)
    mono = sine(500.0, 2.0, rate, -12.0)
    pseudo = np.zeros(2 * len(mono), np.float32)
    pseudo[0::2] = mono
    a.add_samples(pseudo)
    assert -100.0 < a.get_shortterm_lufs() < 0.0
    window = mono[: 16384] if len(mono) >= 16384 else mono
    pts = a.get_fft(window[:16384])
    peak_x = pts[np.argmax(pts[:, 1]), 0]
    expected_x = (np.log10(500) - np.log10(20)) / (np.log10(20000) - np.log10(20)) * 100
    assert abs(peak_x - expected_x) < 2.0
