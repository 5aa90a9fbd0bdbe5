"""Device-resident live pipeline: one jitted step per tick, display-sized
host transfers only."""

import numpy as np

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.models.live import LiveAnalyzer
from soundscope_tpu.utils.synth import sine


def _pseudo_stereo(mono):
    out = np.zeros(2 * len(mono), np.float32)
    out[0::2] = mono
    return out


def test_live_pipeline_mic_semantics():
    rate = 48000
    la = LiveAnalyzer(MeterConfig(channels=2, rate=rate, max_blocks=0))
    mono = sine(500.0, 16.0, rate, -12.0)
    # push in 10 ms capture callbacks like the reference's cpal stream
    hop = 2 * (rate // 100)
    buf = _pseudo_stereo(mono)
    for lo in range(0, len(buf) - hop, hop * 25):  # 250 ms batches
        la.push(buf[lo: lo + hop * 25])
    f = la.frame()
    # spectrum peak at 500 Hz chart position
    xs = la.spectrum_chart_x
    peak_x = xs[int(np.argmax(f.fft_mid))]
    expect = (np.log10(500) - np.log10(20)) / (np.log10(20000) - np.log10(20)) * 100
    assert abs(peak_x - expect) < 2.0
    # pseudo-stereo [x, 0]: mid == side == x/2 -> spectra match
    assert np.allclose(f.fft_mid, f.fft_side, atol=0.5)
    # short-term sane, waveform bounded by amplitude/2
    assert -40.0 < float(f.shortterm) < 0.0
    assert float(np.abs(np.concatenate([f.wf_min, f.wf_max])).max()) <= 0.13
    assert f.wf_min.shape == (15000,)
    # true peak linear for -12 dBFS mono upmix
    assert abs(float(f.true_peak.max()) - 10 ** (-12 / 20)) < 0.01


def test_live_reset():
    la = LiveAnalyzer(MeterConfig(channels=2, rate=48000, max_blocks=0))
    la.push(_pseudo_stereo(sine(440.0, 1.0, 48000, -10.0)))
    assert float(la.frame().true_peak.max()) > 0.1
    la.reset()
    assert float(la.frame().true_peak.max()) == 0.0


def test_live_host_transfer_is_display_sized():
    la = LiveAnalyzer(MeterConfig(channels=2, rate=48000, max_blocks=0))
    la.push(np.zeros(9600, np.float32))
    f = la.frame()
    total = sum(np.asarray(v).nbytes for v in
                [f.fft_mid, f.fft_side, f.wf_min, f.wf_max, f.shortterm,
                 f.momentary, f.true_peak])
    assert total < 200_000  # ~KBs, not the 5.7 MB ring


def test_live_frame_shows_newest_audio():
    """Regression: the frame must analyze the NEWEST end of the ring
    (reference: tui.rs:1431-1437), not stale middle samples."""
    rate = 48000
    la = LiveAnalyzer(MeterConfig(channels=2, rate=rate, max_blocks=0))
    la.push(_pseudo_stereo(np.zeros(rate * 20, np.float32)))  # old silence
    la.push(_pseudo_stereo(sine(2000.0, 1.0, rate, -10.0)))   # newest 1 s
    f = la.frame()
    xs = la.spectrum_chart_x
    peak_x = xs[int(np.argmax(f.fft_mid))]
    expect = (np.log10(2000) - np.log10(20)) / (np.log10(20000) - np.log10(20)) * 100
    assert abs(peak_x - expect) < 2.0
    assert float(f.fft_mid.max()) > -40.0
