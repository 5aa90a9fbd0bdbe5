"""BASELINE config #5: 5.1 multichannel at 192 kHz (surround weights,
no oversampling above 192 k), plus 8x-oversample stretch option."""

import numpy as np

from soundscope_tpu.core import constants as C
from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.models.engine import analyze_array
from soundscope_tpu.utils.synth import sine


def test_5_1_at_192k():
    rate = 192000
    tone = sine(997.0, 2.5, rate, -23.0)
    quiet = np.zeros_like(tone)
    # L R C LFE Ls Rs — LFE must be excluded entirely
    x = np.stack([tone, tone, quiet, tone * 2.0, quiet, quiet])
    cfg = MeterConfig(channels=6, rate=rate, max_blocks=0)
    res = analyze_array(x, cfg)
    # two unit-weight channels at -23 dBFS read -23.0 LUFS (like stereo);
    # the loud LFE channel must contribute NOTHING
    assert abs(float(res.integrated_lufs) - (-23.0)) < 0.1


def test_surround_weighting_at_192k():
    rate = 192000
    tone = sine(997.0, 2.5, rate, -23.0)
    quiet = np.zeros_like(tone)
    x = np.stack([quiet, quiet, quiet, quiet, tone, quiet])  # Ls only
    res = analyze_array(x, MeterConfig(channels=6, rate=rate, max_blocks=0))
    expected = -23.0 - 3.0103 + 10 * np.log10(C.SURROUND_WEIGHT)
    assert abs(float(res.integrated_lufs) - expected) < 0.1


def test_no_oversampling_at_192k_true_peak():
    rate = 192000
    assert C.true_peak_factor(rate) == 1
    x = sine(997.0, 1.0, rate, -6.0)[None, :]
    res = analyze_array(x, MeterConfig(channels=1, rate=rate, max_blocks=0))
    assert abs(float(np.asarray(res.true_peak)[0]) - 10 ** (-6 / 20)) < 1e-3


def test_factor_law():
    assert C.true_peak_factor(44100) == 4
    assert C.true_peak_factor(48000) == 4
    assert C.true_peak_factor(96000) == 2
    assert C.true_peak_factor(191999) == 2
    assert C.true_peak_factor(192000) == 1
