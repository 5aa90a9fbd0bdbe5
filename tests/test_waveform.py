"""Min-max waveform decimation: pins the reference's bucket math
(reference unit test at src/analyzer.rs:324-358)."""

import jax.numpy as jnp
import numpy as np

from soundscope_tpu.ops.decimate import minmax_decimate, waveform_points


def test_reference_contract_30000_points():
    """1 s of samples, 15 s window => exactly 15000 buckets / 30000 points,
    (x, min)/(x, max) pairs with sequential integer x."""
    samples = np.sin(np.arange(44100) / 44100.0).astype(np.float32)
    pts = waveform_points(jnp.asarray(samples), 15.0)
    assert pts.shape == (30000, 2)
    for i in range(0, 15000, 1517):
        assert pts[2 * i, 0] == pts[2 * i + 1, 0] == float(i)
        assert pts[2 * i, 1] <= pts[2 * i + 1, 1]
    xs = pts[0::2, 0]
    assert np.all(np.diff(xs) == 1.0)


def test_fractional_buckets_exact(rng):
    """Every bucket [floor(i*spp), ceil((i+1)*spp)) matches a direct scan."""
    n, w = 44100, 15.0
    s = rng.standard_normal(n).astype(np.float32)
    mins, maxs, valid = minmax_decimate(jnp.asarray(s), w)
    assert valid == 15000
    spp = n / 15000
    mins, maxs = np.asarray(mins), np.asarray(maxs)
    for i in rng.integers(0, 15000, 200):
        st = int(i * spp)
        en = min(int(np.ceil((i + 1) * spp)), n)
        assert mins[i] == s[st:en].min()
        assert maxs[i] == s[st:en].max()


def test_short_input_fewer_samples_than_buckets(rng):
    """n < buckets: every sample covered, empty buckets read 0.0."""
    s = rng.standard_normal(500).astype(np.float32)
    mins, maxs, valid = minmax_decimate(jnp.asarray(s), 1.0)
    assert valid == 1000
    spp = 500 / 1000.0
    for i in [0, 1, 499, 500, 999]:
        st = int(i * spp)
        en = min(int(np.ceil((i + 1) * spp)), 500)
        if st < en:
            assert float(np.asarray(mins)[i]) == s[st:en].min()
        else:
            assert float(np.asarray(mins)[i]) == 0.0


def test_batched(rng):
    s = rng.standard_normal((4, 8000)).astype(np.float32)
    mins, maxs, valid = minmax_decimate(jnp.asarray(s), 2.0)
    assert mins.shape == (4, 2000)
    m0, x0, _ = minmax_decimate(jnp.asarray(s[2]), 2.0)
    assert np.allclose(np.asarray(mins)[2], np.asarray(m0))
