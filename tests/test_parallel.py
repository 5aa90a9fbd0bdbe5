"""Multi-device sharding: the sequence-sharded analysis must equal the
single-device engine exactly (8 virtual CPU devices, see conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.models.engine import analyze_fn
from soundscope_tpu.parallel import (
    make_mesh,
    pad_for_mesh,
    seq_sharding,
    sharded_analyze_fn,
)
from soundscope_tpu.utils.synth import segments, sine, stereo

RATE = 16000  # small subblock (1600) keeps the virtual-CPU test fast


def _make_batch(rng, b, seconds, n_seq):
    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=0)
    n = int(seconds * RATE)
    npad = pad_for_mesh(n, cfg, n_seq)
    x = np.zeros((b, 2, npad), np.float32)
    for i in range(b):
        body = stereo(
            segments([
                sine(997.0, seconds / 2, RATE, -20.0 - i),
                sine(997.0, seconds / 2, RATE, -30.0 - i),
            ])
        )[:, :n]
        x[i, :, : body.shape[1]] = body
        x[i] += rng.standard_normal((2, npad)).astype(np.float32) * 1e-5
    return cfg, x, np.full(b, n, np.int32)


@pytest.mark.parametrize("n_seq", [2, 4])
def test_seq_sharded_matches_single_device(rng, n_seq):
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, seq=n_seq)
    cfg, x, n_valid = _make_batch(rng, b=4, seconds=8.0, n_seq=n_seq)

    sharded = jax.jit(sharded_analyze_fn(cfg, mesh))
    xs = jax.device_put(jnp.asarray(x), seq_sharding(mesh))
    res_sh = sharded(xs, jnp.asarray(n_valid))

    single = jax.vmap(analyze_fn(cfg))
    res_1 = single(jnp.asarray(x), jnp.asarray(n_valid))

    assert np.allclose(
        np.asarray(res_sh.integrated_lufs), np.asarray(res_1.integrated_lufs),
        atol=5e-3,
    )
    assert np.allclose(np.asarray(res_sh.lra), np.asarray(res_1.lra), atol=5e-3)
    assert np.allclose(
        np.asarray(res_sh.true_peak), np.asarray(res_1.true_peak), atol=1e-5
    )
    m_sh = np.asarray(res_sh.momentary)
    m_1 = np.asarray(res_1.momentary)
    for i in range(4):
        k = int(np.asarray(res_1.n_momentary)[i])
        assert np.allclose(m_sh[i, :k], m_1[i, :k], atol=5e-3)


def test_data_parallel_batch(rng):
    mesh = make_mesh(8, seq=1)
    cfg, x, n_valid = _make_batch(rng, b=8, seconds=4.0, n_seq=1)
    from soundscope_tpu.parallel import data_sharding

    fn = jax.jit(jax.vmap(analyze_fn(cfg)))
    xs = jax.device_put(jnp.asarray(x), data_sharding(mesh))
    res = fn(xs, jnp.asarray(n_valid))
    res1 = fn(jnp.asarray(x), jnp.asarray(n_valid))
    assert np.allclose(
        np.asarray(res.integrated_lufs), np.asarray(res1.integrated_lufs), atol=1e-5
    )
