"""Checkpoint/resume: the meter state pytree round-trips bit-exactly and
streaming continues as if never interrupted."""

import jax
import jax.numpy as jnp
import numpy as np

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import init_meter_state
from soundscope_tpu.models import meter as M
from soundscope_tpu.utils.checkpoint import load_meter, save_meter
from soundscope_tpu.utils.synth import sine, stereo


def test_roundtrip_and_resume(tmp_path):
    cfg = MeterConfig(channels=2, rate=48000, max_blocks=500)
    step = jax.jit(M.meter_step(cfg))
    x = stereo(sine(997.0, 6.0, 48000, -20.0))

    # stream half, checkpoint, stream rest
    s = init_meter_state(cfg)
    half = x.shape[1] // 2
    s = step(s, jnp.asarray(x[:, :half]))
    p = str(tmp_path / "meter.npz")
    save_meter(p, cfg, s)
    cfg2, s2 = load_meter(p)
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(s), jax.tree_util.tree_leaves(s2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    s_resumed = step(s2, jnp.asarray(x[:, half:]))
    s_straight = step(s, jnp.asarray(x[:, half:]))
    i1 = float(M.integrated_lufs(cfg, s_resumed))
    i2 = float(M.integrated_lufs(cfg, s_straight))
    assert i1 == i2
    assert abs(i1 + 20.0) < 0.1


def test_shape_mismatch_rejected(tmp_path):
    cfg = MeterConfig(channels=2, rate=48000, max_blocks=100)
    s = init_meter_state(cfg)
    p = str(tmp_path / "meter.npz")
    save_meter(p, cfg, s)
    # tamper with the stored config so template shapes disagree
    import json
    import numpy as np

    data = dict(np.load(p))
    meta = json.loads(bytes(data["__config__"]).decode())
    meta["channels"] = 6
    data["__config__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(p.replace(".npz", "") , **data)
    try:
        load_meter(p)
        assert False, "should have raised"
    except ValueError as e:
        assert "mismatch" in str(e)


def test_live_state_roundtrip_and_resume(tmp_path):
    """Mic-session checkpoint: the full live pytree (device ring + meter)
    round-trips bit-exactly and streaming resumes seamlessly."""
    from soundscope_tpu.models.live import LiveAnalyzer

    cfg = MeterConfig(channels=2, rate=48000, max_blocks=0)
    la = LiveAnalyzer(cfg, seconds=4)
    x = stereo(sine(997.0, 3.0, 48000, -20.0))
    inter = np.ascontiguousarray(np.asarray(x).T).reshape(-1)
    half = len(inter) // 2
    la.push(inter[:half])
    p = str(tmp_path / "live.npz")
    la.save(p)

    lb = LiveAnalyzer.restore(p)
    for a, b in zip(jax.tree_util.tree_leaves(la.state),
                    jax.tree_util.tree_leaves(lb.state)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert lb.seconds == 4 and lb.cfg == cfg

    la.push(inter[half:])
    lb.push(inter[half:])
    fa = la.frame()
    fb = lb.frame()
    assert float(fa.shortterm) == float(fb.shortterm)
    assert float(fa.integrated) == float(fb.integrated)
    np.testing.assert_array_equal(np.asarray(fa.fft_mid), np.asarray(fb.fft_mid))
