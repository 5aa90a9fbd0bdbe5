"""Pallas sequential-grid IIR kernel vs the XLA blocked filter.

Runs in interpret mode on CPU (identical lowering semantics); the real
TPU path is exercised by bench/graft runs on hardware."""

import jax.numpy as jnp
import numpy as np
import pytest

from soundscope_tpu.ops.biquad import block_iir, make_block_filter
from soundscope_tpu.ops.kweight import kweight_cascade_ss
from soundscope_tpu.ops.pallas_iir import block_iir_pallas


@pytest.mark.parametrize("shape", [(1, 128 * 8), (3, 2, 128 * 16)])
def test_pallas_matches_xla(rng, shape):
    ss = kweight_cascade_ss(48000)
    bf = make_block_filter(ss, block=128)
    x = rng.standard_normal(shape).astype(np.float32)
    y_ref, _ = block_iir(bf, jnp.asarray(x), jnp.zeros((*shape[:-1], 4)))
    y_pl = block_iir_pallas(bf, jnp.asarray(x), interpret=True)
    assert np.abs(np.asarray(y_pl) - np.asarray(y_ref)).max() < 2e-5


def test_engine_pallas_impl_flag(rng):
    """MeterConfig(iir_impl='pallas') produces the same integrated LUFS.

    Uses interpret mode via monkeypatching since tests run on CPU."""
    import soundscope_tpu.ops.pallas_iir as P
    import soundscope_tpu.ops.pallas_truepeak as TP
    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_fn

    orig = P.block_iir_pallas
    orig_e = P.kweight_energy_pallas
    orig_p = P.kweight_energy_pallas_prefix
    orig_f = P.kweight_energy_tp_pallas_prefix
    orig_t = TP.true_peak_pallas
    P.block_iir_pallas = lambda bf, x, interpret=False: orig(bf, x, interpret=True)
    P.kweight_energy_pallas = lambda *a, **k: orig_e(*a, **{**k, "interpret": True})
    P.kweight_energy_pallas_prefix = lambda *a, **k: orig_p(*a, **{**k, "interpret": True})
    P.kweight_energy_tp_pallas_prefix = lambda *a, **k: orig_f(*a, **{**k, "interpret": True})
    TP.true_peak_pallas = lambda *a, **k: orig_t(*a, **{**k, "interpret": True})
    try:
        x = (rng.standard_normal((2, 1 << 16)) * 0.1).astype(np.float32)
        nv = jnp.int32((1 << 16) - 500)
        r1 = analyze_fn(MeterConfig(channels=2, rate=48000, max_blocks=0))(
            jnp.asarray(x), nv
        )
        r2 = analyze_fn(
            MeterConfig(channels=2, rate=48000, max_blocks=0, iir_impl="pallas")
        )(jnp.asarray(x), nv)
        assert abs(float(r1.integrated_lufs) - float(r2.integrated_lufs)) < 1e-3
        # the pallas engine path routes true peak through the FUSED
        # energy+TP kernel here; its peaks must match the XLA engine's
        np.testing.assert_allclose(np.asarray(r2.true_peak),
                                   np.asarray(r1.true_peak),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(r2.sample_peak),
                                   np.asarray(r1.sample_peak),
                                   rtol=1e-6, atol=0)
    finally:
        P.block_iir_pallas = orig
        P.kweight_energy_pallas = orig_e
        P.kweight_energy_pallas_prefix = orig_p
        P.kweight_energy_tp_pallas_prefix = orig_f
        TP.true_peak_pallas = orig_t


def test_energy_group_presum_equivalence(rng):
    """group=32 pre-summed output must equal the raw-z output regrouped
    (exact: same masked values summed in the same 32-sample order)."""
    from soundscope_tpu.ops.biquad import make_block_filter
    from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
    from soundscope_tpu.ops.pallas_iir import (
        kweight_energy_pallas,
        kweight_energy_pallas_prefix,
    )

    bf = make_block_filter(kweight_cascade_ss(48000), 128)
    w = tuple(float(v) for v in channel_weights(2))
    b, n = 3, 128 * 64
    x = (rng.standard_normal((b, 2, n)) * 0.1).astype(np.float32)
    nv = jnp.asarray([n, n - 700, n // 2], jnp.int32)
    abt = jnp.transpose(bf.A_pows[128])

    z1 = kweight_energy_pallas(bf.Tt, bf.Wt, bf.Ot, abt, x, nv, w,
                               interpret=True)
    z32 = kweight_energy_pallas(bf.Tt, bf.Wt, bf.Ot, abt, x, nv, w,
                                interpret=True, group=32)
    np.testing.assert_allclose(
        np.asarray(z1).reshape(b, -1, 32).sum(-1), np.asarray(z32),
        rtol=1e-6, atol=1e-7)

    p1 = kweight_energy_pallas_prefix(bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x,
                                      nv, w, interpret=True)
    p32 = kweight_energy_pallas_prefix(bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x,
                                       nv, w, interpret=True, group=32)
    np.testing.assert_allclose(
        np.asarray(p1).reshape(b, -1, 32).sum(-1), np.asarray(p32),
        rtol=1e-6, atol=1e-7)


def test_energy_rows_layout_equivalence(rng):
    """2D rows-layout (b*ch, N) input must produce exactly the 3D
    (b, ch, N) result in BOTH energy kernels (the relayout-free fast
    path batch uploads use), and the true-peak kernel likewise."""
    from soundscope_tpu.ops.biquad import make_block_filter
    from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
    from soundscope_tpu.ops.pallas_iir import (
        kweight_energy_pallas,
        kweight_energy_pallas_prefix,
    )
    from soundscope_tpu.ops.pallas_truepeak import true_peak_pallas

    bf = make_block_filter(kweight_cascade_ss(48000), 128)
    w = tuple(float(v) for v in channel_weights(2))
    b, n = 3, 128 * 64
    x = (rng.standard_normal((b, 2, n)) * 0.1).astype(np.float32)
    x2 = x.reshape(b * 2, n)
    nv = jnp.asarray([n, n - 700, n // 2], jnp.int32)
    abt = jnp.transpose(bf.A_pows[128])

    z3 = kweight_energy_pallas(bf.Tt, bf.Wt, bf.Ot, abt, x, nv, w,
                               interpret=True)
    z2 = kweight_energy_pallas(bf.Tt, bf.Wt, bf.Ot, abt, x2, nv, w,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(z3), np.asarray(z2))

    p3 = kweight_energy_pallas_prefix(bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x,
                                      nv, w, interpret=True)
    p2 = kweight_energy_pallas_prefix(bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x2,
                                      nv, w, interpret=True)
    np.testing.assert_array_equal(np.asarray(p3), np.asarray(p2))

    tp3, sp3 = true_peak_pallas(jnp.asarray(x), nv, 48000, interpret=True)
    tp2, sp2 = true_peak_pallas(jnp.asarray(x2), nv, 48000, interpret=True)
    np.testing.assert_array_equal(np.asarray(tp3).reshape(-1),
                                  np.asarray(tp2))
    np.testing.assert_array_equal(np.asarray(sp3).reshape(-1),
                                  np.asarray(sp2))


@pytest.mark.parametrize("rate,b", [(48000, 3), (96000, 3), (48000, 1)])
def test_fused_energy_tp_matches_standalone(rng, rate, b):
    """The fused energy+true-peak kernel must reproduce BOTH standalone
    kernels exactly: same z (identical matmul sequence) and same tp/sp.
    The TP comparison uses the standalone kernel forced to the same
    sub-block size (its carry boundaries land at the same samples, so
    the float op order is identical). b=1 pins the single-track entry()
    shape (rows=2 — sub-8-sublane tiles)."""
    from soundscope_tpu.ops.biquad import make_block_filter
    from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
    from soundscope_tpu.ops.pallas_iir import (
        kweight_energy_pallas_prefix,
        kweight_energy_tp_pallas_prefix,
    )
    from soundscope_tpu.ops.truepeak import true_peak_masked

    bf = make_block_filter(kweight_cascade_ss(rate), 128)
    w = tuple(float(v) for v in channel_weights(2))
    n = 128 * 64
    x = (rng.standard_normal((b, 2, n)) * 0.1).astype(np.float32)
    nv = jnp.asarray([n, n - 700, n // 2][:b], jnp.int32)

    z_ref = kweight_energy_pallas_prefix(bf.Tt, bf.Wt, bf.Ot, bf.A_pows,
                                         x, nv, w, interpret=True, group=32)
    z, tp, sp = kweight_energy_tp_pallas_prefix(
        bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x, nv, w, rate,
        interpret=True, group=32)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_ref))

    tp_ref, sp_ref = true_peak_masked(
        jnp.asarray(x), nv[:, None, None], rate)
    np.testing.assert_allclose(np.asarray(tp).reshape(b, 2),
                               np.asarray(tp_ref), rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sp).reshape(b, 2),
                               np.asarray(sp_ref), rtol=0, atol=0)

    # rows-layout input must match exactly, like the other kernels
    z2, tp2, sp2 = kweight_energy_tp_pallas_prefix(
        bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x.reshape(b * 2, n), nv, w, rate,
        interpret=True, group=32)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(tp2))
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(sp2))
