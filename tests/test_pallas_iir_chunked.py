"""Chunked (frames-layout) fused energy + true-peak kernel.

This kernel consumes the STFT kernel's native (b, ch, N/128, 128) view so
the GB-scale input is never relaid out (the round-4 trace's 6.9 ms/iter
structural retile), and its step-boundary-split gating output makes ANY
rate's 100 ms sub-block exact — including 44.1 kHz (h = 4410), the
reference's default rate (/root/reference/src/analyzer.rs:34-45).

Interpret mode on CPU; the real-TPU path is exercised by bench runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from soundscope_tpu.ops.biquad import block_iir, make_block_filter
from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
from soundscope_tpu.ops.pallas_iir_chunked import (
    chunked_plan,
    kweight_energy_tp_chunked,
    subblock_sums_from_steps,
)


@pytest.mark.parametrize("h", [4096, 4410, 4800, 9600])
def test_subblock_gather_exact(rng, h):
    """The per-step (total, pre-boundary) decomposition must reconstruct
    exact h-sample sub-block sums for any h >= span — including h | n
    (sub-blocks ending exactly at step/stream boundaries)."""
    span = 4096
    n = span * 24  # 98304; h=4096 divides n exactly, h=4410/4800/9600 don't
    z = rng.standard_normal((3, n)).astype(np.float64)

    nsteps = n // span
    zs = z.reshape(3, nsteps, span)
    full = zs.sum(-1)
    left = np.zeros_like(full)
    for s in range(nsteps):
        start = s * span
        bound = min(-(-start // h) * h, start + span)
        left[:, s] = zs[:, s, : bound - start].sum(-1)
    step_sums = jnp.asarray(
        np.stack([full, left], axis=-1), jnp.float32)

    got = np.asarray(subblock_sums_from_steps(step_sums, h, span, n))
    nb = n // h
    want = z[:, : nb * h].reshape(3, nb, h).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_chunked_plan_eligibility():
    # 48 kHz batch shape: eligible, S bounded by h and VMEM
    S = chunked_plan(128 * 1024, 1024, 64, 4800, 4)
    assert S in (8, 16, 32) and S * 128 <= 4800 and 1024 % S == 0
    # 44.1 kHz: h=4410 >= 8*128 -> still eligible (the whole point)
    S = chunked_plan(128 * 1024, 1024, 64, 4410, 4)
    assert S in (8, 16, 32) and S * 128 <= 4410
    # h too small for even S=8 (streaming mic shapes)
    assert chunked_plan(128 * 64, 64, 4, 800, 4) is None
    # N not a multiple of 128
    assert chunked_plan(128 * 64 + 5, 64, 4, 4800, 4) is None
    # nc not divisible by any S >= 8
    assert chunked_plan(128 * 12, 12, 4, 4800, 4) is None


def test_chunked_plan_scoped_stack_bound():
    """Mosaic scoped-stack usage is ~14 KB per rows*S unit (chip-measured:
    rows=80, S=16 allocates 17.4M against the 16M limit; rows*S = 1024
    compiles in both aspect ratios). Every plan must keep rows*S <= 1024
    — the exact shapes from the first full e2e library scan, which
    compile-failed before the bound existed."""
    for rows in (80, 128):
        S = chunked_plan(1 << 20, (1 << 20) // 128, rows, 4800, 4)
        assert S is not None and rows * S <= 1024, (rows, S)
    # rows > 128 can't satisfy the bound at the minimum S=8: the plan
    # must decline (the engine then falls back to the 3D path)
    assert chunked_plan(1 << 20, (1 << 20) // 128, 256, 4800, 4) is None
    # the 32x60 s bench shape keeps its chip-validated S=16
    assert chunked_plan(22528 * 128, 22528, 64, 4800, 4) == 16


def test_subblock_gather_plan_reusable_across_traces():
    """The gather plan is lru_cached; it must hold NumPy (not jnp)
    constants, or the first trace's arrays leak into the second trace of
    the same (n, h, span) as escaped tracers (UnexpectedTracerError —
    hit by the CLI, which analyzes several bucket sizes that share a
    padded length)."""
    import jax

    n, h, span = 1 << 17, 4800, 4096
    nsteps = n // span

    def run(rows):
        steps = jnp.ones((rows, nsteps, 2), jnp.float32)
        return jax.jit(
            lambda s: subblock_sums_from_steps(s, h, span, n))(steps)

    a = np.asarray(run(2))   # first trace populates the cache
    b = np.asarray(run(4))   # second trace must reuse it safely
    assert a.shape == (2, n // h) and b.shape == (4, n // h)


@pytest.mark.parametrize("rate,b,raggedness", [
    (48000, 3, "ragged"),
    (44100, 3, "ragged"),
    (96000, 2, "full"),
    (48000, 1, "full"),
])
def test_chunked_matches_reference_chain(rng, rate, b, raggedness):
    """Fused chunked kernel vs the XLA chain (block_iir -> weighted
    square -> exact sub-block sums) and true_peak_masked, at 48 k
    (h | span grid), 44.1 k (h=4410, NOT a multiple of anything nice),
    and 192-family 96 k (2x oversampling)."""
    from soundscope_tpu.core import constants as C
    from soundscope_tpu.ops.loudness import weighted_square
    from soundscope_tpu.ops.truepeak import true_peak_masked

    h = rate // 10
    ch = 2
    nc = 512  # n = 65536 samples (~1.4 s @48k)
    n = nc * 128
    rows = b * ch
    factor = C.true_peak_factor(rate)
    S = chunked_plan(n, nc, rows, h, factor)
    assert S is not None

    x = (rng.standard_normal((b, ch, n)) * 0.1).astype(np.float32)
    if raggedness == "ragged":
        nv = jnp.asarray([n, n - 700, n // 2][:b], jnp.int32)
    else:
        nv = jnp.full((b,), n, jnp.int32)
    x4 = jnp.asarray(x.reshape(b, ch, nc, 128))

    bf = make_block_filter(kweight_cascade_ss(rate), 128)
    w = tuple(float(v) for v in channel_weights(ch))

    step_sums, tp, sp = kweight_energy_tp_chunked(
        bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x4, nv, w, rate, h,
        interpret=True)
    got = np.asarray(
        subblock_sums_from_steps(step_sums, h, S * 128, n)
    ).reshape(b, ch, -1).sum(axis=1)

    # reference: per-signal filter, mask, weight, exact sub-block sums
    y, _ = block_iir(bf, jnp.asarray(x), jnp.zeros((b, ch, 4)))
    pos = jnp.arange(n)
    y = jnp.where(pos[None, None, :] < nv[:, None, None], y, 0.0)
    z = weighted_square(y, jnp.asarray(w))
    nb = n // h
    want = np.asarray(z)[:, : nb * h].reshape(b, nb, h).sum(-1)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=2e-5)

    tp_ref, sp_ref = true_peak_masked(jnp.asarray(x), nv[:, None, None],
                                      rate)
    np.testing.assert_allclose(np.asarray(tp).reshape(b, ch),
                               np.asarray(tp_ref), rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sp).reshape(b, ch),
                               np.asarray(sp_ref), rtol=0, atol=0)


def test_engine_4d_frames_matches_3d(rng, monkeypatch):
    """analyze(4D frames) must agree with analyze(3D) end to end, pallas
    impl (interpret) AND the XLA fallback reshape path."""
    import soundscope_tpu.ops.pallas_iir as P
    import soundscope_tpu.ops.pallas_iir_chunked as PC
    import soundscope_tpu.ops.pallas_truepeak as TP
    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_batch_native

    for mod, name in [(P, "block_iir_pallas"), (P, "kweight_energy_pallas"),
                      (P, "kweight_energy_pallas_prefix"),
                      (P, "kweight_energy_tp_pallas_prefix"),
                      (TP, "true_peak_pallas"),
                      (PC, "kweight_energy_tp_chunked")]:
        orig = getattr(mod, name)
        monkeypatch.setattr(mod, name, (lambda o: lambda *a, **k: o(
            *a, **{**k, "interpret": True}))(orig))

    b, ch, nc = 2, 2, 512
    n = nc * 128
    x = (rng.standard_normal((b, ch, n)) * 0.1).astype(np.float32)
    nv = jnp.asarray([n, n - 777], jnp.int32)

    for rate in (48000, 44100):
        cfg = MeterConfig(channels=2, rate=rate, max_blocks=0,
                          iir_impl="pallas")
        assert chunked_plan(n, nc, b * ch, cfg.subblock,
                            cfg.true_peak_factor) is not None
        r3 = analyze_batch_native(cfg)(jnp.asarray(x), nv)
        r4 = analyze_batch_native(cfg)(jnp.asarray(x.reshape(b, ch, nc, 128)), nv)
        np.testing.assert_allclose(np.asarray(r4.integrated_lufs),
                                   np.asarray(r3.integrated_lufs),
                                   rtol=0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(r4.lra), np.asarray(r3.lra),
                                   rtol=0, atol=2e-3)
        m = np.asarray(r3.shortterm) > -1e9
        np.testing.assert_allclose(np.asarray(r4.shortterm)[m],
                                   np.asarray(r3.shortterm)[m],
                                   rtol=0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(r4.true_peak),
                                   np.asarray(r3.true_peak),
                                   rtol=2e-6, atol=1e-7)

        # XLA fallback: 4D input with iir_impl='xla' reshapes and agrees
        cfg_x = MeterConfig(channels=2, rate=rate, max_blocks=0)
        rx3 = analyze_batch_native(cfg_x)(jnp.asarray(x), nv)
        rx4 = analyze_batch_native(cfg_x)(jnp.asarray(x.reshape(b, ch, nc, 128)), nv)
        np.testing.assert_array_equal(np.asarray(rx4.integrated_lufs),
                                      np.asarray(rx3.integrated_lufs))
