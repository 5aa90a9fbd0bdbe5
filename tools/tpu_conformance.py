"""On-chip fidelity sweep through the FULL Pallas path.

Reproduces the BASELINE.md fidelity table on whatever backend is default
(the real chip under axon; CPU with --interpret for smoke tests): a
32-level sweep of stereo sines driven through

  * kweight_energy_pallas_prefix  (the shipped fused K-weight energy kernel),
  * true_peak_pallas       (polyphase oversampled peak),
  * stft_pooled_pallas     (16384-pt packed FFT + pooled display scaling),

each compared against the trusted float64 host chain
(tests/reference_impl.py and a float64 numpy STFT built here).

Budgets (BASELINE.json north star): 0.1 LU integrated, 0.1 dB true peak;
the display STFT gets the same 0.1 dB budget (below the chart's visual
resolution). Exits nonzero when any budget is exceeded.

Usage:
  python tools/tpu_conformance.py [--json] [--interpret] [--levels N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 48000
SECONDS = 3.0
FREQS = [997.0, 440.0, 1000.0, 5000.0, 100.0, 12000.0, 2500.0, 16000.0]

BUDGET_LU = 0.1
BUDGET_TP_DB = 0.1
BUDGET_STFT_DB = 0.1


def make_sweep(levels: int):
    """Stereo sine tracks: levels from -2 to -60 dBFS, varied frequencies,
    right channel scaled (and sign-flipped on odd tracks) so mid AND side
    spectra carry energy."""
    n = int(SECONDS * RATE)
    t = np.arange(n, dtype=np.float64) / RATE
    xs = np.zeros((levels, 2, n), np.float32)
    for i in range(levels):
        db = -2.0 - 58.0 * i / max(levels - 1, 1)
        amp = 10.0 ** (db / 20.0)
        f = FREQS[i % len(FREQS)]
        l = amp * np.sin(2 * np.pi * f * t)
        r = 0.8 * l * (-1.0 if i % 2 else 1.0)
        xs[i, 0] = l.astype(np.float32)
        xs[i, 1] = r.astype(np.float32)
    return xs


def f64_reference(xs: np.ndarray):
    """Trusted host chain: integrated LUFS + true peak per track (f64)."""
    from tests.reference_impl import analyze_reference

    integ = np.zeros(xs.shape[0])
    tp = np.zeros((xs.shape[0], 2))
    for i in range(xs.shape[0]):
        r = analyze_reference(xs[i].astype(np.float64), RATE)
        integ[i] = r["integrated"]
        tp[i] = r["true_peak"]
    return integ, tp


def f64_stft_pooled(x: np.ndarray, nw: int):
    """float64 numpy build of the pooled display spectrogram for ONE track
    (the math stft_pooled_pallas implements; see ops/stft.py)."""
    from soundscope_tpu.core import constants as C
    from soundscope_tpu.ops.spectrum import _bin_plan, _hann_np

    win, hop, pool = C.DEFAULT_FFT_SIZE, 2048, 128
    lo, hi, _, pink_db, _ = _bin_plan(win, RATE, C.SPECTRUM_FMIN_HZ, C.SPECTRUM_FMAX_HZ)
    gain = np.zeros(win, np.float64)
    gain[lo:hi] = (4.0 / win) * 10.0 ** (pink_db.astype(np.float64) / 20.0)
    w = _hann_np(win).astype(np.float64)
    per = win // pool

    l, r = x[0].astype(np.float64), x[1].astype(np.float64)
    mids = np.zeros((nw, pool))
    sides = np.zeros((nw, pool))
    for j in range(nw):
        sl = slice(j * hop, j * hop + win)
        L = np.fft.fft(l[sl] * w)
        R = np.fft.fft(r[sl] * w)
        for out, spec in ((mids, (L + R) / 2), (sides, (L - R) / 2)):
            p = (np.abs(spec) * gain) ** 2
            pm = p.reshape(pool, per).max(-1)
            out[j] = np.where(
                pm > 0.0, 10.0 * np.log10(np.maximum(pm, 1e-38)), C.SPECTRUM_FLOOR_DB
            )
    return mids, sides


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test)")
    ap.add_argument("--levels", type=int, default=32)
    ap.add_argument("--stft-windows", type=int, default=8,
                    help="windows per track checked against the f64 STFT")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    # honors SS_COMPILE_CACHE= (empty) to disable persistence — the test
    # suite runs this tool in-process and cache writes there have
    # crashed the executable serializer mid-suite
    from soundscope_tpu.core import enable_compile_cache

    enable_compile_cache()

    from soundscope_tpu.core import constants as C
    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.ops import loudness as L
    from soundscope_tpu.ops.biquad import make_block_filter
    from soundscope_tpu.ops.kweight import channel_weights, kweight_cascade_ss
    from soundscope_tpu.ops.pallas_iir import (
        kweight_energy_pallas_prefix,
        kweight_energy_tp_eligible,
        kweight_energy_tp_pallas_prefix,
    )
    from soundscope_tpu.ops.pallas_stft import stft_pooled_pallas
    from soundscope_tpu.ops.pallas_truepeak import pick_block, true_peak_pallas

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg = MeterConfig(channels=2, rate=RATE, max_blocks=0)
    xs = make_sweep(args.levels)
    n = xs.shape[-1]
    npad = -(-n // cfg.block) * cfg.block
    xpad = np.zeros((args.levels, 2, npad), np.float32)
    xpad[..., :n] = xs
    nv = np.full((args.levels,), n, np.int32)

    t0 = time.time()
    ref_integ, ref_tp = f64_reference(xs)
    print(f"f64 reference chain: {time.time() - t0:.1f}s", file=sys.stderr)

    # --- device sweep (one jitted program per kernel) ---
    bf = make_block_filter(kweight_cascade_ss(RATE), cfg.block)
    w_tuple = tuple(float(v) for v in channel_weights(2))
    xd = jnp.asarray(xpad)
    nvd = jnp.asarray(nv)

    @jax.jit
    def integrated_from_pallas(x, n_valid):
        z = kweight_energy_pallas_prefix(
            bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x, n_valid, w_tuple,
            interpret=args.interpret,
        )
        sums = L.subblock_sums(z, cfg.subblock)
        e = L.gating_energies(sums, cfg.subblock)
        mask = jnp.arange(e.shape[-1])[None] < (
            n_valid[:, None] // cfg.subblock - (C.MOMENTARY_SUBBLOCKS - 1)
        )
        return L.gated_loudness(e, mask)

    t0 = time.time()
    got_integ = np.asarray(jax.block_until_ready(integrated_from_pallas(xd, nvd)))
    print(f"kweight_energy_pallas: {time.time() - t0:.1f}s", file=sys.stderr)

    assert pick_block(npad) is not None, "true-peak kernel rejected the length"
    t0 = time.time()
    got_tp, _ = jax.block_until_ready(
        jax.jit(lambda x, v: true_peak_pallas(x, v, RATE, interpret=args.interpret))(
            xd, nvd
        )
    )
    got_tp = np.asarray(got_tp)
    print(f"true_peak_pallas: {time.time() - t0:.1f}s", file=sys.stderr)

    # the engine's shipped TPU path routes through the FUSED energy+TP
    # kernel when eligible — sweep it too so the gate certifies what
    # actually runs (integrated via its z, true peak via its tp)
    fused_ok = kweight_energy_tp_eligible(
        npad, args.levels, 2, cfg.block, bf.Wt.shape[1], RATE)
    got_integ_f, got_tp_f = None, None
    if fused_ok:
        @jax.jit
        def fused_sweep(x, n_valid):
            z, tp, _ = kweight_energy_tp_pallas_prefix(
                bf.Tt, bf.Wt, bf.Ot, bf.A_pows, x, n_valid, w_tuple, RATE,
                interpret=args.interpret,
            )
            sums = L.subblock_sums(z, cfg.subblock)
            e = L.gating_energies(sums, cfg.subblock)
            mask = jnp.arange(e.shape[-1])[None] < (
                n_valid[:, None] // cfg.subblock - (C.MOMENTARY_SUBBLOCKS - 1)
            )
            return L.gated_loudness(e, mask), tp.reshape(args.levels, 2)

        t0 = time.time()
        got_integ_f, got_tp_f = jax.block_until_ready(fused_sweep(xd, nvd))
        got_integ_f = np.asarray(got_integ_f)
        got_tp_f = np.asarray(got_tp_f)
        print(f"kweight_energy_tp (fused): {time.time() - t0:.1f}s",
              file=sys.stderr)

    t0 = time.time()
    got_mid, got_side = jax.block_until_ready(
        jax.jit(lambda l, r: stft_pooled_pallas(l, r, RATE, interpret=args.interpret))(
            xd[:, 0], xd[:, 1]
        )
    )
    got_mid, got_side = np.asarray(got_mid), np.asarray(got_side)
    print(f"stft_pooled_pallas: {time.time() - t0:.1f}s", file=sys.stderr)

    # --- compare ---
    err_lu = float(np.max(np.abs(got_integ - ref_integ)))

    def db(v):
        return 20.0 * np.log10(np.maximum(v, 1e-12))

    err_tp = float(np.max(np.abs(db(got_tp) - db(ref_tp))))
    if got_integ_f is not None:
        err_lu = max(err_lu, float(np.max(np.abs(got_integ_f - ref_integ))))
        err_tp = max(err_tp, float(np.max(np.abs(db(got_tp_f) - db(ref_tp)))))

    nw_check = min(args.stft_windows, got_mid.shape[1])
    err_stft = 0.0
    for i in range(min(args.levels, 8)):  # f64 STFT is slow; spot-check tracks
        m64, s64 = f64_stft_pooled(xs[i], nw_check)
        # compare only bands above the floor in the f64 truth — sub-floor
        # bands are clamped representations, not measurements
        for got, want in ((got_mid[i, :nw_check], m64), (got_side[i, :nw_check], s64)):
            live = want > -140.0
            if live.any():
                err_stft = max(err_stft, float(np.max(np.abs(got[live] - want[live]))))

    report = {
        "levels": args.levels,
        "backend": jax.default_backend(),
        "interpret": args.interpret,
        "fused_energy_tp_swept": bool(fused_ok),
        "integrated_max_err_lu": round(err_lu, 5),
        "true_peak_max_err_db": round(err_tp, 5),
        "stft_pooled_max_err_db": round(err_stft, 5),
        "budgets": {"lu": BUDGET_LU, "tp_db": BUDGET_TP_DB, "stft_db": BUDGET_STFT_DB},
        "pass": bool(
            err_lu <= BUDGET_LU and err_tp <= BUDGET_TP_DB and err_stft <= BUDGET_STFT_DB
        ),
    }
    if args.json:
        print(json.dumps(report))
    else:
        for k, v in report.items():
            print(f"{k}: {v}")
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
