"""Trusted float64 NumPy implementation of the BS.1770-4 chain.

A direct, per-sample transcription of the standard (and of the documented
libebur128 block/gating behavior the reference app consumes). Slow and
sequential on purpose — it exists only to cross-validate the TPU kernels
to well below the 0.1 LU / 0.1 dB budget, alongside the synthesizable
EBU Tech 3341/3342 conformance vectors.
"""

from __future__ import annotations

import numpy as np

from soundscope_tpu.core import constants as C
from soundscope_tpu.ops.kweight import channel_weights, design_kweight


def k_filter_slow(x: np.ndarray, rate: int) -> np.ndarray:
    """Per-sample f64 biquad cascade over (C, N) — ground truth, O(N) python."""
    bs, as_ = design_kweight(rate)
    y = np.asarray(x, np.float64).copy()
    for stage in range(2):
        b, a = bs[stage], as_[stage]
        out = np.empty_like(y)
        for c in range(y.shape[0]):
            z1 = z2 = 0.0
            for n in range(y.shape[1]):
                xn = y[c, n]
                yn = b[0] * xn + z1
                z1 = b[1] * xn - a[1] * yn + z2
                z2 = b[2] * xn - a[2] * yn
                out[c, n] = yn
        y = out
    return y


def k_filter(x: np.ndarray, rate: int, block: int = 512) -> np.ndarray:
    """Fast f64 cascade via the blocked state-space identity (vectorised
    numpy, python loop only over blocks). Pinned against k_filter_slow in
    test_kweight.py, then used for long conformance signals."""
    from soundscope_tpu.ops.kweight import kweight_cascade_ss

    A, Bv, Cv, D = kweight_cascade_ss(rate)
    n_state = A.shape[0]
    pows = [np.eye(n_state)]
    for _ in range(block):
        pows.append(pows[-1] @ A)
    h = np.empty(block)
    h[0] = D
    for m in range(1, block):
        h[m] = Cv @ pows[m - 1] @ Bv
    T = np.zeros((block, block))
    for k in range(block):
        T[k:, k] = h[: block - k]
    W = np.stack([pows[block - 1 - k] @ Bv for k in range(block)], axis=1)
    O = np.stack([Cv @ pows[m] for m in range(block)])
    A_B = pows[block]

    x = np.asarray(x, np.float64)
    ch, n = x.shape
    npad = -(-n // block) * block
    xp = np.zeros((ch, npad))
    xp[:, :n] = x
    y = np.empty_like(xp)
    s = np.zeros((ch, n_state))
    for j in range(npad // block):
        xb = xp[:, j * block: (j + 1) * block]
        y[:, j * block: (j + 1) * block] = xb @ T.T + s @ O.T
        s = s @ A_B.T + xb @ W.T
    return y[:, :n]


def subblock_sums(z: np.ndarray, h: int) -> np.ndarray:
    nb = z.shape[-1] // h
    return z[: nb * h].reshape(nb, h).sum(-1)


def analyze_reference(x: np.ndarray, rate: int):
    """Full-chain reference results for planar (C, N) float input.

    Returns dict(integrated, lra, momentary[], shortterm[], true_peak[C]).
    """
    x = np.asarray(x, np.float64)
    ch = x.shape[0]
    w = channel_weights(ch)
    y = k_filter(x, rate)
    z = (w[:, None] * y * y).sum(0)
    h = C.samples_in_100ms(rate)
    sums = subblock_sums(z, h)
    nb = len(sums)

    mom = np.array([
        sums[j - 3: j + 1].sum() / (4 * h) for j in range(3, nb)
    ]) if nb >= 4 else np.zeros(0)
    st = np.array([
        sums[j - 29: j + 1].sum() / (30 * h) for j in range(29, nb)
    ]) if nb >= 30 else np.zeros(0)

    def loud(e):
        with np.errstate(divide="ignore"):
            return C.LOUDNESS_OFFSET_DB + 10.0 * np.log10(e)

    # Integrated gating.
    gamma_a = 10.0 ** ((C.ABSOLUTE_GATE_LUFS - C.LOUDNESS_OFFSET_DB) / 10.0)
    e1 = mom[mom >= gamma_a]
    if len(e1) == 0:
        integrated = -np.inf
    else:
        gamma_r = e1.mean() * 10.0 ** (C.RELATIVE_GATE_LU / 10.0)
        e2 = e1[e1 >= gamma_r]
        integrated = loud(e2.mean()) if len(e2) else -np.inf

    # LRA per Tech 3342 on 3 s / 1 s-hop blocks.
    e_lra = st[:: C.LRA_HOP_SUBBLOCKS]
    e1 = e_lra[e_lra >= gamma_a]
    if len(e1) == 0:
        lra = 0.0
    else:
        gamma_r = e1.mean() * 10.0 ** (C.LRA_RELATIVE_GATE_LU / 10.0)
        e2 = np.sort(e1[e1 >= gamma_r])
        if len(e2) == 0:
            lra = 0.0
        else:
            nlo = int(np.floor((len(e2) - 1) * C.LRA_LOW_PERCENTILE + 0.5))
            nhi = int(np.floor((len(e2) - 1) * C.LRA_HIGH_PERCENTILE + 0.5))
            lra = loud(e2[nhi]) - loud(e2[nlo])

    return {
        "integrated": integrated,
        "lra": lra,
        "momentary": loud(mom) if len(mom) else mom,
        "shortterm": loud(st) if len(st) else st,
        "true_peak": true_peak_reference(x, rate),
    }


def true_peak_reference(x: np.ndarray, rate: int) -> np.ndarray:
    """Per-channel f64 polyphase true peak (BS.1770-4 Annex 2 law)."""
    factor = C.true_peak_factor(rate)
    sp = np.abs(x).max(-1)
    if factor == 1:
        return sp
    taps = C.TRUE_PEAK_TAPS
    j = np.arange(taps, dtype=np.float64)
    m = j - (taps - 1) / 2.0
    c = np.ones(taps)
    nz = np.abs(m) > 1e-6
    c[nz] = np.sin(m[nz] * np.pi / factor) / (m[nz] * np.pi / factor)
    c *= 0.5 * (1.0 - np.cos(2.0 * np.pi * j / (taps - 1)))
    out = np.zeros(x.shape[0])
    for ci in range(x.shape[0]):
        up = np.zeros(x.shape[1] * factor)
        up[::factor] = x[ci]
        y = np.convolve(up, c, mode="full")[: len(up)]
        out[ci] = max(np.abs(y).max(), sp[ci])
    return out
