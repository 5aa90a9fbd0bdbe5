"""Analytic Layer III reconstruction (decode back half) in NumPy.

Everything here is derivable from closed-form spec formulas (IMDCT
cosine bases, sine windows, alias butterflies from the eight published
ci coefficients, synthesis matrixing cosines). The one arbitrary data
table — the 512-tap synthesis window D — is *recovered numerically* in
extract_d.py by least squares against the libav oracle, then frozen.
"""

from __future__ import annotations

import numpy as np

# Alias-reduction butterflies (ISO 11172-3 2.4.3.4.7.1 ci values).
_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
CS = 1.0 / np.sqrt(1.0 + _CI * _CI)
CA = _CI / np.sqrt(1.0 + _CI * _CI)

N_LONG = 36

# 36-point IMDCT basis: x_i = sum_k X_k cos(pi/72 (2i+1+18)(2k+1))
_I = np.arange(N_LONG)[:, None]
_K = np.arange(18)[None, :]
IMDCT36 = np.cos(np.pi / 72.0 * (2 * _I + 1 + 18) * (2 * _K + 1))
WIN_LONG = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))

# Synthesis matrixing: N_ik = cos((16+i)(2k+1) pi/64), i=0..63, k=0..31
_SI = np.arange(64)[:, None]
_SK = np.arange(32)[None, :]
NMAT = np.cos((16 + _SI) * (2 * _SK + 1) * np.pi / 64.0)


def alias_reduce(xr: np.ndarray) -> np.ndarray:
    """Decoder alias butterflies across the 31 subband boundaries."""
    x = xr.copy()
    for sb in range(1, 32):
        for i in range(8):
            lo, up = 18 * sb - 1 - i, 18 * sb + i
            a, b = x[lo], x[up]
            x[lo] = a * CS[i] - b * CA[i]
            x[up] = b * CS[i] + a * CA[i]
    return x


def imdct_granule(xr: np.ndarray, overlap: np.ndarray):
    """Long-block IMDCT + windowing + overlap-add for all 32 subbands.

    Returns (timesamples [32,18], new_overlap [32,18])."""
    X = xr.reshape(32, 18)
    z = X @ IMDCT36.T * WIN_LONG  # [32, 36]
    out = z[:, :18] + overlap
    return out, z[:, 18:].copy()


def freq_invert(ts: np.ndarray) -> np.ndarray:
    out = ts.copy()
    out[1::2, 1::2] *= -1.0
    return out


class Synth:
    """Polyphase synthesis filterbank with a parametric window D[512]."""

    def __init__(self, d: np.ndarray | None = None):
        self.v = np.zeros(1024)
        self.d = d

    def step_u(self, s32: np.ndarray) -> np.ndarray:
        """One 32-sample step; returns the U[512] vector (pre-window)."""
        self.v[64:] = self.v[:-64]
        self.v[:64] = NMAT @ s32
        u = np.empty(512)
        for i in range(8):
            u[64 * i: 64 * i + 32] = self.v[128 * i: 128 * i + 32]
            u[64 * i + 32: 64 * i + 64] = self.v[128 * i + 96: 128 * i + 128]
        return u

    def step(self, s32: np.ndarray) -> np.ndarray:
        u = self.step_u(s32)
        w = u * self.d
        return w.reshape(16, 32).sum(axis=0)


def granule_u_matrix(xr576: np.ndarray, n_granules_tail: int = 3):
    """Feed one granule of spectrum then zeros; return the stacked U
    vectors for 18*(1+tail) synthesis steps — the linear design data for
    recovering D."""
    synth = Synth()
    overlap = np.zeros((32, 18))
    us = []
    x = alias_reduce(xr576)
    ts, overlap = imdct_granule(x, overlap)
    ts = freq_invert(ts)
    for t in range(18):
        us.append(synth.step_u(ts[:, t]))
    for _ in range(n_granules_tail):
        ts, overlap = imdct_granule(np.zeros(576), overlap)
        ts = freq_invert(ts)
        for t in range(18):
            us.append(synth.step_u(ts[:, t]))
    return np.asarray(us)  # [(1+tail)*18, 512]
