"""Blocked state-space IIR filtering — the MXU-native K-weighting kernel.

The reference filters per-sample (a sequential IIR inside the ebur128
crate, consumed at src/analyzer.rs:139-141). A per-sample `lax.scan` on TPU
would be latency-bound: millions of tiny sequential steps. Instead we use
the exact linear-algebra restatement of an IIR over blocks of length B:

    y_blk  = x_blk @ T^T  +  s0 @ O^T        (zero-state + state response)
    s_next = s0 @ A_B^T   +  x_blk @ W^T     (block state transition)

where, for the LTI system (A, B, C, D) of the cascade,
    T[n, k]  = h[n - k]       (lower-triangular Toeplitz of the impulse resp.)
    O[n, :]  = C A^n
    W[:, k]  = A^{B-1-k} B
    A_B      = A^B

The per-block matmuls are large, batched and parallel across blocks — MXU
work. The only sequential dependency is the 4-dimensional affine recurrence
on s, resolved with `lax.associative_scan` (log-depth, vectorised combines).
This is algebraically exact, not an approximation; matrices are built on
host in float64 and applied in float32 with HIGHEST matmul precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_PREC = jax.lax.Precision.HIGHEST


@struct.dataclass
class BlockFilter:
    """Trace-time constants for blocked application of one LTI system."""

    Tt: jnp.ndarray      # (B, B)  Tt[k, n] = h[n - k]   (y0 = x @ Tt)
    Wt: jnp.ndarray      # (B, 4)  Wt[k, :] = A^{B-1-k} B  (s_in = x @ Wt)
    Ot: jnp.ndarray      # (4, B)  Ot[:, n] = (C A^n)^T    (y_s = s0 @ Ot)
    A_pows: jnp.ndarray  # (B + 1, 4, 4) A^0 .. A^B
    block: int = struct.field(pytree_node=False)


@functools.lru_cache(maxsize=None)
def _build_block_filter_np(ss_key, block: int):
    """ss_key: hashable ((A rows...), (B...), (C...), D) in f64."""
    A = np.asarray(ss_key[0], np.float64)
    Bv = np.asarray(ss_key[1], np.float64)
    Cv = np.asarray(ss_key[2], np.float64)
    D = float(ss_key[3])
    n = A.shape[0]
    B = block

    pows = np.empty((B + 1, n, n))
    pows[0] = np.eye(n)
    for i in range(1, B + 1):
        pows[i] = pows[i - 1] @ A

    h = np.empty(B)
    h[0] = D
    for m in range(1, B):
        h[m] = Cv @ pows[m - 1] @ Bv

    Tt = np.zeros((B, B))
    for k in range(B):
        Tt[k, k:] = h[: B - k]

    Wt = np.stack([pows[B - 1 - k] @ Bv for k in range(B)])  # (B, n)
    Ot = np.stack([Cv @ pows[m] for m in range(B)], axis=1)  # (n, B)
    return (
        Tt.astype(np.float32),
        Wt.astype(np.float32),
        Ot.astype(np.float32),
        pows.astype(np.float32),
    )


def modal_form(ss):
    """Real modal (block-diagonal) realization of (A, B, C, D).

    Direct-form cascade state matrices are highly non-normal: their powers
    transiently grow before decaying, which amplifies float32 rounding in
    the associative scan by orders of magnitude. The modal form has A made
    of 2x2 rotation-scaling blocks (one per complex pole pair), which is
    normal — ||A^k|| = rho^k — so block-state composition is perfectly
    conditioned. The transfer function (and thus the filter output) is
    unchanged. Modes are balanced so input and output gains match.
    """
    evals, vecs = np.linalg.eig(np.asarray(ss[0], np.float64))
    n = len(evals)
    used = np.zeros(n, bool)
    cols = []
    for i in range(n):
        if used[i]:
            continue
        lam = evals[i]
        used[i] = True
        if abs(lam.imag) < 1e-12:
            cols.append(vecs[:, i].real[:, None])
        else:
            j = next(
                k for k in range(n)
                if not used[k] and abs(evals[k] - lam.conjugate()) < 1e-8
            )
            used[j] = True
            v = vecs[:, i]
            cols.append(np.stack([v.real, v.imag], axis=1))
    T = np.concatenate(cols, axis=1)
    Ti = np.linalg.inv(T)
    Am = Ti @ np.asarray(ss[0], np.float64) @ T
    Bm = Ti @ np.asarray(ss[1], np.float64)
    Cm = np.asarray(ss[2], np.float64) @ T
    # Balance per mode: scale so |B| ~ |C| blockwise.
    sizes = [c.shape[1] for c in cols]
    ofs = 0
    scale = np.ones(n)
    for sz in sizes:
        sl = slice(ofs, ofs + sz)
        nb = np.linalg.norm(Bm[sl]) + 1e-300
        nc = np.linalg.norm(Cm[sl]) + 1e-300
        scale[sl] = np.sqrt(nb / nc)
        ofs += sz
    Bm = Bm / scale
    Cm = Cm * scale
    Am = (Am / scale[:, None]) * scale[None, :]
    return Am, Bm, Cm, float(ss[3])


def make_block_filter(ss, block: int = 128) -> BlockFilter:
    """Build a BlockFilter from a float64 state-space tuple (A, B, C, D)."""
    A, Bv, Cv, D = modal_form(ss)
    key = (
        tuple(map(tuple, np.asarray(A))),
        tuple(np.asarray(Bv)),
        tuple(np.asarray(Cv)),
        float(D),
    )
    Tt, Wt, Ot, pows = _build_block_filter_np(key, block)
    return BlockFilter(
        Tt=jnp.asarray(Tt), Wt=jnp.asarray(Wt), Ot=jnp.asarray(Ot),
        A_pows=jnp.asarray(pows), block=block,
    )


def _affine_combine(left, right):
    """Composition of x -> x @ m1 + v1 then x -> x @ m2 + v2 (the ONE
    definition both the streaming scan and the sharded decomposition use —
    they must stay algebraically identical)."""
    m1, v1 = left
    m2, v2 = right
    return (
        jnp.matmul(m1, m2, precision=_PREC),
        jnp.matmul(v1[..., None, :], m2, precision=_PREC)[..., 0, :] + v2,
    )


def _affine_scan(A_B: jnp.ndarray, s0: jnp.ndarray, s_in: jnp.ndarray):
    """Prefix states of s_{j+1} = s_j @ A_B^T + s_in_j.

    s0: (..., n). s_in: (..., nb, n). Returns s_before: (..., nb, n) — the
    state at the start of each block — and s_final: (..., n).
    """
    nb = s_in.shape[-2]
    n = s_in.shape[-1]
    ABt = A_B.T

    # Fold s0 into the first element so the scan is homogeneous.
    v0 = s_in[..., 0, :] + jnp.matmul(s0, ABt, precision=_PREC)
    v = jnp.concatenate([v0[..., None, :], s_in[..., 1:, :]], axis=-2)
    M = jnp.broadcast_to(ABt, (*v.shape[:-1], n, n))

    # Positive axis from the front: leaves have different ranks, so a
    # negative axis would bind to different dimensions.
    _, s_after = jax.lax.associative_scan(_affine_combine, (M, v), axis=v.ndim - 2)
    s_before = jnp.concatenate(
        [jnp.broadcast_to(s0[..., None, :], (*s_after.shape[:-2], 1, n)),
         s_after[..., :-1, :]],
        axis=-2,
    )
    return s_before, s_after[..., -1, :]


def block_iir_parts(bf: BlockFilter, x: jnp.ndarray):
    """Zero-state decomposition for sequence-sharded filtering.

    x: (..., N) with N a multiple of bf.block. Returns FOUR values:
      y_zero:   (..., N)    outputs for s0 = 0
      P:        (nb, n, n)  P[j] = (A_B^T)^j — propagates an initial state
                            to the start of block j (P[0] = I, last entry
                            P[nb-1])
      s_final0: (..., n)    final state for s0 = 0
      P_total:  (n, n)      (A_B^T)^nb — the whole-segment propagator
    so that for any initial state s0:
      y_block_j = y_zero_j + (s0 @ P[j]) @ Ot
      s_final   = s0 @ P_total + s_final0
    This is what parallel/seqshard.py uses to make each shard's output
    exact once the true inter-shard states are known.
    """
    B = bf.block
    N = x.shape[-1]
    assert N % B == 0, "sharded path requires N % block == 0"
    nb = N // B
    batch = x.shape[:-1]
    n = bf.A_pows.shape[-1]
    xb = x.reshape(*batch, nb, B)
    y0 = jnp.matmul(xb, bf.Tt, precision=_PREC)
    s_in = jnp.matmul(xb, bf.Wt, precision=_PREC)
    ABt = bf.A_pows[B].T
    M = jnp.broadcast_to(ABt, (nb, n, n))

    # Scan with leading nb axis for M (shared across batch) — move s_in's
    # block axis to the front for a homogeneous scan, then back.
    v = jnp.moveaxis(s_in, -2, 0)  # (nb, ..., n)
    # M is shared across batch: keep it (nb, 1...1, n, n) and let matmul
    # broadcasting in `combine` do the rest (avoids nb*batch 4x4 copies).
    Mb = M.reshape(nb, *([1] * len(batch)), n, n)
    cumM, s_after = jax.lax.associative_scan(_affine_combine, (Mb, v), axis=0)
    s_before0 = jnp.concatenate([jnp.zeros((1, *batch, n), x.dtype), s_after[:-1]], 0)
    y_zero = y0 + jnp.moveaxis(jnp.matmul(s_before0, bf.Ot, precision=_PREC), 0, -2)
    y_zero = y_zero.reshape(*batch, N)
    # P[j] = (A_B^T)^j; cumM[j] = (A_B^T)^(j+1) (batch dims are size 1).
    cum_sq = cumM.reshape(nb, n, n)
    P = jnp.concatenate([jnp.eye(n, dtype=x.dtype)[None], cum_sq[:-1]], axis=0)
    s_final0 = s_after[-1]
    P_total = cum_sq[-1]
    return y_zero, P, s_final0, P_total


def block_iir(bf: BlockFilter, x: jnp.ndarray, s0: jnp.ndarray):
    """Apply the filter to x: (..., N) with initial state s0: (..., n).

    N is static; a trailing partial block (N % B != 0) is handled exactly
    with sliced block matrices. Returns (y (..., N), s_final (..., n)).
    """
    B = bf.block
    N = x.shape[-1]
    nfull = N // B
    rem = N - nfull * B
    batch = x.shape[:-1]
    n = s0.shape[-1]

    if nfull > 0:
        xb = x[..., : nfull * B].reshape(*batch, nfull, B)
        y0 = jnp.matmul(xb, bf.Tt, precision=_PREC)
        s_in = jnp.matmul(xb, bf.Wt, precision=_PREC)
        s_before, s_last = _affine_scan(bf.A_pows[B], s0, s_in)
        y = y0 + jnp.matmul(s_before, bf.Ot, precision=_PREC)
        y = y.reshape(*batch, nfull * B)
    else:
        y = x[..., :0]
        s_last = s0

    if rem > 0:
        xr = x[..., nfull * B:]
        y0r = jnp.matmul(xr, bf.Tt[:rem, :rem], precision=_PREC)
        ysr = jnp.matmul(s_last, bf.Ot[:, :rem], precision=_PREC)
        s_in_r = jnp.matmul(xr, bf.Wt[B - rem:, :], precision=_PREC)
        s_last = jnp.matmul(s_last, bf.A_pows[rem].T, precision=_PREC) + s_in_r
        y = jnp.concatenate([y, y0r + ysr], axis=-1)

    return y, s_last


def iir_reference(ss, x: np.ndarray, s0: np.ndarray | None = None):
    """Per-sample float64 NumPy reference of the same system (tests only)."""
    A, Bv, Cv, D = ss
    x = np.asarray(x, np.float64)
    s = np.zeros(A.shape[0]) if s0 is None else np.asarray(s0, np.float64)
    y = np.empty_like(x)
    for i, xi in enumerate(x):
        y[i] = Cv @ s + D * xi
        s = A @ s + Bv * xi
    return y, s
