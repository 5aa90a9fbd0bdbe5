"""FFT kernels.

Two interchangeable real-FFT-magnitude paths:

* ``rfft_mag(x, impl="xla")`` — `jnp.fft.rfft`, XLA's built-in FFT.
* ``rfft_mag(x, impl="matmul")`` — a four-step Cooley–Tukey factorisation
  N = N1*N2 evaluated as dense DFT matmuls with twiddle fixup. On TPU this
  maps the whole transform onto the MXU and batches trivially — for the
  analysis workload (many independent 16384-point windows) this is the
  throughput path. Matrices are trace-time constants (host float64,
  applied float32/HIGHEST).

The reference computes a real FFT via the microfft crate inside
spectrum-analyzer (consumed at src/analyzer.rs:55-65).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _fourstep_consts(n: int):
    n1 = 1 << (int(math.log2(n)) // 2)
    n2 = n // n1
    assert n1 * n2 == n, "matmul FFT requires power-of-two length"
    k1 = np.arange(n1)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)            # (N1, N1)
    k2 = np.arange(n2)
    f2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)            # (N2, N2)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)             # (N1, N2)
    c = lambda z: (z.real.astype(np.float32), z.imag.astype(np.float32))
    return n1, n2, c(f1), c(f2), c(tw)


def fft_matmul(x: jnp.ndarray):
    """Complex DFT of real input x (..., N) -> (re, im) each (..., N)."""
    n = x.shape[-1]
    n1, n2, mats1, mats2, tws = _fourstep_consts(n)
    (f1r, f1i), (f2r, f2i), (twr, twi) = (
        tuple(jnp.asarray(m) for m in pair) for pair in (mats1, mats2, tws)
    )
    batch = x.shape[:-1]
    x1 = x.reshape(*batch, n1, n2)
    # Step 1: A[k1, n2] = sum_{n1'} F1[k1, n1'] X[n1', n2]  (real input).
    ar = jnp.einsum("kn,...nm->...km", f1r, x1, precision=_PREC)
    ai = jnp.einsum("kn,...nm->...km", f1i, x1, precision=_PREC)
    # Step 2: twiddles.
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # Step 3: X[k1 + N1*k2] = sum_{n2'} B[k1, n2'] F2[n2', k2].
    xr = (jnp.einsum("...kn,nm->...km", br, f2r, precision=_PREC)
          - jnp.einsum("...kn,nm->...km", bi, f2i, precision=_PREC))
    xi = (jnp.einsum("...kn,nm->...km", br, f2i, precision=_PREC)
          + jnp.einsum("...kn,nm->...km", bi, f2r, precision=_PREC))
    # Index is k1 + N1*k2 -> flatten as (k2, k1).
    xr = jnp.swapaxes(xr, -1, -2).reshape(*batch, n)
    xi = jnp.swapaxes(xi, -1, -2).reshape(*batch, n)
    return xr, xi


def fft_matmul_complex(xr: jnp.ndarray, xi: jnp.ndarray, dtype=jnp.float32):
    """Complex DFT of complex input (re, im) -> (re, im), four-step matmuls.

    `dtype=jnp.bfloat16` runs the MXU at native speed with f32 accumulation
    (~0.4% magnitude error — invisible at display-dB resolution); float32
    uses HIGHEST precision.
    """
    n = xr.shape[-1]
    n1, n2, mats1, mats2, tws = _fourstep_consts(n)
    f1r, f1i = (jnp.asarray(m, dtype) for m in mats1)
    f2r, f2i = (jnp.asarray(m, dtype) for m in mats2)
    twr, twi = (jnp.asarray(m) for m in tws)  # twiddles elementwise: keep f32
    prec = jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16 else _PREC
    batch = xr.shape[:-1]

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b,
            (((a.ndim - 1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

    x1r = xr.reshape(*batch, n1, n2)
    x1i = xi.reshape(*batch, n1, n2)
    # Step 1: A = F1 @ X  — contract over n1: einsum('kn,...nm') as dots.
    def lmm(f, x):
        # f (n1, n1) @ x (..., n1, n2) over x's n1 axis.
        y = jax.lax.dot_general(
            x.astype(dtype), f.T,
            (((x.ndim - 2,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )  # (..., n2, n1)
        return jnp.swapaxes(y, -1, -2)

    ar = lmm(f1r, x1r) - lmm(f1i, x1i)
    ai = lmm(f1i, x1r) + lmm(f1r, x1i)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    yr = mm(br, f2r) - mm(bi, f2i)
    yi = mm(br, f2i) + mm(bi, f2r)
    yr = jnp.swapaxes(yr, -1, -2).reshape(*batch, n)
    yi = jnp.swapaxes(yi, -1, -2).reshape(*batch, n)
    return yr, yi


def fft_pack2(a: jnp.ndarray, b: jnp.ndarray, dtype=jnp.float32):
    """DFTs of TWO real signals with ONE complex FFT (pack z = a + i*b).

    Returns (Ar, Ai, Br, Bi), each (..., N) — the full complex spectra of
    a and b, recovered via the conjugate-symmetry split
      A[k] = (Z[k] + conj(Z[-k]))/2,  B[k] = (Z[k] - conj(Z[-k]))/(2i).
    """
    zr, zi = fft_matmul_complex(a, b, dtype=dtype)
    zr_rev = jnp.roll(zr[..., ::-1], 1, axis=-1)  # Z[-k].re
    zi_rev = jnp.roll(zi[..., ::-1], 1, axis=-1)  # Z[-k].im
    ar = 0.5 * (zr + zr_rev)
    ai = 0.5 * (zi - zi_rev)
    br = 0.5 * (zi + zi_rev)
    bi = 0.5 * (zr_rev - zr)
    return ar, ai, br, bi


def rfft_mag(x: jnp.ndarray, impl: str = "xla") -> jnp.ndarray:
    """|rfft(x)| along the last axis: (..., N) -> (..., N//2 + 1)."""
    n = x.shape[-1]
    if impl == "matmul":
        xr, xi = fft_matmul(x)
        half = n // 2 + 1
        return jnp.sqrt(xr[..., :half] ** 2 + xi[..., :half] ** 2)
    return jnp.abs(jnp.fft.rfft(x, axis=-1))
