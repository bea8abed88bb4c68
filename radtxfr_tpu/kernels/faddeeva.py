"""Branchless Faddeeva function w(z) for TPU (VPU-friendly, real arithmetic).

The reference evaluates w(z) with ``hum1_wei`` (``misc/hapi.py:9833-9846``):
a one-term Humlicek region-1 rational approximation everywhere, overwritten
by a Weideman N=24 rational series where |x| + y < 15 (``cef``,
``misc/hapi.py:9812-9827``; F. Schreier, JQSRT 112 (2011) 1010). The region
dispatch there is data-dependent boolean indexing — unusable on TPU.

Here both approximations are evaluated for every point and blended with
``jnp.where`` (compute-and-mask), in *explicit real arithmetic* so the exact
same code runs inside Pallas kernels (no complex dtype on the TPU vector
unit) and as plain jnp. The Weideman coefficients are precomputed once in
float64 NumPy with the same FFT construction as the reference, so float64
results match the CPU oracle to machine precision.

Valid for y >= 0 (upper half plane), which Voigt profiles guarantee
(y = sqrt(ln2) * gamma_L / gamma_D > 0).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["weideman_coeffs", "wofz_real", "WEIDEMAN_N", "REGION_BOUND"]

WEIDEMAN_N = 24
#: |x| + y threshold between the Weideman series and the asymptotic form
#: (misc/hapi.py:9840)
REGION_BOUND = 15.0


@functools.lru_cache(maxsize=None)
def weideman_coeffs(n: int = WEIDEMAN_N):
    """(L, a[n]) — Weideman rational-series constants, float64.

    Reproduces ``cef`` (``misc/hapi.py:9812-9827``): sample
    f(t) = exp(-t^2)(L^2 + t^2) at t = L tan(theta/2), take the real FFT
    coefficients, keep a[1..n] reversed. Deterministic, so baked as constants.
    """
    m = 2 * n
    m2 = 2 * m
    k = np.arange(-m + 1, m)
    L = np.sqrt(n / np.sqrt(2.0))
    theta = k * np.pi / m
    t = L * np.tan(theta / 2.0)
    f = np.zeros(t.size + 1)
    f[1:] = np.exp(-(t**2)) * (L**2 + t**2)
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / m2
    a = a[1 : n + 1][::-1].copy()
    return float(L), a


def wofz_real(x, y, n: int = WEIDEMAN_N):
    """Faddeeva w(x + iy) -> (Re w, Im w), branchless, real arithmetic.

    ``x``/``y`` are real arrays (any broadcastable shapes). Matches hapi's
    ``hum1_wei`` bitwise-close in float64.
    """
    L, a = weideman_coeffs(n)
    dtype = jnp.result_type(x, y)
    aa = [jnp.asarray(c, dtype=dtype) for c in a]
    L = jnp.asarray(L, dtype=dtype)
    inv_sqrt_pi = jnp.asarray(1.0 / np.sqrt(np.pi), dtype=dtype)

    # --- Humlicek region-1 asymptotic: w ≈ (1/√π) t / (0.5 + t²), t = y - ix
    # (misc/hapi.py:9834-9835)
    tr, ti = y, -x
    # t² = (y² - x²) - 2ixy ;  den = 0.5 + t²
    dr = 0.5 + y * y - x * x
    di = -2.0 * x * y
    dmag = dr * dr + di * di
    asym_r = inv_sqrt_pi * (tr * dr + ti * di) / dmag
    asym_i = inv_sqrt_pi * (ti * dr - tr * di) / dmag

    # --- Weideman series: Z = (L + iz)/(L - iz), z = x + iy
    # numerator L + iz = (L - y) + ix ; denominator L - iz = (L + y) - ix
    nr, ni = L - y, x
    er, ei = L + y, -x
    emag = er * er + ei * ei
    zr = (nr * er + ni * ei) / emag
    zi = (ni * er - nr * ei) / emag

    # Horner with real coefficients on complex Z (numpy polyval order).
    pr = jnp.full_like(zr, aa[0])
    pi_ = jnp.zeros_like(zr)
    for c in aa[1:]:
        pr, pi_ = pr * zr - pi_ * zi + c, pr * zi + pi_ * zr

    # w = 2p/(L - iz)² + (1/√π)/(L - iz)
    # (L - iz)² = (er² - ei²) + 2i er ei ; 1/(L-iz) = conj/(|.|²)
    sr = er * er - ei * ei
    si = 2.0 * er * ei
    smag = sr * sr + si * si
    wr = 2.0 * (pr * sr + pi_ * si) / smag + inv_sqrt_pi * er / emag
    wi = 2.0 * (pi_ * sr - pr * si) / smag - inv_sqrt_pi * ei / emag

    use_wei = (jnp.abs(x) + y) < jnp.asarray(REGION_BOUND, dtype=dtype)
    return jnp.where(use_wei, wr, asym_r), jnp.where(use_wei, wi, asym_i)
