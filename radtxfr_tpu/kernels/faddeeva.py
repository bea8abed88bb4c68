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

__all__ = [
    "weideman_coeffs", "wofz_real", "WEIDEMAN_N", "REGION_BOUND",
    "cpf3", "cpf_humlicek", "cef",
]

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


# --------------------------------------------------------------------------
# The reference's other two CPF implementations (misc/hapi.py:9645-9790),
# kept for benchmarking/oracle use exactly as hapi keeps them. Both are
# branchless here (compute-and-mask) so they jit and vmap cleanly.
# --------------------------------------------------------------------------

#: 15 asymptotic-series half-integer factors (misc/hapi.py:9642)
_TT = (0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5, 9.5, 10.5, 11.5, 12.5,
       13.5, 14.5)
_INV_SQRT_PI = 0.564189583547756

#: Humlicek CPF rational-approximation nodes/weights (misc/hapi.py:9672-9674)
_HUM_T = (0.314240376, 0.947788391, 1.59768264, 2.27950708, 3.02063703,
          3.8897249)
_HUM_U = (1.01172805, -0.75197147, 1.2557727e-2, 1.00220082e-2,
          -2.42068135e-4, 5.00848061e-7)
_HUM_S = (1.393237, 0.231152406, -0.155351466, 6.21836624e-3, 9.19082986e-5,
          -6.27525958e-7)


def _asym_series(x, y, guard=0.0):
    """15-term large-|z| asymptotic CPF at z = x + iy -> (Re, Im).

    ``guard`` clamps |z|^2 away from zero so masked-out small-|z| lanes do
    not produce inf/nan under compute-and-mask.
    """
    zr, zi_ = x, y
    zmag = jnp.maximum(zr * zr + zi_ * zi_, guard)
    # zm1 = 1/z = conj(z)/|z|^2 ; zm2 = zm1^2
    m1r, m1i = zr / zmag, -zi_ / zmag
    m2r = m1r * m1r - m1i * m1i
    m2i = 2.0 * m1r * m1i
    sr = jnp.ones_like(m2r)
    si = jnp.zeros_like(m2r)
    tr_, ti_ = jnp.ones_like(m2r), jnp.zeros_like(m2r)
    for tt_i in _TT:
        tr_, ti_ = (tr_ * m2r - ti_ * m2i) * tt_i, (tr_ * m2i + ti_ * m2r) * tt_i
        sr, si = sr + tr_, si + ti_
    # zsum *= i * zm1 * (1/sqrt(pi))
    fr = (-m1i) * _INV_SQRT_PI
    fi = m1r * _INV_SQRT_PI
    return sr * fr - si * fi, sr * fi + si * fr


def cpf3(x, y):
    """hapi's 'naive' benchmark CPF (``cpf3``, ``misc/hapi.py:9645-9670``):
    the bare 15-term asymptotic series, valid for large |z| only. Returns
    (Re w, Im w)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    return _asym_series(x, y)


def cpf_humlicek(x, y):
    """Full Humlicek 3-region CPF (hapi ``cpf``, ``misc/hapi.py:9677-9790``)
    -> (Re w, Im w), branchless.

    Region split follows the reference exactly: |z| > 8 -> asymptotic
    series; otherwise the 6-term Humlicek rational sums, with the region-2
    variant where y <= 0.85 and |x| >= 18.1 y + 1.65. One reference bug is
    fixed and documented: its region-1 branch reads the y array from X
    (``Y_REGION1 = X[index_REGION1]``, ``misc/hapi.py:9757``); here region 1
    uses the actual y.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dtype = jnp.result_type(x, y, jnp.float32)
    x = x.astype(dtype)
    y = jnp.broadcast_to(jnp.asarray(y, dtype=dtype), jnp.broadcast_shapes(
        x.shape, jnp.shape(y)))
    x = jnp.broadcast_to(x, y.shape)

    in3 = jnp.sqrt(x * x + y * y) > 8.0
    in2 = (~in3) & (y <= 0.85) & (jnp.abs(x) >= 18.1 * y + 1.65)

    wr3, wi3 = _asym_series(x, y, guard=1e-30)

    y1 = y + 1.5
    y2 = y1 * y1
    y3 = y + 3.0

    wr1 = jnp.zeros_like(x)
    wi1 = jnp.zeros_like(x)
    wr2 = jnp.where(jnp.abs(x) < 12.0, jnp.exp(-jnp.minimum(x * x, 144.0)),
                    0.0)
    wi2 = jnp.zeros_like(x)
    for t_i, u_i, s_i in zip(_HUM_T, _HUM_U, _HUM_S):
        rm = x - t_i
        dm = 1.0 / (rm * rm + y2)
        d1m, d2m = y1 * dm, rm * dm
        rp = x + t_i
        dp = 1.0 / (rp * rp + y2)
        d1p, d2p = y1 * dp, rp * dp
        wr1 = wr1 + u_i * (d1m + d1p) - s_i * (d2m - d2p)
        wi1 = wi1 + u_i * (d2m + d2p) + s_i * (d1m - d1p)
        wr2 = wr2 + (y * (u_i * (rm * d2m - 1.5 * d1m) + s_i * y3 * d2m)
                     / (rm * rm + 2.25)
                     + y * (u_i * (rp * d2p - 1.5 * d1p) - s_i * y3 * d2p)
                     / (rp * rp + 2.25))
        wi2 = wi2 + u_i * (d2m + d2p) + s_i * (d1m - d1p)

    wr = jnp.where(in3, wr3, jnp.where(in2, wr2, wr1))
    wi = jnp.where(in3, wi3, jnp.where(in2, wi2, wi1))
    return wr, wi


def cef(x, y, n: int = WEIDEMAN_N):
    """Weideman rational series w(z) with ``n`` terms (hapi ``cef``,
    ``misc/hapi.py:9812-9827``). Returns complex w; assumes Im(z) >= 0."""
    wr, wi = wofz_real_series_only(x, y, n)
    return wr + 1j * wi


def wofz_real_series_only(x, y, n: int = WEIDEMAN_N):
    """The Weideman series leg of :func:`wofz_real` alone (no asymptotic
    blend) -> (Re, Im). This is ``cef`` in real arithmetic."""
    L, a = weideman_coeffs(n)
    dtype = jnp.result_type(x, y)
    aa = [jnp.asarray(c, dtype=dtype) for c in a]
    L = jnp.asarray(L, dtype=dtype)
    inv_sqrt_pi = jnp.asarray(1.0 / np.sqrt(np.pi), dtype=dtype)
    x = jnp.asarray(x, dtype=dtype)
    y = jnp.asarray(y, dtype=dtype)

    nr, ni = L - y, x
    er, ei = L + y, -x
    emag = er * er + ei * ei
    zr = (nr * er + ni * ei) / emag
    zi_ = (ni * er - nr * ei) / emag
    pr = jnp.full_like(zr, aa[0])
    pi_ = jnp.zeros_like(zr)
    for c in aa[1:]:
        pr, pi_ = pr * zr - pi_ * zi_ + c, pr * zi_ + pi_ * zr
    sr = er * er - ei * ei
    si = 2.0 * er * ei
    smag = sr * sr + si * si
    wr = 2.0 * (pr * sr + pi_ * si) / smag + inv_sqrt_pi * er / emag
    wi = 2.0 * (pi_ * sr - pr * si) / smag - inv_sqrt_pi * ei / emag
    return wr, wi
