"""Hartmann-Tran profile (pCqSDHC) family, branchless jnp.

Reimplements the reference's ``pcqsdhc`` (``misc/hapi.py:9850-10023``; Tran,
Ngo & Hartmann, JQSRT 129 (2013) 199) with compute-and-mask region blending
instead of data-dependent boolean indexing, so it vectorizes over
(lines x wavenumbers) tensors and runs under jit on TPU.

Region structure mirrors the reference exactly:

* PART1 (``|c2t| == 0``, per line): pure Voigt-like term  (``:9910-9921``)
* otherwise per point: PART2 (``|X| <= 3e-8 |Y|``), PART3
  (``|Y| <= 1e-15 |X|``), PART4 (main), with the PART4 CPF3-vs-CPF
  sub-selection (``:9930-9968``).

Documented divergences from the reference (both are evident bugs there,
reproduced nowhere because the affected terms multiply zero in every
supported profile):

* PART1's ``Bterm`` branch assignments overwrite the whole array instead of
  the masked subset (``misc/hapi.py:9918-9921``); here the |Z1|<=4000 branch
  is applied pointwise.
* PART3's small-|sqrt(X)| branch evaluates ``sqrt(X)`` on the full vector
  and would shape-mismatch if ever hit (``:10006-10012``); here it is
  evaluated consistently on the masked subset.

Thin wrappers mirror hapi's PROFILE_* family (``misc/hapi.py:10034-10152``):
HT, SD-Rautian, Rautian, SD-Voigt (plus Voigt/Lorentz/Doppler in
:mod:`radtxfr_tpu.kernels.profiles`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .faddeeva import wofz_real

__all__ = [
    "pcqsdhc",
    "profile_ht",
    "profile_sdvoigt",
    "profile_sdrautian",
    "profile_rautian",
]

_RPI = np.sqrt(np.pi)
_SQRT_LN2 = np.sqrt(np.log(2.0))


def _w_of(Z):
    """hapi's CPF convention: w evaluated at (x, y) = (-Im Z, Re Z)."""
    wr, wi = wofz_real(-jnp.imag(Z), jnp.real(Z))
    return wr + 1j * wi


def _cpf3_of(Z):
    """15-term asymptotic CPF (``cpf3``, ``misc/hapi.py:9645-9670``) at
    (x, y) = (-Im Z, Re Z)."""
    x = -jnp.imag(Z)
    y = jnp.real(Z)
    z = x + 1j * y
    zm1 = 1.0 / z
    zm2 = zm1 * zm1
    zsum = jnp.ones_like(z)
    zterm = jnp.ones_like(z)
    for tt_i in (0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5, 9.5, 10.5,
                 11.5, 12.5, 13.5, 14.5):
        zterm = zterm * zm2 * tt_i
        zsum = zsum + zterm
    return zsum * 1j * zm1 * (1.0 / _RPI)


def pcqsdhc(sg0, gamma_d, gamma0, gamma2, shift0, shift2, anuvc, eta, sg):
    """Complex-normalized pCqSDHC line shape, vectorized & branchless.

    All parameters broadcast against ``sg`` (wavenumber axis). Returns
    (real, imag) parts in [cm], matching ``pcqsdhc``'s return convention.
    """
    sg = jnp.asarray(sg)
    dtype = jnp.result_type(sg, gamma_d, jnp.float32)
    c = lambda a: jnp.asarray(a, dtype=dtype)
    sg0, gamma_d, gamma0, gamma2, shift0, shift2, anuvc = map(
        c, (sg0, gamma_d, gamma0, gamma2, shift0, shift2, anuvc)
    )
    # eta may be complex (the HT driver's correlation parameter is
    # Sum eta_d abun_d (Gamma0T + i Shift0T) / (Gamma0 + i Shift0),
    # misc/hapi.py:10640-10642)
    eta = jnp.asarray(eta)
    if not jnp.iscomplexobj(eta):
        eta = jnp.asarray(eta, dtype=dtype)

    cte = _SQRT_LN2 / gamma_d
    c0 = gamma0 + 1j * shift0
    c2 = gamma2 + 1j * shift2
    c0t = (1.0 - eta) * (c0 - 1.5 * c2) + anuvc
    c2t = (1.0 - eta) * c2

    part1 = jnp.abs(c2t) == 0.0

    # ---------------- PART1: |c2t| == 0 (collapses toward Voigt/Rautian) ---
    Z1a = (1j * (sg0 - sg) + c0t) * cte
    w1a = _w_of(Z1a)
    A1 = _RPI * cte * w1a
    B1_small = _RPI * cte * ((1.0 - Z1a**2) * w1a + Z1a / _RPI)
    # guard the 1/Z1 asymptotic against Z1 ~ 0 (only selected when |Z1|>4e3)
    Z1a_safe = jnp.where(jnp.abs(Z1a) > 1e-30, Z1a, 1.0)
    B1_big = cte * (_RPI * w1a + 0.5 / Z1a_safe - 0.75 / Z1a_safe**3)
    B1 = jnp.where(jnp.abs(Z1a) <= 4.0e3, B1_small, B1_big)

    # ---------------- PART2/3/4 ------------------------------------------
    c2t_safe = jnp.where(part1, 1.0, c2t)
    X = (1j * (sg0 - sg) + c0t) / c2t_safe
    Y = (1.0 / (2.0 * cte * c2t_safe)) ** 2
    g2s2 = gamma2**2 + shift2**2
    g2s2_safe = jnp.where(g2s2 == 0.0, 1.0, g2s2)
    eta_safe = jnp.where(eta == 1.0, 0.0, eta)
    csqrtY = (gamma2 - 1j * shift2) / (2.0 * cte * (1.0 - eta_safe) * g2s2_safe)

    absX = jnp.abs(X)
    absY = jnp.abs(Y)
    part2 = ~part1 & (absX <= 3.0e-8 * absY)
    part3 = ~part1 & ~part2 & (absY <= 1.0e-15 * absX)
    # part4 is the remainder

    sXY = jnp.sqrt(X + Y)

    # --- PART4 (main) ---
    Z1 = sXY - csqrtY
    Z2 = Z1 + 2.0 * csqrtY
    xZ1, yZ1 = -jnp.imag(Z1), jnp.real(Z1)
    xZ2, yZ2 = -jnp.imag(Z2), jnp.real(Z2)
    SZ1 = jnp.sqrt(xZ1**2 + yZ1**2)
    SZ2 = jnp.sqrt(xZ2**2 + yZ2**2)
    DSZ = jnp.abs(SZ1 - SZ2)
    SZmx = jnp.maximum(SZ1, SZ2)
    SZmn = jnp.minimum(SZ1, SZ2)
    use_cpf3 = (DSZ <= 1.0) & (SZmx > 8.0) & (SZmn <= 8.0)
    w1_4 = jnp.where(use_cpf3, _cpf3_of(Z1), _w_of(Z1))
    w2_4 = jnp.where(use_cpf3, _cpf3_of(Z2), _w_of(Z2))
    A4 = _RPI * cte * (w1_4 - w2_4)
    csqrtY_safe = jnp.where(jnp.abs(csqrtY) == 0.0, 1.0, csqrtY)
    B4 = (-1.0
          + _RPI / (2.0 * csqrtY_safe) * (1.0 - Z1**2) * w1_4
          - _RPI / (2.0 * csqrtY_safe) * (1.0 - Z2**2) * w2_4) / c2t_safe

    # --- PART2 (|X| << |Y|) ---
    Z1b = (1j * (sg0 - sg) + c0t) * cte
    Z2b = sXY + csqrtY
    w1_2 = _w_of(Z1b)
    w2_2 = _w_of(Z2b)
    A2 = _RPI * cte * (w1_2 - w2_2)
    B2 = (-1.0
          + _RPI / (2.0 * csqrtY_safe) * (1.0 - Z1b**2) * w1_2
          - _RPI / (2.0 * csqrtY_safe) * (1.0 - Z2b**2) * w2_2) / c2t_safe

    # --- PART3 (|Y| << |X|) ---
    wXY = _w_of(sXY)
    sX = jnp.sqrt(X)
    wX = _w_of(sX)
    A3_small = (2.0 * _RPI / c2t_safe) * (1.0 / _RPI - sX * wX)
    B3_small = (1.0 / c2t_safe) * (
        -1.0
        + 2.0 * _RPI * (1.0 - X - 2.0 * Y) * (1.0 / _RPI - sX * wX)
        + 2.0 * _RPI * sXY * wXY
    )
    X_safe = jnp.where(jnp.abs(X) < 1e-300, 1.0, X)
    A3_big = (1.0 / c2t_safe) * (1.0 / X_safe - 1.5 / X_safe**2)
    B3_big = (1.0 / c2t_safe) * (
        -1.0
        + (1.0 - X - 2.0 * Y) * (1.0 / X_safe - 1.5 / X_safe**2)
        + 2.0 * _RPI * sXY * wXY
    )
    small3 = jnp.abs(sX) <= 4.0e3
    A3 = jnp.where(small3, A3_small, A3_big)
    B3 = jnp.where(small3, B3_small, B3_big)

    A = jnp.where(part1, A1, jnp.where(part2, A2, jnp.where(part3, A3, A4)))
    B = jnp.where(part1, B1, jnp.where(part2, B2, jnp.where(part3, B3, B4)))

    LS = (1.0 / np.pi) * A / (1.0 - (anuvc - eta * (c0 - 1.5 * c2)) * A + eta * c2 * B)
    return jnp.real(LS), jnp.imag(LS)


# ---------------- thin wrappers (hapi PROFILE_* semantics) ------------------

def profile_ht(sg0, gamma_d, gamma0, gamma2, shift0, shift2, anuvc, eta, sg):
    """PROFILE_HT (misc/hapi.py:10034)."""
    return pcqsdhc(sg0, gamma_d, gamma0, gamma2, shift0, shift2, anuvc, eta, sg)


def profile_sdvoigt(sg0, gamma_d, gamma0, gamma2, shift0, shift2, sg):
    """PROFILE_SDVOIGT (misc/hapi.py:10117)."""
    return pcqsdhc(sg0, gamma_d, gamma0, gamma2, shift0, shift2, 0.0, 0.0, sg)


def profile_sdrautian(sg0, gamma_d, gamma0, gamma2, shift0, shift2, anuvc, sg):
    """PROFILE_SDRAUTIAN (misc/hapi.py:10089)."""
    return pcqsdhc(sg0, gamma_d, gamma0, gamma2, shift0, shift2, anuvc, 0.0, sg)


def profile_rautian(sg0, gamma_d, gamma0, shift0, anuvc, sg):
    """PROFILE_RAUTIAN (misc/hapi.py:10104)."""
    return pcqsdhc(sg0, gamma_d, gamma0, 0.0, shift0, 0.0, anuvc, 0.0, sg)
