"""Continuum absorption: pluggable additive models.

Scope per SURVEY.md §7: exact parity targets the hapi path, which has **no**
continuum; the reference's LBLRTM path adds the MT_CKD continuum with
per-species scale factors (``radiative_transfer.py:591-601,622``), whose
proprietary coefficient tables are not shippable. This module provides the
structural equivalent — an additive per-layer continuum OD term composed
with the line-by-line OD — with:

* :func:`continuum_od` — dispatcher applying a named model with the
  7-element scale-factor convention of TAPE5 record 1.2a
  (``radiative_transfer.py:658-660``: [H2O self, H2O foreign, CO2, O3,
  O2, N2, Rayleigh]);
* ``'none'`` — the hapi-parity default (zero);
* ``'h2o_empirical'`` — a simple LWIR water-vapor continuum of the standard
  empirical form  k = x_h2o * (C_s * e + C_f * (p - e)) * (nu/1000)^-2 *
  (296/T)^m  (self term exponentially T-dependent), with coefficients of
  the magnitude used in window-region literature (Roberts et al. 1976 family).
  This is an openly-documented approximation, NOT MT_CKD — do not expect
  agreement with LBLRTM to better than tens of percent in the window.

Custom models register via :func:`register_continuum`.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..core.constants import BARYE_PER_ATM, CM_PER_KM, K_BOLTZMANN_CGS, PA_PER_ATM

__all__ = ["continuum_od", "register_continuum", "CONTINUUM_MODELS"]


def _zero(nu, T, p_pa, vmr, mol_ids, pl_km, cf):
    return jnp.zeros_like(nu)


def _h2o_empirical(nu, T, p_pa, vmr, mol_ids, pl_km, cf):
    """Empirical LWIR H2O self+foreign continuum (window region).

    Roberts/Selby/Biberman-form: self coefficient C_s(nu, 296 K) =
    a + b*exp(-beta*nu), exponential T scaling exp(To*(1/T - 1/296)),
    foreign fraction ~ 0.002 of self at 296 K.
    """
    try:
        ih2o = list(mol_ids).index(1)
    except ValueError:
        return jnp.zeros_like(nu)
    x = vmr[ih2o]
    p_atm = p_pa / PA_PER_ATM
    e_atm = x * p_atm                       # H2O partial pressure [atm]

    # C_s at 296 K [cm^2 molec^-1 atm^-1], Roberts et al. (1976) form
    a, b, beta = 4.18e-24, 5.578e-21, 7.87e-3
    To = 1800.0
    cs = (a + b * jnp.exp(-beta * nu)) * jnp.exp(To * (1.0 / T - 1.0 / 296.0))
    cf_coef = 0.002 * (a + b * jnp.exp(-beta * nu))  # foreign, no T scaling

    k = cs * cf[0] * e_atm + cf_coef * cf[1] * (p_atm - e_atm)  # per molecule
    n_h2o = x * (p_atm * BARYE_PER_ATM) / (K_BOLTZMANN_CGS * T)  # molec/cm^3
    return k * n_h2o * pl_km * CM_PER_KM


def _rayleigh(nu, T, p_pa, vmr, mol_ids, pl_km, cf):
    """Rayleigh extinction OD (TAPE5 scale-factor slot 7,
    ``radiative_transfer.py:658-660``).

    Standard molecular-scattering cross-section in the long-wavelength
    (static-refractivity) limit:

        sigma(nu) = (24 pi^3 nu^4 / N_s^2) ((n^2-1)/(n^2+2))^2 F_k

    with dry-air refractivity n-1 = 2.79e-4 at standard density
    N_s = 2.546899e19 cm^-3 and King depolarization factor F_k = 1.061
    (Bodhaine et al. 1999, J. Atmos. Ocean. Tech. 16, 1854). In the LWIR
    this is ~1e-6 of the visible value (nu^4) — included for structural
    parity with LBLRTM's Rayleigh term, not because it matters at 10 um.
    """
    n_s = 2.546899e19                      # molec/cm^3 at 288.15 K, 1013.25 hPa
    n_ref = 1.0 + 2.79e-4                  # dry air, long-wavelength limit
    f_k = 1.061
    lorentz = (n_ref**2 - 1.0) / (n_ref**2 + 2.0)
    sigma = (24.0 * jnp.pi**3 * nu**4 / n_s**2) * lorentz**2 * f_k  # cm^2
    n_air = (p_pa * 10.0) / (K_BOLTZMANN_CGS * T)   # molec/cm^3 (Pa->barye)
    return cf[6] * sigma * n_air * pl_km * CM_PER_KM


def _empirical(nu, T, p_pa, vmr, mol_ids, pl_km, cf):
    """All implemented empirical terms combined (H2O self+foreign +
    Rayleigh), each honoring its TAPE5 scale-factor slot."""
    return (_h2o_empirical(nu, T, p_pa, vmr, mol_ids, pl_km, cf)
            + _rayleigh(nu, T, p_pa, vmr, mol_ids, pl_km, cf))


CONTINUUM_MODELS: dict[str, Callable] = {
    "none": _zero,
    "h2o_empirical": _h2o_empirical,
    "rayleigh": _rayleigh,
    "empirical": _empirical,
}


def register_continuum(name: str, fn: Callable) -> None:
    """Register a model fn(nu, T, p_pa, vmr, mol_ids, pl_km, cf) -> OD."""
    CONTINUUM_MODELS[name] = fn


def continuum_od(nu, atmos, model: str = "none", continuum_factors=None):
    """Additive continuum OD (nLayers, nX) for a layered atmosphere.

    ``continuum_factors`` follows the reference's 7-element TAPE5 scale
    factors; defaults to all ones for the selected model.
    """
    import jax

    fn = CONTINUUM_MODELS[model]
    if continuum_factors is None:
        cf = jnp.ones(7)
    else:
        cf = jnp.asarray(continuum_factors)
        if cf.shape != (7,):
            # jnp indexing clamps out of range, which would silently read
            # the wrong scale-factor slot
            raise ValueError(
                f"continuum_factors must have exactly 7 elements (TAPE5 "
                f"record 1.2a convention), got shape {cf.shape}")
    nu = jnp.asarray(nu)

    def one(T_l, p_l, pl_l, vmr_l):
        return fn(nu, T_l, p_l, vmr_l, atmos.mol_ids, pl_l, cf)

    return jax.vmap(one)(atmos.T, atmos.p, atmos.pl, atmos.vmr)
