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


CONTINUUM_MODELS: dict[str, Callable] = {
    "none": _zero,
    "h2o_empirical": _h2o_empirical,
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
    cf = jnp.ones(7) if continuum_factors is None else jnp.asarray(continuum_factors)
    nu = jnp.asarray(nu)

    def one(T_l, p_l, pl_l, vmr_l):
        return fn(nu, T_l, p_l, vmr_l, atmos.mol_ids, pl_l, cf)

    return jax.vmap(one)(atmos.T, atmos.p, atmos.pl, atmos.vmr)
