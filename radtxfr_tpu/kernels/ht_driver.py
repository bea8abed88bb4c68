"""Hartmann-Tran absorption-coefficient driver (hapi parity).

Vectorized equivalent of ``absorptionCoefficient_HT``
(``misc/hapi.py:10302-10650``): per diluent the driver resolves HT-specific
columns with fallbacks to the Voigt-era columns —

* Gamma0:  ``gamma_HT_0_<d>_296`` (nonzero) → ``gamma_<d>`` → 0; exponent
  ``n_HT_<d>_296`` (nonzero) → ``n_<d>`` (self falls back to ``n_air`` when
  zero) → ``n_air``; scaled by (p/pref)(Tref/T)^n.
* Shift0:  ``delta_HT_0_<d>_296`` (nonzero) → ``delta_<d>`` → 0, plus
  ``deltap_HT_<d>_296`` (nonzero) → ``deltap_<d>`` → 0 linear T term.
* Gamma2:  ``gamma_HT_2_<d>_296`` (nonzero) → ``SD_<d>`` * Gamma0DB → 0;
  scaled by p/pref (no T power).
* Shift2:  ``delta_HT_2_<d>_296`` → 0; scaled by p/pref.
* nuVC:    ``nu_HT_<d>`` * (Tref/T)^``kappa_HT_<d>`` * p.
* eta:     complex-valued Sum_d eta_d * abun_d * (Gamma0T_d + i Shift0T_d)
  normalized by (Gamma0 + i Shift0)  (``misc/hapi.py:10640-10642``).

The column *selection* (nonzero checks, fallbacks) runs host-side on the
concrete line columns; the thermodynamic scaling stays traced so the driver
jits over (T, p). Only the TrefHT = 296 K band (200 K <= T < 400 K —
every atmospheric case) is supported; other HT reference temperatures raise.

Column values come from the :class:`LineStore` fields plus an optional
``extras`` dict of per-line arrays (e.g. loaded via
``lines.hapi_db.load_table_columns``).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import (
    C_LIGHT_CGS, C_MASS_MOL, C2_CM_K, K_BOLTZMANN_CGS, P_REF, T_REF,
)
from ..lines.tips import partition_sum
from .htp import pcqsdhc

__all__ = ["xsect_ht", "resolve_ht_columns", "ht_params",
           "ht_xsect_from_params"]

_STORE_COLS = ("gamma_air", "gamma_self", "n_air", "delta_air", "sd_air")


def _col(lines, extras, name, default=0.0):
    """Resolve a per-line column from the store or extras (host-side)."""
    attr = {"gamma_air": "gamma_air", "gamma_self": "gamma_self",
            "n_air": "n_air", "delta_air": "delta_air",
            "SD_air": "sd_air"}.get(name)
    if extras and name in extras:
        return np.asarray(extras[name], dtype=np.float64)
    if attr is not None and hasattr(lines, attr):
        return np.asarray(getattr(lines, attr), dtype=np.float64)
    n = np.asarray(lines.nu0).shape[0]
    return np.full(n, default)


def _nz(primary, fallback):
    """hapi's 'use primary where nonzero else fallback' column blending."""
    return np.where(primary != 0.0, primary, fallback)


def resolve_ht_columns(lines, extras, diluent):
    """Host-side HT column resolution per diluent (hapi fallbacks;
    see module docstring). Returns a list of (abundance, 9 jnp arrays)."""
    resolved = []
    for d, abun in diluent.items():
        d = d.lower()
        g_ht = _col(lines, extras, f"gamma_HT_0_{d}_296")
        g_plain = _col(lines, extras, f"gamma_{d}")
        g0db = _nz(g_ht, g_plain)
        n_ht = _col(lines, extras, f"n_HT_{d}_296")
        n_plain = _col(lines, extras, f"n_{d}")
        if d == "self":
            n_plain = _nz(n_plain, _col(lines, extras, "n_air"))
        has_n_plain = (extras and f"n_{d}" in extras) or d in ("air", "self")
        n_fallback = n_plain if has_n_plain else _col(lines, extras, "n_air")
        ndb = _nz(n_ht, n_fallback)
        d0 = _nz(_col(lines, extras, f"delta_HT_0_{d}_296"),
                 _col(lines, extras, f"delta_{d}"))
        dp = _nz(_col(lines, extras, f"deltap_HT_{d}_296"),
                 _col(lines, extras, f"deltap_{d}"))
        g2db = _nz(_col(lines, extras, f"gamma_HT_2_{d}_296"),
                   _col(lines, extras, f"SD_{d}") * g0db)
        d2db = _col(lines, extras, f"delta_HT_2_{d}_296")
        nuvc_db = _col(lines, extras, f"nu_HT_{d}")
        kappa_db = _col(lines, extras, f"kappa_HT_{d}")
        eta_db = _col(lines, extras, f"eta_HT_{d}")
        resolved.append((float(abun), *map(jnp.asarray,
                        (g0db, ndb, d0, dp, g2db, d2db, nuvc_db, kappa_db, eta_db))))
    return resolved


def ht_params(resolved, lines, iso, T, p_atm, wing_abs=0.0, wing_hw=50.0,
              complex_dtype=None, abun=None):
    """Traced per-line HT parameters at (T, p) from resolved columns.

    Returns a dict: strength, gamma_d, gamma0, shift0, gamma2, shift2,
    nuvc, eta (complex), wing — the exact quantities the reference HT
    driver feeds ``PROFILE_HT`` (``misc/hapi.py:10530-10650``).

    ``abun`` optionally overrides the resolved diluent abundances with
    traced values (scalars or (L,) arrays, one per resolved diluent) —
    the layered-OD path resolves ``{'air': 1, 'self': 1}`` host-side and
    passes ``[1 - x_self, x_self]`` per layer here, the same
    vmr-dependent diluent mix the Voigt layer drivers apply.
    """
    T = jnp.asarray(T)
    p = jnp.asarray(p_atm)
    L = jnp.shape(lines.nu0)[0]

    all_rows = jnp.arange(iso.q.shape[0])
    q_t = partition_sum(iso.q, all_rows, T)[lines.iso_row]
    q_ref = partition_sum(iso.q, all_rows, jnp.asarray(T_REF))[lines.iso_row]
    nu0 = jnp.asarray(lines.nu0)
    elower = jnp.asarray(lines.elower)
    ch = jnp.exp(-C2_CM_K * elower / T) * (1.0 - jnp.exp(-C2_CM_K * nu0 / T))
    zn = jnp.exp(-C2_CM_K * elower / T_REF) * (1.0 - jnp.exp(-C2_CM_K * nu0 / T_REF))
    strength = jnp.asarray(lines.sw) * (q_ref / q_t) * (ch / zn)

    mass_g = iso.molar_mass[lines.iso_row] * C_MASS_MOL * 1000.0
    gamma_d = jnp.sqrt(2.0 * K_BOLTZMANN_CGS * T * np.log(2.0) / mass_g
                       / C_LIGHT_CGS**2) * nu0

    if complex_dtype is None:
        complex_dtype = (jnp.complex128 if gamma_d.dtype == jnp.float64
                         else jnp.complex64)
    gamma0 = 0.0
    shift0 = 0.0
    gamma2 = 0.0
    shift2 = 0.0
    nuvc = 0.0
    eta_num = jnp.zeros(L, dtype=complex_dtype)
    for i, (a_res, g0db, ndb, d0, dp, g2db, d2db, nuvc_db, kappa_db,
            eta_db) in enumerate(resolved):
        a = a_res if abun is None else abun[i]
        g0t = g0db * (p / P_REF) * (T_REF / T) ** ndb
        s0t = (d0 + dp * (T - T_REF)) * (p / P_REF)
        gamma0 = gamma0 + a * g0t
        shift0 = shift0 + a * s0t
        gamma2 = gamma2 + a * g2db * (p / P_REF)
        shift2 = shift2 + a * d2db * (p / P_REF)
        nuvc = nuvc + a * nuvc_db * (T_REF / T) ** kappa_db * p
        eta_num = eta_num + eta_db * a * (g0t + 1j * s0t)
    eta = eta_num / (gamma0 + 1j * shift0)

    wing = jnp.maximum(jnp.asarray(wing_abs),
                       jnp.maximum(wing_hw * gamma0, wing_hw * gamma_d))
    return dict(strength=strength, gamma_d=gamma_d, gamma0=gamma0,
                shift0=shift0, gamma2=gamma2, shift2=shift2, nuvc=nuvc,
                eta=eta, wing=wing)


def xsect_ht(grid, lines, iso, T, p_atm, diluent=None, extras=None,
             wing_abs: float = 0.0, wing_hw: float = 50.0, chunk: int = 128):
    """HT-profile absorption cross-section on ``grid`` [cm^2/molec].

    The traced portion runs under :func:`jax.jit` — eager complex
    arithmetic is unimplemented on some TPU runtimes, and the chunked
    scan dispatches thousands of ops when unjitted.
    """
    if diluent is None:
        diluent = {"air": 1.0}
    grid = jnp.asarray(grid)
    resolved = resolve_ht_columns(lines, extras, diluent)
    return _xsect_ht_eval(grid, resolved, lines, iso, T, p_atm,
                          wing_abs=float(wing_abs), wing_hw=float(wing_hw),
                          chunk=int(chunk))


@partial(jax.jit, static_argnames=("wing_abs", "wing_hw", "chunk"))
def _xsect_ht_eval(grid, resolved, lines, iso, T, p_atm,
                   wing_abs=0.0, wing_hw=50.0, chunk=128):
    prm = ht_params(resolved, lines, iso, T, p_atm,
                    wing_abs=wing_abs, wing_hw=wing_hw,
                    complex_dtype=(jnp.complex128
                                   if grid.dtype == jnp.float64
                                   else jnp.complex64))
    return ht_xsect_from_params(grid, jnp.asarray(lines.nu0), prm,
                                chunk=chunk)


def ht_xsect_from_params(grid, nu0, prm, chunk=128, strength_scale=None):
    """Chunked lines x grid pcqsdhc evaluation from an :func:`ht_params`
    dict (hapi window mask); the shared eval of the lattice and layered
    jnp HT engines. ``strength_scale`` optionally multiplies the HITRAN
    strengths (the layered OD path passes the species column density)."""
    strength, gamma_d = prm["strength"], prm["gamma_d"]
    if strength_scale is not None:
        strength = strength * strength_scale
    gamma0, shift0 = prm["gamma0"], prm["shift0"]
    gamma2, shift2 = prm["gamma2"], prm["shift2"]
    nuvc, eta, wing = prm["nuvc"], prm["eta"], prm["wing"]
    L = jnp.shape(nu0)[0]

    # ---- chunked lines x grid evaluation ----------------------------------
    n_pad = (-L) % chunk
    padc = lambda a, v: jnp.concatenate([jnp.asarray(a), jnp.full((n_pad,), v, dtype=jnp.asarray(a).dtype)]) if n_pad else jnp.asarray(a)
    cols = [padc(nu0, -1e9), padc(strength, 0.0), padc(gamma_d, 1.0),
            padc(gamma0, 1.0), padc(gamma2, 0.0), padc(shift0, 0.0),
            padc(shift2, 0.0), padc(nuvc, 0.0), padc(eta, 0.0),
            padc(wing, 0.0)]
    n_chunks = cols[0].shape[0] // chunk
    stacked = [c.reshape(n_chunks, chunk) for c in cols]

    def body(acc, cs):
        nu0c, sc, gdc, g0c, g2c, s0c, s2c, nvcc, etac, wc = cs
        vals = pcqsdhc(nu0c[:, None], gdc[:, None], g0c[:, None],
                       g2c[:, None], s0c[:, None], s2c[:, None],
                       nvcc[:, None], etac[:, None], grid[None, :])[0]
        g = grid[None, :]
        mask = (g > (nu0c - wc)[:, None]) & (g <= (nu0c + wc)[:, None])
        return acc + jnp.where(mask, sc[:, None] * vals, 0.0).sum(axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(grid), stacked)
    return acc
