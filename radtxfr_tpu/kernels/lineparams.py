"""Per-line thermodynamic parameter evaluation (the pre-kernel stage).

Turns a :class:`~radtxfr_tpu.lines.store.LineStore` plus a layer state
(T [K], p [atm], per-line self mixing fraction) into the four arrays the
line-shape kernels consume: effective center, temperature-scaled intensity,
Doppler HWHM, collisional HWHM — plus the wing cutoff.

Formulas match hapi's Voigt driver exactly
(``misc/hapi.py:11050-11138``, env dependences ``:10169-10200``):

* intensity: S(T) = S_ref * Q(Tref)/Q(T)
  * exp(-c2 E''/T)(1 - exp(-c2 nu0/T)) / [same at Tref],
  c2 = 1.4388028496642257 cm K  (``:10169-10175``)
* gamma_D = nu0 * sqrt(2 k_B T ln2 / m c^2), m in grams (``:11085-11087``)
* gamma_0 = sum_d abun_d * gamma_d * (p/pref)(Tref/T)^{n_d}  (``:11090-11113``)
  with the HITRAN .par fallback n_self -> n_air (``:11104-11109``)
* shift0 = sum_d abun_d * delta_d * p/pref; .par has no delta_self/deltap,
  so only the air term contributes (``:11115-11128``)
* wing = max(wing_abs, wing_hw * gamma_0, wing_hw * gamma_D)  (``:11131``)

Everything is vectorized over lines and jit/vmap-safe; vmap over layers
gives the (layers x lines) parameter tensor in one shot.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import (
    C2_CM_K,
    C_LIGHT_CGS,
    C_MASS_MOL,
    K_BOLTZMANN_CGS,
    P_REF,
    T_REF,
)
from ..lines.store import IsoTables, LineStore
from ..lines.tips import partition_sum

__all__ = ["LineParams", "compute_line_params"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LineParams:
    """Kernel-ready per-line parameters for one thermodynamic state."""

    nu0: jax.Array          # (L,) unshifted line center [cm^-1] (wing window)
    nu0_shifted: jax.Array  # (L,) pressure-shifted center [cm^-1] (profile)
    strength: jax.Array     # (L,) scaled intensity (includes any density/path factor)
    gamma_d: jax.Array      # (L,) Doppler HWHM [cm^-1]
    gamma_0: jax.Array      # (L,) collisional HWHM [cm^-1]
    wing: jax.Array         # (L,) wing cutoff [cm^-1]
    gamma_2: jax.Array      # (L,) speed-dependent width [cm^-1] (SDVoigt/HT)
    shift0: jax.Array       # (L,) pressure shift [cm^-1] (enters HT profiles)


def compute_line_params(
    lines: LineStore,
    iso: IsoTables,
    T,
    p_atm,
    vmr_self=0.0,
    wing_abs=0.0,
    wing_hw=50.0,
    strength_scale=1.0,
    abundance_ratio=1.0,
    profile: str = "voigt",
) -> LineParams:
    """Evaluate per-line parameters at (T, p).

    Parameters
    ----------
    T, p_atm : scalars (traced OK) — layer temperature [K] and pressure [atm].
    vmr_self : scalar or (L,) — per-line self-broadening mole fraction
        (the Diluent {'air': 1-x, 'self': x} split).
    wing_abs, wing_hw : absolute [cm^-1] and relative (in halfwidths) wing
        cutoffs; hapi defaults are 0.0 and 50 (``misc/hapi.py:10215-10218``).
    strength_scale : scalar or (L,) extra factor folded into ``strength``
        (e.g. molecule number density x path length for optical depth).
    abundance_ratio : scalar or (L,) — ABUNDANCES/NATURAL_ABUNDANCES factor
        (1 for natural-abundance HITRAN use, ``misc/hapi.py:11136-11137``).
    """
    T = jnp.asarray(T)
    p = jnp.asarray(p_atm)
    # nu0 is kept host-float64 for exact centers; canonicalize so non-x64
    # backends compute in float32 without per-call downcast warnings.
    dtype = jax.dtypes.canonicalize_dtype(lines.nu0.dtype)

    # --- intensity temperature scaling -------------------------------------
    # Evaluate Q(T) once per isotopologue (a ~143-row table), then gather per
    # line — far cheaper than the per-line 4-point Lagrange gathers when
    # vmapped over layers.
    all_rows = jnp.arange(iso.q.shape[0])
    q_t = partition_sum(iso.q, all_rows, T)[lines.iso_row]
    q_ref = partition_sum(iso.q, all_rows,
                          jnp.asarray(T_REF, dtype=T.dtype))[lines.iso_row]
    c2 = jnp.asarray(C2_CM_K, dtype=dtype)
    ch = jnp.exp(-c2 * lines.elower / T) * (1.0 - jnp.exp(-c2 * lines.nu0 / T))
    zn = jnp.exp(-c2 * lines.elower / T_REF) * (1.0 - jnp.exp(-c2 * lines.nu0 / T_REF))
    strength = lines.sw * (q_ref / q_t) * (ch / zn) * abundance_ratio * strength_scale

    # --- Doppler width ------------------------------------------------------
    if profile == "doppler":
        # The reference's Doppler driver uses SI constants and a sqrt-mass
        # factorization (misc/hapi.py:11534-11538) — numerically slightly
        # different from the CGS Voigt-driver formula; reproduced exactly.
        c_si = 2.99792458e8
        k_si = 1.3806503e-23
        from ..core.constants import SQRT_2LN2

        gamma_d = (
            (SQRT_2LN2 / c_si)
            * jnp.sqrt(k_si / C_MASS_MOL)
            * jnp.sqrt(T)
            * lines.nu0
            / jnp.sqrt(iso.molar_mass[lines.iso_row])
        )
    else:
        mass_g = iso.molar_mass[lines.iso_row] * C_MASS_MOL * 1000.0
        gamma_d = (
            jnp.sqrt(2.0 * K_BOLTZMANN_CGS * T * np.log(2.0) / mass_g / C_LIGHT_CGS**2)
            * lines.nu0
        )

    # --- collisional width & shift -----------------------------------------
    x_self = jnp.asarray(vmr_self, dtype=dtype)
    t_pow = (T_REF / T) ** lines.n_air  # n_self falls back to n_air (.par)
    gamma_0 = (p / P_REF) * t_pow * (
        (1.0 - x_self) * lines.gamma_air + x_self * lines.gamma_self
    )
    if profile == "doppler":
        # Doppler driver: shift is delta_air * p/pref, no diluent mix
        # (misc/hapi.py:11545).
        shift0 = lines.delta_air * (p / P_REF)
    else:
        shift0 = (1.0 - x_self) * lines.delta_air * (p / P_REF)

    # --- wing cutoff (per-driver rules) ------------------------------------
    wa = jnp.asarray(wing_abs, dtype=dtype)
    if profile == "lorentz":
        # misc/hapi.py:11364 — no GammaD term
        wing = jnp.maximum(wa, wing_hw * gamma_0)
    elif profile == "doppler":
        # misc/hapi.py:11541 — no Gamma0 term
        wing = jnp.maximum(wa, wing_hw * gamma_d)
    else:
        # misc/hapi.py:11131
        wing = jnp.maximum(wa, jnp.maximum(wing_hw * gamma_0, wing_hw * gamma_d))

    # SD width: Gamma2 = sum_d abun_d * SD_d * (p/pref) * Gamma0DB_d — the
    # unscaled reference gamma, no T-power (misc/hapi.py:10870-10876).
    # .par has no SD_self column, so only the air diluent term contributes.
    gamma_2 = (1.0 - x_self) * lines.sd_air * lines.gamma_air * (p / P_REF)

    # The SDVoigt driver evaluates the profile at the UNSHIFTED center and
    # passes Shift0 into the HT profile instead (misc/hapi.py:10890).
    shifted = lines.nu0 if profile in ("sdvoigt", "ht") else lines.nu0 + shift0
    return LineParams(
        nu0=lines.nu0,
        nu0_shifted=shifted,
        strength=strength,
        gamma_d=gamma_d,
        gamma_0=gamma_0,
        wing=wing,
        gamma_2=gamma_2,
        shift0=shift0,
    )
