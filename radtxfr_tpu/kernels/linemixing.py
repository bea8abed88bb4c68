"""First-order Rosenkranz line mixing (CO2 Q-branch class physics).

The reference's production LBLRTM runs with line coupling enabled
(``ILBLF4=1``, ``/root/reference/radiative_transfer.py:621``); hapi — the
exact-parity scope — has none. This module provides the flag-gated
equivalent: the first-order Rosenkranz (1975, IEEE Trans. Antennas Propag.
23, 498) perturbation, where line k of an overlapping branch acquires an
asymmetric component

    k(nu) = S * (cte/sqrt(pi)) * [ Re w(z)  +  Y * Im w(z) ],
    z = (sqrt(ln2)/gamma_D) * ((nu - nu0*) + i gamma_0),

with the pressure-proportional mixing coefficient

    Y(p, T) = p * [ (1 - x_self) y_air + x_self y_self ] * (Tref/T)^n_T.

``y_air``/``y_self`` are the HITRAN ``linemixing`` parameter-group columns
[1/atm at 296 K] (fetchable via ``pargroups=['linemixing']``,
:mod:`radtxfr_tpu.lines.fetch`); ``n_T`` defaults to 0 — the plain
Rosenkranz Y(p) convention (HITRAN's first-order columns carry no T
dependence); users may opt into an empirical collisional-width-like
exponent (~0.75) explicitly. Setting Y = 0 recovers the
Voigt profile exactly, so the module composes with (not replaces) the
Voigt engines; the intensity sum rule sum_k S_k Y_k = 0 holds for physical
coefficient sets and is NOT enforced here — it is the data's property.

The Pallas production path evaluates the same expression in the fused
kernel's ``mode='mix'`` (the mixing coefficient rides the kernel's spare
per-line slot); this module is the jnp/correctness engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.constants import SQRT_LN2, T_REF
from .faddeeva import wofz_real
from .lineparams import LineParams

__all__ = ["mixing_coefficient", "xsect_voigt_mixing"]

_INV_SQRT_PI = 0.5641895835477563


def mixing_coefficient(y_air, p_atm, T, y_self=None, x_self=0.0,
                       n_T: float = 0.0):
    """Per-line first-order mixing coefficient Y(p, T).

    ``y_air``/``y_self`` in 1/atm at 296 K (HITRAN ``y_air``/``y_self``
    columns); ``y_self`` defaults to ``y_air`` (HITRAN rarely provides a
    distinct self column). Scalars or (L,) arrays; broadcastable layer
    scalars for (T, p, x_self).
    """
    y_air = jnp.asarray(y_air)
    y_s = y_air if y_self is None else jnp.asarray(y_self)
    y_mix = (1.0 - x_self) * y_air + x_self * y_s
    return p_atm * y_mix * (T_REF / T) ** n_T


@functools.partial(jax.jit, static_argnames=("chunk",))
def xsect_voigt_mixing(grid, params: LineParams, Y, chunk: int = 512):
    """Voigt spectrum with first-order Rosenkranz mixing.

    Same contract as :func:`radtxfr_tpu.kernels.xsect.xsect_from_params`
    (hapi wing-window mask, shifted centers) with the additional per-line
    asymmetry ``Y`` (from :func:`mixing_coefficient`). ``Y = 0`` lines
    reproduce the Voigt engine bitwise (the Im-w term is simply dropped).
    """
    from .xsect import pad_params

    grid = jnp.asarray(grid)
    Y = jnp.broadcast_to(jnp.asarray(Y, dtype=grid.dtype),
                         params.nu0.shape)
    n0 = params.nu0.shape[0]
    params = pad_params(params, chunk)
    n_pad = params.nu0.shape[0]
    Y = jnp.concatenate([Y, jnp.zeros(n_pad - n0, dtype=Y.dtype)])
    n_chunks = n_pad // chunk
    stacked = jax.tree.map(lambda a: a.reshape(n_chunks, chunk), params)
    Y_st = Y.reshape(n_chunks, chunk)

    def body(acc, arg):
        p, y_row = arg
        dnu = grid[None, :] - p.nu0_shifted[:, None]
        cte = SQRT_LN2 / p.gamma_d[:, None]
        K, L = wofz_real(dnu * cte, p.gamma_0[:, None] * cte)
        vals = _INV_SQRT_PI * cte * (K + y_row[:, None] * L)
        g = grid[None, :]
        mask = (g > (p.nu0 - p.wing)[:, None]) & (g <= (p.nu0 + p.wing)[:, None])
        contrib = jnp.where(mask, p.strength[:, None] * vals, 0.0)
        return acc + contrib.sum(axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(grid), (stacked, Y_st))
    return acc
