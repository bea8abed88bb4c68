"""At-sensor apparent radiance forward model.

    L = tau * [ eps * B(Ts + dT) + (1 - eps) * Ld ] + Lu

Pure-broadcast tensor model over (nX, nE materials, nA atmospheres[, nT
temperature deltas]) exactly as the reference's
``compute_LWIR_apparent_radiance`` (``radiative_transfer.py:1017-1069``),
re-expressed in jnp (jit/vmap/grad-safe; runs as one fused XLA kernel).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.planck import planckian

__all__ = ["apparent_radiance"]


def apparent_radiance(X, emis, Ts, tau, Lu, Ld, dT=None, return_Ls: bool = False):
    """Apparent spectral radiance for every (material, atmosphere[, dT]).

    Parameters
    ----------
    X : (nX,) wavenumber axis [cm^-1].
    emis : (nX, nE) surface emissivities.
    Ts : (nA,) surface temperatures [K].
    tau, Lu, Ld : (nX, nA) atmospheric transmittance / upwelling /
        downwelling for each atmosphere.
    dT : optional (nT,) surface-temperature deltas [K].
    return_Ls : also return the surface-leaving radiance.

    Returns
    -------
    L : (nX, nE, nA) or (nX, nE, nA, nT) [µW/(cm^2 sr cm^-1)]
    (optionally (L, Ls)).
    """
    X = jnp.asarray(X)
    emis = jnp.asarray(emis)
    Ts = jnp.asarray(Ts).reshape(-1)
    tau = jnp.asarray(tau)
    Lu = jnp.asarray(Lu)
    Ld = jnp.asarray(Ld)

    if dT is not None:
        dT = jnp.asarray(dT).reshape(-1)
        T_ = Ts[:, None] + dT[None, :]                  # (nA, nT)
        B_ = planckian(X, T_)[:, None, :, :]            # (nX, 1, nA, nT)
        tau_ = tau[:, None, :, None]
        Lu_ = Lu[:, None, :, None]
        Ld_ = Ld[:, None, :, None]
        em_ = emis[:, :, None, None]
    else:
        B_ = planckian(X, Ts)[:, None, :]               # (nX, 1, nA)
        tau_ = tau[:, None, :]
        Lu_ = Lu[:, None, :]
        Ld_ = Ld[:, None, :]
        em_ = emis[:, :, None]

    Ls = em_ * B_ + (1.0 - em_) * Ld_
    L = tau_ * Ls + Lu_
    return (L, Ls) if return_Ls else L
