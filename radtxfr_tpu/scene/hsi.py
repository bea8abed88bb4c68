"""Hyperspectral-imagery (HSI) scene generator.

TPU-native rewrite of ``LWIR_HSI_gen`` (``LWIR_HSI_Generator.py:109-179``):
mixed-pixel at-sensor radiances over randomly chosen atmospheric TUDs,
emissivity end-members, per-pixel material mixtures and Gaussian surface
temperatures,

    L = tau * [ eps_eff * B(Ts + dT) + (1 - eps_eff) * Ld ] + Lu,
    eps_eff = sum_k f_k eps_k  (linear mixing, LWIR_HSI_Generator.py:30-42)

with three TPU-first changes:

* ``jax.random`` keyed sampling replaces global ``np.random.seed(42)``
  (``:102``) — reproducible, splittable, parallelizable;
* the per-atmosphere Python loop becomes a ``vmap`` over atmospheres, so
  one jit produces the whole (N_atm, N, nX) cube on device;
* fractional abundances use the same normalized-uniform construction as the
  reference (``:157-158``) — not a symmetric Dirichlet — for distributional
  parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.planck import planckian

__all__ = ["hsi_generate"]


@functools.partial(jax.jit, static_argnames=("n_pixels", "n_emis", "n_mix", "n_atm"))
def hsi_generate(
    key,
    X,
    tau,
    Lu,
    Ld,
    Ts,
    emis,
    n_pixels: int = 100,
    dT: float = 3.0,
    n_emis: int = 6,
    n_mix: int = 2,
    n_atm: int = 3,
):
    """Generate mixed-pixel apparent-radiance cubes.

    Parameters
    ----------
    key : jax PRNG key.
    X : (nX,) wavenumber axis.
    tau, Lu, Ld : (nA, nX) TUD ensemble (atmosphere-major).
    Ts : (nA,) surface/boundary temperature per atmosphere.
    emis : (nE, nX) emissivity database on the same axis.
    n_pixels, dT, n_emis, n_mix, n_atm : reference parameters N, dT,
        N_emis, N_mix, N_atm.

    Returns
    -------
    dict with L (n_atm, n_pixels, nX), atmos_labels (n_atm,),
    Ts_pix (n_atm, n_pixels), emis_labels (n_atm, n_pixels, n_mix),
    mix_frac (n_atm, n_pixels, n_mix).
    """
    X = jnp.asarray(X)
    tau, Lu, Ld = map(jnp.asarray, (tau, Lu, Ld))
    Ts = jnp.asarray(Ts)
    emis = jnp.asarray(emis)
    n_db = emis.shape[0]
    n_tud = tau.shape[0]

    k_atm, k_scene = jax.random.split(key)
    atmos_labels = jax.random.randint(k_atm, (n_atm,), 0, n_tud)

    def one_atmosphere(k, ix_atm):
        k_em, k_pick, k_frac, k_T = jax.random.split(k, 4)
        # N_emis end-members from the DB, then per-pixel picks among them
        members = jax.random.randint(k_em, (n_emis,), 0, n_db)
        pick = jax.random.randint(k_pick, (n_pixels, n_mix), 0, n_emis)
        ix_em = members[pick]                                   # (N, n_mix)
        frac = jax.random.uniform(k_frac, (n_pixels, n_mix))
        frac = frac / frac.sum(axis=1, keepdims=True)
        em_eff = jnp.einsum("pm,pmx->px", frac, emis[ix_em])    # (N, nX)

        T = Ts[ix_atm] + dT * jax.random.normal(k_T, (n_pixels,))
        B = planckian(X, T).T                                   # (N, nX)
        Ls = em_eff * B + (1.0 - em_eff) * Ld[ix_atm][None, :]
        L = tau[ix_atm][None, :] * Ls + Lu[ix_atm][None, :]
        return L, T, ix_em, frac

    keys = jax.random.split(k_scene, n_atm)
    L, Ts_pix, emis_labels, mix_frac = jax.vmap(one_atmosphere)(keys, atmos_labels)
    return {
        "L": L,
        "atmos_labels": atmos_labels,
        "Ts_pix": Ts_pix,
        "emis_labels": emis_labels,
        "mix_frac": mix_frac,
    }
