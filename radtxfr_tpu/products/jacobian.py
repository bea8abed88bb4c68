"""TUD Jacobians by forward-mode autodiff.

The reference approximates Jacobians by brute force: 3*66+1 = 199 perturbed
profiles with relative step 1e-3, each a full TUD run
(``Generate_LWIR_TUD.py:55-71``). Being a JAX program end to end, the TPU
framework differentiates the physics instead: ``jax.jacfwd`` over the
(T, vmr-columns) of every layer yields machine-precision sensitivities in a
single traced computation — one of the places a TPU-native rewrite is
qualitatively better, not just faster.

Two engines: the jnp line-by-line engine (dtype-polymorphic autodiff) and
the Pallas kernel with an analytic ``jax.custom_jvp`` (tangents w.r.t.
strength/gamma_d/gamma_0/shift flow through region-consistent analytic
w-derivatives in a dedicated tangent kernel, launched separately from the
primal so the primal stays unbatched under ``jacfwd``) — so
production-resolution Jacobians run at kernel speed. In both, wing cutoffs
are held fixed at the linearization point: the hapi window mask is
piecewise-constant in (T, p), so its derivative is zero almost everywhere
and ignoring it matches the reference's finite-difference convention for
small steps.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.planck import planckian
from .od import _line_species_cols, compute_od_layer
from .tud import tud_from_od

__all__ = ["tud_with_jacobian"]


def tud_with_jacobian(
    lines,
    iso,
    grid,
    atmos,
    altitudes,
    wrt=("T", 1, 3),
    mu=1.0,
    n_angles: int = 30,
    chunk: int = 512,
    tangent_batch: int | None = None,
    engine: str = "jnp",
    continuum: str = "none",
    continuum_factors=None,
):
    """TUD products and their Jacobian w.r.t. per-layer state variables.

    Parameters
    ----------
    wrt : sequence of "T" and/or HITRAN molecule ids present in
        ``atmos.mol_ids`` — e.g. ``("T", 1, 3)`` for temperature, H2O and O3
        (the reference's Jacobian set, ``Generate_LWIR_TUD.py:55-71``).
    tangent_batch : forward-mode tangents held in flight at once (default:
        all nLayers). jacfwd memory scales with tangents x grid x layers —
        at production grids all 66 tangents can exceed HBM; 8-16 keeps the
        Jacobian streaming at a small wall-clock cost.
    engine : 'jnp' (dtype-polymorphic autodiff path) or 'pallas' — the
        bucketed kernel with its analytic custom JVP
        (:func:`radtxfr_tpu.kernels.pallas_xsect.xsect_fused_voigt_diff`),
        giving production-resolution Jacobians the fast path.

    Returns
    -------
    (tud, jac) where ``jac`` maps each entry of ``wrt`` (stringified:
    ``"T"``, ``"1"``, ...) to a pytree with
    fields tau/Lu/Ld whose arrays gain a trailing (nLayers,) axis:
    d(product)/d(state_layer).
    """
    grid = jnp.asarray(grid)
    altitudes = jnp.atleast_1d(jnp.asarray(altitudes))
    cols = jnp.asarray(_line_species_cols(lines, atmos.mol_ids))
    mol_col = {m: i for i, m in enumerate(atmos.mol_ids)}

    od_fn = None
    cont_fn = None
    if engine == "pallas":
        from .od import make_od_pallas_fn

        od_fn = make_od_pallas_fn(lines, iso, np.asarray(grid), atmos,
                                  differentiable=True, continuum=continuum,
                                  continuum_factors=continuum_factors)
    elif continuum != "none":
        from ..atmos.continuum import continuum_od

        def cont_fn(T, vmr):
            st = atmos.replace(T=T, vmr=vmr)
            return continuum_od(grid, st, model=continuum,
                                continuum_factors=continuum_factors)

    def forward(T, vmr):
        if od_fn is not None:
            od = od_fn(T, atmos.p, atmos.pl, vmr)
        else:
            def one_layer(layer):
                T_l, p_l, pl_l, vmr_l = layer
                return compute_od_layer(lines, iso, grid, T_l, p_l, pl_l,
                                        vmr_l, cols, chunk=chunk)

            od = jax.lax.map(one_layer, (T, atmos.p, atmos.pl, vmr))
            if cont_fn is not None:
                od = od + cont_fn(T, vmr).astype(od.dtype)
        B = jnp.swapaxes(planckian(grid, T), 0, 1).astype(od.dtype)
        tud = tud_from_od(grid, od, B, atmos.z0, altitudes, mu=mu,
                          n_angles=n_angles)
        return {"tau": tud.tau, "Lu": tud.Lu, "Ld": tud.Ld}

    tud = forward(atmos.T, atmos.vmr)

    n_lay = int(atmos.T.shape[0])

    def _jacfwd_batched(f, x):
        """jacfwd(f)(x) computed ``tangent_batch`` input-dims at a time."""
        if tangent_batch is None or tangent_batch >= n_lay:
            return jax.jacfwd(f)(x)
        eye = jnp.eye(n_lay, dtype=x.dtype)
        jvp_one = jax.jit(lambda v: jax.jvp(f, (x,), (v,))[1])
        parts = [jax.vmap(jvp_one)(eye[k:k + tangent_batch])
                 for k in range(0, n_lay, tangent_batch)]
        # each part: pytree with leading tangent axis; concat + move last
        return jax.tree.map(
            lambda *ps: jnp.moveaxis(jnp.concatenate(ps, axis=0), 0, -1),
            *parts)

    # Keys are normalized to STRINGS ("T", "1", "3"): a dict mixing str and
    # int keys is not a valid pytree (key sort raises), which would break
    # jax.block_until_ready / device_get / tree.map over the result.
    jac = {}
    for key in wrt:
        if key == "T":
            f = lambda T: forward(T, atmos.vmr)
            jac["T"] = _jacfwd_batched(f, atmos.T)
        else:
            c = mol_col[int(key)]

            def f(v_col, c=c):
                vmr = atmos.vmr.at[:, c].set(v_col)
                return forward(atmos.T, vmr)

            jac[str(int(key))] = _jacfwd_batched(f, atmos.vmr[:, c])
    return tud, jac
