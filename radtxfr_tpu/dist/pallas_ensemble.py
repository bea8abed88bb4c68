"""Pallas-powered sharded ensemble TUD: the production fast path.

Combines the bucketed Pallas OD engine with the (ensemble x spectrum) mesh:
one SPMD program where every device owns an (atmosphere-subset x nu-subband)
tile, runs the same static kernel plans on its local data (per-shard
line-block ranges + a global grid offset — see
:func:`radtxfr_tpu.products.od.make_od_pallas_local_fn`), and composes TUD
locally. Line-wing spill across spectral shard boundaries is handled by the
bucketing itself: line data is replicated and each shard's tile ranges
already include every line whose wing reaches the shard.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..atmos.profile import AtmosphericState
from ..core.planck import planckian
from ..products.od import make_od_pallas_local_fn
from ..products.tud import tud_from_od
from .mesh import ENSEMBLE, SPECTRUM

__all__ = ["make_tud_ensemble_fn", "tud_ensemble_pallas"]


def make_tud_ensemble_fn(
    lines,
    iso,
    grid,
    batch: AtmosphericState,
    altitudes,
    mesh,
    atmos_class: AtmosphericState | None = None,
    mu=1.0,
    n_angles: int = 30,
    quadrature: str = "uniform",
    return_od: bool = False,
    **od_opts,
):
    """Sharded ensemble TUD using the Pallas OD engine.

    ``batch`` carries a leading ensemble axis on every field; ``atmos_class``
    (default: first ensemble member) sizes the static wing plans and must
    envelope the batch's thermodynamics.

    Returns (padded_grid, run): ``run(batch) -> (tau, Lu, Ld)`` is the
    reusable jitted SPMD program; ``padded_grid`` is the exact
    :class:`UniformGrid` the outputs live on (padded up to the sharding
    alignment — slice to the original ``len(grid)``); tau/Lu are
    (B, nXp, nZs, nMu), Ld is (B, nXp).
    """
    n_spec = mesh.shape[SPECTRUM]
    n_ens = mesh.shape[ENSEMBLE]
    if batch.T.shape[0] % n_ens:
        raise ValueError(f"batch {batch.T.shape[0]} not divisible by ensemble axis {n_ens}")
    if atmos_class is None:
        # Envelope the batch: the static wing upper bounds and core-region
        # lower bounds must cover every member. [mins, maxs] alone misses
        # mixed extremes (g0 is increasing in p/vmr but DEcreasing in T, so
        # its max lives at (T_min, p_max, vmr_max), which is in neither
        # all-min nor all-max state); add both mixed corners so every
        # monotone combination is bounded.
        import numpy as _np

        mins = jax.tree.map(lambda a: jnp.asarray(_np.asarray(a).min(axis=0)), batch)
        maxs = jax.tree.map(lambda a: jnp.asarray(_np.asarray(a).max(axis=0)), batch)
        cold_dense = mins.replace(p=maxs.p, pl=maxs.pl, vmr=maxs.vmr)
        hot_thin = maxs.replace(p=mins.p, pl=mins.pl, vmr=mins.vmr)
        atmos_class = [mins, maxs, cold_dense, hot_thin]

    local_fn, spec_data, gpad = make_od_pallas_local_fn(
        lines, iso, grid, atmos_class, n_spec, **od_opts)
    n_local = gpad.n // n_spec
    x_global = gpad.values(np.float64)
    if local_fn.point_index is not None:
        # weighted partition (od_opts partition='weighted'): each shard's
        # points are a non-contiguous permutation of the global grid —
        # feed the permuted axis in, gather the outputs back to global
        # grid order on the way out (TUD is pointwise in nu, so the
        # permutation commutes with everything in between)
        flat_idx = np.asarray(local_fn.point_index).ravel()
        x_pad = jnp.asarray(x_global[flat_idx], dtype=jnp.float32)
        pos_of = np.empty(gpad.n, dtype=np.int64)
        pos_of[flat_idx] = np.arange(gpad.n)
        unpermute = jax.jit(lambda a: jnp.take(a, jnp.asarray(pos_of),
                                               axis=1))
    else:
        x_pad = jnp.asarray(x_global, dtype=jnp.float32)
        unpermute = None
    altitudes = jnp.atleast_1d(jnp.asarray(altitudes))
    mu_arr = jnp.atleast_1d(jnp.asarray(mu))

    def body(grid_loc, T, p, pl, vmr, z0, spec_local):
        k_off = jax.lax.axis_index(SPECTRUM) * n_local

        def one_atmos(args):
            T_a, p_a, pl_a, vmr_a, z0_a = args
            od = local_fn(T_a, p_a, pl_a, vmr_a, spec_local, k_off)
            B = jnp.swapaxes(planckian(grid_loc, T_a), 0, 1).astype(od.dtype)
            tud = tud_from_od(grid_loc, od, B, z0_a, altitudes, mu=mu_arr,
                              n_angles=n_angles, return_od=return_od,
                              quadrature=quadrature)
            return tud.tau, tud.Lu, tud.Ld

        return jax.lax.map(one_atmos, (T, p, pl, vmr, z0))

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(SPECTRUM),
            P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE),
            jax.tree.map(lambda _: P(SPECTRUM), spec_data),
        ),
        out_specs=(
            P(ENSEMBLE, SPECTRUM, None, None),
            P(ENSEMBLE, SPECTRUM, None, None),
            P(ENSEMBLE, SPECTRUM),
        ),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(b: AtmosphericState):
        tau, Lu, Ld = jitted(x_pad, b.T, b.p, b.pl, b.vmr, b.z0, spec_data)
        if unpermute is not None:
            tau, Lu, Ld = unpermute(tau), unpermute(Lu), unpermute(Ld)
        return tau, Lu, Ld

    return gpad, run


def tud_ensemble_pallas(lines, iso, grid, batch, altitudes, mesh, **kw):
    """One-shot convenience around :func:`make_tud_ensemble_fn`.

    For production loops build the function once and call it per batch —
    re-tracing the SPMD program costs seconds.
    """
    gpad, run = make_tud_ensemble_fn(lines, iso, grid, batch, altitudes,
                                     mesh, **kw)
    tau, Lu, Ld = run(batch)
    return gpad, tau, Lu, Ld
