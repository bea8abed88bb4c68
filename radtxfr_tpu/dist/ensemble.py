"""Sharded ensemble TUD production — the reference's `Generate_LWIR_TUD`
re-expressed as one pjit/shard_map program.

The reference fans 24-atmosphere batches over a 6-process pool, each worker
running 66 LBLRTM subprocesses and writing into lock-guarded shared memory
(``Generate_LWIR_TUD.py:98-150``). Here the whole ensemble is a single SPMD
computation over the 2-D (ensemble x spectrum) mesh:

* each device owns an (atmosphere-subset x nu-subband) tile of the output;
* line lists are replicated (they are small next to the spectra), so every
  spectral shard evaluates its own sub-band exactly — no halo needed at this
  sharding level (SURVEY.md §2.3 P3);
* results are already device-resident sharded arrays; host gather happens
  only at checkpoint/HDF5-export time (replacing P2's shared-memory locks).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..atmos.profile import AtmosphericState
from ..core.planck import planckian
from ..products.od import _line_species_cols, compute_od_layer
from ..products.tud import tud_from_od
from .mesh import ENSEMBLE, SPECTRUM

__all__ = ["stack_states", "tud_ensemble_sharded"]


def stack_states(states) -> AtmosphericState:
    """Stack a list of :class:`AtmosphericState` into one batched state."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def tud_ensemble_sharded(
    lines,
    iso,
    grid,
    batch: AtmosphericState,
    altitudes,
    mesh,
    mu=1.0,
    n_angles: int = 30,
    quadrature: str = "uniform",
    return_od: bool = False,
    chunk: int = 512,
    continuum: str = "none",
    continuum_factors=None,
):
    """Compute TUD for a batch of atmospheres on an (ensemble x spectrum) mesh.

    Parameters
    ----------
    batch : :class:`AtmosphericState` with a leading batch axis on every
        array field; the batch size must divide the mesh's ensemble axis and
        ``len(grid)`` must divide its spectrum axis.

    Returns
    -------
    (tau, Lu, Ld) with shapes (B, nX, nZs, nMu), (B, nX, nZs, nMu), (B, nX),
    sharded over (ensemble, spectrum).
    """
    grid = jnp.asarray(grid)
    altitudes = jnp.atleast_1d(jnp.asarray(altitudes))
    mu_arr = jnp.atleast_1d(jnp.asarray(mu))
    species_cols = jnp.asarray(_line_species_cols(lines, batch.mol_ids))

    n_spec = mesh.shape[SPECTRUM]
    n_ens = mesh.shape[ENSEMBLE]
    if grid.shape[0] % n_spec:
        raise ValueError(f"grid size {grid.shape[0]} not divisible by spectrum axis {n_spec}")
    if batch.T.shape[0] % n_ens:
        raise ValueError(f"batch {batch.T.shape[0]} not divisible by ensemble axis {n_ens}")

    def body(grid_loc, T, p, pl, vmr, z0, lines_, iso_, cols):
        def one_atmos(args):
            T_a, p_a, pl_a, vmr_a, z0_a = args

            def one_layer(layer):
                T_l, p_l, pl_l, vmr_l = layer
                return compute_od_layer(
                    lines_, iso_, grid_loc, T_l, p_l, pl_l, vmr_l, cols,
                    chunk=chunk,
                )

            od = jax.lax.map(one_layer, (T_a, p_a, pl_a, vmr_a))   # (nL, nXloc)
            if continuum != "none":
                from ..atmos.continuum import CONTINUUM_MODELS

                cfn = CONTINUUM_MODELS[continuum]
                cfac = (jnp.ones(7) if continuum_factors is None
                        else jnp.asarray(continuum_factors))
                if cfac.shape != (7,):
                    raise ValueError("continuum_factors must have 7 elements")
                one_cont = lambda T_l, p_l, pl_l, vmr_l: cfn(
                    grid_loc, T_l, p_l, vmr_l, batch.mol_ids, pl_l, cfac)
                od = od + jax.vmap(one_cont)(T_a, p_a, pl_a, vmr_a
                                             ).astype(od.dtype)
            B = jnp.swapaxes(planckian(grid_loc, T_a), 0, 1).astype(od.dtype)
            tud = tud_from_od(grid_loc, od, B, z0_a, altitudes,
                              mu=mu_arr, n_angles=n_angles, return_od=return_od,
                              quadrature=quadrature)
            return tud.tau, tud.Lu, tud.Ld

        return jax.lax.map(one_atmos, (T, p, pl, vmr, z0))

    rep = jax.tree.map(lambda _: P(), (lines, iso))
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(SPECTRUM),                      # grid
            P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE),
            rep[0], rep[1], P(),
        ),
        out_specs=(
            P(ENSEMBLE, SPECTRUM, None, None),
            P(ENSEMBLE, SPECTRUM, None, None),
            P(ENSEMBLE, SPECTRUM),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)(
        grid, batch.T, batch.p, batch.pl, batch.vmr, batch.z0,
        lines, iso, species_cols,
    )
