#!/usr/bin/env python
"""Time a single OD kernel call (core or widest asym class) at a given
tile/block — one Pallas compile per invocation, for fast config sweeps."""

import argparse
import time

import numpy as np
import jax
from radtxfr_tpu.utils import device_sync as _dsync
import jax.numpy as jnp

from radtxfr_tpu.utils import enable_persistent_cache
enable_persistent_cache()

from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.kernels.pallas_xsect import UniformGrid, plan_buckets, xsect_pallas
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.synthetic import synthetic_lines
from radtxfr_tpu.products.od import (
    PA_PER_ATM,
    _line_species_cols,
    compute_line_params,
    core_wing_bound,
    species_column,
    wing_bound_matrix,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["core", "asym"])
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--n-lay", type=int, default=66)
    ap.add_argument("--n-weideman", type=int, default=16)
    ap.add_argument("--fast-rcp", action="store_true")
    a = ap.parse_args()

    dtype = jnp.float32
    iso = IsoTables.load(dtype=dtype)
    atm = std_atmosphere(dtype=dtype)
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=0, dtype=dtype)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    g = UniformGrid.from_axis(axis)
    nu0 = np.asarray(lines.nu0, dtype=np.float64)

    cols = jnp.asarray(_line_species_cols(lines, atm.mol_ids))
    p_atm = atm.p / PA_PER_ATM

    def one(T_l, p_l, pl_l, vmr_l):
        u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
        return compute_line_params(
            lines, iso, T_l, p_l, vmr_self=vmr_l[cols],
            wing_abs=0.0, wing_hw=50.0, strength_scale=u[cols],
        )

    params = jax.vmap(one)(atm.T, p_atm, atm.pl, atm.vmr)

    if a.mode == "core":
        w = core_wing_bound(lines, iso, atm)
        lay_idx = np.arange(66)[: a.n_lay]
        cls_idx = np.arange(nu0.size)
    else:
        # Widest-wing layer group x densest line class approximation:
        # first n_lay layers (ground) and all lines, wing = group max.
        W = wing_bound_matrix(lines, iso, atm)
        order = np.argsort(W.max(axis=1))[::-1]
        lay_idx = np.sort(order[: a.n_lay])
        w = float(W[lay_idx].max())
        cls_idx = np.arange(nu0.size)

    plan = plan_buckets(nu0[cls_idx], g, w, tile=a.tile, block=a.block)
    sub = jax.tree.map(lambda x: x[lay_idx][:, cls_idx], params)
    fn = jax.jit(lambda ps: xsect_pallas(
        plan, ps, n_weideman=a.n_weideman, mode=a.mode, fused_layers=True,
        fast_rcp=a.fast_rcp))
    out = fn(sub)
    _dsync(out)
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(sub)
    _dsync(out)
    dt = (time.perf_counter() - t0) / n_rep
    ev = float(plan.counts.astype(np.int64).sum()) * plan.block * plan.tile * len(lay_idx)
    print(f"{a.mode} tile={a.tile} block={a.block} nlay={len(lay_idx)} "
          f"mb={plan.max_blocks} wing={w:.4f} padded={ev/1e9:.2f}G "
          f"{dt*1e3:.2f}ms {ev/dt/1e9:.2f} Gev/s")


if __name__ == "__main__":
    main()
