#!/usr/bin/env python
"""Per-call timing of the OD Pallas decomposition on the bench workload.

For each (layer-group x pass) kernel call, reports the padded
eval count (grid work actually performed), wall time, and eval rate, so
optimization targets the slowest pass.
"""

import time

import numpy as np
import jax
from radtxfr_tpu.utils import device_sync as _dsync
import jax.numpy as jnp

from radtxfr_tpu.utils import enable_persistent_cache
enable_persistent_cache()

from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.kernels.pallas_xsect import UniformGrid, xsect_pallas
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.synthetic import synthetic_lines
from radtxfr_tpu.products.od import (
    _build_od_calls,
    _line_species_cols,
    compute_line_params,
    species_column,
    PA_PER_ATM,
)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--far-tile", type=int, default=None)
    ap.add_argument("--far-block", type=str, default=None)
    ap.add_argument("--core-tile", type=int, default=None)
    ap.add_argument("--core-block", type=int, default=16)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--max-groups", type=int, default=8)
    ap.add_argument("--group-ratio", type=float, default=4.0)
    ap.add_argument("--n-weideman", type=int, default=16)
    ap.add_argument("--fast-rcp", action="store_true")
    a = ap.parse_args()
    far_block = a.far_block
    if far_block is not None and far_block != "auto":
        far_block = int(far_block)
    dtype = jnp.float32
    iso = IsoTables.load(dtype=dtype)
    atm = std_atmosphere(dtype=dtype)
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=0, dtype=dtype)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    g = UniformGrid.from_axis(axis)

    calls = _build_od_calls(
        lines, iso, atm, g, wing_abs=0.0, wing_hw=50.0,
        max_groups=a.max_groups, tile=a.tile,
        two_pass=True, far_tile=a.far_tile, far_block=far_block,
        group_ratio=a.group_ratio,
        core_tile=a.core_tile, core_block=a.core_block)

    cols = jnp.asarray(_line_species_cols(lines, atm.mol_ids))
    p_atm = atm.p / PA_PER_ATM

    def one(T_l, p_l, pl_l, vmr_l):
        u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
        return compute_line_params(
            lines, iso, T_l, p_l, vmr_self=vmr_l[cols],
            wing_abs=0.0, wing_hw=50.0, strength_scale=u[cols],
        )

    params = jax.vmap(one)(atm.T, p_atm, atm.pl, atm.vmr)
    sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)

    total_t = 0.0
    total_ev = 0.0
    print(f"{'mode':8s} {'nLay':>4s} {'nLines':>6s} {'tile':>5s} {'blk':>4s} "
          f"{'mb':>4s} {'Geval(pad)':>10s} {'ms':>8s} {'Gev/s':>8s}")
    for lay_idx, cls_idx, plan, mode in calls:
        p_sub = sub(params, lay_idx, cls_idx)
        p_sub = jax.tree.map(jnp.asarray, p_sub)
        fn = jax.jit(lambda ps, plan=plan, mode=mode: xsect_pallas(
            plan, ps, n_weideman=a.n_weideman, mode=mode, fused_layers=True,
            fast_rcp=a.fast_rcp))
        out = fn(p_sub)
        _dsync(out)
        n_rep = 10
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = fn(p_sub)
        _dsync(out)
        dt = (time.perf_counter() - t0) / n_rep
        n_lay = int(lay_idx.size)
        # padded evals: sum over tiles of counts * block * tile * n_lay
        ev = float(plan.counts.astype(np.int64).sum()) * plan.block * plan.tile * n_lay
        total_t += dt
        total_ev += ev
        print(f"{mode:8s} {n_lay:4d} {int(cls_idx.size):6d} {plan.tile:5d} "
              f"{plan.block:4d} {plan.max_blocks:4d} {ev/1e9:10.2f} "
              f"{dt*1e3:8.2f} {ev/dt/1e9:8.2f}")
    print(f"TOTAL padded {total_ev/1e9:.2f} Geval  {total_t*1e3:.1f} ms  "
          f"{total_ev/total_t/1e9:.2f} Gev/s")


if __name__ == "__main__":
    main()
