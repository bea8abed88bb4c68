#!/usr/bin/env python
"""Micro-benchmark: per-step cost of the fused OD kernel vs tile/block.

Reproduces the largest wing-pass call of the bench decomposition (the
lowest-altitude layer group x widest wing class) and times xsect_pallas
across (tile, block) to locate the per-step fixed cost and the compute
roofline. Run on the real TPU.
"""

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--blocks", default="32,64,128,256")
    ap.add_argument("--mode", default="asym")
    ap.add_argument("--n-rep", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid, plan_buckets, xsect_pallas
    from radtxfr_tpu.kernels.lineparams import compute_line_params
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import (
        _build_od_calls, _line_species_cols, species_column, PA_PER_ATM,
    )

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    dtype = jnp.float32
    iso = IsoTables.load(dtype=dtype)
    atm = std_atmosphere(dtype=dtype)
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=0,
                            dtype=dtype)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    g = UniformGrid.from_axis(axis)
    cols = jnp.asarray(_line_species_cols(lines, atm.mol_ids))

    calls = _build_od_calls(lines, iso, atm, g, wing_abs=0.0, wing_hw=50.0,
                            max_groups=8, tile=512,
                            two_pass=True, far_tile=None, far_block=None,
                            group_ratio=1.6)
    # largest wing-pass call by evaluated work
    best = max((c for c in calls if c[3] == "asym"),
               key=lambda c: int(c[2].counts.sum()) * c[2].block)
    lay_idx, cls_idx, plan0, mode0 = best
    print(f"target call: {len(np.asarray(lay_idx))} layers x "
          f"{len(np.asarray(cls_idx))} lines, max_wing={plan0.max_wing:.2f}")

    @jax.jit
    def params_fn(T, p_pa, pl, vmr):
        p_atm = p_pa / PA_PER_ATM

        def one(T_l, p_l, pl_l, vmr_l):
            u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
            return compute_line_params(
                lines, iso, T_l, p_l, vmr_self=vmr_l[cols],
                wing_abs=0.0, wing_hw=50.0, strength_scale=u[cols])

        return jax.vmap(one)(T, p_atm, pl, vmr)

    params = _dsync(params_fn(atm.T, atm.p, atm.pl, atm.vmr))
    p = jax.tree.map(lambda x: x[lay_idx][:, cls_idx], params)
    n_lay = len(np.asarray(lay_idx))
    nu0 = np.asarray(lines.nu0, dtype=np.float64)[np.asarray(cls_idx)]

    mode = args.mode
    for tile, block in itertools.product(
            (int(t) for t in args.tiles.split(",")),
            (int(b) for b in args.blocks.split(","))):
        plan = plan_buckets(nu0, g, plan0.max_wing, tile=tile, block=block)
        run = lambda: xsect_pallas(plan, p, n_weideman=16, mode=mode,
                                   fused_layers=True)
        out = _dsync(run())
        t0 = time.perf_counter()
        for _ in range(args.n_rep):
            out = run()
        _dsync(out)
        dt = (time.perf_counter() - t0) / args.n_rep
        steps = int(plan.counts.sum())
        ev = steps * block * tile * n_lay
        print(f"tile={tile:5d} block={block:4d} steps={steps:7d} "
              f"t={dt*1e3:8.2f} ms  us/step={dt/steps*1e6:7.1f} "
              f"eval={ev/1e9:6.2f}G rate={ev/dt/1e9:7.1f} Geval/s")


if __name__ == "__main__":
    main()
