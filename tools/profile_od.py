#!/usr/bin/env python
"""Per-call profiling of the OD Pallas decomposition on the bench workload.

For each (layer-group x wing-class [+ core]) call of make_od_pallas_fn's
static decomposition, reports:
  * measured steady-state time,
  * evaluated work (grid steps x block x tile x layers),
  * the reference window work it covers,
so the padding slop (evaluated / window) and the per-call eval rate are
visible. Run on the real TPU. Options tune the decomposition knobs.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--far-tile", type=int, default=None)
    ap.add_argument("--far-block", type=int, default=None)
    ap.add_argument("--max-groups", type=int, default=8)
    ap.add_argument("--max-classes", type=int, default=4)
    ap.add_argument("--group-ratio", type=float, default=1.6)
    ap.add_argument("--class-ratio", type=float, default=2.5)
    ap.add_argument("--n-weideman", type=int, default=16)
    ap.add_argument("--single-pass", action="store_true")
    ap.add_argument("--n-rep", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid, xsect_pallas
    from radtxfr_tpu.kernels.lineparams import compute_line_params
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import (
        _build_od_calls, _line_species_cols, species_column, PA_PER_ATM,
        make_od_pallas_fn,
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

    two_pass = not args.single_pass
    calls = _build_od_calls(
        lines, iso, atm, g, wing_abs=0.0, wing_hw=50.0,
        max_groups=args.max_groups, max_classes=args.max_classes,
        tile=args.tile, block=args.block, two_pass=two_pass,
        far_tile=args.far_tile, far_block=args.far_block,
        group_ratio=args.group_ratio, class_ratio=args.class_ratio)

    @jax.jit
    def params_fn(T, p_pa, pl, vmr):
        p_atm = p_pa / PA_PER_ATM

        def one(T_l, p_l, pl_l, vmr_l):
            u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
            return compute_line_params(
                lines, iso, T_l, p_l, vmr_self=vmr_l[cols],
                wing_abs=0.0, wing_hw=50.0, strength_scale=u[cols])

        return jax.vmap(one)(T, p_atm, pl, vmr)

    params = jax.block_until_ready(params_fn(atm.T, atm.p, atm.pl, atm.vmr))
    sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)

    # reference window work per (layer, line)
    nu0_all = np.broadcast_to(np.asarray(params.nu0, dtype=np.float64),
                              np.asarray(params.wing).shape)
    wing_all = np.asarray(params.wing, dtype=np.float64)
    ax = np.asarray(axis)
    lo = np.searchsorted(ax, (nu0_all - wing_all).ravel(), side="right")
    hi = np.searchsorted(ax, (nu0_all + wing_all).ravel(), side="right")
    win_per = (hi - lo).reshape(wing_all.shape)
    total_window = int(win_per.sum())

    total_t = 0.0
    total_eval = 0
    for ci, (lay_idx, cls_idx, plan, mode) in enumerate(calls):
        p = sub(params, lay_idx, cls_idx)
        run = lambda: xsect_pallas(plan, p, n_weideman=args.n_weideman,
                                   mode=mode, fused_layers=True)
        out = jax.block_until_ready(run())
        t0 = time.perf_counter()
        for _ in range(args.n_rep):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.n_rep
        n_lay = len(np.asarray(lay_idx))
        # evaluated work: per tile, counts[i] blocks of (block x tile) x layers
        grid_steps = int(plan.counts.sum())
        ev = grid_steps * plan.block * plan.tile * n_lay
        win = int(win_per[np.ix_(np.asarray(lay_idx), np.asarray(cls_idx))].sum())
        total_t += dt
        total_eval += ev
        print(f"call {ci}: mode={mode:5s} layers={n_lay:3d} "
              f"lines={len(np.asarray(cls_idx)):6d} tile={plan.tile:5d} "
              f"block={plan.block:4d} steps={grid_steps:7d} "
              f"t={dt*1e3:8.2f} ms  eval={ev/1e9:7.2f}G "
              f"win={win/1e9:6.2f}G slop={ev/max(win,1):5.2f} "
              f"rate={ev/dt/1e9:7.2f} Geval/s")
    print(f"TOTAL: t={total_t*1e3:.1f} ms eval={total_eval/1e9:.2f}G "
          f"window={total_window/1e9:.2f}G slop={total_eval/total_window:.2f} "
          f"window-rate={total_window/total_t/1e9:.2f} Geval/s")

    # end-to-end jitted function for comparison (includes params + adds)
    fn = make_od_pallas_fn(lines, iso, g, atm, tile=args.tile,
                           block=args.block, n_weideman=args.n_weideman,
                           two_pass=two_pass, far_tile=args.far_tile,
                           far_block=args.far_block,
                           max_groups=args.max_groups,
                           max_classes=args.max_classes,
                           group_ratio=args.group_ratio,
                           class_ratio=args.class_ratio)
    a = (atm.T, atm.p, atm.pl, atm.vmr)
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(args.n_rep):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.n_rep
    print(f"END-TO-END od_fn: {dt*1e3:.1f} ms -> "
          f"{total_window/dt/1e9:.2f} G window evals/s")


if __name__ == "__main__":
    main()
