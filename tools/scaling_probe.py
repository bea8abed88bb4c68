#!/usr/bin/env python
"""Spectral-shard scaling probe: static work balance + SPMD equivalence.

Two things multi-chip scaling depends on that CAN be validated without a
pod (BASELINE north star: >=80% multi-host scaling efficiency on a v4-16):

1. **Static work balance.** The OD kernel's work is fixed at trace time by
   the bucket plans; per-shard padded evals are exactly computable on the
   host. Line density varies by orders of magnitude across a band, so the
   balance of the spectrum-sharded plans upper-bounds achievable scaling
   efficiency (collectives for the TUD reductions ride ICI and are tiny by
   comparison: one psum of a few reduced spectra per member). This probe
   prints, per shard count, the max/mean padded-work imbalance and the
   implied efficiency bound.

2. **SPMD equivalence.** On a virtual 8-device CPU mesh, the sharded
   ensemble TUD must produce the same numbers as the unsharded path — run
   separately in the test suite (`tests/test_dist.py`); this probe focuses
   on the balance numbers, which do not need any device at all.

    python tools/scaling_probe.py [--n-lines 20000] [--shards 2 4 8 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-lines", type=int, default=20000)
    ap.add_argument("--dv", type=float, default=0.0025)
    ap.add_argument("--shards", type=int, nargs="+", default=[2, 4, 8, 16])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import _build_od_calls

    dt = jnp.float32
    iso = IsoTables.load(dtype=dt)
    atm = std_atmosphere(dtype=dt)
    lines = synthetic_lines(args.n_lines, nu_min=480.0, nu_max=1520.0,
                            seed=0, dtype=dt)
    axis = arange_drift_free(500.0, 1500.0, args.dv)
    env = [atm.replace(T=atm.T - 20.0), atm.replace(T=atm.T + 20.0)]

    results = []
    print(f"{'shards':>6s} {'work/shard (Geval)':>22s} {'max/mean':>9s} "
          f"{'efficiency bound':>17s}")
    for n_shards in args.shards:
        align = 1024 * n_shards
        n_pad = -(-axis.size // align) * align
        g = UniformGrid(x0=float(axis[0]),
                        dx=float((axis[-1] - axis[0]) / (axis.size - 1)),
                        n=n_pad)
        calls = _build_od_calls(
            lines, iso, env, g, wing_abs=0.0, wing_hw=50.0, max_groups=8,
            tile=512, two_pass=True, far_tile=None,
            far_block=None, group_ratio=1.6)
        n_local = n_pad // n_shards
        work = np.zeros(n_shards, dtype=np.float64)
        for lay_idx, _, plan, _mode in calls:
            tiles_per_shard = n_local // plan.tile
            n_lay = int(np.asarray(lay_idx).size)
            cnt = np.asarray(plan.counts, dtype=np.float64)
            per_tile = cnt * plan.block * plan.tile * n_lay
            for s in range(n_shards):
                work[s] += per_tile[s * tiles_per_shard:(s + 1) * tiles_per_shard].sum()
        imb = work.max() / work.mean()
        print(f"{n_shards:6d} {work.mean() / 1e9:13.2f} (mean) "
              f"{imb:9.3f} {1.0 / imb:16.1%}")
        results.append({"n_shards": n_shards,
                        "mean_evals_per_shard": float(work.mean()),
                        "max_over_mean": float(imb),
                        "efficiency_bound": float(1.0 / imb)})

    import json

    artifact = {
        "workload": {"n_lines": args.n_lines, "dv": args.dv,
                     "band": [500.0, 1500.0], "layers": 66,
                     "wing_hw": 50.0, "two_pass": True},
        "results": results,
        "caveats": "Static padded-work balance only: an UPPER bound on "
                   "spectrum-shard scaling efficiency. It ignores per-call "
                   "kernel-launch overhead asymmetry across shards (shards "
                   "with fewer line blocks still pay every grid step) and "
                   "the (small) TUD psum collectives; measured multi-chip "
                   "efficiency will be below this bound.",
    }
    out = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
