#!/usr/bin/env python
"""Measure per-shard wall time of the spectrum-sharded production program
ON THE REAL TPU (one chip, shards run sequentially).

The CPU-mesh dryrun's balance number times Pallas in interpret mode,
whose per-block-step overhead dominates and does not follow the
op-weighted work model the 'weighted' partition optimizes (model balance
96.5% vs 88.9% measured on CPU for the production-shaped 8-shard
config). Production runs on TPU hardware, where the kernels' cost IS
op-shaped — this probe is the honest balance measurement for the pod
story.

Usage: python tools/shard_balance_probe.py [n_shards] [dx] [partition...]
"""
import sys
import time

import numpy as np


def _sync(x):
    import jax
    return float(jax.device_get(x.ravel()[0]))


def main():
    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
    from radtxfr_tpu.lines.derived import derived_lwir_linelist
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.products.od import make_od_pallas_local_fn

    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dx = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0025
    parts = sys.argv[3:] or ["equal", "weighted"]

    atm = std_atmosphere(dtype=jnp.float32)
    iso = IsoTables.load(dtype=jnp.float32)
    lines = derived_lwir_linelist(480.0, 1520.0, dtype=jnp.float32)
    lm = {"y_air": y_air_for_store(lines)}
    grid = arange_drift_free(500.0, 1500.0, dx)
    print(f"backend={jax.default_backend()} n_shards={n_shards} "
          f"grid={grid.size} lines={int(np.asarray(lines.nu0).size)}")

    for part in parts:
        loc_fn, spec_data, gpad = make_od_pallas_local_fn(
            lines, iso, grid, atm, n_shards, partition=part,
            line_mixing=lm, continuum="mt_ckd")
        loc_jit = jax.jit(loc_fn)
        times = []
        for s_i in range(n_shards):
            local_s = jax.tree.map(lambda x: x[s_i:s_i + 1], spec_data)
            args_s = (atm.T, atm.p, atm.pl, atm.vmr, local_s,
                      jnp.asarray(s_i * (gpad.n // n_shards),
                                  dtype=jnp.int32))
            _sync(loc_jit(*args_s))                     # compile + warm
            best = min(
                (lambda t0=time.perf_counter():
                 (_sync(loc_jit(*args_s)),
                  time.perf_counter() - t0)[1])()
                for _ in range(5))
            times.append(best)
        mean_t = sum(times) / len(times)
        print(f"partition={part:9s} per-shard ms: ["
              + ", ".join(f"{t*1e3:.1f}" for t in times)
              + f"] balance eff = {mean_t / max(times):.1%}")


if __name__ == "__main__":
    main()
