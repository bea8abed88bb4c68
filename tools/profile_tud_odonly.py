#!/usr/bin/env python
"""OD-only ensemble timing in the exact lax.map structure of the bench row."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from radtxfr_tpu.utils import enable_persistent_cache, device_sync
enable_persistent_cache()
from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.dist.ensemble import stack_states
from radtxfr_tpu.products.od import make_od_pallas_local_fn
from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
from radtxfr_tpu.lines.derived import derived_lwir_linelist
import bench

iso = IsoTables.load(dtype=jnp.float32)
atm = std_atmosphere(dtype=jnp.float32)
axis = arange_drift_free(500.0, 1500.0, 0.0025)
dlines = derived_lwir_linelist(480.0, 1520.0, dtype=jnp.float32)
lm = {"y_air": y_air_for_store(dlines)}
env = [atm.replace(T=atm.T - 25.0),
       atm.replace(T=atm.T + 25.0, vmr=atm.vmr.at[:, 0].mul(2.0))]
member = bench._diverse_members(atm, 1000, jnp)
batch = 40
b = stack_states([member(i) for i in range(batch)])

local_fn, spec_data, gpad = make_od_pallas_local_fn(
    dlines, iso, axis, env, 1, continuum="mt_ckd", line_mixing=lm)

@jax.jit
def run_od_only(T, p, pl, vmr):
    def one(args):
        T_a, p_a, pl_a, vmr_a = args
        od = local_fn(T_a, p_a, pl_a, vmr_a, spec_data, 0)
        return od[:, ::997].sum()      # tiny output, forces full od
    return jax.lax.map(one, (T, p, pl, vmr))

out = run_od_only(b.T, b.p, b.pl, b.vmr); device_sync(out)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = run_od_only(b.T, b.p, b.pl, b.vmr); device_sync(out)
    best = min(best, time.perf_counter() - t0)
print(f"od-only batch {batch}: {best:.3f}s -> {best/batch*1000:.1f} ms/member")
