#!/usr/bin/env python
"""Split the flagship TUD member wall into OD vs composition (single shard)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from radtxfr_tpu.utils import enable_persistent_cache, device_sync
enable_persistent_cache()
from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.core.planck import planckian
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.products.od import make_od_pallas_local_fn
from radtxfr_tpu.products.tud import tud_from_od
from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
from radtxfr_tpu.lines.derived import derived_lwir_linelist

iso = IsoTables.load(dtype=jnp.float32)
atm = std_atmosphere(dtype=jnp.float32)
axis = arange_drift_free(500.0, 1500.0, 0.0025)
dlines = derived_lwir_linelist(480.0, 1520.0, dtype=jnp.float32)
lm = {"y_air": y_air_for_store(dlines)}
env = [atm.replace(T=atm.T - 25.0),
       atm.replace(T=atm.T + 25.0, vmr=atm.vmr.at[:, 0].mul(2.0))]
alts = jnp.asarray([0.061, 0.305, 1.524, 3.048, 6.096, 9.144, 12.192, 15.24, 500.0], dtype=jnp.float32)

local_fn, spec_data, gpad = make_od_pallas_local_fn(
    dlines, iso, axis, env, 1, continuum="mt_ckd", line_mixing=lm)
x_pad = jnp.asarray(gpad.values(np.float64), dtype=jnp.float32)

od_fn = jax.jit(lambda: local_fn(atm.T, atm.p, atm.pl, atm.vmr, spec_data, 0))

def comp(od):
    B = jnp.swapaxes(planckian(x_pad, atm.T), 0, 1).astype(od.dtype)
    t = tud_from_od(x_pad, od, B, atm.z0, alts, mu=jnp.atleast_1d(jnp.asarray(1.0)), n_angles=30)
    return t.tau, t.Lu, t.Ld
comp_fn = jax.jit(comp)

full_fn = jax.jit(lambda: comp(local_fn(atm.T, atm.p, atm.pl, atm.vmr, spec_data, 0)))

od = od_fn(); device_sync(od)
r = comp_fn(od); device_sync(r)
f = full_fn(); device_sync(f)
for name, fn, arg in [("od", od_fn, None), ("comp", comp_fn, od), ("full", full_fn, None)]:
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(arg) if arg is not None else fn()
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms")
