#!/usr/bin/env python
"""Split the full-res production member wall: OD call vs tail (comp+reduce)."""
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
from radtxfr_tpu.products.od import make_od_pallas_fn
from radtxfr_tpu.products.tud import tud_from_od
from radtxfr_tpu.sensor.resolution import reduce_operator
from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
from radtxfr_tpu.lines.derived import derived_lwir_linelist
import bench

iso = IsoTables.load(dtype=jnp.float32)
atm = std_atmosphere(dtype=jnp.float32)
lines = derived_lwir_linelist(665.0, 1435.0, dtype=jnp.float32)
lm = {"y_air": y_air_for_store(lines)}
X = arange_drift_free(690.0, 1410.0, 0.0005)
alts = jnp.asarray([0.061, 0.305, 1.524, 3.048, 6.096, 9.144, 12.192, 15.24, 500.0], dtype=jnp.float32)
member = bench._diverse_members(atm, 100, jnp)
env = [atm.replace(T=atm.T - 20.0),
       atm.replace(T=atm.T + 20.0, vmr=atm.vmr.at[:, 0].mul(2.0))]
fn = make_od_pallas_fn(lines, iso, X, env, continuum="mt_ckd", line_mixing=lm)
op = reduce_operator(X, 0.25)
grid = jnp.asarray(X, dtype=jnp.float32)

@jax.jit
def tail(od, T):
    B = jnp.swapaxes(planckian(grid, T), 0, 1).astype(od.dtype)
    tud = tud_from_od(grid, od, B, atm.z0, alts, n_angles=30)
    return op(tud.tau[:, :, 0]), op(tud.Lu[:, :, 0]), op(tud.Ld)

m = member(0)
od = fn(m.T, m.p, m.pl, m.vmr); device_sync(od)
out = tail(od, m.T); device_sync(out)
for name, f in [("od", lambda: fn(m.T, m.p, m.pl, m.vmr)),
                ("tail", lambda: tail(od, m.T))]:
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); r = f(); device_sync(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms")
# combined, as the bench runs it
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    od2 = fn(m.T, m.p, m.pl, m.vmr); r = tail(od2, m.T); device_sync(r)
    best = min(best, time.perf_counter() - t0)
print(f"member total: {best*1000:.1f} ms")

# fused: one jit for od + tail
@jax.jit
def fused(T, p, pl, vmr):
    od2 = fn(T, p, pl, vmr)
    return tail.__wrapped__(od2, T)

r = fused(m.T, m.p, m.pl, m.vmr); device_sync(r)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter(); r = fused(m.T, m.p, m.pl, m.vmr); device_sync(r)
    best = min(best, time.perf_counter() - t0)
print(f"fused member: {best*1000:.1f} ms")
