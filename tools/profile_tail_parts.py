#!/usr/bin/env python
"""Break the full-res TUD tail into parts: planck, tau, Lu, Ld, reduce."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from radtxfr_tpu.utils import enable_persistent_cache, device_sync
enable_persistent_cache()
from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.core.planck import planckian
from radtxfr_tpu.products.tud import tud_from_od, downwelling_quadrature
from radtxfr_tpu.sensor.resolution import reduce_operator

atm = std_atmosphere(dtype=jnp.float32)
X = arange_drift_free(690.0, 1410.0, 0.0005)
n = X.size
alts = jnp.asarray([0.061, 0.305, 1.524, 3.048, 6.096, 9.144, 12.192, 15.24, 500.0], dtype=jnp.float32)
grid = jnp.asarray(X, dtype=jnp.float32)
key = jax.random.PRNGKey(0)
od = jax.random.uniform(key, (66, n), dtype=jnp.float32, minval=0.0, maxval=0.1)
op = reduce_operator(X, 0.25)

B0 = jnp.swapaxes(planckian(grid, atm.T), 0, 1).astype(jnp.float32)

f_planck = jax.jit(lambda T: jnp.swapaxes(planckian(grid, T), 0, 1).astype(jnp.float32))

def f_tau(od):
    cum = jnp.cumsum(od, axis=0)
    nb = jnp.sum(atm.z0[None, :] <= alts[:, None], axis=1)
    gi = jnp.clip(nb - 1, 0, 65)
    return jnp.exp(-cum[gi])
f_tau = jax.jit(f_tau)

def f_lu(od, B):
    def step(c, l):
        od_k, b_k = l
        t = jnp.exp(-od_k)
        c = t * c + (1.0 - t) * b_k
        return c, c
    _, states = jax.lax.scan(step, jnp.zeros((n,), jnp.float32), (od, B))
    return states[jnp.asarray([10, 20, 65])]
f_lu = jax.jit(f_lu)

sec_np, w_np = downwelling_quadrature(30, "uniform")
sec = jnp.asarray(sec_np, jnp.float32); w = jnp.asarray(w_np, jnp.float32)

def f_ld(od, B):
    def step(c, l):
        od_k, b_k = l
        t = jnp.exp(-od_k[None, :] * sec[:, None])
        return t * c + (1.0 - t) * b_k[None, :], None
    c, _ = jax.lax.scan(step, jnp.zeros((30, n), jnp.float32), (od[::-1], B[::-1]))
    return jnp.sum(c * w[:, None], axis=0)
f_ld = jax.jit(f_ld)

f_full = jax.jit(lambda od, T: tud_from_od(grid, od, jnp.swapaxes(planckian(grid, T), 0, 1).astype(od.dtype), atm.z0, alts, n_angles=30))

tau = f_tau(od)
f_red = jax.jit(lambda t: op(t.T))

def t_it(name, f, *a):
    r = f(*a); device_sync(r)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); r = f(*a); device_sync(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms")

t_it("planck (66 x 1.44M)", f_planck, atm.T)
t_it("tau (cumsum+exp 9 alts)", f_tau, od)
t_it("Lu scan (1 mu)", f_lu, od, B0)
t_it("Ld scan (30 angles)", f_ld, od, B0)
t_it("reduce op (9, 1.44M)", f_red, tau)
t_it("tud_from_od full", f_full, od, atm.T)
