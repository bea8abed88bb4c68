import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from radtxfr_tpu.utils import enable_persistent_cache
enable_persistent_cache()
from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.dist.ensemble import stack_states
from radtxfr_tpu.dist.mesh import make_mesh
from radtxfr_tpu.dist.pallas_ensemble import make_tud_ensemble_fn
from radtxfr_tpu.sensor.resolution import reduce_operator
from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
from radtxfr_tpu.lines.derived import derived_lwir_linelist
import bench

iso = IsoTables.load(dtype=jnp.float32)
atm = std_atmosphere(dtype=jnp.float32)
axis = arange_drift_free(500.0, 1500.0, 0.0025)
dlines = derived_lwir_linelist(480.0, 1520.0, dtype=jnp.float32)
lm = {"y_air": y_air_for_store(dlines)}

batch = 40
mesh = make_mesh(1, len(jax.devices()))
alts = jnp.asarray([0.061, 0.305, 1.524, 3.048, 6.096, 9.144, 12.192, 15.24, 500.0], dtype=jnp.float32)
member = bench._diverse_members(atm, 1000, jnp)
env = [atm.replace(T=atm.T - 25.0), atm.replace(T=atm.T + 25.0, vmr=atm.vmr.at[:, 0].mul(2.0))]
probe = stack_states([member(i) for i in range(batch)])
gpad, run = make_tud_ensemble_fn(dlines, iso, axis, probe, alts, mesh,
                                 atmos_class=env, n_angles=30,
                                 continuum="mt_ckd", line_mixing=lm)
n = axis.size
op = reduce_operator(np.asarray(gpad.values()[:n], dtype=np.float64), 0.25)

@jax.jit
def reduce_batch(tau, Lu, Ld):
    return (op(tau[:, :n, -1, 0].T).T, op(Lu[:, :n, -1, 0].T).T, op(Ld[:, :n].T).T)

def sync(out):
    bench._sync(out)

# warm
b = stack_states([member(i) for i in range(batch)])
out = run(b); r = reduce_batch(*out); sync(r)

for trial in range(3):
    t0 = time.perf_counter()
    b = stack_states([member(i) for i in range(batch, 2*batch)])
    t1 = time.perf_counter()
    out = run(b)
    sync(out)
    t2 = time.perf_counter()
    r = reduce_batch(*out)
    sync(r)
    t3 = time.perf_counter()
    print(f"trial {trial}: members {t1-t0:.3f}s  run(od+tud) {t2-t1:.3f}s  reduce {t3-t2:.3f}s  total {(t3-t0):.3f}s  -> {batch/(t3-t0):.2f} spectra/s")
