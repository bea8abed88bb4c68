#!/usr/bin/env python
"""End-to-end verification drive: full pipeline through public exports on TPU.

See .claude/skills/verify/SKILL.md. Prints END-TO-END OK on success.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from radtxfr_tpu.utils import device_sync as _dsync

from radtxfr_tpu.utils import enable_persistent_cache
enable_persistent_cache()
print("backend devices:", jax.devices())
from radtxfr_tpu import planckian, brightness_temperature, make_spectral_axis
from radtxfr_tpu.lines import synthetic_lines, IsoTables
from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.products import compute_od_layers, tud_from_od, apparent_radiance
from radtxfr_tpu.sensor.ils import ils_mako

dt = jnp.float32
atm = std_atmosphere(dtype=dt)
iso = IsoTables.load(dtype=dt)
lines = synthetic_lines(2000, nu_min=650, nu_max=1450, seed=0, dtype=dt)
grid = jnp.asarray(make_spectral_axis(690.0, 1410.0, 0.05), dtype=dt)
print(f"grid {grid.shape[0]} pts, {lines.n_lines} lines, {atm.n_layers} layers")

t0 = time.time()
engine = "pallas" if jax.default_backend() == "tpu" else "jnp"
od = compute_od_layers(lines, iso, grid, atm, engine=engine,
                       pallas_opts=dict(max_groups=2))
od = jnp.asarray(od)
_dsync(od)
print(f"OD tensor {od.shape} ({engine}) in {time.time()-t0:.1f}s; max={float(od.max()):.3f}")

B = jnp.swapaxes(planckian(grid, atm.T), 0, 1).astype(dt)
alts = jnp.asarray([0.061, 2.0, 10.0, 500.0], dtype=dt)
tud = tud_from_od(grid, od, B, atm.z0, alts, mu=1.0, n_angles=30)
tau, Lu, Ld = np.asarray(tud.tau), np.asarray(tud.Lu), np.asarray(tud.Ld)
assert (tau >= 0).all() and (tau <= 1.0 + 1e-6).all()
assert (Lu >= 0).all() and (Ld >= 0).all()
assert (tau[:, 3, 0] <= tau[:, 0, 0] + 1e-6).all()

emis = jnp.ones((grid.shape[0], 2), dtype=dt) * jnp.asarray([0.95, 0.7], dtype=dt)
L = apparent_radiance(grid, emis, jnp.asarray([296.0], dtype=dt),
                      tau[:, 3:4, 0], Lu[:, 3:4, 0], Ld[:, None])
Tb = np.asarray(brightness_temperature(grid, L[:, 0, 0]))
assert 150 < np.nanmin(Tb) and np.nanmax(Tb) < 400
x_mako, L_mako = ils_mako(np.asarray(grid, dtype=np.float64), L[:, :, 0])
assert x_mako.shape[0] == 128

# resolution reduction (compat-style pipeline step)
from radtxfr_tpu.sensor.resolution import reduce_resolution
x_lo, tau_lo = reduce_resolution(np.asarray(grid, dtype=np.float64), tau[:, 3, 0], 0.25)
assert x_lo.size < grid.shape[0] and np.isfinite(np.asarray(tau_lo)).all()

# compat drop-in surface (reference-named API)
import radtxfr_tpu.compat as rt
X_c, od_c = rt.compute_OD(800.0, 805.0, lines=lines.select_band(790, 815), iso=iso,
                          DVOUT=0.01, T=280.0, P=90000.0, PL=0.5,
                          MF_ID=np.array([1, 2, 3]),
                          MF_VAL=np.array([7000.0, 380.0, 0.03]))
assert (od_c >= 0).all()

# SDVoigt profile path
from radtxfr_tpu.kernels.lineparams import compute_line_params
from radtxfr_tpu.kernels.xsect import xsect_from_params
sd_params = compute_line_params(lines.select_band(800, 810), iso, 280.0, 0.9,
                                profile="sdvoigt")
k_sd = xsect_from_params(jnp.asarray(X_c, dtype=dt), sd_params, profile="sdvoigt")
assert np.isfinite(np.asarray(k_sd)).all()

# scene: emissivity DB -> HSI cube on the freshly computed TUD
from radtxfr_tpu.scene import synthetic_db, hsi_generate
db = synthetic_db(16, X=np.asarray(grid, dtype=np.float64))
hsi = hsi_generate(jax.random.key(0), grid, tau[None, :, 3, 0], Lu[None, :, 3, 0],
                   Ld[None, :], jnp.asarray([296.0]), db.emis,
                   n_pixels=8, n_emis=4, n_mix=2, n_atm=2)
assert np.isfinite(np.asarray(hsi["L"])).all() and (np.asarray(hsi["L"]) > 0).all()

# io: HDF5 with units metadata + MBI cube round trip
import tempfile, os
from radtxfr_tpu.io import Var, write_h5, read_h5, mbi_export, mbi_read
with tempfile.TemporaryDirectory() as td:
    write_h5(os.path.join(td, "t.h5"),
             {"X": Var(np.asarray(grid), units="cm^{-1}"), "tau": Var(tau)})
    assert read_h5(os.path.join(td, "t.h5"))["X"].units == "cm^{-1}"
    mbi_export(os.path.join(td, "c.bip"), np.asarray(hsi["L"][0]).T[None, :, :])
    back = mbi_read(os.path.join(td, "c.bip"))[0]
    assert back.shape[0] == 1

bt_bad = np.asarray(brightness_temperature(np.array([1000.0]), np.array([-5.0])))
assert np.isnan(bt_bad).all()
try:
    bad = synthetic_lines(10, species=((9, 1),), seed=1)
    compute_od_layers(bad, iso, grid, atm)
    raise SystemExit("PROBE-FAIL: no error for missing molecule")
except ValueError as e:
    print("probe ok:", e)
print(f"TOTAL {time.time()-t0:.1f}s  -- END-TO-END OK")
