#!/usr/bin/env python
"""Quickstart: line store -> layered OD -> TUD -> brightness temperature.

Replaces the reference's ``compute_TUD`` pipeline
(``radiative_transfer.py:303-399``: 66 serial LBLRTM subprocess calls per
spectrum) with one traced program. The physics checks at the end mirror the
reference's commented-out ``__main__`` verification block
(``radiative_transfer.py:1353-1441``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax.numpy as jnp

from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.core.planck import brightness_temperature, planckian
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.synthetic import synthetic_lines
from radtxfr_tpu.products import compute_od_layers, tud_from_od

# Real runs: lines = parse_par("HITRAN.par", dtype=jnp.float32) — the native
# C++ parser — or lines.hapi_db.HapiDatabase(dir).load("table").
lines = synthetic_lines(2_000, nu_min=780.0, nu_max=1270.0, seed=0,
                        dtype=jnp.float32)
iso = IsoTables.load(dtype=jnp.float32)
atm = std_atmosphere(dtype=jnp.float32)          # 1976 US Standard, 66 layers
X = arange_drift_free(800.0, 1250.0, 0.01)       # LWIR window

# engine="auto": Pallas bucketed kernel on TPU, jnp engine elsewhere.
# continuum="mt_ckd" is the reference's ICNTNM=6 production physics.
od = compute_od_layers(lines, iso, jnp.asarray(X), atm, engine="auto",
                       continuum="mt_ckd")
print(f"OD tensor {od.shape}: max {float(od.max()):.2f}")

B = jnp.swapaxes(planckian(jnp.asarray(X), atm.T), 0, 1).astype(od.dtype)
tud = tud_from_od(jnp.asarray(X), od, B, atm.z0,
                  altitudes=[2.0, 500.0], n_angles=12)
tau = np.asarray(tud.tau)      # (nX, nAlt, nMu)
Lu = np.asarray(tud.Lu)
Ld = np.asarray(tud.Ld)

Tb = np.asarray(brightness_temperature(jnp.asarray(X),
                                       jnp.asarray(Lu[:, -1, 0] + 1e-12)))

# the reference's sanity checks, as assertions instead of plots
assert np.all((tau >= 0.0) & (tau <= 1.0 + 1e-6)), "transmittance range"
assert np.all(tau[:, 1, 0] <= tau[:, 0, 0] + 1e-6), \
    "tau must not increase with sensor altitude"
assert np.all(Lu >= 0.0) and np.all(Ld >= 0.0), "radiances nonnegative"
print(f"tau(2 km) mean {tau[:, 0, 0].mean():.3f}; "
      f"tau(space) mean {tau[:, 1, 0].mean():.3f}")
print(f"upwelling BT at space: {Tb[Tb > 0].min():.1f}-{Tb.max():.1f} K")
print("OK")
