#!/usr/bin/env python
"""The hapi-named drop-in API against a local ``.par`` table.

Everything below is spelled exactly like the reference's hapi tutorial
(``misc/hapi.py``) — ``db_begin``/``select``/``absorptionCoefficient_*``/
slit functions — but computed by the TPU engine (float64 on CPU for
drop-in numerical parity; the Pallas float32 fast paths live on the
native API, see example 04).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# the drop-in surface is float64 like hapi itself; run it on the CPU
# backend (the native float32 Pallas fast paths are example 04's topic)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np

import radtxfr_tpu.hapi_compat as hapi
from radtxfr_tpu.lines.hapi_db import save_table
from radtxfr_tpu.lines.synthetic import synthetic_lines

workdir = tempfile.mkdtemp(prefix="hapi_demo_")
save_table(synthetic_lines(300, 1000.0, 1100.0, seed=11), workdir, "demo")

hapi.db_begin(workdir)              # directory-as-database, like hapi
print("tables:", hapi.tableList())
hapi.describeTable("demo")

# condition DSL (reference misc/hapi.py select/filter machinery)
hapi.select("demo", DestinationTableName="strong",
            Conditions=("AND", (">=", "sw", 1e-22),
                        ("between", "nu", 1020.0, 1080.0)))
print("strong lines:", len(hapi.getColumn("strong", "nu")))

# all five absorption drivers, hapi defaults (HITRAN units, 50-HW wings)
env = {"T": 296.0, "p": 0.95}
kw = dict(SourceTables="demo", Environment=env,
          WavenumberRange=(1010.0, 1090.0), WavenumberStep=0.01)
nu, k_v = hapi.absorptionCoefficient_Voigt(**kw)
_, k_sd = hapi.absorptionCoefficient_SDVoigt(**kw)
_, k_l = hapi.absorptionCoefficient_Lorentz(**kw)
_, k_d = hapi.absorptionCoefficient_Doppler(**kw)
_, k_ht = hapi.absorptionCoefficient_HT(**kw)
print(f"Voigt max {k_v.max():.3e} cm^2/molec; "
      f"SDVoigt/HT deltas {abs(k_sd - k_v).max():.2e} / "
      f"{abs(k_ht - k_v).max():.2e}")

# radiance + slit convolution (reference absorptionSpectrum /
# radianceSpectrum / convolveSpectrum) — these take the coefficient in
# cm^-1, i.e. HITRAN_units=False, exactly as in the hapi tutorial
nu, k_cm = hapi.absorptionCoefficient_Voigt(HITRAN_units=False, **kw)
nu_r, rad = hapi.radianceSpectrum(nu, k_cm,
                                  Environment={"T": 296.0, "l": 100.0})
nu_c, rad_c, _, _, _ = hapi.convolveSpectrum(nu_r, rad, Resolution=0.5,
                                             SlitFunction=hapi.SLIT_TRIANGULAR)
print(f"radiance {rad.max():.4g} -> convolved {rad_c.max():.4g} "
      f"on {nu_c.size} points")
print("OK")
