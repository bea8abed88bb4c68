#!/usr/bin/env python
"""Round-3 physics fidelity demo: derived line lists, CO2 Q-branch line
mixing, and the full continuum stack — offline.

The reference's production physics is LBLRTM with the AER line database,
MT_CKD continuum (``ICNTNM=6``) and line coupling (``ILBLF4=1``). Without
network or the 970 MB TAPE3, this framework derives the data instead:

1. the H2O+CO2+O3+N2O+CH4 LWIR line list from published spectroscopic
   constants (`lines/derived.py` — real Q-branch clustering at
   597-791 cm^-1, the O3 manifolds, N2O combs, CH4 clumps);
2. first-order Rosenkranz ``y_air`` for the CO2 Q branches from an EPG
   relaxation matrix (`kernels/linemixing_data.py`, sum rule exact);
3. the 'mt_ckd' continuum: H2O self/foreign tables + the chi-factor CO2
   far-wing term constructed from the same derived band system + O2/N2
   CIA + Rayleigh (`atmos/{continuum,far_wing}.py`).

This script composes all three into a 66-layer TUD around the 791.4
Q branch and prints what each physics switch contributes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax.numpy as jnp

from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.core.planck import planckian
from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
from radtxfr_tpu.lines.derived import derived_lwir_linelist
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.products import compute_od_layers, tud_from_od

iso = IsoTables.load()
atm = std_atmosphere()
lines = derived_lwir_linelist(690.0, 820.0)
print(f"derived lines in 690-820 cm^-1: {lines.n_lines} "
      f"(CO2 Q branches at 720.8/741.7, O3 nu2 R branch)")

X = arange_drift_free(788.0, 795.0, 0.005)
grid = jnp.asarray(X)
alts = jnp.asarray([2.0, 500.0])

y_air = y_air_for_store(lines)
print(f"line-mixing coefficients on {int((y_air != 0).sum())} CO2 lines "
      f"(EPG relaxation matrix, Sum S*Y = 0 exact)")

cases = {
    "lines only": dict(),
    "+ line mixing": dict(line_mixing={"y_air": y_air}),
    "+ continuum": dict(line_mixing={"y_air": y_air}, continuum="mt_ckd"),
}
tau = {}
for name, kw in cases.items():
    od = compute_od_layers(lines, iso, grid, atm, **kw)
    B = jnp.swapaxes(planckian(grid, atm.T), 0, 1).astype(od.dtype)
    t = tud_from_od(grid, od, B, atm.z0, alts, n_angles=12)
    tau[name] = np.asarray(t.tau[:, 0, 0])
    print(f"{name:14s}: mean ground-to-2km tau = {tau[name].mean():.4f}, "
          f"to-space {np.asarray(t.tau[:, 1, 0]).mean():.4f}")

d_mix = np.abs(tau["+ line mixing"] - tau["lines only"]).max()
d_cont = np.abs(tau["+ continuum"] - tau["+ line mixing"]).max()
print(f"line-mixing reshapes tau by up to {d_mix:.2e} around the Q branch; "
      f"the continuum (incl. the constructed CO2 far wing) removes "
      f"{d_cont:.2e} more")
