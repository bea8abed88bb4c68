#!/usr/bin/env python
"""Measure the reference engine's (hapi) Voigt throughput on this CPU.

Produces the HAPI_BASELINE_EVALS_PER_S constant used by bench.py's
``vs_baseline``. The reference publishes no benchmark numbers (BASELINE.md),
so the baseline is its Python LBL engine measured on identical inputs:
``absorptionCoefficient_Voigt`` (float64, serial per-line loop,
``misc/hapi.py:11050-11138``) over a synthetic line list, counting the same
wing-window evaluations bench.py counts.
"""

import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.kernels.lineparams import compute_line_params
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.synthetic import synthetic_lines
from oracle import hapi_xsect


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="Voigt",
                    choices=["Voigt", "SDVoigt", "Lorentz", "Doppler", "HT"],
                    help="reference driver to measure (bench.py baselines: "
                         "Voigt 3.62e6, SDVoigt 1.76e6 on this container)")
    args = ap.parse_args()

    store = synthetic_lines(500, nu_min=540.0, nu_max=610.0, seed=5)
    grid = arange_drift_free(550.0, 600.0, 0.0025)

    t0 = time.perf_counter()
    hapi_xsect(store, grid, 296.0, 1.0, profile=args.profile)
    dt = time.perf_counter() - t0

    iso = IsoTables.load()
    if args.profile == "HT":
        # the HT driver has its own column-fallback wing logic
        from radtxfr_tpu.kernels.ht_driver import ht_params, resolve_ht_columns

        resolved = resolve_ht_columns(store, None, {"air": 1.0})
        prm = ht_params(resolved, store, iso, 296.0, 1.0)
        nu0 = np.asarray(store.nu0)
        wing = np.asarray(prm["wing"])
    else:
        p = compute_line_params(store, iso, 296.0, 1.0,
                                profile=args.profile.lower())
        nu0 = np.asarray(p.nu0)
        wing = np.asarray(p.wing)
    lo = np.searchsorted(grid, nu0 - wing, side="right")
    hi = np.searchsorted(grid, nu0 + wing, side="right")
    evals = int((hi - lo).sum())
    print(f"hapi {args.profile}: {dt:.2f}s, {evals} window evals, "
          f"{evals/dt:.3e} evals/s")


if __name__ == "__main__":
    main()
