#!/usr/bin/env python
"""Headline benchmark: Voigt line-wavenumber evaluations/s/chip.

Workload: the north-star TUD configuration (BASELINE.json) — 66-layer 1976
US Standard Atmosphere optical-depth tensor over 500-1500 cm^-1 at
0.0025 cm^-1 (400k points) with a 20k-line synthetic HITRAN-like list,
evaluated by the bucketed Pallas Voigt kernel on one chip.

Metric: *window* evaluations per second — sum over (layer, line) of the
line's hapi wing-window length (the work the reference actually performs),
divided by steady-state wall time. The baseline is the reference engine
(hapi ``absorptionCoefficient_Voigt``, float64 serial loop) measured on this
machine's CPU: 3.62e6 window evals/s (see tools/measure_hapi_baseline.py).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# Reference (hapi) throughput measured via tools/measure_hapi_baseline.py
# on this container's CPU (single core, float64, hapi 1.1.0.7).
HAPI_BASELINE_EVALS_PER_S = 3.62e6


def main():
    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import (
        _line_species_cols,
        layer_line_params,
        make_od_pallas_fn,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32
    iso = IsoTables.load(dtype=dtype)
    atm = std_atmosphere(dtype=dtype)
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=0, dtype=dtype)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    grid = UniformGrid.from_axis(axis)

    fn = make_od_pallas_fn(lines, iso, grid, atm)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    out = fn(*args)
    out.block_until_ready()

    n_rep = 5 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    # Window evals: per (layer, line), the hapi wing-window length.
    cols = jnp.asarray(_line_species_cols(lines, atm.mol_ids))
    params = layer_line_params(lines, iso, atm, cols)
    g = axis
    nu0 = np.broadcast_to(np.asarray(params.nu0, dtype=np.float64),
                          np.asarray(params.wing).shape)
    wing = np.asarray(params.wing, dtype=np.float64)
    lo = np.searchsorted(g, (nu0 - wing).ravel(), side="right")
    hi = np.searchsorted(g, (nu0 + wing).ravel(), side="right")
    window_evals = int((hi - lo).sum())

    value = window_evals / dt
    print(json.dumps({
        "metric": "voigt_window_evals_per_s_per_chip",
        "value": value,
        "unit": "evals/s",
        "vs_baseline": value / HAPI_BASELINE_EVALS_PER_S,
    }))


if __name__ == "__main__":
    main()
