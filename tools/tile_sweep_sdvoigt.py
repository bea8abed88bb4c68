#!/usr/bin/env python
"""Knob sweep for the SD-Voigt XS-lattice builder (bench metric 4).

Mirrors bench.py's bench_sdvoigt_xs configuration (30k lines, 400-7100
@ 0.0025 = 2.68M points, 350 cm^-1 wings, 10-state lattice, coarse-far
auto) and sweeps tile / coarse_r / near_width. Reports seconds per call
and the max rel deviation (normalized by the per-state peak, the same
yardstick the coarse-far accuracy tests use) vs the current default.
"""
import sys
import time

import numpy as np


def _sync(out):
    import jax
    while isinstance(out, (tuple, list)):
        out = out[0]
    if hasattr(out, "ravel"):
        out = out.ravel()[0]
    return float(jax.device_get(out))


def _timed(fn, n_rep):
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import make_xsect_pallas_fn

    iso = IsoTables.load(dtype=jnp.float32)
    wing_abs = 350.0
    lines = synthetic_lines(30_000, nu_min=400.0, nu_max=7100.0, seed=1,
                            dtype=jnp.float32, sd_zero_frac=0.25)
    axis = arange_drift_free(400.0, 7100.0, 0.0025)
    T_s = np.arange(275.0, 321.0, 5.0)
    p_s = np.full_like(T_s, 1.0)
    Tj = jnp.asarray(T_s, dtype=jnp.float32)
    pj = jnp.asarray(p_s, dtype=jnp.float32)
    n_rep = 3 if jax.default_backend() == "tpu" else 1

    configs = [dict(tile=8192)]  # bench default first = reference output
    for t in (4096, 16384):
        configs.append(dict(tile=t))
    for r in (32, 128, 256):
        configs.append(dict(tile=8192, coarse_r=r))
    configs.append(dict(tile=8192, near_width=2.0))
    configs.append(dict(tile=8192, near_width=8.0))
    if len(sys.argv) > 1:
        configs = configs[: int(sys.argv[1])]

    ref = peak = None
    for cfg in configs:
        fn = make_xsect_pallas_fn(lines, iso, axis, T_s, p_s,
                                  profile="sdvoigt", wing_abs=wing_abs,
                                  **cfg)
        out = fn(Tj, pj)
        _sync(out)
        dt = _timed(lambda: fn(Tj, pj), n_rep)
        o = np.asarray(out)
        if ref is None:
            ref, peak = o, np.max(np.abs(o), axis=1, keepdims=True)
            err = 0.0
        else:
            err = float(np.max(np.abs(o - ref) / peak))
        print(f"{str(cfg):44s} {dt*1e3:8.1f} ms  err_of_peak={err:.2e}",
              flush=True)
        del fn, out, o


if __name__ == "__main__":
    main()
