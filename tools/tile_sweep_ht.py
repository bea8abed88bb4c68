#!/usr/bin/env python
"""Tile-size sweep for the two HT Pallas paths (layered OD + lattice XS).

Mirrors bench.py's bench_ht_layered / bench_ht_xs configurations exactly,
varying only the bucketing tile width, and reports seconds per call plus
max |rel delta| against the tile=512 result so a faster tile can be
promoted to the builder default only when bitwise/numerically safe.
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

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.products.od import make_ht_pallas_fn, make_od_ht_pallas_fn

    tiles = [int(t) for t in (sys.argv[1:] or [512, 256, 128, 64])]
    iso = IsoTables.load(dtype=jnp.float32)
    atm = std_atmosphere(dtype=jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    n_rep = 5 if on_tpu else 1

    # ---- layered HT (bench_ht_layered config) ----
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=2,
                            dtype=jnp.float32, sd_zero_frac=0.4)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    n = int(np.asarray(lines.nu0).size)
    rng = np.random.default_rng(5)
    ht_rows = rng.random(n) < 0.3
    extras = {"nu_HT_air": rng.uniform(0.01, 0.05, n) * ht_rows,
              "kappa_HT_air": rng.uniform(0.0, 1.0, n) * ht_rows,
              "eta_HT_air": rng.uniform(0.1, 0.3, n) * ht_rows}
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    ref = None
    print("== layered HT (make_od_ht_pallas_fn) ==")
    for t in tiles:
        fn = make_od_ht_pallas_fn(lines, iso, axis, atm, extras=extras, tile=t)
        out = fn(*args)
        _sync(out)
        dt = _timed(lambda: fn(*args), n_rep)
        if ref is None:
            ref = np.asarray(out)
            err = 0.0
        else:
            o = np.asarray(out)
            err = float(np.max(np.abs(o - ref) / (np.abs(ref) + 1e-30)))
        print(f"tile={t:4d}  {dt*1e3:8.1f} ms  rel_err_vs_first={err:.2e}")
        del fn, out

    # ---- lattice HT (bench_ht_xs config) ----
    atm_lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=2,
                                dtype=jnp.float32, sd_zero_frac=0.4)
    T_s = np.arange(275.0, 321.0, 5.0)
    p_s = np.full_like(T_s, 1.0)
    rng = np.random.default_rng(3)
    ht_rows = rng.random(n) < 0.3
    extras2 = {"nu_HT_air": rng.uniform(0.01, 0.05, n) * ht_rows,
               "kappa_HT_air": rng.uniform(0.0, 1.0, n) * ht_rows,
               "eta_HT_air": rng.uniform(0.1, 0.3, n) * ht_rows}
    Tj = jnp.asarray(T_s, dtype=jnp.float32)
    pj = jnp.asarray(p_s, dtype=jnp.float32)
    ref = None
    print("== lattice HT (make_ht_pallas_fn) ==")
    for t in tiles:
        fn = make_ht_pallas_fn(atm_lines, iso, axis, T_s, p_s, extras=extras2,
                               tile=t)
        out = fn(Tj, pj)
        _sync(out)
        dt = _timed(lambda: fn(Tj, pj), n_rep)
        if ref is None:
            ref = np.asarray(out)
            err = 0.0
        else:
            o = np.asarray(out)
            err = float(np.max(np.abs(o - ref) / (np.abs(ref) + 1e-30)))
        print(f"tile={t:4d}  {dt*1e3:8.1f} ms  rel_err_vs_first={err:.2e}")
        del fn, out


if __name__ == "__main__":
    main()
