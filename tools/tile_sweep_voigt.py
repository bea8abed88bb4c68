#!/usr/bin/env python
"""Knob sweep for the north-star Voigt layered-OD builder.

Mirrors bench.py's bench_voigt configuration (66-layer StdAtmos,
500-1500 cm^-1 @ 0.0025, 20k synthetic lines) and sweeps the plan knobs
the round-3 tile sweep left untouched: core/far tiles and blocks and the
layer-group merge ratio. Reports seconds per call and the max rel
deviation vs the default build.
"""
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

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
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import make_od_pallas_fn

    iso = IsoTables.load(dtype=jnp.float32)
    atm = std_atmosphere(dtype=jnp.float32)
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=0,
                            dtype=jnp.float32)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    n_rep = 5 if jax.default_backend() == "tpu" else 1

    configs = [dict()]  # default first = reference output
    if len(sys.argv) > 1 and sys.argv[1] == "r5":
        # round-5 sweep: the dimensions round 4 left untouched — the far
        # (asym) pass's line-block size, HT's winning narrow tiles, and
        # far_tile DOWN (the builder default is 2*tile)
        for fb in (32, 64, 128):
            configs.append(dict(far_block=fb))
        for tile in (128, 256):
            configs.append(dict(tile=tile))
        for ft in (512, 1024):
            configs.append(dict(far_tile=ft))
        configs += [dict(far_tile=512, far_block=64),
                    dict(far_tile=1024, far_block=64),
                    dict(tile=256, far_tile=1024, far_block=64),
                    dict(far_block=256)]
    else:
        for tile in (256, 512, 1024):
            for core_block in (8, 16, 32):
                if tile == 512 and core_block == 16:
                    continue
                configs.append(dict(tile=tile, core_block=core_block))
        for gr in (2.0, 8.0):
            configs.append(dict(group_ratio=gr))
        for ft in (1024, 2048):
            configs.append(dict(far_tile=ft))

        if len(sys.argv) > 1:   # e.g. "quick" subset
            configs = configs[: int(sys.argv[1])]

    ref = None
    for cfg in configs:
        fn = make_od_pallas_fn(lines, iso, axis, atm, **cfg)
        out = fn(*args)
        _sync(out)
        dt = _timed(lambda: fn(*args), n_rep)
        if ref is None:
            ref = np.asarray(out)
            err = 0.0
        else:
            o = np.asarray(out)
            err = float(np.max(np.abs(o - ref) / (np.abs(ref) + 1e-30)))
        print(f"{str(cfg):48s} {dt*1e3:8.1f} ms  rel_err={err:.2e}",
              flush=True)
        del fn, out


if __name__ == "__main__":
    main()
