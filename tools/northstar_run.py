#!/usr/bin/env python
"""North-star production run: 1000-atmosphere LWIR TUD ensemble.

BASELINE.json target: "full 500-1500 cm^-1 LWIR TUD ensemble (1000
atmospheres) generated on a v4-16 in minutes with >=80% multi-host scaling
efficiency". This script runs the whole thing on however many chips are
attached (here: one v5e), production-style: the SPMD Pallas ensemble
function built once, batches streamed through it, spectra reduced to
0.25 cm^-1, every batch checkpointed resumably.

    python tools/northstar_run.py [--n-atmos 1000] [--batch 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-atmos", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--n-lines", type=int, default=20000)
    ap.add_argument("--dv", type=float, default=0.0025)
    ap.add_argument("--dv-out", type=float, default=0.25)
    ap.add_argument("--checkpoint", default="/tmp/northstar_ck")
    ap.add_argument("--output", default="/tmp/northstar_tud.h5")
    ap.add_argument("--n-angles", type=int, default=30)
    ap.add_argument("--quadrature", default="uniform",
                    choices=["uniform", "gauss"],
                    help="downwelling rule: 'uniform' = reference parity "
                         "(30 angles); 'gauss' = double-Gauss (8 nodes "
                         "beat uniform-30)")
    ap.add_argument("--continuum", default="none",
                    help="continuum model ('mt_ckd' = the reference's "
                         "LBLRTM ICNTNM=6 production setting)")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed before building the "
                         "mesh (multi-host pods; see dist.init)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.utils import device_sync as _dsync,  enable_persistent_cache
    enable_persistent_cache()

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.dist.checkpoint import EnsembleCheckpoint, run_batched
    from radtxfr_tpu.dist.ensemble import stack_states
    from radtxfr_tpu.dist.mesh import make_mesh
    from radtxfr_tpu.dist.pallas_ensemble import make_tud_ensemble_fn
    from radtxfr_tpu.io.h5 import Var, write_h5
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.sensor.resolution import reduce_operator
    from radtxfr_tpu.utils import PhaseTimer

    if args.multihost:
        from radtxfr_tpu.dist.init import init_multihost, runtime_info

        init_multihost()
        print(f"multihost runtime: {runtime_info()}")

    n_dev = len(jax.devices())
    mesh = make_mesh(1, n_dev) if n_dev > 1 else make_mesh(1, 1)
    print(f"devices: {n_dev} ({jax.default_backend()}); mesh {dict(mesh.shape)}")

    dt32 = jnp.float32
    iso = IsoTables.load(dtype=dt32)
    base = std_atmosphere(dtype=dt32)
    lines = synthetic_lines(args.n_lines, nu_min=480.0, nu_max=1520.0,
                            seed=0, dtype=dt32)
    grid = arange_drift_free(500.0, 1500.0, args.dv)
    alts = jnp.asarray([0.061, 0.305, 1.524, 3.048, 6.096, 9.144, 12.192,
                        15.24, 500.0], dtype=dt32)  # the 9 reference altitudes

    # TIGR-style ensemble: temperature offsets + H2O/O3 scalings
    rng = np.random.default_rng(0)
    dT = rng.normal(0.0, 6.0, args.n_atmos).astype(np.float32)
    sc_h2o = rng.uniform(0.5, 1.5, args.n_atmos).astype(np.float32)
    sc_o3 = rng.uniform(0.8, 1.25, args.n_atmos).astype(np.float32)

    def member(i):
        vmr = base.vmr.at[:, 0].mul(float(sc_h2o[i]))
        vmr = vmr.at[:, 2].mul(float(sc_o3[i]))
        return base.replace(T=base.T + float(dT[i]), vmr=vmr)

    timer = PhaseTimer()
    # Envelope for the static wing plans
    env = [base.replace(T=base.T - 20.0), base.replace(T=base.T + 20.0)]
    probe = stack_states([member(i) for i in range(args.batch)])
    with timer.phase("build+compile"):
        gpad, run = make_tud_ensemble_fn(
            lines, iso, grid, probe, alts, mesh, atmos_class=env,
            n_angles=args.n_angles, quadrature=args.quadrature,
            continuum=args.continuum)
    print(f"compile: {timer.phases['build+compile']:.0f} s "
          f"(padded grid {gpad.n} points)")

    # Fused on-device 0.25 cm^-1 reduction: only n_out-length spectra ever
    # leave the chip (vs round-tripping the full 400k-point arrays to host).
    x_hi = np.asarray(gpad.values()[:grid.size], dtype=np.float64)
    op = reduce_operator(x_hi, args.dv_out)
    x_lo = op.x_out
    n = grid.size

    @jax.jit
    def reduce_batch(tau, Lu, Ld):
        return (op(tau[:, :n, -1, 0].T).T, op(Lu[:, :n, -1, 0].T).T,
                op(Ld[:, :n].T).T)

    def compute_batch(indices):
        batch = stack_states([member(int(i)) for i in indices])
        with timer.phase("tud", work_items=len(indices)):
            tau, Lu, Ld = run(batch)
            tau_lo, lu_lo, ld_lo = reduce_batch(tau, Lu, Ld)
            _dsync((tau_lo, lu_lo, ld_lo))
        with timer.phase("reduce"):
            return {"tau": np.asarray(tau_lo), "La": np.asarray(lu_lo),
                    "Ld": np.asarray(ld_lo)}

    t0 = time.time()
    ck = EnsembleCheckpoint(args.checkpoint, args.n_atmos, args.batch)
    out = run_batched(ck, compute_batch, async_io=True)
    wall = time.time() - t0
    print(timer.report())
    rate = args.n_atmos / timer.phases["tud"]
    print(f"TOTAL {wall:.0f} s wall for {args.n_atmos} atmospheres "
          f"({rate:.2f} TUD spectra/s device time, incl. host reduce: "
          f"{args.n_atmos/wall:.2f}/s)")
    write_h5(args.output, {
        "X": Var(np.asarray(x_lo), units="cm^{-1}", name="Wavenumbers"),
        "tau": Var(out["tau"].astype(np.float32), units="none",
                   name="Transmittance (TOA)"),
        "La": Var(out["La"].astype(np.float32), units="µW/(cm^2 sr cm^{-1})",
                  name="Upwelling (path) radiance (TOA)"),
        "Ld": Var(out["Ld"].astype(np.float32), units="µW/(cm^2 sr cm^{-1})",
                  name="Hemispherically averaged downwelling radiance"),
        "dT": Var(dT, units="K", name="Ground temperature offset"),
        "scale_H2O": Var(sc_h2o, units="none", name="H2O profile scale"),
        "scale_O3": Var(sc_o3, units="none", name="O3 profile scale"),
    })
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
