#!/usr/bin/env python
"""End-product error budget: propagate the stated data-fidelity bounds to
tau/Lu/Ld (VERDICT r4 #3 / weak #4).

The engine is oracle-exact (<=2.5e-6 of peak, tools/accuracy_report.py),
but the packaged *data* are principled stand-ins with stated bounds:

* derived band/line intensities  ~+-30%   (lines/derived.py:37-41)
* H2O continuum tables           ~+-25%   (atmos/continuum.py:20-22,
                                           700-1250 window vs AER MT_CKD)
* CO2 chi-factor far wing        ~+-50%   (atmos/far_wing.py:30-31,
                                           published-constant class)
* line positions (off the CO2
  laser bands)                   ~+-0.1 cm^-1 (derived.py; laser bands
                                           bounded to <=1-10 mcm^-1 by
                                           lines/golden.py)

This tool perturbs each component by its bound through a full StdAtmos
TUD (66 layers, ground + space altitudes, 30 downwelling angles, mt_ckd
continuum + CO2 Q-branch mixing — the production physics) and reports the
resulting Delta-tau / Delta-Lu / Delta-Ld at the 0.25 cm^-1 product
resolution: the quantified product-accuracy spec that the stated data
caveats imply. Worst-case coherent perturbations (every line +30% at
once, every position +0.1 cm^-1 the same way) — real errors partially
cancel across lines, so these are upper bounds.

Writes docs/ERROR_BUDGET.md (+ prints the table). Run on the TPU chip
(pallas engine) or CPU (jnp engine, coarser default grid via --dv).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def _tud_products(lines, iso, X, atm, alts, op, factors, lm, engine,
                  n_angles):
    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.core.planck import planckian
    from radtxfr_tpu.products import compute_od_layers, tud_from_od
    from radtxfr_tpu.products.od import make_od_pallas_fn

    grid = jnp.asarray(X, dtype=jnp.float32)
    if engine == "pallas":
        fn = make_od_pallas_fn(lines, iso, X, atm, continuum="mt_ckd",
                               continuum_factors=factors, line_mixing=lm)
        od = fn(atm.T, atm.p, atm.pl, atm.vmr)
    else:
        od = compute_od_layers(lines, iso, grid, atm, engine="jnp",
                               continuum="mt_ckd",
                               continuum_factors=factors, line_mixing=lm)
    B = jnp.swapaxes(planckian(grid, atm.T), 0, 1).astype(od.dtype)
    tud = tud_from_od(grid, od, B, atm.z0, jnp.asarray(alts),
                      n_angles=n_angles)
    tau = np.asarray(op(tud.tau[:, :, 0]))
    Lu = np.asarray(op(tud.Lu[:, :, 0]))
    Ld = np.asarray(op(tud.Ld))
    return tau[:, -1], Lu[:, -1], Ld       # ground-to-space slices


def _scale_sw(lines, factor, mol=None):
    """Coherently scale line intensities (optionally one molecule)."""
    import jax.numpy as jnp

    sw = np.asarray(lines.sw, dtype=np.float64)
    if mol is None:
        keep = np.ones(sw.size, dtype=bool)
    else:
        keep = np.asarray(lines.mol_id) == mol
    new = np.where(keep, sw * factor, sw)
    out = dataclasses.replace(lines, sw=jnp.asarray(
        new, dtype=jnp.asarray(lines.sw).dtype))
    host = dict(getattr(lines, "_host", {}) or {})
    if "sw" in host:
        host["sw"] = new
    object.__setattr__(out, "_host", host)
    return out


def _shift_nu(lines, dnu):
    """Coherent worst-case position shift of every line center."""
    import jax.numpy as jnp  # noqa: F401

    nu0 = np.asarray(lines.nu0, dtype=np.float64) + dnu
    out = dataclasses.replace(lines, nu0=nu0)
    object.__setattr__(out, "_host", dict(getattr(lines, "_host", {}) or {}))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--numin", type=float, default=690.0)
    ap.add_argument("--numax", type=float, default=1410.0)
    ap.add_argument("--dv", type=float, default=None,
                    help="fine grid step (default: 2.5e-3 on TPU, 0.02 on "
                         "CPU)")
    ap.add_argument("--n-angles", type=int, default=30)
    ap.add_argument("--output", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "docs",
        "ERROR_BUDGET.md"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
    from radtxfr_tpu.lines.derived import derived_lwir_linelist
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.sensor.resolution import reduce_operator

    on_tpu = jax.default_backend() == "tpu"
    engine = "pallas" if on_tpu else "jnp"
    dv = args.dv or (0.0025 if on_tpu else 0.02)

    iso = IsoTables.load(dtype=jnp.float32)
    atm = std_atmosphere(dtype=jnp.float32)
    lines = derived_lwir_linelist(args.numin - 25, args.numax + 25,
                                  dtype=jnp.float32)
    X = arange_drift_free(args.numin, args.numax, dv)
    alts = [0.061, 500.0]
    op = reduce_operator(np.asarray(X, dtype=np.float64), 0.25)
    x_lo = np.asarray(op.x_out)
    window = (x_lo >= 800.0) & (x_lo <= 1250.0)

    lm = {"y_air": y_air_for_store(lines)}

    def products(ls, factors=None):
        return _tud_products(ls, iso, X, atm, alts, op, factors, lm,
                             engine, args.n_angles)

    print(f"baseline TUD [{engine}] {args.numin}-{args.numax} @ {dv} "
          f"({X.size} pts), mt_ckd + mixing ...", flush=True)
    base = products(lines)

    # Each case: (label, stated bound source, perturbed products)
    cases = []

    def case(label, source, ls=None, factors=None):
        print(f"perturbation: {label} ...", flush=True)
        cases.append((label, source, products(ls or lines, factors=factors)))

    case("line intensities +30% (all)", "derived.py:37-41", _scale_sw(lines, 1.30))
    case("H2O line intensities +30%", "derived.py:37-41", _scale_sw(lines, 1.30, mol=1))
    case("CO2 line intensities +30%", "derived.py:37-41", _scale_sw(lines, 1.30, mol=2))
    case("O3 line intensities +30%", "derived.py:37-41", _scale_sw(lines, 1.30, mol=3))
    case("line positions +0.1 cm^-1 (all, coherent)", "derived.py header",
         _shift_nu(lines, 0.1))
    # TAPE5 record-1.2a factor slots: [XSELF, XFRGN, XCO2C, XO3CN, XO2CN,
    # XN2CN, XRAYL] (radiative_transfer.py:591-601)
    case("H2O continuum +25% (self+foreign)", "continuum.py:20-22",
         factors=[1.25, 1.25, 1, 1, 1, 1, 1])
    case("CO2 far-wing continuum +50%", "far_wing.py:30-31",
         factors=[1, 1, 1.5, 1, 1, 1, 1])

    # --- report ----------------------------------------------------------
    hdr = ("| Perturbation (stated bound) | max Delta-tau | mean Delta-tau "
           "(window) | max Delta-Lu [uW/cm^2 sr cm] | max Delta-Ld | "
           "BT-equivalent Delta at 1000 cm^-1 [K] |")
    sep = "|---|---|---|---|---|---|"
    rows = []
    from radtxfr_tpu.core.planck import brightness_temperature

    i1000 = int(np.argmin(np.abs(x_lo - 1000.0)))
    for label, source, (tau, Lu, Ld) in cases:
        dtau = np.abs(tau - base[0])
        dLu = np.abs(Lu - base[1])
        dLd = np.abs(Ld - base[2])
        # BT impact: perturbe the ground-leaving radiance proxy at 1000/cm
        L0 = float(base[1][i1000]) + 1e-9
        bt0 = float(brightness_temperature(jnp.asarray([1000.0]),
                                           jnp.asarray([max(L0, 1e-6)]))[0])
        bt1 = float(brightness_temperature(
            jnp.asarray([1000.0]),
            jnp.asarray([max(L0 + float(dLu[i1000]), 1e-6)]))[0])
        rows.append(
            f"| {label} ({source}) | {dtau.max():.3e} | "
            f"{dtau[window].mean():.3e} | {dLu.max():.3e} | "
            f"{dLd.max():.3e} | {abs(bt1 - bt0):.3f} |")

    doc = [
        "# End-product error budget",
        "",
        "Propagation of the stated data-fidelity bounds through a full",
        f"StdAtmos TUD ({args.numin}-{args.numax} cm^-1 @ {dv}, 66 layers,",
        f"{args.n_angles} downwelling angles, mt_ckd continuum + CO2",
        "Q-branch mixing, 0.25 cm^-1 product resolution; ground-to-space",
        "tau/Lu slices). Perturbations are worst-case **coherent** (every",
        "line scaled/shifted together) — real per-line errors partially",
        "cancel, so each row is an upper bound for its stated data bound.",
        "Generated by tools/error_budget.py on backend "
        f"'{jax.default_backend()}'.",
        "",
        hdr, sep, *rows,
        "",
        "Reading the table: the engine itself contributes <=2.5e-6-of-peak",
        "(tools/accuracy_report.py); every entry above is *data* error.",
        "'window' = 800-1250 cm^-1 band mean. The BT column converts the",
        "upwelling-radiance impact at 1000 cm^-1 into an equivalent",
        "brightness-temperature error for a 296 K-class scene.",
    ]
    out = os.path.abspath(args.output)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(doc) + "\n")
    print("\n".join(doc))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
