#!/usr/bin/env python
"""Verification report: TPU engines vs the reference's own float64 engine.

Prints one table of max errors (relative to the spectrum peak) for every
line-shape driver, the Pallas OD path, and the TUD composition, using
vendored hapi (``/root/reference/misc/hapi.py``) as the float64 CPU oracle —
the same oracle the test suite asserts against (BASELINE.json correctness
criterion: allclose on the 1976 US Standard Atmosphere).

    python tools/accuracy_report.py                # CPU x64 (all components)
    python tools/accuracy_report.py --backend tpu  # real-chip f32 Pallas rows
                                                   # (oracle stays host f64)

The CPU run exercises every component at float64; the TPU run is the
real-hardware check the CPU suite cannot see (Mosaic codegen, fast
reciprocal, matmul precision) — it reports only the float32 engine rows.
"""

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, os.path.join(_HERE, "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
    args = ap.parse_args()
    on_tpu = args.backend == "tpu"

    import jax

    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")  # oracle comparisons: x64
        jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp

    from oracle import hapi_xsect, load_hapi
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.core.planck import planckian
    from radtxfr_tpu.kernels.lineparams import compute_line_params
    from radtxfr_tpu.kernels.xsect import xsect_from_params
    from radtxfr_tpu.kernels.ht_driver import xsect_ht
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products import species_column, tud_from_od
    from radtxfr_tpu.products.od import make_od_pallas_fn

    rows = []

    def row(component, config, err):
        rows.append((component, config, err))
        print(f"{component:<38s} {config:<34s} {err:9.2e}")

    print(f"{'component':<38s} {'config':<34s} {'max|err|/peak':>9s}")
    print("-" * 86)

    # ---------------- per-driver cross-sections (float64 engine) ----------
    hapi = load_hapi()
    iso = IsoTables.load()
    lines = synthetic_lines(60, 990.0, 1030.0, seed=7)
    grid = arange_drift_free(1000.0, 1020.0, 0.01)
    T, p_atm = 296.0, 0.95
    dil = {"air": 0.9, "self": 0.1}
    cfg = "60 lines, 1000-1020 @ 0.01"

    for profile in () if on_tpu else ("Voigt", "SDVoigt", "Lorentz", "Doppler"):
        _, k_ref = hapi_xsect(lines, grid, T, p_atm, diluent=dil,
                              profile=profile)
        params = compute_line_params(
            lines, iso, T, p_atm, vmr_self=dil["self"],
            profile=profile.lower())
        k = np.asarray(xsect_from_params(jnp.asarray(grid), params,
                                         profile=profile.lower()))
        row(f"xsect {profile} (jnp f64)", cfg,
            np.abs(k - k_ref).max() / np.abs(k_ref).max())

    if not on_tpu:
        _, k_ref = hapi_xsect(lines, grid, T, p_atm, diluent=dil, profile="HT")
        k = xsect_ht(jnp.asarray(grid), lines, iso, T, p_atm, diluent=dil)
        row("xsect HT (jnp f64)", cfg,
            np.abs(np.asarray(k) - k_ref).max() / np.abs(k_ref).max())

    # ---------------- Pallas OD float32 vs hapi f64 layer OD --------------
    lines_p = synthetic_lines(300, nu_min=795.0, nu_max=835.0, seed=101)
    axis = arange_drift_free(800.0, 830.0, 0.0025)
    atm = std_atmosphere()
    layer_ids = [0, 20, 45]
    sub = jax.tree.map(
        lambda a: a[np.asarray(layer_ids)]
        if hasattr(a, "shape") and a.ndim else a, atm)
    mol_col = {m: i for i, m in enumerate(atm.mol_ids)}
    want = np.zeros((len(layer_ids), axis.size))
    for r, l in enumerate(layer_ids):
        Tl = float(atm.T[l]); p_pa = float(atm.p[l]); pl = float(atm.pl[l])
        for m in np.unique(np.asarray(lines_p.mol_id)):
            x = float(atm.vmr[l, mol_col[int(m)]])
            _, k = hapi_xsect(lines_p.select_molecules([int(m)]), axis, Tl,
                              p_pa / 101325.0,
                              diluent={"air": 1.0 - x, "self": x})
            want[r] += k * float(species_column(p_pa, Tl, pl, x))

    iso32 = IsoTables.load(dtype=jnp.float32)
    atm32 = jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32)
                         if hasattr(a, "dtype") and a.dtype.kind == "f" else a,
                         sub)
    fn = make_od_pallas_fn(lines_p, iso32, axis, atm32)
    got = np.asarray(fn(atm32.T, atm32.p, atm32.pl, atm32.vmr))
    cfg_p = "300 lines, 3 layers @ 0.0025"
    eng = f"Pallas f32, {jax.default_backend()}"

    # The hapi wing rule cuts each line hard at nu0 +- wing: a step
    # discontinuity, so ~1e-8 input rounding (f32 gammas -> f32 wing) flips
    # whole wing-edge values at isolated grid points. Those flips measure
    # the RULE's sensitivity, not engine accuracy — mask points within one
    # grid step of any line's window edge and report both numbers.
    from radtxfr_tpu.kernels.lineparams import compute_line_params as _clp

    edge_free = []
    for r, l in enumerate(layer_ids):
        mask = np.ones(axis.size, dtype=bool)
        for m in np.unique(np.asarray(lines_p.mol_id)):
            mol_lines = lines_p.select_molecules([int(m)])
            x = float(atm.vmr[l, mol_col[int(m)]])
            pr = _clp(mol_lines, IsoTables.load(), float(atm.T[l]),
                      float(atm.p[l]) / 101325.0, vmr_self=x)
            nu_c = (np.asarray(mol_lines.nu0, dtype=np.float64)
                    + np.asarray(pr.shift0, dtype=np.float64))
            wing_r = np.asarray(pr.wing, dtype=np.float64)
            for edge in (nu_c - wing_r, nu_c + wing_r):
                k = np.searchsorted(axis, edge)
                for off in (-2, -1, 0, 1, 2):
                    kk = np.clip(k + off, 0, axis.size - 1)
                    mask[kk] = False
        edge_free.append(mask)

    row(f"layer OD ({eng}, incl. wing-edge flips)", cfg_p,
        max(np.abs(got[r] - want[r]).max() / np.abs(want[r]).max()
            for r in range(len(layer_ids))))
    row(f"layer OD ({eng}, edge-masked)", cfg_p,
        max(np.abs((got[r] - want[r])[edge_free[r]]).max()
            / np.abs(want[r]).max() for r in range(len(layer_ids))))
    row(f"layer transmittance ({eng}, edge-masked)", cfg_p,
        max(np.abs((np.exp(-got[r]) - np.exp(-want[r]))[edge_free[r]]).max()
            / np.abs(np.exp(-want[r])).max()
            for r in range(len(layer_ids))))

    # ---------------- SD-Voigt Pallas production path ---------------------
    if not on_tpu:
        from radtxfr_tpu.products import compute_od_layers

        want_sd = np.asarray(compute_od_layers(
            lines_p, IsoTables.load(), jnp.asarray(axis), sub,
            profile="sdvoigt"))
        fn_sd = make_od_pallas_fn(lines_p, iso32, axis, atm32,
                                  profile="sdvoigt")
        got_sd = np.asarray(fn_sd(atm32.T, atm32.p, atm32.pl, atm32.vmr))
        row("layer OD SD-Voigt (Pallas f32 vs f64)", cfg_p,
            max(np.abs(got_sd[r] - want_sd[r]).max()
                / np.abs(want_sd[r]).max() for r in range(len(layer_ids))))

        # ------------ continuum anchors (published 296 K values) ----------
        from radtxfr_tpu.atmos.continuum import continuum_od
        from radtxfr_tpu.atmos.profile import AtmosphericState
        from radtxfr_tpu.core.constants import BARYE_PER_ATM, K_BOLTZMANN_CGS

        one_l = AtmosphericState(
            z0=jnp.zeros(1), z1=jnp.ones(1), pl=jnp.ones(1),
            p=jnp.asarray([101325.0]), T=jnp.asarray([296.0]),
            vmr=jnp.asarray([[0.01, 4e-4, 3e-8]]), mol_ids=(1, 2, 3))
        od_c = np.asarray(continuum_od(
            jnp.asarray([944.0, 1000.0]), one_l, model="mt_ckd",
            continuum_factors=[1, 0, 0, 0, 0, 0, 0]))[0]
        n_h2o = 0.01 * BARYE_PER_ATM / (K_BOLTZMANN_CGS * 296.0)
        cs = od_c / (n_h2o * 0.01 * 1e5)
        anchors = np.array([2.0e-22, 1.55e-22])  # Burch & Alt 1984 / CKD
        row("H2O self continuum vs published", "944 & 1000 cm^-1, 296 K",
            np.abs(cs / anchors - 1.0).max())

        # ------------ held-out continuum checks (VERDICT r3 #4) -----------
        # (a) non-anchor LWIR frequencies against the INDEPENDENT Roberts
        # et al. (1976) closed form (a + b exp(-beta nu), published
        # constants — not used to build the table): makes the stated
        # ~10-25% table uncertainty a measured number.
        from radtxfr_tpu.atmos.continuum import (H2O_CONTINUUM_LWIR,
                                                 _interp_log)

        nu_ho = np.array([820.0, 1075.0, 1175.0])   # between anchors
        cs_tab = np.asarray(_interp_log(jnp.asarray(nu_ho),
                                        H2O_CONTINUUM_LWIR.nu,
                                        H2O_CONTINUUM_LWIR.cs296))
        g_per_molec = 18.015 / 6.02214076e23
        cs_rob = (4.18 + 5578.0 * np.exp(-7.87e-3 * nu_ho)) * g_per_molec
        row("H2O self continuum vs Roberts'76 held-out [data]",
            "820/1075/1175 cm^-1 (non-anchor)",
            np.abs(cs_tab / cs_rob - 1.0).max())
        # (b) the 4 um window value vs the published measurement band
        # (MT_CKD 3.x ~2e-24 ... CAVIAR/Burch ~1.2e-23 at 2500 cm^-1):
        # deviation from the geometric center of the published band
        cs25 = float(np.asarray(_interp_log(jnp.asarray([2500.0]),
                                            H2O_CONTINUUM_LWIR.nu,
                                            H2O_CONTINUUM_LWIR.cs296))[0])
        center = np.sqrt(2.0e-24 * 1.2e-23)
        row("H2O self continuum 4um window vs published [data]",
            "2500 cm^-1 (MT_CKD..CAVIAR span)", abs(cs25 / center - 1.0))

        # ------------ golden CO2 laser lines (external positions) ---------
        from radtxfr_tpu.lines.golden import match_golden_positions

        nu_obs, nu_model, _lbl = match_golden_positions()
        row("derived CO2 positions vs laser stds [data, cm^-1]",
            f"{nu_obs.size} heterodyne-std lines (golden.py)",
            float(np.abs(nu_model - nu_obs).max()))

        # ------------ band-integrated intensities vs literature anchors ---
        # (round-5 ask #3; see LITERATURE_BAND_INTENSITIES honesty note:
        # anchors are the same literature class the derived totals used,
        # so this validates normalization/transcription consistency; the
        # stated anchor confidence is what tools/error_budget.py
        # propagates to tau/Lu/Ld)
        from radtxfr_tpu.lines.golden import band_intensity_residuals

        for label, s_mod, s_ref, resid, conf in band_intensity_residuals():
            row(f"band intensity: {label} [data, frac of anchor "
                f"(conf ±{conf:.0%})]",
                "derived-list window integral vs literature anchor",
                abs(resid))

        # ------------ Rosenkranz mixing vs f64 wofz oracle ----------------
        from scipy.special import wofz as _wofz

        from radtxfr_tpu.core.constants import SQRT_LN2 as _SL2
        from radtxfr_tpu.kernels.linemixing import (mixing_coefficient,
                                                    xsect_voigt_mixing)

        lm_lines = synthetic_lines(30, 1002.0, 1008.0, seed=9)
        rngm = np.random.default_rng(3)
        y_air = rngm.normal(0.0, 3e-3, 30)
        prm = compute_line_params(lm_lines, IsoTables.load(), 250.0, 0.5)
        Ym = np.asarray(mixing_coefficient(y_air, 0.5, 250.0))
        gmix = arange_drift_free(1003.0, 1007.0, 0.005)
        got_m = np.asarray(xsect_voigt_mixing(jnp.asarray(gmix), prm, Ym))
        pm = jax.device_get(prm)
        want_m = np.zeros_like(gmix)
        for i in range(30):
            cte = _SL2 / pm.gamma_d[i]
            w = _wofz((gmix - pm.nu0_shifted[i]) * cte
                      + 1j * pm.gamma_0[i] * cte)
            vals = cte / np.sqrt(np.pi) * (w.real + Ym[i] * w.imag)
            msk = ((gmix > pm.nu0[i] - pm.wing[i])
                   & (gmix <= pm.nu0[i] + pm.wing[i]))
            want_m += np.where(msk, pm.strength[i] * vals, 0.0)
        row("Rosenkranz mixing (jnp f64 vs wofz)", "30 lines, Y~N(0,3e-3)",
            np.abs(got_m - want_m).max() / np.abs(want_m).max())

        # ------------- round-3 physics: derived data paths ----------------
        from radtxfr_tpu.lines.derived import co2_lwir_lines, derived_lwir_linelist
        from radtxfr_tpu.kernels.linemixing_data import (
            _branch_w_matrix, _first_order_y, branch_profile_full_w)
        from radtxfr_tpu.products import compute_od_layers

        dstore = derived_lwir_linelist(660.0, 700.0)
        dsub = dstore.select_band(664.0, 670.0, margin=25.0)
        daxis = arange_drift_free(664.0, 670.0, 0.0025)
        datm = std_atmosphere()
        d_got = np.asarray(compute_od_layers(dsub, iso, daxis, datm,
                                             engine="pallas"))[0]
        from radtxfr_tpu.products.od import (_line_species_cols,
                                             species_column)
        dcols = np.asarray(_line_species_cols(dsub, datm.mol_ids))
        du = np.asarray(species_column(datm.p[0], datm.T[0], datm.pl[0],
                                       datm.vmr[0]))
        d_want = np.zeros(daxis.size)
        for m in np.unique(np.asarray(dsub.mol_id)):
            mm = np.asarray(dsub.mol_id) == m
            msub = dsub.subset(np.nonzero(mm)[0])
            x = float(np.asarray(datm.vmr[0])[dcols[mm][0]])
            _, k = hapi_xsect(msub, daxis, float(datm.T[0]),
                              float(datm.p[0]) / 101325.0,
                              diluent={"air": 1.0 - x, "self": x})
            d_want += k * float(du[dcols[mm][0]])
        row("derived 667 Q-branch OD (Pallas f32 vs hapi f64)",
            f"{dsub.n_lines} clustered lines, ground layer",
            np.abs(d_got - d_want).max() / np.abs(d_want).max())

        rows_q = co2_lwir_lines(j_max=30)
        mq = (rows_q["band"] == "1:00001->01101") & (rows_q["dJ"] == 0)
        nu_q, sw_q = rows_q["nu0"][mq], rows_q["sw"][mq]
        g_q, el_q = rows_q["gamma_air"][mq], rows_q["elower"][mq]
        Wq, _, dq = _branch_w_matrix(nu_q, el_q, sw_q, g_q, 296.0)
        Yq = _first_order_y(nu_q, Wq, dq)
        gq = np.linspace(nu_q.min() - 0.2, nu_q.max() + 0.2, 20000)
        fullq = branch_profile_full_w(gq, nu_q, sw_q, g_q, el_q, 296.0, 0.005)
        foq = np.zeros_like(gq)
        for k in range(nu_q.size):
            dn = gq - nu_q[k]
            gl = g_q[k] * 0.005
            foq += sw_q[k] / np.pi * (gl + Yq[k] * 0.005 * dn) / (dn * dn + gl * gl)
        # physical truncation of the Rosenkranz expansion (validated to
        # CONVERGE as p->0, not to vanish) — excluded from the engine
        # PASS gate below
        row("line-mixing 1st order vs resolvent [physics]",
            "667 Q branch, p=0.005 atm",
            np.abs(foq - fullq).max() / fullq.max())

        # coarse-far scheme vs classic two-pass (pointwise)
        from radtxfr_tpu.products.od import make_xsect_pallas_fn
        from radtxfr_tpu.lines.synthetic import synthetic_lines as _synl

        clines = _synl(400, nu_min=500.0, nu_max=700.0, seed=9,
                       sd_zero_frac=0.3)
        caxis = arange_drift_free(480.0, 720.0, 0.01)
        cT = np.array([260.0, 296.0])
        cp = np.array([0.7, 1.0])
        f_cl = make_xsect_pallas_fn(clines, iso, caxis, cT, cp,
                                    profile="sdvoigt", wing_abs=30.0,
                                    far_method="classic")
        f_co = make_xsect_pallas_fn(clines, iso, caxis, cT, cp,
                                    profile="sdvoigt", wing_abs=30.0,
                                    far_method="coarse", coarse_r=16)
        a_cl = np.asarray(f_cl(jnp.asarray(cT, dtype=jnp.float32),
                               jnp.asarray(cp, dtype=jnp.float32)))
        a_co = np.asarray(f_co(jnp.asarray(cT, dtype=jnp.float32),
                               jnp.asarray(cp, dtype=jnp.float32)))
        row("coarse-far vs classic two-pass (sdvoigt)",
            "R=16, 30 cm^-1 wings",
            np.abs(a_cl - a_co).max() / np.abs(a_cl).max())

    if on_tpu:
        # TUD on the real chip vs a pure-numpy f64 reference recursion
        from radtxfr_tpu.products import tud_from_od

        B64 = np.swapaxes(np.asarray(planckian(np.asarray(axis),
                                               np.asarray(sub.T))), 0, 1)
        sec = 1.0 / np.cos(np.linspace(0, np.pi / 2, 30, endpoint=False))
        wq = np.cos(np.arccos(1.0 / sec)) * np.sin(np.arccos(1.0 / sec))
        ld = np.zeros((30, axis.size))
        for kk in reversed(range(want.shape[0])):
            tt = np.exp(-want[kk][None, :] * sec[:, None])
            ld = tt * ld + (1 - tt) * B64[kk][None, :]
        ld_ref = (ld * wq[:, None]).sum(0) / wq.sum()

        t32 = tud_from_od(jnp.asarray(axis, dtype=jnp.float32),
                          jnp.asarray(got), jnp.asarray(B64, dtype=jnp.float32),
                          atm32.z0, jnp.asarray([500.0], dtype=jnp.float32),
                          n_angles=30)
        row("TUD Ld (f32 tpu vs f64 host)", "3 layers, 30 angles",
            float(np.abs(np.asarray(t32.Ld) - ld_ref).max()
                  / np.abs(ld_ref).max()))
        print("-" * 86)
        worst = max(r[2] for r in rows
                    if "[physics" not in r[0] and "[data" not in r[0])
        print(f"worst engine error: {worst:.2e}  "
              f"({'PASS' if worst < 1e-3 else 'CHECK'} at 1e-3; [physics]/[data] "
              f"rows are expansion-truncation comparisons, not errors)")
        return

    # ---------------- TUD composition f32 vs f64 --------------------------
    od64 = jnp.asarray(want)
    B64 = jnp.swapaxes(planckian(jnp.asarray(axis), sub.T), 0, 1)
    alts = jnp.asarray([500.0])
    t64 = tud_from_od(jnp.asarray(axis), od64, B64, sub.z0, alts, n_angles=30)
    t32 = tud_from_od(jnp.asarray(axis, dtype=jnp.float32),
                      od64.astype(jnp.float32), B64.astype(jnp.float32),
                      sub.z0.astype(jnp.float32), alts.astype(jnp.float32),
                      n_angles=30)
    cfg_t = "3 layers, 30 angles, 1 altitude"
    row("TUD tau (f32 vs f64)", cfg_t,
        float(np.abs(np.asarray(t32.tau) - np.asarray(t64.tau)).max()
              / np.abs(np.asarray(t64.tau)).max()))
    row("TUD Ld (f32 vs f64)", cfg_t,
        float(np.abs(np.asarray(t32.Ld) - np.asarray(t64.Ld)).max()
              / np.abs(np.asarray(t64.Ld)).max()))

    print("-" * 86)
    worst = max(r[2] for r in rows
                if "[physics" not in r[0] and "[data" not in r[0])
    print(f"worst engine error: {worst:.2e}  "
          f"({'PASS' if worst < 1e-3 else 'CHECK'} at 1e-3; [physics]/[data] "
          f"rows are expansion-truncation comparisons, not errors)")


if __name__ == "__main__":
    main()
