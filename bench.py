#!/usr/bin/env python
"""Headline benchmarks (one JSON line per metric, headline first).

Metrics (all on one chip, north-star configurations from BASELINE.json):

1. ``voigt_window_evals_per_s_per_chip`` — the 66-layer 1976 US Standard
   Atmosphere OD tensor over 500-1500 cm^-1 at 0.0025 cm^-1 (400k points)
   with a 20k-line synthetic HITRAN-like list, bucketed Pallas Voigt kernel.
   *Window evaluations* = sum over (layer, line) of the hapi wing-window
   length (the work the reference engine actually performs) / wall time.
2. ``tud_spectra_per_s`` — full TUD products (9 sensor altitudes, 30
   downwelling angles, 0.25 cm^-1 on-device reduction) on the
   physics-DERIVED clustered LWIR line list with CO2 Q-branch line
   mixing AND the MT_CKD-formulation continuum — the reference's full
   production physics (ICNTNM=6 + ILBLF4=1,
   ``radiative_transfer.py:621-622``) — through the sharded Pallas
   ensemble path; steady-state spectra per second including the host
   batch loop. ``tud_spectra_per_s_synthetic`` keeps the round-1..3
   uniform synthetic-list configuration for continuity.
3. ``ensemble_1000_wall_s`` — wall-clock seconds for the full
   1000-atmosphere LWIR TUD ensemble (the reference's production run,
   ``Generate_LWIR_TUD.py``) on the same derived-list+physics config;
   lower is better. ``_synthetic`` variant as above.
4. ``sdvoigt_window_evals_per_s_per_chip`` — the reference XS-generator
   workload (``misc/RT_gen_AbsXS_files.py:15-31,87-92``): SD-Voigt
   cross-sections over 400-7100 cm^-1 at 0.0025 cm^-1 (2.68M points) with
   350 cm^-1 absolute wings on a (T, p) lattice. Uses the coarse-far
   scheme (far_method='auto' -> R=64 decimated far field + exact interp
   corrections; products/od.py::_build_coarse_far_calls), which cuts the
   wing-dominated work ~R x at < 1e-5-of-peak deviation from the classic
   two-pass build.
5. ``ht_window_evals_per_s_per_chip`` — Hartmann-Tran profile
   (``absorptionCoefficient_HT``, ``misc/hapi.py:10302-10650``) on a 10-state
   (T, p) lattice, 20k lines over 500-1500 cm^-1 at 0.0025 cm^-1; ~30% of
   lines carry live nuVC/eta columns (the full real-arithmetic pcqsdhc
   Pallas kernel), the rest route to the exact SD-Voigt/Voigt degenerations.

``vs_baseline`` is the speedup over the reference engine (hapi, float64
serial per-line loop) measured on this machine's CPU via
tools/measure_hapi_baseline.py: 3.62e6 Voigt / 1.76e6 SD-Voigt / 1.50e6 HT
window evals/s. For TUD metrics the baseline is the hapi time to produce the
same spectra (window evals / Voigt rate; the reference's TUD recursions are
negligible next to its LBL cost).

Env knobs: BENCH_N_ATMOS (default 1000), BENCH_ONLY (comma list of
{voigt,tud,sdvoigt,ht}).
"""

import datetime
import json
import os
import platform
import time

import numpy as np

# Reference (hapi) throughput measured via tools/measure_hapi_baseline.py
# on this container's CPU (single core, float64, hapi 1.1.0.7).
HAPI_BASELINE_EVALS_PER_S = 3.62e6
HAPI_SDVOIGT_BASELINE_EVALS_PER_S = 1.76e6
HAPI_HT_BASELINE_EVALS_PER_S = 1.50e6
HAPI_BASELINE_PROVENANCE = (
    "tools/measure_hapi_baseline.py, 2026-08 round-2 container CPU "
    "(single core, float64, hapi 1.1.0.7 serial per-line loop)")

_PROVENANCE = {}


def _provenance():
    """Self-describing run metadata carried on every JSON line (VERDICT r2
    #10): baseline values + where they were measured, and the chip."""
    if not _PROVENANCE:
        import jax
        d = jax.devices()[0]
        _PROVENANCE.update({
            "chip": d.device_kind,
            "backend": d.platform,
            "host": platform.node(),
            "run_date": datetime.date.today().isoformat(),
            "hapi_baseline_evals_per_s": {
                "voigt": HAPI_BASELINE_EVALS_PER_S,
                "sdvoigt": HAPI_SDVOIGT_BASELINE_EVALS_PER_S,
                "ht": HAPI_HT_BASELINE_EVALS_PER_S,
            },
            "hapi_baseline_provenance": HAPI_BASELINE_PROVENANCE,
        })
    return _PROVENANCE


_RT = {}


def _sync(out):
    """Force device-execution completion via a ONE-ELEMENT host read.

    Two failure modes bracket this (both hit earlier rounds):

    * ``block_until_ready`` can return before remote execution completes
      on this tunneled backend (an 8192^2 f32 matmul "completes" in
      0.2 ms but takes 33 ms — a plausible 33 TFLOP/s — when an element
      is read back), so timing with it alone measures dispatch.
    * ``jax.device_get(out)`` pulls the ENTIRE buffer through the
      ~50 MB/s tunnel — a 105 MB OD tensor adds ~2.1 s of pure transfer
      per sync, which is NOT kernel time.

    The fix: slice one element ON DEVICE (``out.ravel()[0]`` — its
    producer must finish first) and transfer only that. Validated
    against known-cost matmuls (33 TFLOP/s f32 at 8192^2, under the
    chip's ~50 TFLOP/s f32 MXU rate).
    """
    import jax
    while isinstance(out, (tuple, list)):
        out = out[0]
    if hasattr(out, "ravel"):
        out = out.ravel()[0]
    return float(jax.device_get(out))


def _round_trip_s():
    """Median host<->device scalar read-back latency [s], subtracted from
    timed loops (one sync per loop)."""
    if "rt" not in _RT:
        import jax.numpy as jnp
        x = jnp.arange(8, dtype=jnp.float32)
        _sync(x)
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            _sync(x)
            ts.append(time.perf_counter() - t0)
        _RT["rt"] = float(np.median(ts))
    return _RT["rt"]


def _timed(fn_call, n_rep, trials: int = 5):
    """Time n_rep dispatches + one forced sync per trial; subtract the
    read-back round trip; return best-of-``trials`` seconds per call (the
    tunneled backend shows ~±40% run-to-run noise; the minimum is the
    reproducible achieved-throughput figure)."""
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_rep):
            out = fn_call()
        _sync(out)
        dt = max(time.perf_counter() - t0 - _round_trip_s(), 1e-12) / n_rep
        best = min(best, dt)
    return best


_VPU_PEAK = {}


def measured_vpu_peak():
    """Validated VPU issue-slot peak [lane-ops/s] (docs/ROOFLINE.md §1).

    Runs the two defining dependent-chain probes in-process — `a*y+b`
    (counted 2 ops/step: the probe suite shows no single-slot FMA; mul+add
    pairs co-issue ~1.13x) and `y*a` (1 op/step) — on a VMEM-resident
    (512, 1024) f32 block, 64 x 4000 chained steps in a single dispatch
    (this tunneled backend has ~30 ms per-dispatch overhead; multi-dispatch
    micro-benchmarks measure the tunnel, not the chip). The peak is the
    max of the two rates; the full instruction-mix suite that validates it
    (add, cmp+select, sqrt, divide, ILP variants) is
    tools/vpu_peak_probe.py. Best of 5 trials each.
    """
    if _VPU_PEAK:
        return _VPU_PEAK["ops"]
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    # (32, 512) = 16 vregs — the kernels' own (block, tile) scale. This
    # matters: on (512, 1024) working sets Mosaic streams every
    # elementwise op through VMEM and the same chains sustain only
    # ~1.2e12 ops/s; register-resident blocks reach ~3.9e12 (measured
    # sweep in docs/ROOFLINE.md §1). Using the higher figure keeps the
    # MFU denominators honest for kernels that ARE block-resident.
    shape, ITERS = (32, 512), 40_000

    def probe(step, ops_per_step, depth):
        def kernel(y_ref, o_ref):
            def body(_, y):
                for _ in range(depth):
                    y = step(y)
                return y

            o_ref[...] = lax.fori_loop(0, ITERS, body, y_ref[...])

        y = jnp.full(shape, 0.5, dtype=jnp.float32)
        f = jax.jit(lambda y: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(y))
        _sync(f(y))
        best = min(_timed(lambda: f(y), 1) for _ in range(5))
        return ops_per_step * depth * ITERS * shape[0] * shape[1] / best

    a, b = np.float32(0.9999999), np.float32(1e-9)
    fma = probe(lambda y: a * y + b, 2.0, 512)
    mul = probe(lambda y: y * a, 1.0, 512)
    _VPU_PEAK["ops"] = max(fma, mul)
    _VPU_PEAK["which"] = "fma_pair" if fma >= mul else "mul"
    return _VPU_PEAK["ops"]


def _roofline(evals, dt, mode, fn=None, n_wei=16):
    """Falsifiable utilization accounting (VERDICT r3 #1; docs/ROOFLINE.md).

    Numerator: the builder's ``work_report`` — per-kernel-call executed
    (line-slot x point) evaluations from the static plans (padding slots
    included, skipped blocks excluded) x the hand-counted per-mode VPU
    lane-op cost (`pallas_xsect._ops_per_eval`, op-by-op derivations in
    docs/ROOFLINE.md §3). Denominator: the probe-validated issue-slot
    peak. No XLA cost-analysis numbers anywhere.

    ``executed_evals_per_s`` is the chip's real work rate — for coarse-far
    rows it differs from the nominal hapi-window ``value`` by design (the
    scheme evaluates ~R x fewer far-field points); both are emitted.
    """
    from radtxfr_tpu.kernels.pallas_xsect import _ops_per_eval

    peak = measured_vpu_peak()
    out = {"peak_ops_per_s": peak,
           "peak_provenance": ("max sustained dependent-chain rate across "
                               "instruction mixes, tools/vpu_peak_probe.py "
                               "+ in-process fma/mul probes "
                               f"({_VPU_PEAK.get('which')}); "
                               "docs/ROOFLINE.md")}
    report = getattr(fn, "work_report", None)
    if report:
        ex_evals = sum(r["evals"] for r in report)
        ex_ops = sum(r["evals"] * _ops_per_eval(r["n_weideman"], r["mode"])
                     for r in report)
        out.update({
            "executed_evals": ex_evals,
            "executed_evals_per_s": ex_evals / dt,
            "executed_ops_per_s": ex_ops / dt,
            "mfu_pct": 100.0 * (ex_ops / dt) / peak,
            "ops_accounting": ("hand-counted lane ops x plan-executed "
                               "work; conservative (per-line algebra and "
                               "non-kernel ops uncharged)"),
        })
    return out


def _emit(metric, value, unit, vs_baseline, extra=None):
    rec = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": vs_baseline}
    rec.update(extra or {})
    rec.update(_provenance())
    print(json.dumps(rec), flush=True)


def _window_evals(lines, iso, atmos, grid_axis, profile="voigt",
                  wing_abs=0.0, states=None):
    """hapi wing-window evaluation count for a (layers x lines) workload."""
    import jax
    import jax.numpy as jnp

    from radtxfr_tpu.products.od import _line_species_cols, layer_line_params

    if states is None:
        cols = jnp.asarray(_line_species_cols(lines, atmos.mol_ids))
        params = layer_line_params(lines, iso, atmos, cols,
                                   wing_abs=wing_abs, profile=profile)
        nu0 = np.broadcast_to(np.asarray(params.nu0, dtype=np.float64),
                              np.asarray(params.wing).shape)
        wing = np.asarray(jax.device_get(params.wing), dtype=np.float64)
    else:
        from radtxfr_tpu.kernels.lineparams import compute_line_params

        T_s, p_s = states
        one = lambda T, p: compute_line_params(
            lines, iso, T, p, wing_abs=wing_abs, profile=profile)
        params = jax.vmap(one)(jnp.asarray(T_s), jnp.asarray(p_s))
        nu0 = np.broadcast_to(np.asarray(lines.nu0, dtype=np.float64),
                              np.asarray(params.wing).shape)
        wing = np.asarray(jax.device_get(params.wing), dtype=np.float64)
    lo = np.searchsorted(grid_axis, (nu0 - wing).ravel(), side="right")
    hi = np.searchsorted(grid_axis, (nu0 + wing).ravel(), side="right")
    return int((hi - lo).sum())


def bench_voigt(jnp, iso, atm, lines, axis):
    """Metric 1. Returns the hapi-equivalent seconds per spectrum for the
    TUD baselines."""
    import jax

    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid
    from radtxfr_tpu.products.od import make_od_pallas_fn

    on_tpu = jax.default_backend() == "tpu"
    grid = UniformGrid.from_axis(axis)
    fn = make_od_pallas_fn(lines, iso, grid, atm)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    _sync(fn(*args))

    n_rep = 10 if on_tpu else 1
    dt = _timed(lambda: fn(*args), n_rep)

    evals = _window_evals(lines, iso, atm, axis)
    value = evals / dt
    _emit("voigt_window_evals_per_s_per_chip", value, "evals/s",
          value / HAPI_BASELINE_EVALS_PER_S,
          extra=_roofline(evals, dt, "full", fn=fn))
    return evals / HAPI_BASELINE_EVALS_PER_S  # hapi seconds per spectrum


def bench_voigt_derived(jnp, iso, atm):
    """Metric 1b (VERDICT r2 #2): the 66-layer OD workload on the
    physics-DERIVED H2O+CO2+O3 LWIR list (real clustering statistics:
    CO2 Q-branches, O3 manifold — radtxfr_tpu/lines/derived.py) instead
    of the uniform synthetic draw; bucket load balance must survive
    orders-of-magnitude line-density variation."""
    import jax

    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid
    from radtxfr_tpu.lines.derived import derived_lwir_linelist
    from radtxfr_tpu.products.od import make_od_pallas_fn

    on_tpu = jax.default_backend() == "tpu"
    lines = derived_lwir_linelist(480.0, 1520.0, dtype=jnp.float32)
    from radtxfr_tpu.core.grid import arange_drift_free
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    grid = UniformGrid.from_axis(axis)
    fn = make_od_pallas_fn(lines, iso, grid, atm)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    _sync(fn(*args))
    n_rep = 10 if on_tpu else 1
    dt = _timed(lambda: fn(*args), n_rep)
    evals = _window_evals(lines, iso, atm, axis)
    value = evals / dt
    _emit("voigt_derived_lines_window_evals_per_s_per_chip", value,
          "evals/s", value / HAPI_BASELINE_EVALS_PER_S,
          extra=dict(_roofline(evals, dt, "full", fn=fn),
                     n_lines=int(lines.n_lines),
                     lines_provenance=(
                         "physics-derived H2O+CO2+O3 LWIR list "
                         "(lines/derived.py: effective-constant CO2 "
                         "bands, asym-rotor H2O, near-prolate O3); no "
                         "network egress for a verbatim HITRAN extract")))


def _diverse_members(atm, n_atmos, jnp):
    """Regrid-diversified ensemble members (VERDICT r4 weak #5): coarse
    perturbed soundings cubic-regridded onto the 66-level grid — the
    reference's TIGR ingestion path (``Generate_LWIR_TUD.py:42-49``,
    ``atmos/regrid.py``) — instead of plain (dT, H2O-scale) draws.
    Returns ``member(i) -> AtmosphericState``."""
    import jax

    from radtxfr_tpu.atmos.regrid import regrid_profiles

    rng = np.random.default_rng(0)
    z66 = np.asarray(atm.z0, dtype=np.float64)
    z_src = np.linspace(z66.min(), z66.max(), 40)
    zz = z_src / z_src.max()
    T_base = np.interp(z_src, z66, np.asarray(atm.T, dtype=np.float64))
    H_base = np.interp(z_src, z66, np.asarray(atm.vmr[:, 0], dtype=np.float64))
    O_base = np.interp(z_src, z66, np.asarray(atm.vmr[:, 2], dtype=np.float64))
    a = rng.normal(size=(n_atmos, 3))
    T_src = T_base[None] + (4.0 * a[:, :1] * np.exp(-zz[None] * 3)
                            + 2.0 * a[:, 1:2] * np.exp(-zz[None]))
    H_src = H_base[None] * np.exp(0.25 * a[:, 1:2] * np.exp(-zz[None] * 2)
                                  + 0.1 * a[:, 2:])
    O_src = O_base[None] * np.exp(0.1 * a[:, 2:])
    members = regrid_profiles(z_src, T=T_src, h2o=H_src, o3=O_src)
    return lambda i: jax.tree.map(lambda x: x[i], members)


def bench_tud_ensemble(jnp, iso, atm, lines, axis, hapi_s_per_spectrum,
                       line_mixing=None, suffix="",
                       lines_provenance="synthetic uniform draw"):
    """Metrics 2 + 3: the production ensemble run.

    The headline rows (no suffix) run the physics-DERIVED clustered
    LWIR list with CO2 Q-branch line mixing + MT_CKD-formulation
    continuum — the reference's production configuration
    (``Generate_LWIR_TUD.py:77-85``, ``radiative_transfer.py:621-622``;
    VERDICT r3 #2). The ``_synthetic`` rows keep the round-1..3
    uniform-draw configuration for cross-round continuity.
    """
    import jax

    from radtxfr_tpu.dist.ensemble import stack_states
    from radtxfr_tpu.dist.mesh import make_mesh
    from radtxfr_tpu.dist.pallas_ensemble import make_tud_ensemble_fn
    from radtxfr_tpu.sensor.resolution import reduce_operator

    n_atmos = int(os.environ.get("BENCH_N_ATMOS", "1000"))
    batch = 40
    # fixed batch shape (one compiled program); round the member count up
    # so every batch index is valid, and report on the rounded count
    n_atmos = max(batch, -(-n_atmos // batch) * batch)
    n_dev = len(jax.devices())
    mesh = make_mesh(1, n_dev)
    alts = jnp.asarray([0.061, 0.305, 1.524, 3.048, 6.096, 9.144, 12.192,
                        15.24, 500.0], dtype=jnp.float32)

    member = _diverse_members(atm, n_atmos, jnp)

    env = [atm.replace(T=atm.T - 25.0),
           atm.replace(T=atm.T + 25.0, vmr=atm.vmr.at[:, 0].mul(2.0))]
    probe = stack_states([member(i) for i in range(batch)])
    gpad, run = make_tud_ensemble_fn(lines, iso, axis, probe, alts, mesh,
                                     atmos_class=env, n_angles=30,
                                     continuum="mt_ckd",
                                     line_mixing=line_mixing)

    n = axis.size
    op = reduce_operator(np.asarray(gpad.values()[:n], dtype=np.float64), 0.25)

    @jax.jit
    def reduce_batch(tau, Lu, Ld):
        return (op(tau[:, :n, -1, 0].T).T, op(Lu[:, :n, -1, 0].T).T,
                op(Ld[:, :n].T).T)

    def run_batch(lo):
        b = stack_states([member(i) for i in range(lo, lo + batch)])
        tau, Lu, Ld = run(b)
        out = reduce_batch(tau, Lu, Ld)
        _sync(out)          # real completion, not block_until_ready
        return out

    t_all0 = time.perf_counter()
    run_batch(0)                       # includes compile
    t_steady0 = time.perf_counter()
    for lo in range(batch, n_atmos, batch):
        run_batch(lo)
    t_end = time.perf_counter()

    steady = (n_atmos - batch) / (t_end - t_steady0)
    extra = {"lines_provenance": lines_provenance,
             "n_lines": int(np.asarray(lines.nu0).size),
             "members": "regrid-diversified profiles (atmos/regrid.py)",
             "physics": ("mt_ckd continuum"
                         + (", CO2 Q-branch line mixing"
                            if line_mixing is not None else ""))}
    _emit("tud_spectra_per_s" + suffix, steady, "spectra/s",
          steady * hapi_s_per_spectrum, extra=extra)
    wall = t_end - t_all0
    _emit("ensemble_1000_wall_s" + suffix, wall, "s",
          (n_atmos * hapi_s_per_spectrum) / wall, extra=extra)


def bench_tud_fullres(jnp, iso, atm):
    """Metrics 2c/3c (VERDICT r4 #1): the reference's ACTUAL production
    configuration end to end — 690-1410 cm^-1 at DVOUT=5e-4 (1.44M fine
    points), 66 layers, 9 sensor altitudes, 30 downwelling angles, derived
    clustered list + CO2 Q-branch mixing + MT_CKD-formulation continuum,
    fused on-device reduction to 0.25 cm^-1 of ALL altitudes
    (``Generate_LWIR_TUD.py:77-85,152-223``). Members are regrid-
    diversified profiles (atmos/regrid.py cubic re-gridding of perturbed
    soundings — production-diverse inputs, VERDICT r4 weak #5), not just
    (dT, H2O-scale) draws.

    Env knob: BENCH_N_ATMOS_FULLRES (default 100).
    """
    import jax

    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
    from radtxfr_tpu.lines.derived import derived_lwir_linelist
    from radtxfr_tpu.products.od import make_od_pallas_fn
    from radtxfr_tpu.products.tud import make_tud_pallas_fn
    from radtxfr_tpu.sensor.resolution import reduce_operator

    n_atmos = int(os.environ.get("BENCH_N_ATMOS_FULLRES", "100"))
    lines = derived_lwir_linelist(665.0, 1435.0, dtype=jnp.float32)
    lm = {"y_air": y_air_for_store(lines)}
    X = arange_drift_free(690.0, 1410.0, 0.0005)          # 1.44M points
    alts = jnp.asarray([0.061, 0.305, 1.524, 3.048, 6.096, 9.144, 12.192,
                        15.24, 500.0], dtype=jnp.float32)

    member = _diverse_members(atm, n_atmos, jnp)

    # envelope states for the static wing plans
    env = [atm.replace(T=atm.T - 20.0),
           atm.replace(T=atm.T + 20.0, vmr=atm.vmr.at[:, 0].mul(2.0))]
    t_build0 = time.perf_counter()
    fn = make_od_pallas_fn(lines, iso, X, env, continuum="mt_ckd",
                           line_mixing=lm)
    op = reduce_operator(X, 0.25)
    # fused Pallas composition (round 5): tau/Lu/Ld in one kernel pass
    # with VMEM-resident carries + in-kernel Planck, then the gather-free
    # banded reduction — replaces the XLA-scan tail that measured ~300 ms
    # against a ~30 ms roofline (docs/ROOFLINE.md §8)
    tud_fn = make_tud_pallas_fn(atm.z0, np.asarray(alts), mu=1.0,
                                n_angles=30)
    build_s = time.perf_counter() - t_build0

    grid = jnp.asarray(X, dtype=jnp.float32)

    @jax.jit
    def run_batch(T, p, pl, vmr):
        def one_member(args):
            T_a, p_a, pl_a, vmr_a = args
            od = fn(T_a, p_a, pl_a, vmr_a)
            tud = tud_fn(grid, od, T_a)
            return op(tud.tau[:, :, 0]), op(tud.Lu[:, :, 0]), op(tud.Ld)

        return jax.lax.map(one_member, (T, p, pl, vmr))

    # small member batches per dispatch: the tunneled chip pays a ~33 ms
    # fixed dispatch+sync round trip, which a per-member loop would add
    # to every spectrum (measured; ROOFLINE §8)
    mb = 4
    n_atmos = -(-n_atmos // mb) * mb

    def one(lo):
        ms = [member(i) for i in range(lo, lo + mb)]
        out = run_batch(*(jnp.stack([getattr(m, f) for m in ms])
                          for f in ("T", "p", "pl", "vmr")))
        _sync(out)
        return out

    t_all0 = time.perf_counter()
    one(0)                                   # includes compile
    t_steady0 = time.perf_counter()
    for lo in range(mb, n_atmos, mb):
        one(lo)
    t_end = time.perf_counter()

    steady = (n_atmos - mb) / (t_end - t_steady0)
    evals = _window_evals(lines, iso, atm, X)
    hapi_s = evals / HAPI_BASELINE_EVALS_PER_S
    extra = {"config": ("690-1410 @ 5e-4 (1.44M pts), 66 layers, 9 alts, "
                        "30 angles, derived clustered list + CO2 Q-branch "
                        "mixing + mt_ckd continuum, fused 0.25 cm^-1 "
                        "reduction of all altitudes on device"),
             "n_lines": int(np.asarray(lines.nu0).size),
             "members": "regrid-diversified profiles (atmos/regrid.py)",
             "build_s": build_s}
    _emit("tud_spectra_per_s_fullres", steady, "spectra/s",
          steady * hapi_s, extra=extra)
    wall = t_end - t_all0
    _emit("ensemble_wall_s_fullres", wall, "s",
          (n_atmos * hapi_s) / wall,
          extra=dict(extra, n_atmos=n_atmos))


def bench_ht_layered(jnp, iso, atm):
    """Metric 5b (VERDICT r2 #5 'TUD bench line'): the full Hartmann-Tran
    profile through the LAYERED-OD Pallas path (make_od_ht_pallas_fn) —
    66 StdAtmos layers, 20k lines over 500-1500 at 0.0025, ~30% of lines
    with live HT columns, per-line ht/sdvoigt/voigt routing and the
    air/self diluent mix."""
    import jax

    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import make_od_ht_pallas_fn, ht_wing_bounds
    from radtxfr_tpu.kernels.ht_driver import resolve_ht_columns

    on_tpu = jax.default_backend() == "tpu"
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=2,
                            dtype=jnp.float32, sd_zero_frac=0.4)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)
    n = int(np.asarray(lines.nu0).size)
    rng = np.random.default_rng(5)
    ht_rows = rng.random(n) < 0.3
    extras = {"nu_HT_air": rng.uniform(0.01, 0.05, n) * ht_rows,
              "kappa_HT_air": rng.uniform(0.0, 1.0, n) * ht_rows,
              "eta_HT_air": rng.uniform(0.1, 0.3, n) * ht_rows}
    fn = make_od_ht_pallas_fn(lines, iso, axis, atm, extras=extras)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    _sync(fn(*args))
    n_rep = 5 if on_tpu else 1
    dt = _timed(lambda: fn(*args), n_rep)

    lines_h = lines.host_view()
    resolved = resolve_ht_columns(lines_h, extras, {"air": 1.0, "self": 1.0})
    W = ht_wing_bounds(resolved, lines_h, iso,
                       np.asarray(atm.T, dtype=np.float64),
                       np.asarray(atm.p, dtype=np.float64) / 101325.0)
    nu0 = np.asarray(lines_h.nu0, dtype=np.float64)
    nu0_b = np.broadcast_to(nu0, W.shape)
    lo = np.searchsorted(axis, (nu0_b - W).ravel(), side="right")
    hi = np.searchsorted(axis, (nu0_b + W).ravel(), side="right")
    evals = int((hi - lo).sum())
    value = evals / dt
    _emit("ht_layered_od_window_evals_per_s_per_chip", value, "evals/s",
          value / HAPI_HT_BASELINE_EVALS_PER_S,
          extra=_roofline(evals, dt, "ht", fn=fn))


def bench_sdvoigt_xs(jnp, iso):
    """Metric 4: the XS-generator SD-Voigt lattice."""
    import jax

    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import make_xsect_pallas_fn

    on_tpu = jax.default_backend() == "tpu"
    wing_abs = 350.0
    lines = synthetic_lines(30_000, nu_min=400.0, nu_max=7100.0, seed=1,
                            dtype=jnp.float32, sd_zero_frac=0.25)
    axis = arange_drift_free(400.0, 7100.0, 0.0025)     # 2.68M points
    T_s = np.arange(275.0, 321.0, 5.0)                  # 10 states
    p_s = np.full_like(T_s, 1.0)
    # wing-dominated workload: wide tiles keep the packed-plan duplication
    # (~wing/tile_span) and its HBM footprint in check
    fn = make_xsect_pallas_fn(lines, iso, axis, T_s, p_s, profile="sdvoigt",
                              wing_abs=wing_abs, tile=8192)
    Tj = jnp.asarray(T_s, dtype=jnp.float32)
    pj = jnp.asarray(p_s, dtype=jnp.float32)
    _sync(fn(Tj, pj))

    n_rep = 3 if on_tpu else 1
    dt = _timed(lambda: fn(Tj, pj), n_rep)

    evals = _window_evals(lines, iso, None, axis, profile="sdvoigt",
                          wing_abs=wing_abs, states=(T_s, p_s))
    value = evals / dt
    _emit("sdvoigt_window_evals_per_s_per_chip", value, "evals/s",
          value / HAPI_SDVOIGT_BASELINE_EVALS_PER_S,
          extra=_roofline(evals, dt, "sdvoigt", fn=fn))


def bench_ht_xs(jnp, iso, atm_lines, axis):
    """Metric 5: full-HT lattice through the Pallas HT kernel."""
    import jax

    from radtxfr_tpu.kernels.ht_driver import resolve_ht_columns
    from radtxfr_tpu.products.od import make_ht_pallas_fn

    on_tpu = jax.default_backend() == "tpu"
    T_s = np.arange(275.0, 321.0, 5.0)                  # 10 states
    p_s = np.full_like(T_s, 1.0)
    # mixed production-shaped table: ~30% of lines carry live HT columns
    # (nuVC/eta -> the full pcqsdhc kernel), the rest resolve to the
    # SD-Voigt / Voigt degenerations and route to the cheaper modes
    n = int(np.asarray(atm_lines.nu0).size)
    rng = np.random.default_rng(3)
    ht_rows = rng.random(n) < 0.3
    extras = {"nu_HT_air": rng.uniform(0.01, 0.05, n) * ht_rows,
              "kappa_HT_air": rng.uniform(0.0, 1.0, n) * ht_rows,
              "eta_HT_air": rng.uniform(0.1, 0.3, n) * ht_rows}
    fn = make_ht_pallas_fn(atm_lines, iso, axis, T_s, p_s, extras=extras)
    Tj = jnp.asarray(T_s, dtype=jnp.float32)
    pj = jnp.asarray(p_s, dtype=jnp.float32)
    _sync(fn(Tj, pj))

    n_rep = 3 if on_tpu else 1
    dt = _timed(lambda: fn(Tj, pj), n_rep)

    # per-state hapi wing windows: the library's own planning rule
    from radtxfr_tpu.products.od import ht_wing_bounds

    lines_h = atm_lines.host_view()
    resolved = resolve_ht_columns(lines_h, extras, {"air": 1.0})
    W = ht_wing_bounds(resolved, lines_h, iso, T_s, p_s)
    nu0 = np.asarray(lines_h.nu0, dtype=np.float64)
    nu0_b = np.broadcast_to(nu0, W.shape)
    lo = np.searchsorted(axis, (nu0_b - W).ravel(), side="right")
    hi = np.searchsorted(axis, (nu0_b + W).ravel(), side="right")
    evals = int((hi - lo).sum())
    value = evals / dt
    _emit("ht_window_evals_per_s_per_chip", value, "evals/s",
          value / HAPI_HT_BASELINE_EVALS_PER_S,
          extra=_roofline(evals, dt, "ht", fn=fn))


def bench_jacobian(jnp, iso, atm, lines, axis):
    """Metric 6 (VERDICT r3 #6): analytic-JVP Jacobians on the Pallas
    path. One JVP pass = one directional derivative of the full
    (66, nX) OD tensor; the reference computes each Jacobian row by a
    full finite-difference forward run (199 perturbed profiles,
    ``Generate_LWIR_TUD.py:55-71``), so ``vs_baseline`` compares one JVP
    against hapi's cost for the two forward runs a central difference
    needs. Voigt runs the north-star workload; HT runs a disclosed
    smaller config (2k lines, 790-830 cm^-1 — the jvp-traced pcqsdhc
    tangent kernel at production block shapes)."""
    import jax

    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.od import make_od_pallas_fn, make_od_ht_pallas_fn

    on_tpu = jax.default_backend() == "tpu"
    lay = 3

    fn_v = make_od_pallas_fn(lines, iso, axis, atm, differentiable=True)
    jac_v = jax.jit(jax.jacfwd(
        lambda tl: fn_v(atm.T.at[lay].set(tl), atm.p, atm.pl, atm.vmr)))
    _sync(jac_v(atm.T[lay]))
    dt = _timed(lambda: jac_v(atm.T[lay]), 3 if on_tpu else 1)
    evals = _window_evals(lines, iso, atm, axis)
    fd_s = 2.0 * evals / HAPI_BASELINE_EVALS_PER_S
    _emit("voigt_jacobian_jvp_per_s", 1.0 / dt, "JVP/s", fd_s / dt,
          extra={"config": "20k lines, 500-1500 @ 0.0025, d/dT[3]",
                 "baseline_note": "hapi central-difference row (2 forward "
                                  "runs) for the same config"})

    n = 2000
    hl = synthetic_lines(n, nu_min=780.0, nu_max=840.0, seed=77,
                         dtype=jnp.float32, sd_zero_frac=0.4)
    rng = np.random.default_rng(5)
    ht_rows = rng.random(n) < 0.4
    extras = {"nu_HT_air": rng.uniform(0.01, 0.05, n) * ht_rows,
              "kappa_HT_air": rng.uniform(0.0, 1.0, n) * ht_rows,
              "eta_HT_air": rng.uniform(0.1, 0.3, n) * ht_rows}
    ax_h = arange_drift_free(790.0, 830.0, 0.0025)
    fn_h = make_od_ht_pallas_fn(hl, iso, ax_h, atm, extras=extras,
                                differentiable=True)
    jac_h = jax.jit(jax.jacfwd(
        lambda tl: fn_h(atm.T.at[lay].set(tl), atm.p, atm.pl, atm.vmr)))
    _sync(jac_h(atm.T[lay]))
    dt_h = _timed(lambda: jac_h(atm.T[lay]), 3 if on_tpu else 1)
    from radtxfr_tpu.kernels.ht_driver import resolve_ht_columns
    from radtxfr_tpu.products.od import ht_wing_bounds

    lines_h = hl.host_view()
    resolved = resolve_ht_columns(lines_h, extras, {"air": 1.0, "self": 1.0})
    W = ht_wing_bounds(resolved, lines_h, iso,
                       np.asarray(atm.T, dtype=np.float64),
                       np.asarray(atm.p, dtype=np.float64) / 101325.0)
    nu0 = np.broadcast_to(np.asarray(lines_h.nu0, dtype=np.float64), W.shape)
    lo = np.searchsorted(ax_h, (nu0 - W).ravel(), side="right")
    hi = np.searchsorted(ax_h, (nu0 + W).ravel(), side="right")
    fd_s_h = 2.0 * int((hi - lo).sum()) / HAPI_HT_BASELINE_EVALS_PER_S
    _emit("ht_jacobian_jvp_per_s", 1.0 / dt_h, "JVP/s", fd_s_h / dt_h,
          extra={"config": "2k lines (~40% live HT), 790-830 @ 0.0025, "
                           "d/dT[3]; jvp-traced pcqsdhc tangent kernel"})


def bench_jacobian_full(jnp, iso, atm, lines, axis):
    """Metric 6b (VERDICT r4 #4): ONE FULL 199-profile-equivalent TUD
    Jacobian — the reference's actual Jacobian product
    (``Generate_LWIR_TUD.py:55-71``: the unperturbed run plus 3x66
    perturbed profiles for T/H2O/O3) — as the primal plus 198 directional
    JVPs through the sharded differentiable builder
    (:func:`radtxfr_tpu.dist.pallas_ensemble.make_tud_jacobian_fn`) on the
    north-star config, with fused 0.25 cm^-1 reduction of every direction.
    ``vs_baseline`` = hapi's cost for the 199 finite-difference forward
    runs / this wall."""
    import jax

    from radtxfr_tpu.dist.mesh import make_mesh
    from radtxfr_tpu.dist.pallas_ensemble import (jacobian_directions,
                                                  make_tud_jacobian_fn)
    from radtxfr_tpu.sensor.resolution import reduce_operator

    mesh = make_mesh(1, len(jax.devices()))
    alts = jnp.asarray([0.061, 1.524, 12.192, 500.0], dtype=jnp.float32)
    gpad, run = make_tud_jacobian_fn(lines, iso, axis, atm, alts, mesh,
                                     n_angles=30)
    V_T, V_vmr, _ = jacobian_directions(atm, wrt=("T", 1, 3))
    n_dirs = V_T.shape[0]                    # 198 = 199 profiles - primal
    n = axis.size
    op = reduce_operator(np.asarray(gpad.values()[:n], dtype=np.float64),
                         0.25)

    @jax.jit
    def reduce_tangent(t):
        red = lambda a: jnp.moveaxis(op(jnp.moveaxis(a[:, :n], 1, 0)), 0, 1)
        return {k: red(v) for k, v in t.items()}

    batch = 6
    n_pad = -(-n_dirs // batch) * batch

    def sweep():
        outs = []
        for lo in range(0, n_pad, batch):
            idx = [min(i, n_dirs - 1) for i in range(lo, lo + batch)]
            _, tangent = run(atm.T, atm.vmr, V_T[idx], V_vmr[idx])
            out = reduce_tangent(tangent)
            _sync(out["tau"])
            outs.append(out)
        return outs

    sweep()                                  # compile
    t0 = time.perf_counter()
    sweep()
    wall = time.perf_counter() - t0

    evals = _window_evals(lines, iso, atm, axis)
    fd_s = 199.0 * evals / HAPI_BASELINE_EVALS_PER_S
    _emit("jacobian_full_199_wall_s", wall, "s", fd_s / wall,
          extra={"config": ("20k lines, 500-1500 @ 0.0025, 66 layers, "
                            "4 altitudes, 30 angles; primal + 198 JVP "
                            "directions (T/H2O/O3 x 66 layers) in batches "
                            f"of {batch} through the sharded "
                            "differentiable builder, each direction "
                            "reduced to 0.25 cm^-1 on device"),
                 "n_directions": int(n_dirs),
                 "baseline_note": ("hapi wall for the reference's 199 "
                                   "finite-difference forward runs")})


def main():
    import jax.numpy as jnp

    from radtxfr_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.lines.synthetic import synthetic_lines

    only = set((os.environ.get("BENCH_ONLY")
                or "voigt,derived,tud,tud_synth,tud_fullres,sdvoigt,ht,"
                   "ht_layered,jacobian,jacobian_full")
               .split(","))
    iso = IsoTables.load(dtype=jnp.float32)
    atm = std_atmosphere(dtype=jnp.float32)
    lines = synthetic_lines(20_000, nu_min=480.0, nu_max=1520.0, seed=0,
                            dtype=jnp.float32)
    axis = arange_drift_free(500.0, 1500.0, 0.0025)

    hapi_s = None
    if "voigt" in only:
        hapi_s = bench_voigt(jnp, iso, atm, lines, axis)
    if "derived" in only:
        bench_voigt_derived(jnp, iso, atm)
    if "tud" in only:
        # headline: the derived clustered list + full production physics
        from radtxfr_tpu.kernels.linemixing_data import y_air_for_store
        from radtxfr_tpu.lines.derived import derived_lwir_linelist

        dlines = derived_lwir_linelist(480.0, 1520.0, dtype=jnp.float32)
        lm = {"y_air": y_air_for_store(dlines)}
        hapi_s_d = (_window_evals(dlines, iso, atm, axis)
                    / HAPI_BASELINE_EVALS_PER_S)
        bench_tud_ensemble(
            jnp, iso, atm, dlines, axis, hapi_s_d, line_mixing=lm,
            lines_provenance=("physics-derived clustered LWIR list "
                              "(lines/derived.py) + EPG CO2 Q-branch "
                              "mixing (kernels/linemixing_data.py)"))
    if "tud_synth" in only:
        # round-1..3 continuity rows (synthetic uniform list)
        if hapi_s is None:
            hapi_s = _window_evals(lines, iso, atm, axis) / HAPI_BASELINE_EVALS_PER_S
        bench_tud_ensemble(jnp, iso, atm, lines, axis, hapi_s,
                           suffix="_synthetic")
    if "tud_fullres" in only:
        bench_tud_fullres(jnp, iso, atm)
    if "sdvoigt" in only:
        bench_sdvoigt_xs(jnp, iso)
    if "ht" in only:
        bench_ht_xs(jnp, iso, lines, axis)
    if "ht_layered" in only:
        bench_ht_layered(jnp, iso, atm)
    if "jacobian" in only:
        bench_jacobian(jnp, iso, atm, lines, axis)
    if "jacobian_full" in only:
        bench_jacobian_full(jnp, iso, atm, lines, axis)


if __name__ == "__main__":
    main()
