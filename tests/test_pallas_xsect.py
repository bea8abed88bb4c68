"""Pallas bucketed Voigt kernel vs the jnp engine and the hapi oracle.

Runs in interpreter mode on the CPU backend (same kernel code path the TPU
compiles); float32 accuracy is checked peak-relative.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.kernels.lineparams import compute_line_params
from radtxfr_tpu.kernels.pallas_xsect import UniformGrid, plan_buckets, xsect_pallas
from radtxfr_tpu.kernels.xsect import xsect_from_params
from radtxfr_tpu.lines.synthetic import synthetic_lines
from radtxfr_tpu.lines.store import IsoTables


GRID_AXIS = arange_drift_free(550.0, 600.0, 0.0025)  # 20001 pts
GRID = UniformGrid.from_axis(GRID_AXIS)
MAX_WING = 12.0  # bounds 50*gamma for the synthetic parameter ranges


@pytest.fixture(scope="module")
def store():
    return synthetic_lines(700, nu_min=540.0, nu_max=610.0, seed=21)


def _params(store, iso_tables, T, p, clamp=True):
    p_ = compute_line_params(store, iso_tables, T, p)
    return p_


def test_pallas_matches_jnp_engine_single_layer(store, iso_tables):
    params = _params(store, iso_tables, 296.0, 1.0)
    plan = plan_buckets(np.asarray(store.nu0), GRID, MAX_WING, tile=512, block=128)
    got = np.asarray(xsect_pallas(plan, params, interpret=True))

    # jnp engine in float64 with the same wing clamp is the oracle.
    import dataclasses
    clamped = dataclasses.replace(params, wing=jnp.minimum(params.wing, MAX_WING))
    want = np.asarray(xsect_from_params(jnp.asarray(GRID_AXIS), clamped))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 3e-6 * peak


def test_pallas_layered_matches_per_layer(store, iso_tables):
    temps = jnp.asarray([296.0, 250.0, 220.0])
    pres = jnp.asarray([1.0, 0.5, 0.05])
    params = jax.vmap(
        lambda T, p: compute_line_params(store, iso_tables, T, p)
    )(temps, pres)
    plan = plan_buckets(np.asarray(store.nu0), GRID, MAX_WING, tile=512, block=128)
    got = np.asarray(xsect_pallas(plan, params, interpret=True))
    assert got.shape == (3, GRID.n)
    for i in range(3):
        single = compute_line_params(store, iso_tables, temps[i], pres[i])
        one = np.asarray(xsect_pallas(plan, single, interpret=True))
        np.testing.assert_allclose(got[i], one, rtol=0, atol=1e-12)


def test_pallas_wing_mask_semantics(iso_tables):
    """A single strong line: window must follow the bisect rule within a
    grid step."""
    store = synthetic_lines(1, nu_min=574.0, nu_max=575.0, seed=3)
    params = compute_line_params(store, iso_tables, 296.0, 1.0)
    plan = plan_buckets(np.asarray(store.nu0), GRID, MAX_WING, tile=512, block=128)
    got = np.asarray(xsect_pallas(plan, params, interpret=True))
    nz = np.nonzero(got)[0]
    nu0 = float(store.nu0[0])
    wing = float(jnp.minimum(params.wing, MAX_WING)[0])
    g = GRID.values()
    inside = (g > nu0 - wing) & (g <= nu0 + wing)
    # all energy inside the window; boundaries within one grid step
    assert got[~inside].max(initial=0.0) == 0.0
    assert abs(nz.min() - np.nonzero(inside)[0].min()) <= 1
    assert abs(nz.max() - np.nonzero(inside)[0].max()) <= 1


def test_pallas_grid_index_precision(iso_tables):
    """dnu computed in grid-index space: line-center values match float64
    engine to ~1e-5 even at nu ~ 1000 where naive f32 breaks down."""
    big_axis = arange_drift_free(1000.0, 1010.0, 0.0025)
    big_grid = UniformGrid.from_axis(big_axis)
    store = synthetic_lines(50, nu_min=1000.0, nu_max=1010.0, seed=4)
    params = compute_line_params(store, iso_tables, 250.0, 0.3)
    plan = plan_buckets(np.asarray(store.nu0), big_grid, MAX_WING, tile=512, block=128)
    got = np.asarray(xsect_pallas(plan, params, interpret=True))
    import dataclasses
    clamped = dataclasses.replace(params, wing=jnp.minimum(params.wing, MAX_WING))
    want = np.asarray(xsect_from_params(jnp.asarray(big_axis), clamped))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 3e-6 * peak


def test_grouped_od_pallas_matches_jnp_engine(iso_tables):
    """compute_od_layers(engine='pallas') — wing-grouped plans — vs the jnp
    engine on a small StdAtmos band."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products import compute_od_layers
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(150, nu_min=795.0, nu_max=855.0, seed=41)
    axis = arange_drift_free(800.0, 850.0, 0.01)
    want = np.asarray(compute_od_layers(lines, iso_tables, jnp.asarray(axis), atm))
    got = np.asarray(compute_od_layers(lines, iso_tables, axis, atm, engine="pallas"))
    assert got.shape == want.shape
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 5e-6 * peak

    fn = make_od_pallas_fn(lines, iso_tables, axis, atm)
    got2 = np.asarray(fn(atm.T, atm.p, atm.pl, atm.vmr))
    np.testing.assert_allclose(got2, got, rtol=0, atol=1e-12)


def test_two_pass_equals_single_pass(iso_tables):
    """asym + core decomposition must equal the single-pass blend."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(200, nu_min=795.0, nu_max=855.0, seed=43)
    axis = arange_drift_free(800.0, 850.0, 0.005)
    fn1 = make_od_pallas_fn(lines, iso_tables, axis, atm, two_pass=False)
    fn2 = make_od_pallas_fn(lines, iso_tables, axis, atm, two_pass=True)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    a = np.asarray(fn1(*args))
    b = np.asarray(fn2(*args))
    peak = np.abs(a).max()
    assert np.abs(a - b).max() < 2e-6 * peak, np.abs(a - b).max() / peak


def test_sdvoigt_pallas_matches_jnp_engine(iso_tables):
    """Pallas sdvoigt mode (layer-fused) vs the float64 jnp HTP engine."""
    import dataclasses

    store = synthetic_lines(120, nu_min=795.0, nu_max=815.0, seed=71)
    axis = arange_drift_free(800.0, 810.0, 0.005)
    grid = UniformGrid.from_axis(axis)
    params = compute_line_params(store, iso_tables, 280.0, 0.8, profile="sdvoigt")
    plan = plan_buckets(np.asarray(store.nu0), grid, 12.0, tile=512, block=32)
    got = np.asarray(xsect_pallas(plan, params, interpret=True,
                                  mode="sdvoigt", fused_layers=True))
    clamped = dataclasses.replace(params, wing=jnp.minimum(params.wing, 12.0))
    want = np.asarray(xsect_from_params(jnp.asarray(axis), clamped,
                                        profile="sdvoigt"))
    peak = np.abs(want).max()
    # f32 complex-sqrt cancellations cost a little accuracy vs pure Voigt
    assert np.abs(got - want).max() < 2e-5 * peak, np.abs(got - want).max() / peak


@pytest.mark.parametrize("profile", ["lorentz", "doppler"])
def test_simple_profile_pallas_matches_jnp_engine(iso_tables, profile):
    """Pallas lorentz/doppler modes vs the float64 jnp engine — completes
    the five-driver fast-path family (hapi absorptionCoefficient_Lorentz /
    _Doppler per-driver rules come from compute_line_params)."""
    import dataclasses

    store = synthetic_lines(120, nu_min=795.0, nu_max=815.0, seed=71)
    axis = arange_drift_free(800.0, 810.0, 0.005)
    grid = UniformGrid.from_axis(axis)
    params = compute_line_params(store, iso_tables, 280.0, 0.8,
                                 profile=profile)
    plan = plan_buckets(np.asarray(store.nu0), grid, 12.0, tile=512, block=32)
    got = np.asarray(xsect_pallas(plan, params, interpret=True,
                                  mode=profile, fused_layers=True))
    clamped = dataclasses.replace(params, wing=jnp.minimum(params.wing, 12.0))
    want = np.asarray(xsect_from_params(jnp.asarray(axis), clamped,
                                        profile=profile))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-6 * peak, \
        np.abs(got - want).max() / peak


@pytest.mark.parametrize("profile", ["lorentz", "doppler"])
def test_simple_profile_production_path_matches_jnp(iso_tables, profile):
    """make_od_pallas_fn(profile='lorentz'|'doppler'): the single-pass
    dense call decomposition vs the jnp engine on the layered OD."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products import compute_od_layers
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(100, nu_min=795.0, nu_max=855.0, seed=79)
    axis = arange_drift_free(800.0, 850.0, 0.01)
    want = np.asarray(compute_od_layers(lines, iso_tables, jnp.asarray(axis),
                                        atm, profile=profile))
    fn = make_od_pallas_fn(lines, iso_tables, axis, atm, profile=profile)
    got = np.asarray(fn(atm.T, atm.p, atm.pl, atm.vmr))
    assert got.shape == want.shape
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-6 * peak, \
        np.abs(got - want).max() / peak


def test_sdvoigt_runtime_zero_gamma2_is_voigt_limit(iso_tables):
    """vmr_self = 1 (pure-species layer) makes runtime Gamma2 exactly 0
    even for sd_air != 0 lines (lineparams.py:158) — host routing cannot
    see it, so _sdvoigt_block clamps to the Voigt limit instead of
    dividing by zero. Output must be finite and match the jnp engine
    (whose pcqsdhc handles c2t = 0 via PART1)."""
    import dataclasses

    store = synthetic_lines(120, nu_min=795.0, nu_max=815.0, seed=71)
    axis = arange_drift_free(800.0, 810.0, 0.005)
    grid = UniformGrid.from_axis(axis)
    params = compute_line_params(store, iso_tables, 280.0, 0.8,
                                 vmr_self=1.0, profile="sdvoigt")
    assert float(jnp.abs(params.gamma_2).max()) == 0.0
    plan = plan_buckets(np.asarray(store.nu0), grid, 12.0, tile=512, block=32)
    got = np.asarray(xsect_pallas(plan, params, interpret=True,
                                  mode="sdvoigt", fused_layers=True))
    assert np.isfinite(got).all()
    clamped = dataclasses.replace(params, wing=jnp.minimum(params.wing, 12.0))
    want = np.asarray(xsect_from_params(jnp.asarray(axis), clamped,
                                        profile="sdvoigt"))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-4 * peak, \
        np.abs(got - want).max() / peak


def test_sdvoigt_production_path_matches_jnp(iso_tables):
    """make_od_pallas_fn(profile='sdvoigt'): mixed sd/non-sd lines — sd
    lines through the pcqsdhc kernel mode, sd_air == 0 lines through the
    two-pass Voigt passes — vs the float64 jnp HTP engine (the reference's
    SD-Voigt production workload shape, misc/RT_gen_AbsXS_files.py:87-92)."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products import compute_od_layers
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(150, nu_min=795.0, nu_max=855.0, seed=77,
                            sd_zero_frac=0.4)
    assert (np.asarray(lines.sd_air) == 0).any()
    assert (np.asarray(lines.sd_air) != 0).any()
    axis = arange_drift_free(800.0, 850.0, 0.01)
    want = np.asarray(compute_od_layers(lines, iso_tables, jnp.asarray(axis),
                                        atm, profile="sdvoigt"))
    fn = make_od_pallas_fn(lines, iso_tables, axis, atm, profile="sdvoigt")
    got = np.asarray(fn(atm.T, atm.p, atm.pl, atm.vmr))
    assert got.shape == want.shape
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-5 * peak, \
        np.abs(got - want).max() / peak


def test_sdvoigt_two_pass_equals_single_pass(iso_tables):
    """sdvoigt_asym + sdvoigt_core must equal the single-pass pcqsdhc
    selection (the SD-Voigt far-wing split)."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(120, nu_min=795.0, nu_max=855.0, seed=79)
    axis = arange_drift_free(800.0, 850.0, 0.01)
    fn1 = make_od_pallas_fn(lines, iso_tables, axis, atm, profile="sdvoigt",
                            two_pass=False)
    fn2 = make_od_pallas_fn(lines, iso_tables, axis, atm, profile="sdvoigt",
                            two_pass=True)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    a = np.asarray(fn1(*args))
    b = np.asarray(fn2(*args))
    peak = np.abs(a).max()
    assert np.abs(a - b).max() < 2e-6 * peak, np.abs(a - b).max() / peak


def test_sdvoigt_engine_pallas_dispatch(iso_tables):
    """compute_od_layers(engine='pallas', profile='sdvoigt') dispatches and
    agrees with the explicit builder."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products import compute_od_layers

    atm = std_atmosphere()
    lines = synthetic_lines(60, nu_min=795.0, nu_max=825.0, seed=78,
                            sd_zero_frac=0.5)
    axis = arange_drift_free(800.0, 820.0, 0.01)
    got = np.asarray(compute_od_layers(lines, iso_tables, axis, atm,
                                       engine="pallas", profile="sdvoigt"))
    want = np.asarray(compute_od_layers(lines, iso_tables, jnp.asarray(axis),
                                        atm, profile="sdvoigt"))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-5 * peak


def test_xsect_lattice_pallas_matches_jnp(iso_tables):
    """make_xsect_pallas_fn: the XS-generator (T, p) lattice in HITRAN units
    with absolute wings, states evaluated as fused 'layers'."""
    from radtxfr_tpu.products.od import make_xsect_pallas_fn

    lines = synthetic_lines(100, nu_min=795.0, nu_max=825.0, seed=9,
                            sd_zero_frac=0.3)
    axis = arange_drift_free(800.0, 820.0, 0.005)
    T = jnp.asarray([275.0, 296.0, 320.0])
    p = jnp.asarray([0.85, 1.0, 1.05])
    fn = make_xsect_pallas_fn(lines, iso_tables, axis, T, p,
                              profile="sdvoigt", wing_abs=25.0)
    got = np.asarray(fn(T, p))
    assert got.shape == (3, axis.size)
    for i in range(3):
        params = compute_line_params(lines, iso_tables, float(T[i]),
                                     float(p[i]), wing_abs=25.0,
                                     profile="sdvoigt")
        want = np.asarray(xsect_from_params(jnp.asarray(axis), params,
                                            profile="sdvoigt"))
        peak = np.abs(want).max()
        assert np.abs(got[i] - want).max() < 2e-5 * peak


def test_differentiable_pallas_jvp_matches_jnp(iso_tables):
    """The analytic custom-JVP kernel vs jax.jvp through the float64 jnp
    engine, tangents flowing through compute_line_params (T and H2O)."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products import compute_od_layers
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(120, nu_min=795.0, nu_max=835.0, seed=51)
    axis = arange_drift_free(800.0, 830.0, 0.01)
    fn = make_od_pallas_fn(lines, iso_tables, axis, atm, differentiable=True)

    # primal equals the non-differentiable single-pass build
    fn0 = make_od_pallas_fn(lines, iso_tables, axis, atm, two_pass=False)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    np.testing.assert_allclose(np.asarray(fn(*args)), np.asarray(fn0(*args)),
                               rtol=0, atol=1e-12)

    # JVP w.r.t. T (per-layer tangent) vs the jnp engine's autodiff
    t_dir = jnp.asarray(np.linspace(0.5, 1.5, atm.n_layers))
    _, got_t = jax.jvp(lambda T: fn(T, atm.p, atm.pl, atm.vmr),
                       (atm.T,), (t_dir,))

    def jnp_od(T):
        return compute_od_layers(lines, iso_tables, jnp.asarray(axis),
                                 atm.replace(T=T))

    _, want_t = jax.jvp(jnp_od, (atm.T,), (t_dir.astype(atm.T.dtype),))
    peak = np.abs(np.asarray(want_t)).max()
    assert np.abs(np.asarray(got_t) - np.asarray(want_t)).max() < 2e-5 * peak

    # JVP w.r.t. the H2O vmr column
    v_dir = jnp.zeros_like(atm.vmr).at[:, 0].set(jnp.asarray(atm.vmr[:, 0]))
    _, got_v = jax.jvp(lambda v: fn(atm.T, atm.p, atm.pl, v),
                       (atm.vmr,), (v_dir,))

    def jnp_od_v(v):
        return compute_od_layers(lines, iso_tables, jnp.asarray(axis),
                                 atm.replace(vmr=v))

    _, want_v = jax.jvp(jnp_od_v, (atm.vmr,), (v_dir.astype(atm.vmr.dtype),))
    peak_v = np.abs(np.asarray(want_v)).max()
    assert np.abs(np.asarray(got_v) - np.asarray(want_v)).max() < 2e-5 * peak_v


def test_pallas_jacobian_engine_matches_jnp(iso_tables):
    """tud_with_jacobian(engine='pallas') vs the jnp engine end to end."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products.jacobian import tud_with_jacobian

    atm = std_atmosphere()
    lines = synthetic_lines(60, nu_min=798.0, nu_max=812.0, seed=52)
    axis = arange_drift_free(800.0, 810.0, 0.02)
    alts = jnp.asarray([2.0, 500.0])
    tud_j, jac_j = tud_with_jacobian(lines, iso_tables, axis, atm, alts,
                                     wrt=("T", 1), n_angles=6)
    tud_p, jac_p = tud_with_jacobian(lines, iso_tables, axis, atm, alts,
                                     wrt=("T", 1), n_angles=6,
                                     engine="pallas")
    for k in ("tau", "Lu", "Ld"):
        np.testing.assert_allclose(np.asarray(tud_p[k]), np.asarray(tud_j[k]),
                                   rtol=2e-4, atol=1e-6)
        for w in ("T", "1"):
            a, b = np.asarray(jac_p[w][k]), np.asarray(jac_j[w][k])
            peak = np.abs(b).max()
            assert np.abs(a - b).max() < 5e-4 * peak, (k, w)


def test_packed_plan_matches_shared_plan(store, iso_tables):
    """plan_buckets_packed (per-tile gather packing) computes the identical
    spectrum to the shared-block plan, in both kernel layouts."""
    from radtxfr_tpu.kernels.pallas_xsect import plan_buckets_packed

    temps = jnp.asarray([296.0, 250.0])
    pres = jnp.asarray([1.0, 0.3])
    params = jax.vmap(
        lambda T, p: compute_line_params(store, iso_tables, T, p)
    )(temps, pres)
    shared = plan_buckets(np.asarray(store.nu0), GRID, MAX_WING, tile=512, block=128)
    packed = plan_buckets_packed(np.asarray(store.nu0), GRID, MAX_WING,
                                 tile=512, block=16)
    want = np.asarray(xsect_pallas(shared, params, interpret=True))
    got = np.asarray(xsect_pallas(packed, params, interpret=True))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 5e-7 * peak
    got_f = np.asarray(xsect_pallas(packed, params, interpret=True,
                                    fused_layers=True))
    assert np.abs(got_f - want).max() < 5e-7 * peak


def test_packed_plan_auto_block_and_padding(store, iso_tables):
    """Auto block sizing and -1 gather padding slots contribute nothing."""
    from radtxfr_tpu.kernels.pallas_xsect import plan_buckets_packed

    packed = plan_buckets_packed(np.asarray(store.nu0), GRID, MAX_WING,
                                 tile=256, block="auto")
    assert packed.gather is not None
    assert (packed.gather >= -1).all()
    # every tile's blocks hold exactly its in-range lines
    valid = packed.gather >= 0
    n_dup = int(valid.sum())
    assert n_dup >= len(np.asarray(store.nu0))  # duplication across tiles
    params = _params(store, iso_tables, 280.0, 0.8)
    got = np.asarray(xsect_pallas(packed, params, interpret=True))
    import dataclasses
    clamped = dataclasses.replace(params, wing=jnp.minimum(params.wing, MAX_WING))
    want = np.asarray(xsect_from_params(jnp.asarray(GRID_AXIS), clamped))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 3e-6 * peak


def test_differentiable_sdvoigt_pallas_jvp_matches_jnp(iso_tables):
    """VERDICT r2 #7: the analytic SD-Voigt custom-JVP kernel vs jax.jvp
    through the float64 jnp engine (tangents through compute_line_params:
    T perturbs strength/gamma_d/gamma_0/gamma_2; vmr perturbs the
    gamma_0 diluent mix and the column density)."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products import compute_od_layers
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    # sd_zero_frac mixes sd==0 (Voigt-routed, the voigt JVP kernel) and
    # sd!=0 lines (the sdvoigt JVP kernel) in one differentiable build
    lines = synthetic_lines(120, nu_min=795.0, nu_max=835.0, seed=53,
                            sd_zero_frac=0.3)
    axis = arange_drift_free(800.0, 830.0, 0.01)
    fn = make_od_pallas_fn(lines, iso_tables, axis, atm, profile="sdvoigt",
                           differentiable=True)

    # primal equals the non-differentiable single-pass build
    fn0 = make_od_pallas_fn(lines, iso_tables, axis, atm, profile="sdvoigt",
                            two_pass=False)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    np.testing.assert_allclose(np.asarray(fn(*args)), np.asarray(fn0(*args)),
                               rtol=0, atol=1e-12)

    t_dir = jnp.asarray(np.linspace(0.5, 1.5, atm.n_layers))
    _, got_t = jax.jvp(lambda T: fn(T, atm.p, atm.pl, atm.vmr),
                       (atm.T,), (t_dir,))

    def jnp_od(T):
        return compute_od_layers(lines, iso_tables, jnp.asarray(axis),
                                 atm.replace(T=T), profile="sdvoigt")

    _, want_t = jax.jvp(jnp_od, (atm.T,), (t_dir.astype(atm.T.dtype),))
    want_t, got_t = np.asarray(want_t), np.asarray(got_t)
    peak = np.abs(want_t).max()
    rel_t = np.abs(got_t - want_t).max(axis=1) / peak
    # upper-stratosphere layers: narrow Doppler cores + the CPF3 sub-band
    # (whose tangent uses the Weideman/asym blend's slope) relax to 2e-4
    assert rel_t[:55].max() < 2e-5, rel_t[:55].max()
    assert rel_t.max() < 2e-4, rel_t.max()

    v_dir = jnp.zeros_like(atm.vmr).at[:, 0].set(jnp.asarray(atm.vmr[:, 0]))
    _, got_v = jax.jvp(lambda v: fn(atm.T, atm.p, atm.pl, v),
                       (atm.vmr,), (v_dir,))

    def jnp_od_v(v):
        return compute_od_layers(lines, iso_tables, jnp.asarray(axis),
                                 atm.replace(vmr=v), profile="sdvoigt")

    _, want_v = jax.jvp(jnp_od_v, (atm.vmr,), (v_dir.astype(atm.vmr.dtype),))
    want_v, got_v = np.asarray(want_v), np.asarray(got_v)
    peak_v = np.abs(want_v).max()
    rel_v = np.abs(got_v - want_v).max(axis=1) / peak_v
    assert rel_v[:55].max() < 2e-5, rel_v[:55].max()
    assert rel_v.max() < 2e-4, rel_v.max()


def test_differentiable_sdvoigt_jacfwd_matches_fd(iso_tables):
    """jacfwd through the SD-Voigt Pallas build vs central finite
    differences (the reference's Jacobian convention,
    Generate_LWIR_TUD.py:55-71) of the float64 jnp engine — FD of the f32
    kernel primal is dominated by f32 rounding noise (~1e-2 relative at
    usable steps), so the difference quotient runs on the f64 engine."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products import compute_od_layers
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(50, nu_min=798.0, nu_max=812.0, seed=54,
                            sd_zero_frac=0.2)
    axis = arange_drift_free(800.0, 810.0, 0.02)
    fn = make_od_pallas_fn(lines, iso_tables, axis, atm, profile="sdvoigt",
                           differentiable=True)

    lay = 3
    f_of_T = lambda tl: fn(atm.T.at[lay].set(tl), atm.p, atm.pl, atm.vmr)
    J = np.asarray(jax.jacfwd(f_of_T)(atm.T[lay]))[lay]

    def f64_od(tl):
        a = atm.replace(T=atm.T.at[lay].set(tl))
        return np.asarray(compute_od_layers(lines, iso_tables,
                                            jnp.asarray(axis), a,
                                            profile="sdvoigt"))[lay]

    h = 0.05
    fd = (f64_od(atm.T[lay] + h) - f64_od(atm.T[lay] - h)) / (2 * h)
    scale = np.abs(fd).max()
    assert np.abs(J - fd).max() < 5e-4 * scale, np.abs(J - fd).max() / scale


def test_coarse_far_matches_classic_xs_lattice(iso_tables):
    """Coarse-far scheme (R-decimated guarded-asym far field + 4-point
    Lagrange-cubic upsample + in-kernel interp corrections near centers
    and window edges): pointwise parity with the classic two-pass build
    for both lattice profiles. The scheme activates only for
    statically-exact absolute wings (wing_abs dominating every halfwidth
    wing)."""
    from radtxfr_tpu.products.od import make_xsect_pallas_fn

    lines = synthetic_lines(400, nu_min=500.0, nu_max=700.0, seed=9,
                            sd_zero_frac=0.3)
    axis = arange_drift_free(480.0, 720.0, 0.01)
    T_s = np.array([260.0, 296.0])
    p_s = np.array([0.7, 1.0])
    Tj = jnp.asarray(T_s, dtype=jnp.float32)
    pj = jnp.asarray(p_s, dtype=jnp.float32)
    for prof, tol in (("voigt", 1e-6), ("sdvoigt", 1e-5)):
        f0 = make_xsect_pallas_fn(lines, iso_tables, axis, T_s, p_s,
                                  profile=prof, wing_abs=30.0,
                                  far_method="classic")
        f1 = make_xsect_pallas_fn(lines, iso_tables, axis, T_s, p_s,
                                  profile=prof, wing_abs=30.0,
                                  far_method="coarse", coarse_r=16)
        a = np.asarray(f0(Tj, pj))
        b = np.asarray(f1(Tj, pj))
        peak = np.abs(a).max()
        assert np.abs(a - b).max() < tol * peak, \
            (prof, np.abs(a - b).max() / peak)


def test_coarse_far_guards(iso_tables):
    """far_method='coarse' must refuse halfwidth-dominated wings (the
    static-exactness precondition) and non-multiple correction tiles."""
    from radtxfr_tpu.products.od import make_xsect_pallas_fn

    lines = synthetic_lines(50, nu_min=995.0, nu_max=1005.0, seed=3)
    axis = arange_drift_free(990.0, 1010.0, 0.01)
    with pytest.raises(ValueError):
        make_xsect_pallas_fn(lines, iso_tables, axis, [296.0], [1.0],
                             wing_abs=0.0, far_method="coarse")
    # auto quietly falls back to classic there
    fn = make_xsect_pallas_fn(lines, iso_tables, axis, [296.0], [1.0],
                              wing_abs=0.0, far_method="auto")
    out = np.asarray(fn(jnp.asarray([296.0], dtype=jnp.float32),
                        jnp.asarray([1.0], dtype=jnp.float32)))
    assert np.isfinite(out).all()


def test_coarse_far_dense_list_accuracy(iso_tables):
    """Regression (round 4): on DENSE line lists every grid point sums
    thousands of overlapping far wings, so per-line interpolation biases
    add coherently — linear upsampling measured 2.7e-3-of-peak on the
    30k-line XS lattice (on TPU, where the corr kernel's default-precision
    MXU dot added a bf16-truncation residue near line centers on top of
    the lerp bias). The cubic stencil + HIGHEST-precision interp dot must
    keep a dense config at the same 1e-5-of-peak class as sparse ones."""
    from radtxfr_tpu.products.od import make_xsect_pallas_fn

    # ~50 lines/cm^-1 with 30 cm^-1 windows: each point sums ~2000 wings
    # (wing_abs 30 also dominates the class halfwidth bound of ~29, the
    # static-exactness precondition)
    lines = synthetic_lines(2000, nu_min=600.0, nu_max=640.0, seed=11,
                            sd_zero_frac=0.3)
    axis = arange_drift_free(590.0, 650.0, 0.01)
    T_s = np.array([296.0])
    p_s = np.array([1.0])
    Tj = jnp.asarray(T_s, dtype=jnp.float32)
    pj = jnp.asarray(p_s, dtype=jnp.float32)
    f0 = make_xsect_pallas_fn(lines, iso_tables, axis, T_s, p_s,
                              profile="sdvoigt", wing_abs=30.0,
                              far_method="classic")
    f1 = make_xsect_pallas_fn(lines, iso_tables, axis, T_s, p_s,
                              profile="sdvoigt", wing_abs=30.0,
                              far_method="coarse", coarse_r=8)
    a = np.asarray(f0(Tj, pj))
    b = np.asarray(f1(Tj, pj))
    peak = np.abs(a).max()
    assert np.abs(a - b).max() < 2e-5 * peak, np.abs(a - b).max() / peak


def test_coarse_far_small_wing_plan_disjointness(iso_tables):
    """Regression (round-3 advisor): when wing_abs is small enough that a
    line's near-zone plan and a window-edge plan could share a tile_corr
    tile, the corr kernel (masked only by the true window) would apply the
    correction twice. The guard must keep such wings off the coarse path:
    'coarse' raises, 'auto' falls back to classic bit-exactly."""
    from radtxfr_tpu.products.od import (_coarse_far_min_wing,
                                         make_xsect_pallas_fn)
    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid

    lines = synthetic_lines(200, nu_min=520.0, nu_max=620.0, seed=9,
                            sd_zero_frac=0.3)
    axis = arange_drift_free(500.0, 640.0, 0.0025)
    g = UniformGrid.from_axis(np.asarray(axis))
    # wing 4.5 is wide by the old 16*R*dx=2.56 rule but inside the broken
    # range (< near + edge-band + one corr tile ~ 5.46); without the guard
    # it produced ~1.4e-4 relative error vs classic (double-counted tiles)
    assert 16.0 * 64 * g.dx < 4.5 < _coarse_far_min_wing(g, 64, 4.0)
    T_s = np.array([296.0])
    p_s = np.array([1.0])
    with pytest.raises(ValueError):
        make_xsect_pallas_fn(lines, iso_tables, axis, T_s, p_s,
                             profile="voigt", wing_abs=4.5, wing_hw=5.0,
                             far_method="coarse", coarse_r=64)
    Tj = jnp.asarray(T_s, dtype=jnp.float32)
    pj = jnp.asarray(p_s, dtype=jnp.float32)
    f0 = make_xsect_pallas_fn(lines, iso_tables, axis, T_s, p_s,
                              profile="voigt", wing_abs=4.5, wing_hw=5.0,
                              far_method="classic")
    f1 = make_xsect_pallas_fn(lines, iso_tables, axis, T_s, p_s,
                              profile="voigt", wing_abs=4.5, wing_hw=5.0,
                              far_method="auto", coarse_r=64)
    a = np.asarray(f0(Tj, pj))
    b = np.asarray(f1(Tj, pj))
    np.testing.assert_array_equal(a, b)


def test_coarse_far_layered_od_matches_classic(iso_tables):
    """Layered-OD coarse-far (LBLRTM-convention absolute wings,
    make_od_pallas_fn far_method='coarse'): pointwise parity with the
    classic two-pass build across the 66-layer standard atmosphere."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products.od import make_od_pallas_fn

    atm = std_atmosphere()
    lines = synthetic_lines(300, nu_min=500.0, nu_max=700.0, seed=9,
                            sd_zero_frac=0.3)
    axis = arange_drift_free(480.0, 720.0, 0.01)
    args = (atm.T, atm.p, atm.pl, atm.vmr)
    for prof, tol in (("voigt", 2e-6), ("sdvoigt", 2e-5)):
        f0 = make_od_pallas_fn(lines, iso_tables, axis, atm, profile=prof,
                               wing_abs=25.0, far_method="classic")
        f1 = make_od_pallas_fn(lines, iso_tables, axis, atm, profile=prof,
                               wing_abs=25.0, far_method="coarse",
                               coarse_r=16)
        a = np.asarray(f0(*args))
        b = np.asarray(f1(*args))
        peak = np.abs(a).max()
        assert np.abs(a - b).max() < tol * peak, \
            (prof, np.abs(a - b).max() / peak)
    # hw-dominated wings: auto falls back to classic silently
    fn = make_od_pallas_fn(lines, iso_tables, axis, atm, far_method="auto")
    assert np.isfinite(np.asarray(fn(*args))).all()


def test_work_report_executed_accounting(iso_tables):
    """Builders attach an executed-work manifest (VERDICT r3 #1): every
    call's mode resolves in the hand-counted op table, and the executed
    eval count (padded plan work) upper-bounds the true hapi window work
    of the same configuration."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.kernels.pallas_xsect import _ops_per_eval
    from radtxfr_tpu.products.od import make_od_pallas_fn, wing_bound_matrix

    atm = std_atmosphere()
    lines = synthetic_lines(500, nu_min=520.0, nu_max=680.0, seed=4,
                            sd_zero_frac=0.3)
    axis = arange_drift_free(500.0, 700.0, 0.01)
    # true hapi window work for comparison (sum of per-(layer, line)
    # window lengths on this grid)
    W = wing_bound_matrix(lines, iso_tables, atm)
    nu0 = np.broadcast_to(np.asarray(lines.nu0, dtype=np.float64), W.shape)
    ax = np.asarray(axis)
    lo = np.searchsorted(ax, (nu0 - W).ravel(), side="right")
    hi = np.searchsorted(ax, (nu0 + W).ravel(), side="right")
    window_work = int((hi - lo).sum())
    for prof in ("voigt", "sdvoigt"):
        fn = make_od_pallas_fn(lines, iso_tables, axis, atm, profile=prof)
        rep = fn.work_report
        assert rep, "empty work report"
        ops = sum(r["evals"] * _ops_per_eval(r["n_weideman"], r["mode"])
                  for r in rep)
        assert ops > 0
        evals = sum(r["evals"] for r in rep)
        # the wing passes alone must cover the true window work; the core
        # double-coverage and padding keep the total within a small factor
        assert evals >= window_work
        assert evals < 10 * window_work, (evals, window_work)


def test_ht_differentiable_jacobian_matches_fd(iso_tables):
    """profile='ht' Jacobians on the Pallas path (VERDICT r3 #6): the
    analytic JVP (jax.jvp traced through pcqsdhc_real inside the fused
    tangent kernel) vs central finite differences of the f64 jnp HT
    engine, w.r.t. a layer temperature."""
    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.products.od import make_od_ht_pallas_fn
    from radtxfr_tpu.products import compute_od_layers

    atm = std_atmosphere()
    lines = synthetic_lines(120, nu_min=795.0, nu_max=825.0, seed=77,
                            sd_zero_frac=0.4)
    n = int(np.asarray(lines.nu0).size)
    rng = np.random.default_rng(5)
    ht_rows = rng.random(n) < 0.4
    extras = {"nu_HT_air": rng.uniform(0.01, 0.05, n) * ht_rows,
              "kappa_HT_air": rng.uniform(0.0, 1.0, n) * ht_rows,
              "eta_HT_air": rng.uniform(0.1, 0.3, n) * ht_rows}
    axis = arange_drift_free(800.0, 820.0, 0.01)
    fn = make_od_ht_pallas_fn(lines, iso_tables, axis, atm, extras=extras,
                              differentiable=True)

    lay = 3
    f_of_T = lambda tl: fn(atm.T.at[lay].set(tl), atm.p, atm.pl, atm.vmr)
    J = np.asarray(jax.jacfwd(f_of_T)(atm.T[lay]))[lay]

    # analytic-vs-analytic: the f32 Pallas tangent kernel against the f64
    # jnp engine's own jacfwd (measured 1.3e-6 — the kernel itself)
    def g_jnp(tl):
        a = atm.replace(T=atm.T.at[lay].set(tl))
        return compute_od_layers(lines, iso_tables, jnp.asarray(axis), a,
                                 profile="ht", ht_extras=extras)[lay]

    J64 = np.asarray(jax.jacfwd(g_jnp)(atm.T[lay]))
    scale = np.abs(J64).max()
    assert np.abs(J - J64).max() < 5e-5 * scale, \
        np.abs(J - J64).max() / scale

    # vs central finite differences, masking points near any line's hapi
    # window edge: wing = max(.., hw*Gamma(T)) moves with T, so FD flips
    # whole wing values at the hard-cutoff points — a property of the
    # window RULE, not of the derivative (autodiff treats the window as
    # piecewise-constant, like the reference's FD Jacobians treat it)
    def f64_od(tl):
        return np.asarray(g_jnp(tl))

    h = 0.05
    fd = (f64_od(atm.T[lay] + h) - f64_od(atm.T[lay] - h)) / (2 * h)
    from radtxfr_tpu.kernels.ht_driver import ht_params, resolve_ht_columns
    from radtxfr_tpu.products.od import _line_species_cols

    lines_h = lines.host_view()
    res = resolve_ht_columns(lines_h, extras, {"air": 1.0, "self": 1.0})
    cols = np.asarray(_line_species_cols(lines, atm.mol_ids))
    x_self = np.asarray(atm.vmr)[lay, cols]
    nu0 = np.asarray(lines_h.nu0, dtype=np.float64)
    mask = np.ones(axis.size, dtype=bool)
    for dT in (-h, 0.0, h):
        prm = ht_params(res, lines, iso_tables, float(atm.T[lay]) + dT,
                        float(atm.p[lay]) / 101325.0,
                        abun=[1.0 - x_self, x_self])
        W = np.asarray(prm["wing"], dtype=np.float64)
        for edge in (nu0 - W, nu0 + W):
            k = np.searchsorted(axis, edge)
            for off in (-2, -1, 0, 1, 2):
                mask[np.clip(k + off, 0, axis.size - 1)] = False
    assert np.abs((J - fd)[mask]).max() < 5e-4 * scale, \
        np.abs((J - fd)[mask]).max() / scale


def test_coarse_tile_corr_adaptive():
    """_coarse_tile_corr: widest power-of-two correction tile whose
    near/edge plan-disjointness bound clears wing_abs — 2048 for the
    XS-generator's 350 cm^-1 wings, stepping down for moderate wings
    (the layered 25 cm^-1 LBLRTM convention on a 0.01 grid), never
    below the 512 floor the eligibility guard checks."""
    from radtxfr_tpu.kernels.pallas_xsect import UniformGrid
    from radtxfr_tpu.products.od import (_coarse_far_min_wing,
                                         _coarse_tile_corr)

    g_fine = UniformGrid(x0=400.0, dx=0.0025, n=1000)
    assert _coarse_tile_corr(g_fine, 64, 4.0, 350.0) == 2048
    g_coarse = UniformGrid(x0=480.0, dx=0.01, n=1000)
    tc = _coarse_tile_corr(g_coarse, 16, 4.0, 25.0)
    assert tc == 1024
    assert _coarse_far_min_wing(g_coarse, 16, 4.0, tile_corr=tc) <= 25.0
    # tiny wings: floor at 512 (eligibility itself is the callers' guard)
    assert _coarse_tile_corr(g_coarse, 16, 4.0, 5.0) == 512


def test_fused_param_layouts_equivalent():
    """The lane-aligned fused-kernel param layout ('l': (n_blocks, block,
    n_lay) packing + trace-time-unrolled layer loop with static lane
    picks) computes the same op sequence as the historical sublane layout
    ('s': (n_blocks, n_lay, block) + fori_loop with per-iteration
    lane->sublane relayouts) across every kernel mode — only the data
    movement differs (docs/ROOFLINE.md #6: the relayouts are the core
    passes' measured per-iteration fixed cost). The compiler may contract
    FMAs differently across the two graph shapes (unrolled vs looped), so
    equality is pinned to float-rounding level, not bitwise."""
    from radtxfr_tpu.kernels.lineparams import LineParams
    from radtxfr_tpu.kernels.pallas_xsect import (UniformGrid,
                                                  plan_buckets_packed,
                                                  xsect_pallas)

    rng = np.random.default_rng(0)
    g = UniformGrid(x0=1000.0, dx=0.01, n=2048)
    n_lines, n_lay = 37, 5
    nu0 = np.sort(rng.uniform(1000.5, 1019.5, n_lines))
    plan = plan_buckets_packed(nu0, g, 3.0, tile=256, block="auto")

    def mk(lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, (n_lay, n_lines)),
                           dtype=jnp.float32)

    nu = jnp.asarray(np.tile(nu0, (n_lay, 1)), dtype=jnp.float32)
    params = LineParams(
        strength=mk(0.5, 2.0), gamma_d=mk(0.01, 0.05),
        gamma_0=mk(0.01, 0.1), gamma_2=mk(0.001, 0.01),
        shift0=mk(-0.01, 0.01),
        wing=jnp.full((n_lay, n_lines), 3.0, dtype=jnp.float32),
        nu0=nu, nu0_shifted=nu)
    for mode in ("full", "asym", "core", "lorentz", "doppler", "mix",
                 "sdvoigt", "sdvoigt_asym", "sdvoigt_core",
                 "corr:64:voigt", "corr:64:voigtfull",
                 "corr:64:sdvoigt", "corr:64:sdvoigtfull"):
        a = np.asarray(xsect_pallas(plan, params, mode=mode,
                                    fused_layers=True, param_layout="s"))
        b = np.asarray(xsect_pallas(plan, params, mode=mode,
                                    fused_layers=True, param_layout="l"))
        scale = np.abs(a).max() + 1e-30
        err = np.abs(a - b).max() / scale
        assert err < 2e-5, (mode, err)
