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
