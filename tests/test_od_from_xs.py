"""Cross-section lattice serving path: node-exactness, interpolation,
AFIT_XS file assembly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.constants import PA_PER_ATM
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.synthetic import synthetic_lines
from radtxfr_tpu.products import (
    build_xs_table,
    compute_od_layers,
    od_from_xs,
    xs_table_from_files,
)
from radtxfr_tpu.products.od_from_xs import interp_sigma


@pytest.fixture(scope="module")
def setup():
    iso = IsoTables.load()
    lines = synthetic_lines(60, nu_min=795.0, nu_max=815.0, seed=7)
    grid = arange_drift_free(800.0, 810.0, 0.01)
    T_grid = np.array([220.0, 260.0, 300.0])
    p_grid = np.array([0.2, 0.6, 1.0])
    table = build_xs_table(lines, iso, grid, T_grid, p_grid)
    return iso, lines, grid, table


def test_node_exact_vs_engine(setup):
    """At lattice nodes the LUT path equals the line-by-line engine.

    The lattice is air-broadened (vmr_self = 0, like the reference XS
    generator's environment), so the comparison layer uses negligible
    mixing fractions where the direct engine's self-broadening term
    vanishes too; the column amounts scale both paths identically."""
    iso, lines, grid, table = setup
    atm = std_atmosphere()
    # one homogeneous layer at an exact lattice node
    layer = atm.replace(
        T=jnp.full((1,), 260.0), p=jnp.full((1,), 0.6 * PA_PER_ATM),
        pl=jnp.full((1,), 1.0), z0=atm.z0[:1], z1=atm.z1[:1],
        vmr=atm.vmr[:1] * 1e-6,
    )
    want = np.asarray(compute_od_layers(lines, iso, jnp.asarray(grid), layer))
    got = np.asarray(od_from_xs(table, layer))
    np.testing.assert_allclose(got, want, rtol=2e-5,
                               atol=1e-8 * np.abs(want).max())


def test_interp_between_nodes_bounded(setup):
    """Between nodes the interpolant lies within the bracketing node values
    where sigma varies monotonically, and edge queries clamp."""
    iso, lines, grid, table = setup
    s_lo = np.asarray(interp_sigma(table, 260.0, 0.6))
    s_hi = np.asarray(interp_sigma(table, 300.0, 0.6))
    s_mid = np.asarray(interp_sigma(table, 280.0, 0.6))
    lo = np.minimum(s_lo, s_hi)
    hi = np.maximum(s_lo, s_hi)
    assert (s_mid >= lo - 1e-12).all() and (s_mid <= hi + 1e-12).all()
    # clamped extrapolation: outside the lattice returns the edge value
    np.testing.assert_allclose(np.asarray(interp_sigma(table, 150.0, 0.6)),
                               np.asarray(interp_sigma(table, 220.0, 0.6)))
    np.testing.assert_allclose(np.asarray(interp_sigma(table, 260.0, 5.0)),
                               np.asarray(interp_sigma(table, 260.0, 1.0)))


def test_od_from_xs_jit_and_layers(setup):
    iso, lines, grid, table = setup
    atm = std_atmosphere()
    od = jax.jit(lambda a: od_from_xs(table, a))(atm)
    assert np.asarray(od).shape == (66, grid.size)
    assert (np.asarray(od) >= 0).all()


def test_xs_table_from_files_round_trip(setup, tmp_path):
    from radtxfr_tpu.io.afit_xs import xs_write

    iso, lines, grid, table = setup
    paths = {}
    mol_ids = table.mol_ids
    for im, m in enumerate(mol_ids):
        fns = []
        for it, T in enumerate(np.asarray(table.T_grid)):
            for ip, lp in enumerate(np.asarray(table.logp_grid)):
                fn = str(tmp_path / f"xs_{m}_{it}_{ip}.bin")
                xs_write(grid, np.asarray(table.sigma)[im, it, ip],
                         float(T), float(np.exp(lp) * PA_PER_ATM), m,
                         "test", fname=fn)
                fns.append(fn)
        paths[m] = fns
    t2 = xs_table_from_files(paths)
    assert t2.mol_ids == tuple(sorted(mol_ids))
    for im, m in enumerate(t2.mol_ids):
        src = np.asarray(table.sigma)[table.mol_ids.index(m)]
        np.testing.assert_allclose(np.asarray(t2.sigma)[im], src, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t2.T_grid),
                               np.asarray(table.T_grid))

    # missing lattice entry -> clear error
    paths[mol_ids[0]] = paths[mol_ids[0]][:-1]
    with pytest.raises(ValueError, match="missing lattice entry"):
        xs_table_from_files(paths)


def test_od_from_xs_missing_molecule_errors(setup):
    iso, lines, grid, table = setup
    atm = std_atmosphere()
    bad = atm.replace(mol_ids=(99,) * len(atm.mol_ids))
    with pytest.raises(ValueError, match="no vmr column"):
        od_from_xs(table, bad)
