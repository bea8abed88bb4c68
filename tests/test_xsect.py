"""Cross-section engine vs the hapi float64 oracle (identical line lists)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.kernels.lineparams import compute_line_params
from radtxfr_tpu.kernels.xsect import xsect_from_params
from radtxfr_tpu.lines.synthetic import synthetic_lines

from oracle import hapi_xsect


GRID = arange_drift_free(550.0, 600.0, 0.01)


def engine_xsect(store, iso_tables, T, p, vmr_self=0.0, profile="voigt",
                 wing_abs=0.0, wing_hw=50.0):
    params = compute_line_params(
        store, iso_tables, T, p, vmr_self=vmr_self,
        wing_abs=wing_abs, wing_hw=wing_hw, profile=profile,
    )
    return np.asarray(xsect_from_params(jnp.asarray(GRID), params, profile=profile))


@pytest.mark.parametrize("T,p", [(296.0, 1.0), (250.0, 0.5), (220.0, 0.05), (310.0, 1.2)])
def test_voigt_xsect_matches_hapi(iso_tables, T, p):
    store = synthetic_lines(300, nu_min=540.0, nu_max=610.0, seed=5)
    _, k_ref = hapi_xsect(store, GRID, T, p, profile="Voigt")
    k = engine_xsect(store, iso_tables, T, p)
    scale = np.abs(k_ref).max()
    np.testing.assert_allclose(k, k_ref, rtol=1e-9, atol=1e-12 * scale)


def test_voigt_xsect_self_broadening(iso_tables):
    store = synthetic_lines(200, nu_min=540.0, nu_max=610.0, seed=6)
    x = 0.3
    _, k_ref = hapi_xsect(store, GRID, 280.0, 0.8,
                          diluent={"air": 1.0 - x, "self": x}, profile="Voigt")
    k = engine_xsect(store, iso_tables, 280.0, 0.8, vmr_self=x)
    np.testing.assert_allclose(k, k_ref, rtol=1e-9, atol=1e-12 * np.abs(k_ref).max())


def test_voigt_xsect_absolute_wing(iso_tables):
    """The XS-generator config: large absolute wing (RT_gen_AbsXS_files.py:19)."""
    store = synthetic_lines(100, nu_min=540.0, nu_max=610.0, seed=8)
    _, k_ref = hapi_xsect(store, GRID, 296.0, 1.0, wing_abs=35.0, wing_hw=50.0)
    k = engine_xsect(store, iso_tables, 296.0, 1.0, wing_abs=35.0, wing_hw=50.0)
    np.testing.assert_allclose(k, k_ref, rtol=1e-9, atol=1e-12 * np.abs(k_ref).max())


def test_lorentz_xsect_matches_hapi(iso_tables):
    store = synthetic_lines(150, nu_min=540.0, nu_max=610.0, seed=9)
    _, k_ref = hapi_xsect(store, GRID, 296.0, 1.0, profile="Lorentz")
    k = engine_xsect(store, iso_tables, 296.0, 1.0, profile="lorentz")
    np.testing.assert_allclose(k, k_ref, rtol=1e-9, atol=1e-12 * np.abs(k_ref).max())


def test_doppler_xsect_matches_hapi(iso_tables):
    store = synthetic_lines(150, nu_min=540.0, nu_max=610.0, seed=10)
    _, k_ref = hapi_xsect(store, GRID, 296.0, 1.0, profile="Doppler")
    # hapi's Doppler driver wings on Gamma0 as well; replicate by passing the
    # same wing rule through gamma params (wing_hw acts on both).
    k = engine_xsect(store, iso_tables, 296.0, 1.0, profile="doppler")
    np.testing.assert_allclose(k, k_ref, rtol=1e-9, atol=1e-12 * np.abs(k_ref).max())


def test_xsect_nonnegative_and_finite(iso_tables):
    store = synthetic_lines(300, nu_min=540.0, nu_max=610.0, seed=12)
    k = engine_xsect(store, iso_tables, 296.0, 1.0)
    assert np.isfinite(k).all()
    assert (k >= 0).all()


def test_xsect_chunk_invariance(iso_tables):
    """Result must not depend on the scan chunking (up to fp association)."""
    store = synthetic_lines(130, nu_min=540.0, nu_max=610.0, seed=13)
    params = compute_line_params(store, iso_tables, 296.0, 1.0)
    a = np.asarray(xsect_from_params(jnp.asarray(GRID), params, chunk=32))
    b = np.asarray(xsect_from_params(jnp.asarray(GRID), params, chunk=512))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=0)


def test_sdvoigt_xsect_matches_hapi(iso_tables):
    store = synthetic_lines(150, nu_min=540.0, nu_max=610.0, seed=14)
    _, k_ref = hapi_xsect(store, GRID, 280.0, 0.7, profile="SDVoigt")
    k = engine_xsect(store, iso_tables, 280.0, 0.7, profile="sdvoigt")
    np.testing.assert_allclose(k, k_ref, rtol=1e-8, atol=1e-12 * np.abs(k_ref).max())


def test_sdvoigt_xsect_self_diluent_matches_hapi(iso_tables):
    store = synthetic_lines(100, nu_min=540.0, nu_max=610.0, seed=15)
    x = 0.25
    _, k_ref = hapi_xsect(store, GRID, 300.0, 1.1,
                          diluent={"air": 1.0 - x, "self": x}, profile="SDVoigt")
    k = engine_xsect(store, iso_tables, 300.0, 1.1, vmr_self=x, profile="sdvoigt")
    np.testing.assert_allclose(k, k_ref, rtol=1e-8, atol=1e-12 * np.abs(k_ref).max())
