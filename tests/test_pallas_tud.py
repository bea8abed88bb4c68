"""Fused Pallas TUD composition vs the jnp scan path (interpret mode).

The kernel (kernels/pallas_tud.py) bakes altitudes/secants/quadrature in
as compile-time constants; these tests pin its float32 results to the
float32-cast jnp composition (products/tud.py::tud_from_od) across the
full option surface: multiple slant secants, below-ground altitudes,
``return_od``, the gauss quadrature, the in-kernel Planck source, and
grids that need tile padding.

Also covers the ReduceOperator gather-free strided-frame path
(sensor/resolution.py::ReduceOperator._build_affine) against the raw
stencil formula — exact to float64 rounding on the affine production
axes, and falling back to the gather on a non-affine axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.core.planck import planckian
from radtxfr_tpu.products.tud import make_tud_pallas_fn, tud_from_od
from radtxfr_tpu.sensor.resolution import reduce_operator


def _setup(n_x=3000, n_lay=24, seed=0):
    rng = np.random.default_rng(seed)
    z0 = np.linspace(0.0, 65.0, n_lay)
    T = (230.0 + 60.0 * rng.random(n_lay)).astype(np.float32)
    od = (0.2 * rng.random((n_lay, n_x))).astype(np.float32)
    x = np.linspace(690.0, 1410.0, n_x)
    return z0, T, od, x


@pytest.mark.parametrize(
    "alts,mu,n_angles,return_od,quad",
    [
        ([0.061, 1.524, 6.096, 15.24, 500.0], [1.0], 30, False, "uniform"),
        ([-1.0, 5.0, 500.0], [1.0, 1.7], 10, True, "uniform"),
        ([2.0, 500.0], [1.3], 8, False, "gauss"),
    ],
)
def test_pallas_tud_matches_jnp(alts, mu, n_angles, return_od, quad):
    z0, T, od, x = _setup()
    B = jnp.swapaxes(
        planckian(jnp.asarray(x, jnp.float32), jnp.asarray(T)), 0, 1
    ).astype(jnp.float32)
    ref = tud_from_od(jnp.asarray(x, jnp.float32), jnp.asarray(od), B,
                      jnp.asarray(z0, jnp.float32),
                      jnp.asarray(alts, jnp.float32),
                      mu=jnp.asarray(mu, jnp.float32), n_angles=n_angles,
                      return_od=return_od, quadrature=quad)
    for planck in (True, False):
        fn = make_tud_pallas_fn(z0, alts, mu=mu, n_angles=n_angles,
                                return_od=return_od, quadrature=quad,
                                planck=planck)
        got = fn(x, od, T if planck else np.asarray(B))
        for name, r, g in [("tau", ref.tau, got.tau), ("Lu", ref.Lu, got.Lu),
                           ("Ld", ref.Ld, got.Ld)]:
            r, g = np.asarray(r), np.asarray(g)
            assert r.shape == g.shape, (name, r.shape, g.shape)
            err = np.abs(g - r).max() / max(np.abs(r).max(), 1e-30)
            assert err < 5e-6, (name, planck, err)


def test_pallas_tud_odd_layer_count():
    """Odd nL exercises the down pass's unroll-by-2 remainder step."""
    z0, T, od, x = _setup(n_lay=23)
    alts = [1.0, 500.0]
    B = jnp.swapaxes(
        planckian(jnp.asarray(x, jnp.float32), jnp.asarray(T)), 0, 1
    ).astype(jnp.float32)
    ref = tud_from_od(jnp.asarray(x, jnp.float32), jnp.asarray(od), B,
                      jnp.asarray(z0, jnp.float32),
                      jnp.asarray(alts, jnp.float32), n_angles=12)
    got = make_tud_pallas_fn(z0, alts, n_angles=12)(x, od, T)
    for name, r, g in [("tau", ref.tau, got.tau), ("Lu", ref.Lu, got.Lu),
                       ("Ld", ref.Ld, got.Ld)]:
        r, g = np.asarray(r), np.asarray(g)
        assert np.abs(g - r).max() / np.abs(r).max() < 5e-6, name


def test_pallas_tud_jittable_and_padding():
    """The returned fn is jit-safe in its array args, and a grid that is
    not a tile multiple is padded internally without changing results."""
    z0, T, od, x = _setup(n_x=1024 + 37)
    alts = [1.0, 500.0]
    fn = make_tud_pallas_fn(z0, alts, t_lanes=1024)
    direct = fn(x, od, T)
    jitted = jax.jit(lambda o, t: fn(jnp.asarray(x, jnp.float32), o, t))(
        jnp.asarray(od), jnp.asarray(T))
    assert np.allclose(np.asarray(direct.Ld), np.asarray(jitted.Ld),
                       rtol=0, atol=0)
    B = jnp.swapaxes(
        planckian(jnp.asarray(x, jnp.float32), jnp.asarray(T)), 0, 1
    ).astype(jnp.float32)
    ref = tud_from_od(jnp.asarray(x, jnp.float32), jnp.asarray(od), B,
                      jnp.asarray(z0, jnp.float32),
                      jnp.asarray(alts, jnp.float32), n_angles=30)
    err = (np.abs(np.asarray(direct.tau) - np.asarray(ref.tau)).max()
           / np.abs(np.asarray(ref.tau)).max())
    assert err < 5e-6


def test_reduce_operator_affine_matches_stencil():
    """The strided-frame path equals the raw gather stencil to float64
    rounding on the production axes (which are affine)."""
    rng = np.random.default_rng(1)
    for lo, hi, dv in [(690.0, 790.0, 0.0005), (500.0, 1500.0, 0.0025)]:
        X = arange_drift_free(lo, hi, dv)
        op = reduce_operator(X, 0.25)
        assert op._affine is not None
        Y = rng.random((X.size, 3))
        got = np.asarray(op(jnp.asarray(Y)))
        s = np.asarray(op.starts)
        ref = np.einsum("ow,owc->oc", np.asarray(op.weights),
                        Y[s[:, None] + np.arange(op.width)[None, :]])
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12
        got1 = np.asarray(op(jnp.asarray(Y[:, 0])))
        assert np.allclose(got1, ref[:, 0], rtol=1e-12)


def test_reduce_operator_nonaffine_falls_back():
    """An alternating-stride axis (dX/dv/N not integral) must route to the
    exact gather path."""
    X = arange_drift_free(800.0, 900.0, 0.01)
    op = reduce_operator(X, 0.5)          # stride 12.5 -> 12/13 alternation
    assert op._affine is None
    rng = np.random.default_rng(2)
    Y = rng.random(X.size)
    got = np.asarray(op(jnp.asarray(Y)))
    s = np.asarray(op.starts)
    ref = (np.asarray(op.weights)
           * Y[s[:, None] + np.arange(op.width)[None, :]]).sum(axis=1)
    assert np.allclose(got, ref, rtol=1e-12)
