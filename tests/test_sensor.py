"""Sensor layer: ILS convolution, smoothing, resolution reduction."""

import numpy as np
import jax.numpy as jnp
import pytest

from radtxfr_tpu.sensor.ils import apply_ils, ils_matrix, ils_mako, mako_axis_wn, mako_wavelengths_um
from radtxfr_tpu.sensor.resolution import reduce_operator, reduce_resolution, smooth


def _ref_ils_mako(X, Y, fwhm_sf=1.0, shift=0.0, scale=1.0):
    """Reference ILS_MAKO math re-derived in NumPy (radiative_transfer.py:1232-1260)."""
    x_out = np.sort(10000.0 / mako_wavelengths_um())
    x_out = x_out[(x_out > X.min()) & (x_out < X.max())]
    sigma = fwhm_sf * np.abs(np.gradient(x_out)) * 1.6
    w = 1.0 - np.abs(X[:, None] - (scale * x_out[None, :] + shift)) / sigma[None, :]
    w[w < 0] = 0
    n = w.sum(axis=0)
    if Y.ndim == 1:
        return x_out, (w * Y[:, None]).sum(axis=0) / n
    return x_out, (w[:, :, None] * Y[:, None, :]).sum(axis=0) / n[:, None]


def test_mako_axis():
    lam = mako_wavelengths_um()
    assert lam.shape == (128,)
    assert lam[0] == pytest.approx(7.5711) and lam[-1] == pytest.approx(13.1594)


def test_ils_mako_matches_reference_math():
    X = np.linspace(700.0, 1400.0, 5000)
    Y = np.exp(-0.5 * ((X - 1000.0) / 100.0) ** 2) + 0.1 * np.sin(X / 7.0)
    want_x, want_y = _ref_ils_mako(X, Y)
    got_x, got_y = ils_mako(X, Y)
    np.testing.assert_allclose(got_x, want_x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=1e-10)


def test_ils_mako_matrix_and_calibration():
    X = np.linspace(700.0, 1400.0, 3000)
    Y = np.random.default_rng(0).random((3000, 5))
    want_x, want_y = _ref_ils_mako(X, Y, fwhm_sf=1.2, shift=0.3, scale=1.001)
    got_x, got_y = ils_mako(X, Y, fwhm_sf=1.2, shift=0.3, scale=1.001)
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=1e-10)
    assert np.asarray(got_y).shape == (want_x.size, 5)


def test_ils_flat_spectrum_preserved():
    """A constant spectrum must convolve to the same constant."""
    X = np.linspace(700.0, 1400.0, 4000)
    _, y = ils_mako(X, np.full(4000, 3.7))
    np.testing.assert_allclose(np.asarray(y), 3.7, rtol=1e-6)


def test_smooth_matches_reference_semantics():
    rng = np.random.default_rng(1)
    x = rng.random(500)
    for window in ("flat", "hanning", "hamming", "bartlett", "blackman"):
        got = np.asarray(smooth(jnp.asarray(x), 11, window))
        # reference formula (radiative_transfer.py:1314-1324)
        s = np.r_[x[10:0:-1], x, x[-2:-12:-1]]
        w = np.ones(11) if window == "flat" else getattr(np, window)(11)
        y = np.convolve(w / w.sum(), s, mode="valid")
        want = y[5:-5]  # ix0 = ceil(11/2 - 1) = 5, ix1 = -floor(11/2) = -5
        assert got.shape == x.shape
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_reduce_resolution_vs_scipy_reference():
    """Local-cubic resample tracks the reference's global-spline pipeline."""
    import scipy.interpolate

    X = np.linspace(800.0, 850.0, 20001)  # 0.0025 spacing
    Y = np.exp(-0.5 * ((X - 825.0) / 3.0) ** 2) + 0.2 * np.sin(X)
    dX = 0.25
    got_x, got_y = reduce_resolution(X, Y, dX)

    # reference pipeline (radiative_transfer.py:1327-1350)
    sm = int(round(dX / np.mean(np.diff(X))))
    ref_sm1 = lambda y: np.asarray(smooth(jnp.asarray(y), sm, "hanning"))
    ref_sm = lambda y: 0.5 * (ref_sm1(y) + ref_sm1(y[::-1])[::-1])
    X_ = ref_sm(X)
    n_pts = int(np.ceil(4 * (X_[-sm - 1] - X_[sm]) / dX)) + 1
    want_x = np.linspace(X_[sm], X_[-sm - 1], n_pts)
    want_y = scipy.interpolate.interp1d(X_, ref_sm(Y), kind="cubic",
                                        bounds_error=False,
                                        fill_value="extrapolate")(want_x)
    np.testing.assert_allclose(got_x, want_x, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=0,
                               atol=2e-6 * np.abs(want_y).max())


def test_reduce_resolution_matrix_input():
    X = np.linspace(800.0, 810.0, 4001)
    Y = np.stack([np.sin(X), np.cos(X)], axis=1)
    x_out, y_out = reduce_resolution(X, Y, 0.25)
    assert np.asarray(y_out).shape == (x_out.size, 2)


def test_reduce_operator_matches_reduce_resolution():
    """The fused banded stencil is numerically identical to the two-stage
    smooth+resample pipeline (same axis, values to ~1e-12 relative)."""
    rng = np.random.default_rng(3)
    X = np.linspace(690.0, 720.0, 12001)  # 0.0025 spacing
    Y = rng.normal(size=(X.size, 4)).cumsum(axis=0) / 50.0
    for dX in (0.25, 0.1875):  # even (sm=100) and odd (sm=75) windows
        x_ref, y_ref = reduce_resolution(X, Y, dX)
        op = reduce_operator(X, dX)
        np.testing.assert_allclose(op.x_out, x_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(op(jnp.asarray(Y))),
                                   np.asarray(y_ref), rtol=1e-9)
    # custom X_out and 1-D input
    op2 = reduce_operator(X, 0.25, X_out=x_ref[2:-2])
    want = reduce_resolution(X, Y[:, 0], 0.25, X_out=x_ref[2:-2])
    np.testing.assert_allclose(np.asarray(op2(jnp.asarray(Y[:, 0]))),
                               np.asarray(want), rtol=1e-9)


def test_reduce_operator_rejects_edge_stencils():
    X = np.linspace(800.0, 810.0, 4001)
    with pytest.raises(ValueError, match="edge"):
        reduce_operator(X, 0.25, X_out=np.asarray([800.0]))


def test_reduce_operator_under_jit():
    import jax

    X = np.linspace(800.0, 812.0, 4801)
    Y = np.sin(X)[:, None] * np.asarray([1.0, 2.0])
    op = reduce_operator(X, 0.25)
    got = jax.jit(lambda y: op(y))(jnp.asarray(Y))
    want = reduce_resolution(X, Y, 0.25, X_out=op.x_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_ils_mako_simple_matches_reference_script():
    """The standalone Gaussian MAKO variant (ILS_MAKO.py:2-35): exact axis,
    sigma = |gradient(X_out)|, column-sum normalization."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ils", "/root/reference/ILS_MAKO.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from radtxfr_tpu.sensor.ils import ils_mako_simple

    X = np.linspace(700.0, 1400.0, 5000)
    Y = np.sin(X / 13.0) ** 2 + 0.3
    x_r, y_r = ref.ILS_MAKO(X, Y)
    x_o, y_o = ils_mako_simple(X, Y)
    np.testing.assert_allclose(x_o, x_r, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y_o), y_r, rtol=1e-9)

    Y2 = np.stack([Y, 2 * Y], axis=1)
    _, y2_r = ref.ILS_MAKO(X, Y2)
    _, y2_o = ils_mako_simple(X, Y2)
    np.testing.assert_allclose(np.asarray(y2_o), y2_r, rtol=1e-9)
