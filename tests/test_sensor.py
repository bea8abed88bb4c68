"""Sensor layer: ILS convolution, smoothing, resolution reduction."""

import numpy as np
import jax.numpy as jnp
import pytest

from radtxfr_tpu.sensor.ils import apply_ils, ils_matrix, ils_mako, mako_axis_wn, mako_wavelengths_um
from radtxfr_tpu.sensor.resolution import reduce_resolution, smooth


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
