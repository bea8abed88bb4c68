"""Planck / brightness-temperature unit tests.

Golden values come from the reference formulas (radiative_transfer.py:792-1014)
evaluated independently in float64 NumPy here, plus round-trip and
physical-limit property tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radtxfr_tpu.core.constants import C1, C2
from radtxfr_tpu.core.planck import planckian, brightness_temperature, bt2l


def ref_planck_wn(X_cm, T):
    """Reference formula, wavenumber mode (radiative_transfer.py:842-845)."""
    nu = np.asarray(X_cm, dtype=np.float64) * 100.0
    return C1 * nu**3 / (np.exp(C2 * nu / T) - 1.0) * 1e4


def ref_planck_wl(X_um, T):
    lam = np.asarray(X_um, dtype=np.float64) * 1e-6
    return C1 / (lam**5 * (np.exp(C2 / (lam * T)) - 1.0)) * 1e-4


def test_planckian_wavenumber_golden():
    X = np.linspace(500.0, 1500.0, 64)
    T = 296.0
    np.testing.assert_allclose(np.asarray(planckian(X, T)).ravel(),
                               ref_planck_wn(X, T), rtol=1e-12)


def test_planckian_wavelength_golden():
    X = np.linspace(7.5, 13.2, 64)
    T = 310.0
    np.testing.assert_allclose(np.asarray(planckian(X, T, wavelength=True)).ravel(),
                               ref_planck_wl(X, T), rtol=1e-12)


def test_planckian_shape_broadcast():
    X = np.linspace(500, 1500, 10)
    T = np.full((3, 4), 300.0)
    L = planckian(X, T)
    assert L.shape == (10, 3, 4)
    # identical T values -> identical spectra
    np.testing.assert_allclose(np.asarray(L[:, 0, 0]), np.asarray(L[:, 2, 3]))


def test_wavenumber_wavelength_consistency():
    """L_wn * dnu == L_wl * dlambda for corresponding axes."""
    wn = 1000.0
    wl = 10000.0 / wn
    T = 296.0
    L_wn = float(np.asarray(planckian(np.array([wn]), T)).ravel()[0])
    L_wl = float(np.asarray(planckian(np.array([wl]), T, wavelength=True)).ravel()[0])
    # dlambda/dnu = 1e4/nu^2 (um per cm^-1)
    np.testing.assert_allclose(L_wn, L_wl * 1e4 / wn**2, rtol=1e-10)


def test_brightness_temperature_round_trip():
    X = np.linspace(600, 1400, 128)
    T = np.array([250.0, 280.0, 296.0, 320.0])
    L = planckian(X, T)
    Tb = brightness_temperature(X, L)
    np.testing.assert_allclose(np.asarray(Tb), np.broadcast_to(T, (128, 4)), rtol=1e-12)


def test_bt2l_round_trip():
    X = np.linspace(600, 1400, 64)
    T = np.full((64,), 296.0)
    L = bt2l(X, T)
    np.testing.assert_allclose(np.asarray(L).ravel(),
                               ref_planck_wn(X, 296.0), rtol=1e-12)


def test_brightness_temperature_bad_values():
    X = np.array([1000.0, 1000.0])
    L = np.array([-1.0, 0.0])
    Tb = np.asarray(brightness_temperature(X, L))
    assert np.isnan(Tb).all()
    Tb2 = np.asarray(brightness_temperature(X, L, bad_value=-77.0))
    np.testing.assert_array_equal(Tb2, [-77.0, -77.0])


def test_planck_monotone_in_T():
    X = np.linspace(600, 1400, 32)
    L1 = np.asarray(planckian(X, 280.0)).ravel()
    L2 = np.asarray(planckian(X, 300.0)).ravel()
    assert (L2 > L1).all()


def test_rayleigh_jeans_limit():
    """Low-frequency limit: L -> 2 c k T nu^2 (checked via ratio -> 1)."""
    X = np.array([1.0])  # 1 cm^-1
    T = 1000.0
    L = float(np.asarray(planckian(X, T)).ravel()[0])
    nu = 100.0  # m^-1
    rj = C1 / C2 * nu**2 * T * 1e4  # same unit scheme
    np.testing.assert_allclose(L, rj, rtol=1e-3)
