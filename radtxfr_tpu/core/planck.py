"""Planck radiation physics as pure jnp functions.

TPU-native reimplementation of the Planck / brightness-temperature trio of
the reference (``radiative_transfer.py:792-1014``):

* :func:`planckian` — spectral radiance B(X, T); broadcasting X (N,) against
  T of arbitrary shape to produce (N, *T.shape), spectral axis first (the
  repo-wide convention, reference ``radiative_transfer.py:25``).
* :func:`brightness_temperature` — inverse of :func:`planckian` in T.
* :func:`bt2l` — forward brightness-temperature → radiance.

Differences from the reference (deliberate, TPU-first):

* No ``mean(X) < 50`` wavelength auto-detection heuristic
  (``radiative_transfer.py:836``) — units are explicit via ``wavelength=``.
  Data-dependent Python branching cannot live under ``jit``.
* No in-place NaN-ification via boolean indexing — invalid radiances map to
  ``bad_value`` through ``jnp.where`` (``radiative_transfer.py:922-923``).
* Everything is dtype-polymorphic (float32 for TPU speed, float64 under
  ``jax_enable_x64`` for oracle comparisons) and jit/vmap/grad-safe.

Units match the reference exactly:
wavenumber mode: X [cm^-1] → L [µW/(cm^2 sr cm^-1)];
wavelength mode: X [µm]    → L [µW/(cm^2 sr µm)] (microflick).
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import C1, C2

__all__ = ["planckian", "brightness_temperature", "bt2l"]


def _broadcast_spectral(X, T):
    """X (N,) column against flattened T row; remember T's shape."""
    X = jnp.asarray(X).reshape(-1)[:, None]
    T = jnp.asarray(T)
    t_shape = T.shape
    T = T.reshape(-1)[None, :]
    return X, T, t_shape


def planckian(X, T, wavelength: bool = False):
    """Planck spectral radiance.

    Parameters
    ----------
    X : (N,) array — spectral axis, wavenumbers [cm^-1] (or µm if
        ``wavelength=True``).
    T : array of arbitrary shape — temperature [K].
    wavelength : interpret ``X`` as wavelength in µm.

    Returns
    -------
    L : (N, *T.shape) array, [µW/(cm^2 sr cm^-1)] (or µF in wavelength mode).

    Reference semantics: ``radiative_transfer.py:792-848``.
    """
    X, T, t_shape = _broadcast_spectral(X, T)
    if wavelength:
        lam = X * 1e-6  # [m] from [µm]
        L = C1 / (lam**5 * jnp.expm1(C2 / (lam * T)))  # [W/(m^2 sr m)]
        L = L * 1e-4  # → [µW/(cm^2 sr µm)]
    else:
        nu = X * 100.0  # [1/m] from [1/cm]
        L = C1 * nu**3 / jnp.expm1(C2 * nu / T)  # [W/(m^2 sr m^-1)]
        L = L * 1e4  # → [µW/(cm^2 sr cm^-1)]
    return L.reshape((X.shape[0], *t_shape))


def brightness_temperature(X, L, wavelength: bool = False, bad_value=jnp.nan):
    """Brightness temperature from spectral radiance.

    ``L`` has the spectral axis first, shape (N, ...) broadcast-compatible
    with ``X`` (N,). Unphysical radiances (L <= 0, non-finite) produce
    ``bad_value``. Reference: ``radiative_transfer.py:851-933``.
    """
    X = jnp.asarray(X).reshape(-1)
    L = jnp.asarray(L)
    Xb = X.reshape((-1,) + (1,) * (L.ndim - 1))
    if wavelength:
        lam = Xb * 1e-6
        L_si = L * 1e4  # [W/(m^2 sr m)] from µF
        T = C2 / (lam * jnp.log1p(C1 / (lam**5 * L_si)))
    else:
        nu = Xb * 100.0
        L_si = L * 1e-4  # [W/(m^2 sr m^-1)]
        T = C2 * nu / jnp.log1p(C1 * nu**3 / L_si)
    bad = ~jnp.isfinite(L) | (L <= 0)
    return jnp.where(bad, bad_value, T)


def bt2l(X, T, wavelength: bool = False, bad_value=jnp.nan):
    """Spectral radiance from brightness temperature (forward of
    :func:`brightness_temperature`). Reference: ``radiative_transfer.py:936-1014``.
    """
    X = jnp.asarray(X).reshape(-1)
    T = jnp.asarray(T)
    Xb = X.reshape((-1,) + (1,) * (T.ndim - 1))
    if wavelength:
        lam = Xb * 1e-6
        L = C1 / (lam**5 * jnp.expm1(C2 / (lam * T))) * 1e-4
    else:
        nu = Xb * 100.0
        L = C1 * nu**3 / jnp.expm1(C2 * nu / T) * 1e4
    bad = ~jnp.isfinite(T) | (T <= 0)
    return jnp.where(bad, bad_value, L)
