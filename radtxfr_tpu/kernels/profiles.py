"""Normalized line-shape profiles (Voigt / Lorentz / Doppler), branchless jnp.

Numerics match the reference's hapi profiles evaluated in float64:

* Voigt: hapi routes PROFILE_VOIGT through the Hartmann-Tran profile with
  zeroed HT parameters (``misc/hapi.py:10131-10140``), which collapses to
  K(x, y) = sqrt(ln2/pi)/gamma_D * Re w(x + iy) with
  x = sqrt(ln2) * (nu - nu0)/gamma_D, y = sqrt(ln2) * gamma_0/gamma_D
  (``pcqsdhc`` PART1, ``misc/hapi.py:9910-9921``, common part ``:10022``).
* Lorentz: gamma0 / (pi * (gamma0^2 + dnu^2)) (``misc/hapi.py:10142``).
* Doppler: hapi's literal truncated constants are reproduced exactly
  (``cSqrtLn2divSqrtPi``, ``cLn2`` — ``misc/hapi.py:88-90,10160``).

All functions are elementwise over ``dnu`` (already centered, shift applied
by the caller) and broadcast against per-line parameters; safe inside
Pallas kernels and under jit/vmap/grad.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.constants import SQRT_LN2_DIV_SQRT_PI, LN2
from .faddeeva import wofz_real

__all__ = ["voigt", "lorentz", "doppler"]

_SQRT_LN2 = np.sqrt(np.log(2.0))
_INV_SQRT_PI = 1.0 / np.sqrt(np.pi)


def voigt(dnu, gamma_d, gamma_0):
    """Voigt profile value [cm] at ``dnu = nu - (nu0 + shift0)``."""
    cte = _SQRT_LN2 / gamma_d
    x = dnu * cte
    y = gamma_0 * cte
    wr, _ = wofz_real(x, y)
    return cte * _INV_SQRT_PI * wr


def lorentz(dnu, gamma_0):
    """Lorentz profile value [cm]."""
    return gamma_0 / (np.pi * (gamma_0 * gamma_0 + dnu * dnu))


def doppler(dnu, gamma_d):
    """Doppler (Gaussian) profile value [cm], hapi constants."""
    return SQRT_LN2_DIV_SQRT_PI * jnp.exp(-LN2 * (dnu / gamma_d) ** 2) / gamma_d
