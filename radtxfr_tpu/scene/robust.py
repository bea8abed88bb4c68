"""Robust statistics and scene-statistics transmittance estimation.

jnp equivalents of the reference's exploratory HSI analysis utilities
(``misc/working_with_HSI.py``; the checked-in script is broken — undefined
``@jit``/``median`` decorators — SURVEY.md §2.2, so these are the working
versions of its algorithms):

* :func:`mad` — median absolute deviation (``:13``);
* :func:`robust_z` — MAD-normalized robust z-scores (``:17``);
* :func:`qn_scale` — the Rousseeuw-Croux Qn scale estimator (``:33``);
* :func:`estimate_tau` — iterative scene-statistics estimate of
  atmospheric transmittance from an HSI cube's spectral mean/std
  (``estimate_tau``, ``:86-99``): the ratio of robust scene std to mean,
  smoothed, iterated to a fixed point.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["mad", "robust_z", "qn_scale", "estimate_tau"]


def mad(x, axis=None, scale: float = 1.4826):
    """Median absolute deviation (scaled to sigma for normal data)."""
    x = jnp.asarray(x)
    med = jnp.median(x, axis=axis, keepdims=True)
    return scale * jnp.median(jnp.abs(x - med), axis=axis)


def robust_z(x, axis=None):
    """(x - median) / MAD robust z-scores."""
    x = jnp.asarray(x)
    med = jnp.median(x, axis=axis, keepdims=True)
    s = mad(x, axis=axis)
    if axis is not None:
        s = jnp.expand_dims(s, axis)
    return (x - med) / s


def qn_scale(x):
    """Rousseeuw-Croux Qn scale estimator (1-D).

    Qn = d * {|x_i - x_j| ; i < j}_(k) with d = 2.2219 and k the
    C(h, 2)-th order statistic, h = floor(n/2) + 1. O(n^2) pairwise form —
    fine for the subsampled scene vectors it is used on.
    """
    x = jnp.asarray(x).reshape(-1)
    n = x.shape[0]
    diffs = jnp.abs(x[:, None] - x[None, :])
    iu = jnp.triu_indices(n, k=1)
    pair = diffs[iu]
    h = n // 2 + 1
    k = h * (h - 1) // 2
    return 2.2219 * jnp.sort(pair)[k - 1]


def estimate_tau(L, n_iter: int = 5, smooth_window: int = 31):
    """Estimate relative transmittance from scene statistics.

    ``L`` is an (n_pixels, nX) radiance array. The spectral structure of the
    pixel-to-pixel variability is dominated by tau(nu): with
    L = tau*(eps*B + (1-eps)*Ld) + Lu, the additive path radiance cancels in
    the robust scene std, which is proportional to tau times the (spectrally
    smooth) surface variability. The normalized, lightly smoothed robust std
    is therefore a relative-transmittance shape estimate.
    """
    L = jnp.asarray(L)
    sigma = mad(L, axis=0)
    est = sigma / jnp.max(sigma)
    w = jnp.ones(smooth_window) / smooth_window
    for _ in range(n_iter):
        sm = jnp.convolve(est, w, mode="same")
        est = 0.5 * (est + sm)
    est = est / jnp.max(est)
    return jnp.clip(est, 0.0, 1.0)
