"""Spectral smoothing and resolution reduction.

Reimplements the reference's ``smooth`` (reflected-edge window convolution,
``radiative_transfer.py:1266-1324``) and ``reduceResolution`` (symmetrized
smooth + cubic resample onto a coarser axis, ``:1327-1350``) as TPU-friendly
linear operators:

* the window convolution runs on device (``jnp.convolve``, XLA lowers it to
  an MXU/VPU-friendly form);
* the cubic resample uses **static host-precomputed 4-point Lagrange
  weights** (the spectral axes are static), applied as gathers + a weighted
  sum — replacing scipy's global cubic spline with a local cubic of the same
  O(h^4) accuracy class. For already-smoothed spectra the two agree to ~1e-6
  relative (covered by tests); this is a deliberate divergence: a global
  spline's tridiagonal solve is sequential and TPU-hostile.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["smooth", "reduce_resolution", "cubic_resample_weights", "apply_resample"]

_WINDOWS = {
    "flat": lambda n: np.ones(n),
    "hanning": np.hanning,
    "hamming": np.hamming,
    "bartlett": np.bartlett,
    "blackman": np.blackman,
}


def smooth(x, window_len: int = 11, window: str = "hanning"):
    """Reflected-edge window smoothing, reference semantics
    (``radiative_transfer.py:1298-1324``). Returns an array of ``len(x)``.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    if window_len < 3 or n < window_len:
        return x
    if window not in _WINDOWS:
        raise ValueError(f"window must be one of {sorted(_WINDOWS)}")
    w = _WINDOWS[window](window_len)
    w = jnp.asarray(w / w.sum(), dtype=x.dtype)
    s = jnp.concatenate([x[window_len - 1:0:-1], x, x[-2:-window_len - 1:-1]])
    y = jnp.convolve(s, w, mode="valid")
    ix0 = int(np.ceil(window_len / 2 - 1))
    ix1 = y.shape[0] - int(np.floor(window_len / 2))
    return y[ix0:ix1]


def _sym_smooth(y, window_len, window):
    """0.5*(smooth(y) + smooth(y[::-1])[::-1]) (``radiative_transfer.py:1331``)."""
    return 0.5 * (smooth(y, window_len, window) + smooth(y[::-1], window_len, window)[::-1])


def cubic_resample_weights(x_in: np.ndarray, x_out: np.ndarray):
    """Static 4-point Lagrange interpolation stencil (indices, weights).

    Host-side NumPy; ``x_in`` must be strictly increasing. Out-of-range
    points extrapolate from the edge stencils (matching interp1d's
    ``fill_value='extrapolate'``, ``radiative_transfer.py:1332-1334``).
    Returns (idx (n_out, 4) int32, w (n_out, 4) float64).
    """
    x_in = np.asarray(x_in, dtype=np.float64)
    x_out = np.asarray(x_out, dtype=np.float64)
    n = x_in.size
    # stencil base: the 4 nodes (j-1, j, j+1, j+2) around the bracketing cell
    j = np.searchsorted(x_in, x_out, side="right") - 1
    base = np.clip(j - 1, 0, n - 4)
    idx = base[:, None] + np.arange(4)[None, :]
    xs = x_in[idx]                               # (n_out, 4)
    w = np.ones((x_out.size, 4))
    for k in range(4):
        for m in range(4):
            if m == k:
                continue
            w[:, k] *= (x_out - xs[:, m]) / (xs[:, k] - xs[:, m])
    return idx.astype(np.int32), w


def apply_resample(idx, w, y):
    """Apply a static resample stencil on device: y can be (nX,) or (nX, ...)."""
    y = jnp.asarray(y)
    w = jnp.asarray(w, dtype=y.dtype)
    g = y[idx]                                    # (n_out, 4[, ...])
    if y.ndim == 1:
        return jnp.sum(g * w, axis=1)
    return jnp.sum(g * w.reshape(w.shape + (1,) * (y.ndim - 1)), axis=1)


def reduce_resolution(X, Y, dX, N: int = 4, window: str = "hanning", X_out=None):
    """Smooth + resample to a coarser axis; reference semantics
    (``radiative_transfer.py:1327-1350``).

    ``X`` must be a static (host) axis; ``Y`` may be traced, shape (nX,) or
    (nX, nS). Returns (X_out, Y_out) or Y_out if ``X_out`` was given.
    """
    X = np.asarray(X, dtype=np.float64)
    dx_in = float(np.mean(np.diff(X)))
    sm = int(round(dX / dx_in))

    # The axis is static: smooth it host-side in float64 (on a float32
    # backend, device-smoothing the axis can produce duplicate nodes that
    # break the interpolation stencil).
    def np_smooth(x):
        w = _WINDOWS[window](sm)
        w = w / w.sum()
        s = np.r_[x[sm - 1:0:-1], x, x[-2:-sm - 1:-1]]
        y = np.convolve(w, s, mode="valid")
        return y[int(np.ceil(sm / 2 - 1)): y.size - int(np.floor(sm / 2))]

    x_sm = 0.5 * (np_smooth(X) + np_smooth(X[::-1])[::-1])
    n_pts = int(np.ceil(N * (x_sm[-sm - 1] - x_sm[sm]) / dX)) + 1
    return_x = X_out is None
    if X_out is None:
        X_out = np.linspace(x_sm[sm], x_sm[-sm - 1], n_pts)
    idx, w = cubic_resample_weights(x_sm, np.asarray(X_out, dtype=np.float64))

    y_out = _reduce_apply(jnp.asarray(Y), jnp.asarray(idx), jnp.asarray(w),
                          sm, window)
    return (X_out, y_out) if return_x else y_out


@functools.partial(jax.jit, static_argnames=("sm", "window"))
def _reduce_apply(Y, idx, w, sm, window):
    """Jitted smooth+resample (one compile per shape/window combination)."""
    if Y.ndim == 1:
        y_sm = _sym_smooth(Y, sm, window)
    else:
        y_sm = jax.vmap(lambda col: _sym_smooth(col, sm, window),
                        in_axes=1, out_axes=1)(Y)
    return apply_resample(idx, w, y_sm)
