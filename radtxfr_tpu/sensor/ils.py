"""Instrument line shape (ILS) convolution as a precomputed weight matmul.

The reference builds a dense (nX_hi, n_chan) triangle-lineshape weight array
inside every ``ILS_MAKO`` call and reduces it with broadcasting
(``radiative_transfer.py:1072-1263``). Here the weight matrix is built once
host-side (the spectral axes are static), normalized, and applied on device
as a single matmul — which lands on the MXU and batches over any number of
spectra.

The MAKO 128-channel wavelength axis is packaged data
(``radtxfr_tpu/data/mako_channels_um.npy``, extracted from
``radiative_transfer.py:1092-1223``). The generic hapi slit functions
(``misc/hapi.py:11742-11823``) are provided as window generators for
:func:`ils_matrix`.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")

__all__ = [
    "ils_mako_simple",
    "mako_wavelengths_um",
    "mako_axis_wn",
    "ils_matrix",
    "apply_ils",
    "ils_mako",
    "SLIT_SHAPES",
]


@functools.lru_cache(maxsize=1)
def mako_wavelengths_um() -> np.ndarray:
    """The 128 MAKO channel centers [µm] (radiative_transfer.py:1092-1223)."""
    return np.load(os.path.join(_DATA, "mako_channels_um.npy"))


def mako_axis_wn(X, res_factor=None):
    """MAKO output axis in wavenumbers, trimmed in-band.

    Reproduces ``radiative_transfer.py:1226-1233``: optional resolution
    upsampling by linear interpolation in channel index, µm → cm^-1, sort,
    trim to the open interval (X.min(), X.max()).
    """
    X = np.asarray(X)
    x_um = mako_wavelengths_um()
    if res_factor is not None:
        t0 = np.linspace(0.0, 1.0, x_um.size)
        t1 = np.linspace(0.0, 1.0, int(x_um.size * res_factor))
        x_um = np.interp(t1, t0, x_um)
    x_wn = np.sort(10000.0 / x_um)
    return x_wn[(x_wn > X.min()) & (x_wn < X.max())]


# --- slit-function windows (hapi misc/hapi.py:11742-11823 semantics) --------

def _tri(d, s):
    return np.maximum(1.0 - np.abs(d) / s, 0.0)


def _gauss(d, s):
    return np.exp(-0.5 * (d / s) ** 2) / (s * np.sqrt(2.0 * np.pi))


def _rect(d, s):
    return (np.abs(d) <= s).astype(np.float64)


def _lorentz_slit(d, s):
    return s / (np.pi * (d * d + s * s))


def _cosine(d, s):
    w = np.cos(np.pi / 2.0 * d / s)
    return np.where(np.abs(d) <= s, np.maximum(w, 0.0), 0.0)


def _diffraction(d, s):
    x = np.pi * d / s
    out = np.ones_like(d)
    nz = x != 0
    out[nz] = (np.sin(x[nz]) / x[nz]) ** 2
    return out


def _michelson(d, s):
    x = 2.0 * np.pi * d / s
    out = np.full_like(d, 2.0 / s)
    nz = x != 0
    out[nz] = 2.0 / s * np.sin(x[nz]) / x[nz]
    return out


SLIT_SHAPES = {
    "triangle": _tri,
    "gaussian": _gauss,
    "rectangular": _rect,
    "dispersion": _lorentz_slit,
    "cosine": _cosine,
    "diffraction": _diffraction,
    "michelson": _michelson,
}


def ils_matrix(
    X,
    centers,
    widths,
    shape: str = "triangle",
    shift: float = 0.0,
    scale: float = 1.0,
    normalize: bool = True,
) -> np.ndarray:
    """Dense (nX, n_chan) ILS weight matrix, column-normalized.

    ``centers``/``widths`` are per-channel; the effective center is
    ``scale * center + shift`` (the spectral-calibration parameters of
    ``ILS_MAKO``, ``radiative_transfer.py:1242``).
    """
    X = np.asarray(X, dtype=np.float64)
    centers = np.asarray(centers, dtype=np.float64)
    widths = np.broadcast_to(np.asarray(widths, dtype=np.float64), centers.shape)
    d = X[:, None] - (scale * centers[None, :] + shift)
    W = SLIT_SHAPES[shape](d, widths[None, :])
    if normalize:
        n = W.sum(axis=0)
        n = np.where(n == 0, 1.0, n)
        W = W / n
    return W


def apply_ils(W, Y):
    """Convolve: (nX, n_chan)^T @ (nX[, nS]) -> (n_chan[, nS]) on the MXU.

    Full float32 precision is forced: the TPU matmul default truncates
    operands to bfloat16, which costs ~1.6e-3 relative error on sensor
    channels (measured vs the reference ILS) — unacceptable for a parity
    surface, and this matmul is a negligible fraction of any pipeline.
    """
    import jax

    W = jnp.asarray(W)
    Y = jnp.asarray(Y)
    return jnp.tensordot(W, Y, axes=([0], [0]),
                         precision=jax.lax.Precision.HIGHEST)


def ils_mako(X, Y, res_factor=None, return_x: bool = True,
             fwhm_sf: float = 1.0, shift: float = 0.0, scale: float = 1.0,
             shape: str = "triangle"):
    """MAKO ILS convolution with reference semantics.

    Width rule: sigma = fwhm_sf * |gradient(X_out)| * 1.6
    (``radiative_transfer.py:1241``). The commented-out Gaussian alternative
    (``:1245-1248``) is available via ``shape='gaussian'``.
    """
    X = np.asarray(X)
    x_out = mako_axis_wn(X, res_factor)
    if x_out.size < 2:
        raise ValueError(
            f"only {x_out.size} MAKO channel(s) fall inside "
            f"[{X.min():.1f}, {X.max():.1f}] cm^-1; the MAKO band is "
            f"~760-1321 cm^-1 (7.57-13.16 µm)")
    sigma = fwhm_sf * np.abs(np.gradient(x_out)) * 1.6
    W = ils_matrix(X, x_out, sigma, shape=shape, shift=shift, scale=scale)
    y_out = apply_ils(W, Y)
    return (x_out, y_out) if return_x else y_out


def ils_mako_simple(X, Y):
    """The standalone Gaussian MAKO ILS variant (``ILS_MAKO.py:2-35``).

    Differs from :func:`ils_mako`: Gaussian shape with sigma =
    |gradient(X_out)| (no 1.6 factor, no fwhm_sf/shift/scale), no in-band
    channel trim, matrix normalized by its column sums exactly as the
    script does. Returns (X_out, Y_out) always.
    """
    X = np.asarray(X, dtype=np.float64)
    x_out = np.sort(10000.0 / mako_wavelengths_um())
    sigma = np.abs(np.gradient(x_out))
    W = ils_matrix(X, x_out, sigma, shape="gaussian", normalize=True)
    return x_out, apply_ils(W, Y)
