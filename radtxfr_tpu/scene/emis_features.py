"""Emissivity feature compression: OD transform + PCA / ICA / NMF / B-splines.

TPU-native re-design of the reference's exploratory emissivity-compression
block (``Generate_Emissivity_DB.py:93-193``): clamp emissivities to
``[TOL, 1-TOL]``, work in optical depth ``OD = -log(1 - eps)`` where spectra
are additive and non-negative, and compress the material axis with

* whitened PCA (sklearn ``PCA(whiten=True, n_components=48)``, ``:111``),
* FastICA (``FastICA(n_components=36)``, ``:114-118``) — here a jnp
  symmetric-decorrelation FastICA with the logcosh contrast,
* NMF (``NMF(n_components=48)``, ``:120-123``) — here Lee–Seung
  multiplicative updates (OD is non-negative by construction),
* a cubic B-spline least-squares fit of ``-log(eps)`` on uniform interior
  knots with reconstruction ``eps = exp(-|spline|)`` (``:126-142``) — the
  reference loops scipy ``splrep`` per material; here one design matrix and
  one batched least-squares solve fit every material at once (an
  MXU-shaped ``(n_coef, nX) @ (nX, n_mat)`` problem).

Everything is jittable: fixed iteration counts, static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .generative import PCAModel, pca_fit


from ..utils.precision import f32_matmuls as _f32_matmuls


__all__ = [
    "od_transform", "od_inverse", "pca_compress",
    "ICAModel", "fast_ica",
    "NMFModel", "nmf",
    "bspline_design", "BSplineFit", "bspline_fit_emissivity",
]


def od_transform(emis, tol: float = 1e-4):
    """Emissivity -> optical depth ``-log(1 - eps)`` with the reference's
    TOL clamp (``Generate_Emissivity_DB.py:105-107,111``)."""
    eps = jnp.clip(jnp.asarray(emis), tol, 1.0 - tol)
    return -jnp.log1p(-eps)


def od_inverse(od):
    """Optical depth -> emissivity ``1 - exp(-OD)`` (``:116,122``)."""
    return -jnp.expm1(-jnp.asarray(od))


@_f32_matmuls
def pca_compress(emis, n_components: int = 48, tol: float = 1e-4):
    """Whitened PCA of the OD-transformed emissivity matrix.

    Returns ``(model, features, emis_recon)`` — features are the whitened
    scores, reconstruction goes back through :func:`od_inverse`.
    """
    od = od_transform(emis, tol)
    model: PCAModel = pca_fit(od, n_components)
    feats = model.transform(od)
    return model, feats, od_inverse(model.inverse_transform(feats))


# ---------------------------------------------------------------------------
# FastICA (symmetric decorrelation, logcosh contrast)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ICAModel:
    mean: jax.Array        # (d,)
    whiten: jax.Array      # (k, d) whitening matrix (PCA-based)
    unmix: jax.Array       # (k, k) rotation found by FastICA
    mixing: jax.Array      # (d, k) estimated mixing matrix (sklearn ``mixing_``)

    @_f32_matmuls
    def transform(self, X):
        """Data -> independent sources (n, k)."""
        Xw = (jnp.asarray(X) - self.mean) @ self.whiten.T
        return Xw @ self.unmix.T

    @_f32_matmuls
    def inverse_transform(self, S):
        """Sources -> data space (n, d)."""
        return jnp.asarray(S) @ self.mixing.T + self.mean


def _sym_decorrelate(W):
    """W <- (W W^T)^{-1/2} W via eigen-decomposition."""
    s, u = jnp.linalg.eigh(W @ W.T)
    s = jnp.maximum(s, 1e-12)
    return (u * (1.0 / jnp.sqrt(s))) @ u.T @ W


@_f32_matmuls
def fast_ica(X, n_components: int, key=None, n_iter: int = 200) -> ICAModel:
    """Parallel (symmetric) FastICA with the logcosh contrast.

    jnp equivalent of sklearn ``FastICA`` as used at
    ``Generate_Emissivity_DB.py:114``: PCA-whiten to ``n_components``, then
    fixed-point iterations ``W <- E[g(WX) X^T] - E[g'(WX)] W`` with symmetric
    decorrelation. A fixed iteration count keeps the solve jittable
    (convergence is monitored by the caller via reconstruction error).
    """
    X = jnp.asarray(X)
    n = X.shape[0]
    mean = X.mean(axis=0)
    Xc = X - mean
    # PCA whitening
    U, s, Vt = jnp.linalg.svd(Xc, full_matrices=False)
    k = n_components
    # rcond guard: a near-null direction (s ~ 0) must not be amplified to
    # numerical noise by the whitening division
    s_safe = jnp.maximum(s[:k], s[0] * 1e-9)
    whiten = (Vt[:k] / (s_safe[:, None] / jnp.sqrt(n))).astype(X.dtype)
    Xw = Xc @ whiten.T  # (n, k), unit covariance

    if key is None:
        key = jax.random.PRNGKey(0)
    W0 = jax.random.normal(key, (k, k), dtype=X.dtype)
    W0 = _sym_decorrelate(W0)

    def step(_, W):
        WX = Xw @ W.T                       # (n, k) current sources
        g = jnp.tanh(WX)                    # logcosh contrast derivative
        g_prime = (1.0 - g * g).mean(axis=0)  # (k,)
        W_new = (g.T @ Xw) / n - g_prime[:, None] * W
        return _sym_decorrelate(W_new)

    W = jax.lax.fori_loop(0, n_iter, step, W0)
    # mixing matrix: pseudo-inverse of the full unmixing map (k x d)
    full_unmix = W @ whiten                # (k, d)
    mixing = jnp.linalg.pinv(full_unmix)   # (d, k)
    return ICAModel(mean=mean, whiten=whiten, unmix=W, mixing=mixing)


# ---------------------------------------------------------------------------
# NMF (Lee–Seung multiplicative updates, Frobenius loss)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NMFModel:
    W: jax.Array  # (n, k) per-sample activations
    H: jax.Array  # (k, d) non-negative basis spectra

    @_f32_matmuls
    def inverse_transform(self, W=None):
        W = self.W if W is None else jnp.asarray(W)
        return W @ self.H


@_f32_matmuls
def nmf(X, n_components: int, key=None, n_iter: int = 400,
        eps: float = 1e-9) -> NMFModel:
    """Non-negative matrix factorization ``X ~= W H`` (Frobenius loss).

    jnp multiplicative-update equivalent of sklearn ``NMF`` as used at
    ``Generate_Emissivity_DB.py:120``; both factor updates are matmul-shaped
    and run on the MXU. ``X`` must be non-negative (OD space).
    """
    X = jnp.asarray(X)
    n, d = X.shape
    k = n_components
    if key is None:
        key = jax.random.PRNGKey(0)
    kw, kh = jax.random.split(key)
    scale = jnp.sqrt(jnp.maximum(X.mean(), eps) / k)
    W0 = scale * jnp.abs(jax.random.normal(kw, (n, k), dtype=X.dtype))
    H0 = scale * jnp.abs(jax.random.normal(kh, (k, d), dtype=X.dtype))

    def step(_, WH):
        W, H = WH
        H = H * (W.T @ X) / (W.T @ W @ H + eps)
        W = W * (X @ H.T) / (W @ (H @ H.T) + eps)
        return W, H

    W, H = jax.lax.fori_loop(0, n_iter, step, (W0, H0))
    return NMFModel(W=W, H=H)


# ---------------------------------------------------------------------------
# Cubic B-spline least-squares fit
# ---------------------------------------------------------------------------

def bspline_design(x, n_knots: int, degree: int = 3) -> np.ndarray:
    """Dense B-spline design matrix B (len(x), n_knots + degree - 1).

    Uniform interior knots spanning [x.min(), x.max()] (the reference's
    ``np.linspace(X.min(), X.max(), N)[1:-1]`` passed to ``splrep``,
    ``Generate_Emissivity_DB.py:127``), clamped end knots, Cox–de Boor
    recursion. Built host-side once per axis (static), then every fit is a
    single batched least-squares solve.
    """
    x = np.asarray(x, dtype=np.float64)
    lo, hi = float(x.min()), float(x.max())
    interior = np.linspace(lo, hi, n_knots)[1:-1]
    t = np.concatenate([np.full(degree + 1, lo), interior,
                        np.full(degree + 1, hi)])
    n_coef = len(t) - degree - 1
    # Cox–de Boor, vectorized over x
    B = np.zeros((x.size, len(t) - 1))
    for j in range(len(t) - 1):
        B[:, j] = (x >= t[j]) & (x < t[j + 1])
    # make the last basis include the right endpoint
    B[x == hi, np.searchsorted(t, hi, side="left") - 1] = 1.0
    for p in range(1, degree + 1):
        Bp = np.zeros((x.size, len(t) - 1 - p))
        for j in range(len(t) - 1 - p):
            d1 = t[j + p] - t[j]
            d2 = t[j + p + 1] - t[j + 1]
            term = 0.0
            if d1 > 0:
                term = (x - t[j]) / d1 * B[:, j]
            if d2 > 0:
                term = term + (t[j + p + 1] - x) / d2 * B[:, j + 1]
            Bp[:, j] = term
        B = Bp
    return B[:, :n_coef]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSplineFit:
    design: jax.Array  # (nX, n_coef) B-spline basis on the fit axis
    coefs: jax.Array   # (n_mat, n_coef) per-material spline coefficients

    @_f32_matmuls
    def reconstruct(self):
        """emis = exp(-|B c|) per material (the reference's ``emisFcn``,
        ``Generate_Emissivity_DB.py:137-139``) -> (nX, n_mat)."""
        od = self.design @ self.coefs.T
        return jnp.exp(-jnp.abs(od))


@_f32_matmuls
def bspline_fit_emissivity(X, emis, n_knots: int = 48, degree: int = 3,
                           tol: float = 1e-4) -> BSplineFit:
    """Fit ``-log(eps)`` of every material with one batched lstsq.

    ``emis`` is (nX, n_mat) on axis ``X`` (spectral-axis-first convention).
    Replaces the reference's per-material ``splrep`` loop
    (``Generate_Emissivity_DB.py:130-134``) with a single pseudo-inverse
    matmul: coefficients for all materials at once.
    """
    emis = jnp.clip(jnp.asarray(emis), tol, 1.0 - tol)
    y = -jnp.log(emis)                          # (nX, n_mat)
    B = jnp.asarray(bspline_design(X, n_knots, degree), dtype=y.dtype)
    coefs, *_ = jnp.linalg.lstsq(B, y)          # (n_coef, n_mat)
    return BSplineFit(design=B, coefs=coefs.T)
