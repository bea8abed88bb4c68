"""Generative atmosphere-ensemble model: PCA + GMM, all in JAX.

Re-implements the reference's ``GenerativeModel_AtmosInputs.py`` pipeline on
device:

* whitened PCA + Gaussian-mixture density model over feature vectors
  (reference uses sklearn ``PCA(whiten=True)`` +
  ``BayesianGaussianMixture(covariance_type='full')``,
  ``GenerativeModel_AtmosInputs.py:17-46``; here: SVD PCA + a variational
  GMM with the same Dirichlet-process stick-breaking weight prior
  (:func:`bgmm_fit`) so surplus components auto-prune as in sklearn;
  means/covariances use MAP updates rather than the full Normal-Wishart
  posterior — a documented simplification. Plain EM (:func:`gmm_fit`)
  remains available);
* the physics feature transforms — ground-temperature/lapse normalization
  (``trans_T``/``itrans_T``, ``:90-126``), normalized cumulative column
  moles (``trans_C``/``itrans_C``, ``:128-165``; ``mf2mol_cum``/
  ``mol_cum2mf``, ``:61-77``) — with the same plausibility rejection rules;
* supersaturation filtering (``RH_filter``, ``:79-84``); the external
  ``atmos`` package's RH is replaced by an internal Bolton-1980 saturation
  vapor pressure (divergence: different es(T) parameterization, same
  structure incl. the P < 101325 e^-3 high-altitude zeroing);
* ``atmos_generator`` with 5x oversampling + rejection (``:212-243``),
  air-mass clustering (``airmass_labels``, ``:391-419``) and per-air-mass
  augmentation (``gen_samples_per_airmass``, ``:421-443``) — keyed
  ``jax.random`` instead of global numpy state.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


from ..utils.precision import f32_matmuls as _f32_matmuls


__all__ = [
    "PCAModel", "pca_fit",
    "GMMModel", "gmm_fit", "bgmm_fit", "gmm_prune", "gmm_sample",
    "gmm_log_prob", "gmm_predict",
    "mf2mol_cum", "mol_cum2mf", "mf2rh", "rh_filter",
    "trans_T", "itrans_T", "trans_C", "itrans_C",
    "atmos_to_features", "features_to_atmos",
    "atmos_generator", "airmass_labels", "gen_samples_per_airmass",
]


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PCAModel:
    mean: jax.Array        # (d,)
    components: jax.Array  # (k, d) principal axes (rows)
    scale: jax.Array       # (k,) sqrt(explained variance) for whitening
    explained_variance_ratio: jax.Array  # (k,)

    @_f32_matmuls
    def transform(self, X):
        Z = (jnp.asarray(X) - self.mean) @ self.components.T
        return Z / self.scale

    @_f32_matmuls
    def inverse_transform(self, Z):
        return (jnp.asarray(Z) * self.scale) @ self.components + self.mean


@_f32_matmuls
def pca_fit(X, n_components: int) -> PCAModel:
    """Whitened PCA via SVD (sklearn ``PCA(whiten=True)`` semantics)."""
    X = jnp.asarray(X)
    mean = X.mean(axis=0)
    Xc = X - mean
    U, s, Vt = jnp.linalg.svd(Xc, full_matrices=False)
    n = X.shape[0]
    var = (s**2) / (n - 1)
    return PCAModel(
        mean=mean,
        components=Vt[:n_components],
        scale=jnp.sqrt(var[:n_components]),
        explained_variance_ratio=var[:n_components] / var.sum(),
    )


# ---------------------------------------------------------------------------
# Full-covariance Gaussian mixture via EM
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GMMModel:
    weights: jax.Array  # (K,)
    means: jax.Array    # (K, d)
    chols: jax.Array    # (K, d, d) lower Cholesky factors of covariances


def _log_gauss(X, means, chols):
    """(N, K) log N(x | mu_k, Sigma_k) via Cholesky solves."""
    d = X.shape[-1]
    diff = X[:, None, :] - means[None, :, :]                     # (N, K, d)
    sol = jax.vmap(
        lambda L, v: jax.scipy.linalg.solve_triangular(L, v.T, lower=True).T,
        in_axes=(0, 1), out_axes=1,
    )(chols, diff)                                               # (N, K, d)
    maha = jnp.sum(sol**2, axis=-1)
    logdet = jnp.sum(jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (maha + d * jnp.log(2.0 * jnp.pi)) - logdet[None, :]


@_f32_matmuls
def gmm_fit(key, X, n_components: int, n_iter: int = 200, reg: float = 1e-6) -> GMMModel:
    """EM fit of a full-covariance GMM (plain maximum likelihood)."""
    X = jnp.asarray(X)
    n, d = X.shape
    # datasets smaller than n_components seed with replacement (duplicate
    # seeds separate during EM via the responsibility updates)
    k0 = jax.random.choice(key, n, (n_components,),
                           replace=(n < n_components))
    means0 = X[k0]
    cov0 = jnp.cov(X.T) + reg * jnp.eye(d)
    chol0 = jnp.linalg.cholesky(jnp.broadcast_to(cov0, (n_components, d, d)))
    w0 = jnp.full((n_components,), 1.0 / n_components)

    def em_step(_, state):
        w, mu, ch = state
        logp = _log_gauss(X, mu, ch) + jnp.log(w)[None, :]
        logr = logp - logsumexp(logp, axis=1, keepdims=True)
        r = jnp.exp(logr)                                        # (N, K)
        nk = r.sum(axis=0) + 1e-10
        w = nk / n
        mu = (r.T @ X) / nk[:, None]
        diff = X[:, None, :] - mu[None, :, :]
        cov = jnp.einsum("nk,nki,nkj->kij", r, diff, diff) / nk[:, None, None]
        cov = cov + reg * jnp.eye(d)[None]
        ch = jnp.linalg.cholesky(cov)
        return w, mu, ch

    w, mu, ch = jax.lax.fori_loop(0, n_iter, em_step, (w0, means0, chol0))
    return GMMModel(weights=w, means=mu, chols=ch)


def _stick_breaking_log_weights(nk, gamma0):
    """E[ln pi_k] under the truncated stick-breaking posterior
    (a_k = 1 + N_k, b_k = gamma + sum_{j>k} N_j; Blei & Jordan 2006 —
    sklearn's 'dirichlet_process' weight update)."""
    from jax.scipy.special import digamma

    a = 1.0 + nk
    b = gamma0 + jnp.cumsum(nk[::-1])[::-1] - nk
    dig_sum = digamma(a + b)
    log_v = digamma(a) - dig_sum
    log_1mv = digamma(b) - dig_sum
    return log_v + jnp.concatenate([jnp.zeros(1), jnp.cumsum(log_1mv)[:-1]])


@_f32_matmuls
def bgmm_fit(key, X, n_components: int, n_iter: int = 500, reg: float = 1e-6,
             weight_concentration_prior: float | None = None) -> GMMModel:
    """Variational GMM with Dirichlet-process weights and Normal-Wishart
    component posteriors — the behavior of sklearn's
    ``BayesianGaussianMixture`` the reference relies on
    (``GenerativeModel_AtmosInputs.py:30,401``): surplus components are
    driven to ~zero weight, so the effective cluster count adapts to the
    data instead of being fixed.

    Variational updates follow Bishop PRML §10.2 with sklearn's default
    priors: stick-breaking weight concentration gamma = 1/K, mean precision
    beta0 = 1 at m0 = mean(X), Wishart dof nu0 = d with the empirical
    covariance as scale prior. The Normal-Wishart E-step terms
    (E[ln det Lambda] - d/beta - nu * mahalanobis) supply the Occam
    pressure that collapses redundant components — a MAP/EM covariance
    update (``gmm_fit``) has no such pressure and keeps every slot alive.

    Returns a :class:`GMMModel` with the variational expected weights
    (near-zero for pruned components; :func:`gmm_prune` drops them) and
    the posterior-expected covariances W^{-1}/(nu - d - 1).
    """
    from jax.scipy.special import digamma

    X = jnp.asarray(X)
    n, d = X.shape
    gamma0 = (weight_concentration_prior
              if weight_concentration_prior is not None
              else 1.0 / n_components)
    beta0 = 1.0
    nu0 = float(d)
    m0 = X.mean(axis=0)
    Xc = X - m0
    W0inv = (Xc.T @ Xc) / n + reg * jnp.eye(d)
    eye = jnp.eye(d)
    iarange = jnp.arange(1, d + 1)
    ln2, ln2pi = jnp.log(2.0), jnp.log(2.0 * jnp.pi)
    eps = 10 * jnp.finfo(X.dtype).eps

    def posteriors(r):
        nk = r.sum(axis=0) + eps
        xbar = (r.T @ X) / nk[:, None]
        diff = X[:, None, :] - xbar[None, :, :]
        nk_sk = jnp.einsum("nk,nki,nkj->kij", r, diff, diff)
        beta = beta0 + nk
        nu = nu0 + nk
        m = (beta0 * m0 + nk[:, None] * xbar) / beta[:, None]
        dm = xbar - m0
        w_inv = (W0inv[None] + nk_sk
                 + (beta0 * nk / beta)[:, None, None]
                 * jnp.einsum("ki,kj->kij", dm, dm))
        return nk, beta, nu, m, w_inv

    def e_step(nk, beta, nu, m, w_inv):
        L = jnp.linalg.cholesky(w_inv)          # W^{-1} = L L^T
        lndet_winv = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        eln_lam = (jnp.sum(digamma(0.5 * (nu[:, None] + 1.0 - iarange)),
                           axis=1) + d * ln2 - lndet_winv)
        diff = X[:, None, :] - m[None, :, :]
        sol = jax.vmap(
            lambda Lk, v: jax.scipy.linalg.solve_triangular(
                Lk, v.T, lower=True).T,
            in_axes=(0, 1), out_axes=1)(L, diff)
        maha = jnp.sum(sol**2, axis=-1)         # (x-m)^T W (x-m)
        log_w = _stick_breaking_log_weights(nk, gamma0)
        logrho = (log_w[None, :] + 0.5 * eln_lam[None, :]
                  - 0.5 * d / beta[None, :] - 0.5 * nu[None, :] * maha
                  - 0.5 * d * ln2pi)
        return jnp.exp(logrho - logsumexp(logrho, axis=1, keepdims=True))

    # init: hard assignment to K distinct random data points. When the
    # dataset is smaller than n_components, sample seeds with replacement
    # (sklearn's BayesianGaussianMixture also accepts n < K; surplus
    # components are pruned by the stick-breaking weights).
    k0 = jax.random.choice(key, n, (n_components,), replace=(n < n_components))
    d2 = jnp.sum((X[:, None, :] - X[k0][None, :, :]) ** 2, axis=-1)
    r0 = jax.nn.one_hot(jnp.argmin(d2, axis=1), n_components, dtype=X.dtype)

    def vb_step(_, r):
        return e_step(*posteriors(r))

    r = jax.lax.fori_loop(0, n_iter, vb_step, r0)
    nk, beta, nu, m, w_inv = posteriors(r)
    v_a = 1.0 + nk
    v_b = gamma0 + jnp.cumsum(nk[::-1])[::-1] - nk
    v = v_a / (v_a + v_b)
    w = v * jnp.concatenate([jnp.ones(1), jnp.cumprod(1.0 - v)[:-1]])
    w = w / w.sum()
    cov = w_inv / jnp.maximum(nu - d - 1.0, 1e-3)[:, None, None] + reg * eye
    return GMMModel(weights=w, means=m, chols=jnp.linalg.cholesky(cov))


def gmm_prune(model: GMMModel, threshold: float = 1e-3) -> GMMModel:
    """Drop components below a weight threshold (host-side, renormalized)."""
    w = np.asarray(model.weights)
    keep = np.nonzero(w > threshold)[0]
    if keep.size == 0:
        keep = np.array([int(w.argmax())])
    w_k = w[keep]
    return GMMModel(weights=jnp.asarray(w_k / w_k.sum()),
                    means=model.means[keep], chols=model.chols[keep])


@_f32_matmuls
def gmm_log_prob(model: GMMModel, X):
    """Per-sample log density (sklearn ``score_samples``)."""
    logp = _log_gauss(jnp.asarray(X), model.means, model.chols)
    return logsumexp(logp + jnp.log(model.weights)[None, :], axis=1)


@_f32_matmuls
def gmm_predict(model: GMMModel, X):
    logp = _log_gauss(jnp.asarray(X), model.means, model.chols)
    return jnp.argmax(logp + jnp.log(model.weights)[None, :], axis=1)


@_f32_matmuls
def gmm_sample(key, model: GMMModel, n: int):
    k1, k2 = jax.random.split(key)
    comp = jax.random.categorical(k1, jnp.log(model.weights), shape=(n,))
    eps = jax.random.normal(k2, (n, model.means.shape[1]))
    return model.means[comp] + jnp.einsum("nij,nj->ni", model.chols[comp], eps)


# ---------------------------------------------------------------------------
# Atmospheric variable conversions (GenerativeModel_AtmosInputs.py:52-84)
# ---------------------------------------------------------------------------

_R_GAS = 8.314  # [J/K/mol]
_MIX2MASS = 18.0 / (0.8 * 28.0 + 0.2 * 32.0)  # vmr -> mass mixing ratio


def mf2mol_cum(x, P, T):
    """Cumulative column moles (reference ``mf2mol_cum``, ``:61-66``)."""
    rho = (jnp.asarray(P)[None, :] / jnp.asarray(T)) / _R_GAS
    return jnp.cumsum(rho * x, axis=1)


def mol_cum2mf(c, P, T):
    """Inverse of :func:`mf2mol_cum` with negativity clamps (``:68-77``)."""
    c = jnp.maximum(jnp.asarray(c), 0.0)
    c_diff = jnp.maximum(jnp.diff(c, axis=1), 0.0)
    x = jnp.concatenate([c[:, :1], c_diff], axis=1)
    rho = (jnp.asarray(P)[None, :] / jnp.asarray(T)) / _R_GAS
    return x / rho


def _saturation_vapor_pressure(T):
    """Bolton (1980) es(T) [Pa] (replaces the external ``atmos`` package)."""
    Tc = T - 273.15
    return 611.2 * jnp.exp(17.67 * Tc / (Tc + 243.5))


def mf2rh(P, T, mf):
    """Relative humidity [%] from H2O volume mixing fraction (``:52-59``)."""
    P = jnp.asarray(P)
    W = jnp.maximum(jnp.asarray(mf), 0.0)
    # zero out above the reference's pressure cutoff (101325 * e^-3 Pa)
    W = jnp.where(P[None, :] < 101325.0 * np.exp(-3.0), 0.0, W)
    w_mass = W * _MIX2MASS
    e = w_mass * P[None, :] / (w_mass + 0.622)
    rh = 100.0 * e / _saturation_vapor_pressure(jnp.asarray(T))
    return jnp.where((rh < 0) | (W == 0), 0.0, rh)


def rh_filter(P, T, H2O, rh_max: float = 96.0):
    """Boolean mask of profiles with no supersaturated layer (``:79-84``)."""
    rh = mf2rh(P, T, H2O)
    return ~jnp.any(rh > rh_max, axis=1)


# ---------------------------------------------------------------------------
# Feature transforms (GenerativeModel_AtmosInputs.py:90-206)
# ---------------------------------------------------------------------------

def trans_T(T, P, Tm=None):
    T_ = jnp.asarray(T)
    if Tm is not None:
        T_ = T_ - jnp.asarray(Tm)[None, :]
    Tg = T_[:, 0]
    T_ = T_ - Tg[:, None]
    Tr = T_[:, 1:]
    Trm, Trs = Tr.mean(), Tr.std()
    Tgm, Tgs = Tg.mean(), Tg.std()
    Tg = (Tg - Tgm) / Tgs
    Tr = (Tr - Trm) / Trs
    w = (jnp.asarray(P)[1:] * Tr).std(axis=0)
    w = w / w.sum()
    w = jnp.append(w, 3.0 * w.max())
    feats = jnp.hstack([Tr, Tg[:, None]])
    return feats, (Tgm, Tgs, Trm, Trs), w


def itrans_T(feats, trans_vars, T=None, q: float = 0.1, Tm=None):
    Tgm, Tgs, Trm, Trs = trans_vars
    Tg = feats[:, -1] * Tgs + Tgm
    Tr = feats[:, :-1] * Trs + Trm + Tg[:, None]
    T_ = jnp.hstack([Tg[:, None], Tr])
    if Tm is not None:
        T_ = T_ + jnp.asarray(Tm)[None, :]
    ok = jnp.ones(T_.shape[0], dtype=bool)
    if T is not None:
        T = jnp.asarray(T)
        bad = (jnp.any(T_ - (1 - q) * T.min(axis=0)[None, :] < 0, axis=1)
               | jnp.any(T_ - (1 + q) * T.max(axis=0)[None, :] > 0, axis=1))
        bad = bad | jnp.any(
            jnp.abs(jnp.diff(T_, axis=1))
            - (1 + q) * jnp.abs(jnp.diff(T, axis=1)).max(axis=0)[None, :] > 0,
            axis=1,
        )
        ok = ~bad
    return T_, ok


def trans_C(x, P, T):
    c = mf2mol_cum(x, P, T)
    cp = c[:, -1]
    cp = jnp.where(cp == 0, jnp.min(jnp.where(cp > 0, cp, jnp.inf)), cp)
    cr = c[:, :-1] / cp[:, None]
    crm, crs = cr.mean(), cr.std()
    cr = (cr - crm) / crs
    cpm, cps = cp.mean(), cp.std()
    cpn = (cp - cpm) / cps
    w = cr.std(axis=0)
    w = w / w.sum()
    w = jnp.append(w, 3.0 * w.max())
    feats = jnp.hstack([cr, cpn[:, None]])
    return feats, (crm, crs, cpm, cps), w


def itrans_C(feats, trans_vars, P, T, c=None, q: float = 0.05):
    crm, crs, cpm, cps = trans_vars
    cp = feats[:, -1] * cps + cpm
    cr = feats[:, :-1] * crs + crm
    cu = jnp.hstack([cr * cp[:, None], cp[:, None]])
    x_ = mol_cum2mf(cu, P, T)

    c_diff = jnp.diff(cu, axis=1)
    # reference: np.percentile(np.abs(cu[cu>0]), 5) — masked nanpercentile
    # keeps the computation shape-static under jit
    c_sm = jnp.nanpercentile(jnp.where(cu > 0, jnp.abs(cu), jnp.nan), 5.0)
    c_diff_sm = jnp.percentile(jnp.abs(c_diff), 5.0)
    bad = (jnp.any(cu < -c_sm, axis=1)
           | jnp.any(c_diff < -c_diff_sm, axis=1)
           | (cu[:, -1] == 0))
    if c is not None:
        c = jnp.asarray(c)
        metric = ((cu - (1 - q) * c.min(axis=0)[None, :] < 0)
                  | (cu - (1 + q) * c.max(axis=0)[None, :] > 0))
        bad = bad | jnp.any(metric, axis=1)
    return x_, ~bad


def atmos_to_features(P, T, H2O, O3, transform: bool = True, Tm=None):
    T, H2O, O3 = map(jnp.asarray, (T, H2O, O3))
    ixT = np.arange(T.shape[1])
    ixH2O = 1 + ixT[-1] + np.arange(H2O.shape[1])
    ixO3 = 1 + ixH2O[-1] + np.arange(O3.shape[1])
    if transform:
        T_, vars_T, wT = trans_T(T, P, Tm=Tm)
        H2O_, vars_H2O, wH2O = trans_C(H2O, P, T)
        O3_, vars_O3, wO3 = trans_C(O3, P, T)
        trans_vars = (vars_T, ixT, vars_H2O, ixH2O, vars_O3, ixO3, Tm)
        wC = wH2O / wH2O.max() + wO3 / wO3.max()
        wC = wC / wC.sum()
        wT = wT * wC
        wT = wT / wT[:-1].sum()
        wT = wT.at[-1].set(wT[:-1].max())
    else:
        T_, H2O_, O3_ = T, H2O, O3
        trans_vars = ((), ixT, (), ixH2O, (), ixO3, Tm)
        wT, wH2O, wO3 = (jnp.ones(a.shape[1]) for a in (T_, H2O_, O3_))
    X = jnp.concatenate([T_, H2O_, O3_], axis=1)
    wX = jnp.concatenate([wT / wT.max(), wH2O / wH2O.max(), wO3 / wO3.max()])
    return X, trans_vars, wX / wX.sum()


def features_to_atmos(X, trans_vars, P, T=None, cH2O=None, cO3=None):
    vars_T, ixT, vars_H2O, ixH2O, vars_O3, ixO3, Tm = trans_vars
    T_ = X[:, jnp.asarray(ixT)]
    H2O_ = X[:, jnp.asarray(ixH2O)]
    O3_ = X[:, jnp.asarray(ixO3)]
    okT = okW = okO = jnp.ones(X.shape[0], dtype=bool)
    if len(vars_T) > 0:
        T_, okT = itrans_T(T_, vars_T, T, Tm=Tm)
    if len(vars_H2O) > 0:
        H2O_, okW = itrans_C(H2O_, vars_H2O, P, T_, cH2O)
    if len(vars_O3) > 0:
        O3_, okO = itrans_C(O3_, vars_O3, P, T_, cO3)
    return T_, H2O_, O3_, okT & okW & okO


# ---------------------------------------------------------------------------
# Generator + air-mass machinery (GenerativeModel_AtmosInputs.py:212-443)
# ---------------------------------------------------------------------------

def atmos_generator(key, P, T, H2O, O3, n_pca: int = 15, n_gmm: int = 20,
                    transform: bool = True, weight: bool = True,
                    filt: bool = True, rh_max: float = 96.0,
                    variational: bool = True):
    """Fit the PCA+GMM model; return (sample_fn, diagnostics).

    ``sample_fn(key, n)`` draws 5n candidates, applies the plausibility and
    RH rejections, and returns up to n surviving (T, H2O, O3) profiles plus
    their model log-likelihoods (reference ``atm_gen``, ``:225-242``).

    ``variational=True`` (default) fits the Dirichlet-process-weighted
    mixture (:func:`bgmm_fit`), matching the reference's
    ``BayesianGaussianMixture`` component auto-pruning
    (``GenerativeModel_AtmosInputs.py:30``); ``False`` falls back to plain
    EM (:func:`gmm_fit`).
    """
    P = jnp.asarray(P)
    T, H2O, O3 = map(jnp.asarray, (T, H2O, O3))
    X, trans_vars, wX = atmos_to_features(P, T, H2O, O3, transform=transform,
                                          Tm=T.mean(axis=0))
    cH2O = mf2mol_cum(H2O, P, T)
    cO3 = mf2mol_cum(O3, P, T)

    w = wX if weight else jnp.ones_like(wX)
    w = jnp.where(w == 0, jnp.min(jnp.where(w > 0, w, jnp.inf)) / 100.0, w)
    pca = pca_fit(X * w[None, :], n_pca)
    Xr = pca.transform(X * w[None, :])
    fit = bgmm_fit if variational else gmm_fit
    gmm = fit(key, Xr, n_gmm)
    Xm = pca.inverse_transform(Xr) / w[None, :]

    def sample_fn(key, n: int):
        Zr = gmm_sample(key, gmm, int(5 * n))
        ll = gmm_log_prob(gmm, Zr)
        Xn = pca.inverse_transform(Zr) / w[None, :]
        T_n, H_n, O_n, ok = features_to_atmos(Xn, trans_vars, P, T=T,
                                              cH2O=cH2O, cO3=cO3)
        ok = ok & rh_filter(P, T_n, H_n, rh_max=rh_max)
        if filt:
            keep = np.nonzero(np.asarray(ok))[0][:n]
        else:
            keep = np.arange(min(n, T_n.shape[0]))
        return (np.asarray(T_n)[keep], np.asarray(H_n)[keep],
                np.asarray(O_n)[keep], np.asarray(ll)[keep])

    return sample_fn, dict(X=X, Xr=Xr, Xm=Xm, trans_vars=trans_vars, wX=wX,
                           pca=pca, gmm=gmm)


def airmass_labels(key, z, P, T, H2O, O3, n_airmass: int = 5,
                   variational: bool = True):
    """Cluster profiles into air masses on (T_surf, lapse, total H2O, total
    O3) features (reference ``airmass_labels``, ``:391-419``; BGM cluster
    per ``:401``, so surplus air-mass slots prune themselves)."""
    z = jnp.asarray(z)
    T, H2O, O3 = map(jnp.asarray, (T, H2O, O3))
    cH2O = mf2mol_cum(H2O, P, T)
    cO3 = mf2mol_cum(O3, P, T)
    T_surf = T[:, z < 3].mean(axis=1)
    T_grad = jnp.diff(T[:, z < 6], axis=1).mean(axis=1)
    f = lambda x: (x - x.mean()) / x.std()
    feats = jnp.stack([f(T_surf), f(T_grad), f(cH2O[:, -1]), f(cO3[:, -1])], axis=1)
    fit = bgmm_fit if variational else gmm_fit
    gmm = fit(key, feats, n_airmass, n_iter=300)
    return np.asarray(gmm_predict(gmm, feats))


def gen_samples_per_airmass(key, z, P, T, H2O, O3, labels, n_pca: int = 15,
                            n_gmm: int = 10, n_aug: int = 100):
    """Per-air-mass model fit + n_aug-fold augmentation (``:421-443``)."""
    T, H2O, O3 = map(np.asarray, (T, H2O, O3))
    labels = np.asarray(labels)
    outs = {k: [] for k in ("T", "H2O", "O3", "labels", "ll")}
    for i, lab in enumerate(np.unique(labels)):
        ix = labels == lab
        n_samples = int(n_aug * ix.sum())
        k_fit, k_draw, key = jax.random.split(jax.random.fold_in(key, i), 3)
        sample_fn, _ = atmos_generator(k_fit, P, T[ix], H2O[ix], O3[ix],
                                       n_pca=min(n_pca, int(ix.sum()) - 1),
                                       n_gmm=min(n_gmm, int(ix.sum())))
        T_n, H_n, O_n, ll = sample_fn(k_draw, n_samples)
        outs["T"].append(T_n)
        outs["H2O"].append(H_n)
        outs["O3"].append(O_n)
        outs["labels"].append(np.full(T_n.shape[0], lab))
        outs["ll"].append(ll)
    return {k: np.concatenate(v) for k, v in outs.items()}
