"""Scene layer: emissivity DB, HSI generator, PCA+GMM generative model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radtxfr_tpu.scene.emissivity import EmissivityDB, synthetic_db
from radtxfr_tpu.scene.hsi import hsi_generate
from radtxfr_tpu.scene import generative as gen


def test_synthetic_db_physical():
    db = synthetic_db(16)
    e = np.asarray(db.emis)
    assert e.shape[0] == 16
    assert (e >= 0).all() and (e <= 1).all()


def test_emissivity_from_spectra_and_resample():
    x = np.linspace(7.0, 14.0, 200)  # µm
    refl = 0.2 + 0.1 * np.sin(x)
    X_out = np.arange(800.0, 1200.0, 2.0)
    db = EmissivityDB.from_spectra([(x, refl)], X_out, reflectance=True,
                                   wavelength_um=True)
    e = np.asarray(db.emis)[0]
    assert (e >= 0).all() and (e <= 1).all()
    # eps = 1 - R at a checkpoint: R(10 µm) -> eps(1000 cm^-1)
    want = 1.0 - (0.2 + 0.1 * np.sin(10.0))
    got = e[np.argmin(np.abs(X_out - 1000.0))]
    assert abs(got - want) < 1e-3

    db2 = db.resample(np.arange(850.0, 1150.0, 5.0))
    assert np.asarray(db2.emis).shape == (1, 60)


_ASTER_EXPORT = """Name: Construction Concrete
Type: manmade
Class: Concrete
Sample No.: 0092UUUCNC
Owner: JHU
Measurement: Directional Hemispherical Reflectance
First Column: X
Second Column: Y
X Units: Wavelength (micrometers)
Y Units: Reflectance (percent)
First X Value: {x0}
Last X Value: {x1}
Number of X Values: {n}
Additional Information: none

"""


def _write_aster(path, wl, refl_pct, name="Construction Concrete"):
    body = _ASTER_EXPORT.format(x0=wl[0], x1=wl[-1], n=len(wl))
    body = body.replace("Construction Concrete", name)
    body += "".join(f"{x:9.6f}\t{y:8.4f}\n" for x, y in zip(wl, refl_pct))
    path.write_text(body)


def test_read_aster_export(tmp_path):
    from radtxfr_tpu.scene.emissivity import read_aster_export

    wl = np.linspace(2.0, 15.5, 300)
    refl = 20.0 + 10.0 * np.sin(wl)
    p = tmp_path / "concrete.spectrum.txt"
    _write_aster(p, wl, refl)
    meta, x, y = read_aster_export(str(p))
    assert meta["Name"] == "Construction Concrete"
    assert meta["Y Units"] == "Reflectance (percent)"
    np.testing.assert_allclose(x, wl, atol=1e-6)
    np.testing.assert_allclose(y, refl / 100.0, atol=1e-5)  # percent -> frac
    assert (y >= 0).all() and (y <= 1).all()


def test_load_aster_dir_coverage_and_conversion(tmp_path):
    """Directory ingest mirrors Generate_ASTER_emissivity_DB.py:58-117:
    coverage filter (+-0.25 µm margin), common 1 cm^-1 axis, eps = 1 - R."""
    from radtxfr_tpu.scene.emissivity import load_aster_dir

    wl_full = np.linspace(2.0, 15.5, 400)
    _write_aster(tmp_path / "a.txt", wl_full, np.full(400, 30.0), name="A")
    _write_aster(tmp_path / "b.txt", wl_full, 20 + 5 * np.sin(wl_full),
                 name="B")
    # covers only 8-12 µm -> fails the 6.5-14.75 coverage requirement
    wl_short = np.linspace(8.0, 12.0, 100)
    _write_aster(tmp_path / "short.txt", wl_short, np.full(100, 10.0),
                 name="C")
    db, skipped = load_aster_dir(str(tmp_path))
    assert db.n_materials == 2
    assert set(db.names) == {"A", "B"}
    assert len(skipped) == 1 and skipped[0].endswith("short.txt")
    X = np.asarray(db.X)
    assert X.min() >= 10000.0 / 14.5 - 1.0 and X.max() <= 10000.0 / 6.75 + 1.0
    # flat 30% reflectance -> eps = 0.70 everywhere
    i_a = db.names.index("A")
    np.testing.assert_allclose(np.asarray(db.emis)[i_a], 0.70, atol=1e-3)

    with pytest.raises(ValueError):
        load_aster_dir(str(tmp_path), pattern="*.nope")


def test_pairwise_mixtures():
    db = synthetic_db(5)
    mixed = db.pairwise_mixtures(n_fractions=11)
    assert mixed.n_materials == 10 * 11  # C(5,2) pairs x 11 fractions
    e = np.asarray(mixed.emis)
    assert (e >= 1e-3).all() and (e <= 1 - 1e-3).all()


def test_hsi_generate_shapes_and_physics():
    nA, nX = 7, 64
    X = np.linspace(800, 900, nX)
    rng = np.random.default_rng(0)
    tau = rng.uniform(0.5, 0.95, (nA, nX))
    Lu = rng.uniform(0.5, 2.0, (nA, nX))
    Ld = rng.uniform(1.0, 3.0, (nA, nX))
    Ts = rng.uniform(280, 300, nA)
    db = synthetic_db(12, X=X)
    out = hsi_generate(jax.random.key(0), X, tau, Lu, Ld, Ts,
                       db.emis, n_pixels=20, dT=3.0, n_emis=5, n_mix=2, n_atm=3)
    assert out["L"].shape == (3, 20, nX)
    assert out["mix_frac"].shape == (3, 20, 2)
    np.testing.assert_allclose(np.asarray(out["mix_frac"]).sum(-1), 1.0, rtol=1e-6)
    assert np.isfinite(np.asarray(out["L"])).all() and (np.asarray(out["L"]) > 0).all()
    # deterministic per key
    out2 = hsi_generate(jax.random.key(0), X, tau, Lu, Ld, Ts,
                        db.emis, n_pixels=20, dT=3.0, n_emis=5, n_mix=2, n_atm=3)
    np.testing.assert_array_equal(np.asarray(out["L"]), np.asarray(out2["L"]))


def test_pca_round_trip():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 10)) @ rng.normal(size=(10, 10))
    pca = gen.pca_fit(X, 10)
    Z = pca.transform(X)
    np.testing.assert_allclose(np.asarray(Z).std(axis=0), 1.0, atol=0.02)  # whitened
    Xr = pca.inverse_transform(Z)
    np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-8)


def test_pca_matches_sklearn():
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(2)
    X = rng.normal(size=(300, 8)) * np.array([5, 3, 2, 1, 1, 0.5, 0.2, 0.1])
    ours = gen.pca_fit(X, 4)
    sk = PCA(n_components=4, whiten=True).fit(X)
    np.testing.assert_allclose(np.asarray(ours.explained_variance_ratio),
                               sk.explained_variance_ratio_, rtol=1e-8)
    # components equal up to sign
    dots = np.abs(np.sum(np.asarray(ours.components) * sk.components_, axis=1))
    np.testing.assert_allclose(dots, 1.0, rtol=1e-8)


def test_gmm_fit_and_sample_recovers_clusters():
    rng = np.random.default_rng(3)
    X = np.concatenate([rng.normal(-4, 0.5, (300, 2)), rng.normal(4, 0.5, (300, 2))])
    model = gen.gmm_fit(jax.random.key(0), jnp.asarray(X), 2, n_iter=100)
    means = np.sort(np.asarray(model.means)[:, 0])
    np.testing.assert_allclose(means, [-4, 4], atol=0.3)
    np.testing.assert_allclose(np.asarray(model.weights), [0.5, 0.5], atol=0.05)
    samples = np.asarray(gen.gmm_sample(jax.random.key(1), model, 2000))
    assert abs((samples[:, 0] > 0).mean() - 0.5) < 0.08
    ll = np.asarray(gen.gmm_log_prob(model, X))
    assert np.isfinite(ll).all()


def test_bgmm_prunes_surplus_components():
    """Dirichlet-process weight prior: with K=10 slots and 3 true clusters,
    surplus components collapse to ~zero weight (the sklearn
    BayesianGaussianMixture behavior the reference relies on,
    GenerativeModel_AtmosInputs.py:30) — plain EM keeps all 10 alive."""
    rng = np.random.default_rng(7)
    X = np.concatenate([rng.normal(c, 0.4, (250, 3))
                        for c in (-6.0, 0.0, 6.0)])
    vb = gen.bgmm_fit(jax.random.key(0), jnp.asarray(X), 10, n_iter=500)
    w = np.sort(np.asarray(vb.weights))[::-1]
    assert (w > 0.02).sum() == 3, w
    np.testing.assert_allclose(w[:3].sum(), 1.0, atol=0.01)

    em = gen.gmm_fit(jax.random.key(0), jnp.asarray(X), 10, n_iter=200)
    assert (np.asarray(em.weights) > 0.02).sum() > 3

    pruned = gen.gmm_prune(vb, threshold=0.02)
    assert pruned.weights.shape[0] == 3
    np.testing.assert_allclose(np.asarray(pruned.weights).sum(), 1.0,
                               rtol=1e-6)
    means = np.sort(np.asarray(pruned.means)[:, 0])
    np.testing.assert_allclose(means, [-6, 0, 6], atol=0.4)


def test_bgmm_small_dataset_does_not_crash():
    """n_samples < n_components must fit (sklearn handles this case;
    ADVICE r2): seeds are drawn with replacement and surplus components
    prune to ~zero weight."""
    rng = np.random.default_rng(9)
    X = rng.normal(0.0, 1.0, (4, 2))
    vb = gen.bgmm_fit(jax.random.key(0), jnp.asarray(X), 8, n_iter=100)
    w = np.asarray(vb.weights)
    assert np.isfinite(w).all()
    np.testing.assert_allclose(w.sum(), 1.0, atol=0.01)


def test_gmm_small_dataset_does_not_crash():
    """Same small-n contract for the plain-EM fit (ADVICE r3: the r2 fix
    was applied only to bgmm_fit)."""
    rng = np.random.default_rng(9)
    X = rng.normal(0.0, 1.0, (4, 2))
    mdl = gen.gmm_fit(jax.random.key(0), jnp.asarray(X), 8, n_iter=50)
    w = np.asarray(mdl.weights)
    assert np.isfinite(w).all()
    np.testing.assert_allclose(w.sum(), 1.0, atol=0.01)
    assert np.isfinite(np.asarray(mdl.means)).all()


def test_bgmm_effective_components_match_sklearn():
    """Effective component count and major-cluster weights agree with
    sklearn's BayesianGaussianMixture on the same data."""
    from sklearn.mixture import BayesianGaussianMixture

    rng = np.random.default_rng(8)
    X = np.concatenate([rng.normal(-3, 0.5, (320, 2)),
                        rng.normal(3, 0.5, (160, 2))])
    ours = gen.bgmm_fit(jax.random.key(1), jnp.asarray(X), 8, n_iter=500)
    sk = BayesianGaussianMixture(n_components=8, covariance_type="full",
                                 max_iter=2000, random_state=0).fit(X)
    w_ours = np.sort(np.asarray(ours.weights))[::-1]
    w_sk = np.sort(sk.weights_)[::-1]
    assert (w_ours > 0.02).sum() == (w_sk > 0.02).sum() == 2
    # 2:1 cluster mass split recovered by both
    np.testing.assert_allclose(w_ours[:2], w_sk[:2], atol=0.05)


def test_atmos_generator_variational_moments():
    """Statistical acceptance on a TIGR-like fixture: the variational
    generator's surviving samples reproduce the training ensemble's
    per-level T/H2O moments."""
    rng = np.random.default_rng(9)
    nL = 20
    P = np.geomspace(101325.0, 1000.0, nL)
    z = np.linspace(0, 16, nL)
    n = 150
    T0 = 288.0 - 60.0 * (z / 16.0)
    T = T0[None, :] + rng.normal(0, 4.0, (n, 1)) + rng.normal(0, 1.0, (n, nL))
    H2O = np.exp(np.log(8e-3) - z / 3.0)[None, :] * \
        rng.uniform(0.6, 1.4, (n, 1)) * rng.uniform(0.9, 1.1, (n, nL))
    O3 = (3e-8 + 6e-6 * (z / 16.0) ** 3)[None, :] * rng.uniform(0.85, 1.2, (n, 1))
    sample_fn, diag = gen.atmos_generator(
        jax.random.key(2), P, T, H2O, O3, n_pca=8, n_gmm=12)
    T_n, H_n, O_n, ll = sample_fn(jax.random.key(3), 120)
    assert T_n.shape[0] >= 60      # rejection keeps a healthy fraction
    assert np.isfinite(ll).all()
    # per-level mean T within 2 K, ensemble spread within 50%
    np.testing.assert_allclose(T_n.mean(axis=0), T.mean(axis=0), atol=2.0)
    ratio = T_n.std(axis=0) / T.std(axis=0)
    assert (ratio > 0.5).all() and (ratio < 1.6).all()
    # H2O column magnitude preserved (log-space mean within 30%)
    cw_t = gen.mf2mol_cum(H2O, P, T)[:, -1].mean()
    cw_n = gen.mf2mol_cum(H_n, P, T_n)[:, -1].mean()
    assert 0.7 < float(cw_n / cw_t) < 1.3
    # the DP prior pruned at least one of the 12 slots on ~1-cluster data
    assert (np.asarray(diag["gmm"].weights) < 0.02).any()


def test_mol_cum_round_trip():
    rng = np.random.default_rng(4)
    P = np.linspace(101325, 1000, 20)
    T = rng.uniform(210, 300, (5, 20))
    x = rng.uniform(0, 1e-2, (5, 20))
    c = gen.mf2mol_cum(x, P, T)
    x2 = np.asarray(gen.mol_cum2mf(np.asarray(c), P, T))
    np.testing.assert_allclose(x2, x, rtol=1e-10)


def test_rh_filter():
    P = np.array([101325.0, 80000.0])
    T = np.array([[290.0, 280.0], [300.0, 290.0]])
    # sat vmr at 290 K, 1 atm is ~1.9% — 10% vmr is supersaturated
    H2O = np.array([[0.10, 0.001], [0.001, 0.0005]])
    ok = np.asarray(gen.rh_filter(P, T, H2O))
    assert not ok[0] and ok[1]


def test_trans_T_round_trip():
    rng = np.random.default_rng(5)
    P = np.linspace(101325, 100, 12)
    T = 250.0 + rng.normal(0, 10, (50, 12)).cumsum(axis=1) * 0.1 \
        + rng.uniform(-20, 20, (50, 1))
    Tm = T.mean(axis=0)
    feats, tv, w = gen.trans_T(jnp.asarray(T), jnp.asarray(P), Tm=jnp.asarray(Tm))
    T2, ok = gen.itrans_T(feats, tv, Tm=jnp.asarray(Tm))
    np.testing.assert_allclose(np.asarray(T2), T, rtol=1e-8)
    assert np.asarray(ok).all()


def test_trans_C_round_trip():
    rng = np.random.default_rng(6)
    P = np.linspace(101325, 100, 12)
    T = np.full((40, 12), 260.0) + rng.normal(0, 5, (40, 12))
    x = 10.0 ** rng.uniform(-6, -2, (40, 12))
    feats, tv, w = gen.trans_C(jnp.asarray(x), jnp.asarray(P), jnp.asarray(T))
    x2, ok = gen.itrans_C(feats, tv, jnp.asarray(P), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-6)


def test_atmos_generator_end_to_end():
    """Fit on a toy TIGR-like ensemble; generated profiles must be plausible."""
    rng = np.random.default_rng(7)
    n, nz = 150, 16
    P = np.logspace(np.log10(101325), np.log10(500), nz)
    z = np.linspace(0, 20, nz)
    Tg = rng.uniform(270, 305, n)
    T = Tg[:, None] - 6.0 * z[None, :] + rng.normal(0, 1.0, (n, nz))
    T = np.maximum(T, 200.0)
    H2O = 0.01 * np.exp(-z / 2.5)[None, :] * rng.uniform(0.3, 1.2, (n, 1))
    O3 = 1e-8 + 5e-6 * np.exp(-((z - 18) / 6.0) ** 2)[None, :] \
        * rng.uniform(0.7, 1.3, (n, 1))
    sample_fn, diag = gen.atmos_generator(
        jax.random.key(0), P, T, H2O, O3, n_pca=8, n_gmm=4)
    T_n, H_n, O_n, ll = sample_fn(jax.random.key(1), 40)
    assert T_n.shape[0] > 0 and T_n.shape[1] == nz
    assert (T_n > 180).all() and (T_n < 340).all()
    assert (H_n >= 0).all() and (O_n >= 0).all()
    assert np.isfinite(ll).all()

    labels = gen.airmass_labels(jax.random.key(2), z, P, T, H2O, O3, n_airmass=3)
    assert labels.shape == (n,) and len(np.unique(labels)) >= 1


def test_robust_stats():
    from radtxfr_tpu.scene.robust import mad, qn_scale, robust_z, estimate_tau

    rng = np.random.default_rng(8)
    x = rng.normal(10.0, 2.0, 5000)
    assert abs(float(mad(x)) - 2.0) < 0.1          # sigma-consistent
    assert abs(float(qn_scale(x[:500])) - 2.0) < 0.3
    z = np.asarray(robust_z(x))
    assert abs(np.median(z)) < 0.05

    # tau estimation: scene std shaped by a known transmittance
    nX = 400
    tau_true = 0.5 + 0.4 * np.exp(-0.5 * ((np.arange(nX) - 200) / 60.0) ** 2)
    surface = rng.uniform(5, 15, (300, 1))
    L = tau_true[None, :] * surface + 2.0
    est = np.asarray(estimate_tau(L, smooth_window=5))
    corr = np.corrcoef(est, tau_true)[0, 1]
    assert corr > 0.98, corr


def test_emissivity_db_save_load(tmp_path):
    from radtxfr_tpu.scene.emissivity import load_db, save_db

    db = synthetic_db(6)
    base = str(tmp_path / "emisdb")
    save_db(db, base)
    back = load_db(base)
    np.testing.assert_allclose(np.asarray(back.emis), np.asarray(db.emis))
    import csv

    rows = list(csv.reader(open(base + ".csv")))
    assert rows[0] == ["material_ID", "name"] and len(rows) == 7


def test_fit_planck_recovers_graybody():
    from radtxfr_tpu.scene.planck_fit import fit_planck

    X = np.linspace(700.0, 1300.0, 400)
    from radtxfr_tpu.core.planck import planckian

    L = 0.93 * np.asarray(planckian(X, 301.5)).ravel()
    T, eps, resid = fit_planck(jnp.asarray(X), jnp.asarray(L))
    assert abs(float(T) - 301.5) < 0.1
    assert abs(float(eps) - 0.93) < 1e-3


# ---------------------------------------------------------------------------
# Emissivity feature compression (Generate_Emissivity_DB.py:93-193)
# ---------------------------------------------------------------------------

def _smooth_emis(n_x=257, n_mat=40, seed=5):
    """Synthetic smooth emissivities in (nX, n_mat), spanning ~[0.3, 0.99]."""
    rng = np.random.default_rng(seed)
    x = np.linspace(750.0, 1250.0, n_x)
    xs = (x - x.mean()) / (x.max() - x.min())
    basis = np.stack([np.ones_like(xs), xs, xs**2,
                      np.sin(4 * np.pi * xs), np.cos(7 * np.pi * xs)])
    w = rng.normal(scale=[0.4, 0.3, 0.5, 0.2, 0.1], size=(n_mat, 5))
    od = 1.5 + w @ basis  # (n_mat, nX) positive-ish optical depths
    od = np.abs(od) + 0.1
    emis = 1 - np.exp(-od)
    return x, emis.T  # spectral axis first


def test_od_transform_round_trip():
    from radtxfr_tpu.scene.emis_features import od_transform, od_inverse

    eps = np.linspace(0.001, 0.999, 101)
    back = np.asarray(od_inverse(od_transform(eps)))
    np.testing.assert_allclose(back, np.clip(eps, 1e-4, 1 - 1e-4), atol=1e-10)
    # clamp at the reference TOL
    assert np.asarray(od_transform(1.0)) == np.asarray(od_transform(1 - 1e-4))


def test_pca_compress_reconstructs():
    from radtxfr_tpu.scene.emis_features import pca_compress

    _, emis = _smooth_emis()
    model, feats, recon = pca_compress(emis.T, n_components=8)
    assert feats.shape == (emis.shape[1], 8)
    err = np.abs(np.asarray(recon) - np.clip(emis.T, 1e-4, 1 - 1e-4)).max()
    assert err < 1e-6  # 5-dim latent structure, 8 components


def test_fast_ica_reconstructs_and_decorrelates():
    from radtxfr_tpu.scene.emis_features import fast_ica, od_transform

    _, emis = _smooth_emis(n_mat=60)
    od = np.asarray(od_transform(emis.T))
    model = fast_ica(od, n_components=5, n_iter=300)
    S = np.asarray(model.transform(od))
    recon = np.asarray(model.inverse_transform(S))
    # reconstruction through the 5-component subspace is near-exact
    np.testing.assert_allclose(recon, od, atol=1e-5)
    # sources are decorrelated with ~unit variance
    C = np.cov(S.T)
    np.testing.assert_allclose(C, np.eye(5), atol=0.15)


def test_nmf_factors_nonnegative_and_accurate():
    from radtxfr_tpu.scene.emis_features import nmf, od_transform

    _, emis = _smooth_emis(n_mat=50)
    od = np.asarray(od_transform(emis.T))
    model = nmf(od, n_components=8, n_iter=600)
    assert (np.asarray(model.W) >= 0).all() and (np.asarray(model.H) >= 0).all()
    recon = np.asarray(model.inverse_transform())
    rel = np.linalg.norm(recon - od) / np.linalg.norm(od)
    assert rel < 0.01


def test_bspline_design_partition_of_unity():
    from radtxfr_tpu.scene.emis_features import bspline_design

    x = np.linspace(0.0, 10.0, 501)
    B = bspline_design(x, n_knots=12)
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-12)
    assert (B >= 0).all()
    # matches scipy's evaluation of the same basis
    from scipy.interpolate import BSpline

    lo, hi = 0.0, 10.0
    interior = np.linspace(lo, hi, 12)[1:-1]
    t = np.concatenate([np.full(4, lo), interior, np.full(4, hi)])
    n_coef = len(t) - 4
    for j in (0, 3, n_coef - 1):
        c = np.zeros(n_coef)
        c[j] = 1.0
        np.testing.assert_allclose(B[:, j], BSpline(t, c, 3)(x), atol=1e-12)


def test_bspline_fit_emissivity():
    from radtxfr_tpu.scene.emis_features import bspline_fit_emissivity

    x, emis = _smooth_emis()
    fit = bspline_fit_emissivity(x, emis, n_knots=24)
    recon = np.asarray(fit.reconstruct())
    assert recon.shape == emis.shape
    err = np.abs(recon - np.clip(emis, 1e-4, 1 - 1e-4)).max()
    assert err < 5e-3
