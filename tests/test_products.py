"""TUD composition, apparent radiance, Jacobians, end-to-end OD vs oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.core.planck import planckian
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.synthetic import synthetic_lines
from radtxfr_tpu.products import (
    apparent_radiance,
    compute_od_layers,
    species_column,
    tud_from_od,
)
from radtxfr_tpu.products.jacobian import tud_with_jacobian

from oracle import hapi_xsect, load_hapi


def _ref_tud(grid, od, B, z0, alts, mu, n_angles):
    """Reference TUD recursions in plain NumPy (radiative_transfer.py:342-389)."""
    nX = grid.size
    n_alt = len(alts)
    tau = np.zeros((nX, n_alt, 1))
    Lu = np.zeros((nX, n_alt, 1))
    for ii, zs in enumerate(alts):
        ix = z0 <= zs
        tau[:, ii, 0] = np.exp(-np.sum(od[ix, :] * mu, axis=0))
        nb = ix.sum()
        for kk in range(nb):
            t = np.exp(-od[kk, :] * mu)
            Lu[:, ii, 0] = t * Lu[:, ii, 0] + (1 - t) * B[kk, :]
    angles = np.linspace(0, np.pi / 2, n_angles, endpoint=False)
    Ld = np.zeros((nX, n_angles))
    for ii, th in enumerate(angles):
        for jj in range(od.shape[0])[::-1] if False else reversed(range(od.shape[0])):
            t = np.exp(-od[jj, :] / np.cos(th))
            Ld[:, ii] = t * Ld[:, ii] + (1 - t) * B[jj, :]
    w = np.cos(angles) * np.sin(angles)
    Ld = (Ld * w).sum(axis=1) / w.sum()
    return tau, Lu, Ld


def test_tud_matches_reference_recursions():
    rng = np.random.default_rng(7)
    nL, nX = 12, 200
    grid = np.linspace(800, 820, nX)
    od = rng.exponential(0.05, (nL, nX))
    temps = np.linspace(290, 220, nL)
    B = np.asarray(planckian(grid, temps)).T
    z0 = np.linspace(0, 11, nL)
    alts = [0.5, 3.0, 100.0]
    mu = 1.1547  # sec(30 deg)
    want_tau, want_lu, want_ld = _ref_tud(grid, od, B, z0, alts, mu, 16)
    tud = tud_from_od(jnp.asarray(grid), jnp.asarray(od), jnp.asarray(B),
                      jnp.asarray(z0), jnp.asarray(alts), mu=mu, n_angles=16)
    np.testing.assert_allclose(np.asarray(tud.tau), want_tau, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tud.Lu), want_lu, rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(tud.Ld), want_ld, rtol=1e-10, atol=1e-13)


def test_tud_return_od():
    grid = np.linspace(800, 805, 50)
    od = np.full((3, 50), 0.1)
    B = np.ones((3, 50))
    z0 = np.array([0.0, 1.0, 2.0])
    tud = tud_from_od(jnp.asarray(grid), jnp.asarray(od), jnp.asarray(B),
                      jnp.asarray(z0), jnp.asarray([1.5]), return_od=True)
    np.testing.assert_allclose(np.asarray(tud.tau)[:, 0, 0], 0.2, rtol=1e-12)


def test_od_layer_matches_hapi_with_density_scaling(iso_tables):
    """Engine layer OD == hapi xsect * species column density (config 1/2)."""
    hapi = load_hapi()
    store = synthetic_lines(80, nu_min=795.0, nu_max=855.0, seed=51,
                            species=((1, 1),))
    grid = arange_drift_free(800.0, 850.0, 0.01)
    atm = std_atmosphere()
    layer = 3
    T = float(atm.T[layer]); p_pa = float(atm.p[layer])
    pl = float(atm.pl[layer]); x_h2o = float(atm.vmr[layer, 0])
    _, k = hapi_xsect(store, grid, T, p_pa / 101325.0,
                      diluent={"air": 1.0 - x_h2o, "self": x_h2o})
    u = float(species_column(p_pa, T, pl, x_h2o))
    sub = atm.replace(T=atm.T[layer:layer+1], p=atm.p[layer:layer+1],
                      pl=atm.pl[layer:layer+1], vmr=atm.vmr[layer:layer+1],
                      z0=atm.z0[layer:layer+1], z1=atm.z1[layer:layer+1])
    od = np.asarray(compute_od_layers(store, iso_tables, jnp.asarray(grid), sub))[0]
    np.testing.assert_allclose(od, k * u, rtol=1e-8, atol=1e-12 * (k * u).max())


def test_apparent_radiance_shapes_and_physics():
    nX, nE, nA, nT = 50, 3, 2, 5
    X = np.linspace(800, 900, nX)
    emis = np.linspace(0.7, 1.0, nE)[None, :] * np.ones((nX, nE))
    Ts = np.array([290.0, 300.0])
    tau = np.full((nX, nA), 0.8)
    Lu = np.full((nX, nA), 1.0)
    Ld = np.full((nX, nA), 2.0)
    dT = np.linspace(-2, 2, nT)
    L = np.asarray(apparent_radiance(X, emis, Ts, tau, Lu, Ld, dT=dT))
    assert L.shape == (nX, nE, nA, nT)
    # epsilon = 1 blackbody, dT = 0 -> tau*B(Ts) + Lu exactly
    B = np.asarray(planckian(X, Ts))
    np.testing.assert_allclose(L[:, 2, :, 2], 0.8 * B + 1.0, rtol=1e-10)
    # radiance increases with surface temperature delta
    assert (np.diff(L[:, 0, 0, :], axis=1) > 0).all()
    L2, Ls = apparent_radiance(X, emis, Ts, tau, Lu, Ld, return_Ls=True)
    assert np.asarray(Ls).shape == (nX, nE, nA)


def test_jacobian_matches_finite_differences(iso_tables):
    store = synthetic_lines(40, nu_min=798.0, nu_max=812.0, seed=61)
    grid = jnp.asarray(arange_drift_free(800.0, 810.0, 0.02))
    full = std_atmosphere()
    sl = slice(0, 5)
    atm = full.replace(**{f: getattr(full, f)[sl] for f in
                          ("z0", "z1", "pl", "p", "T")},
                       vmr=full.vmr[sl])
    alts = jnp.asarray([100.0])

    tud, jac = tud_with_jacobian(store, iso_tables, grid, atm, alts,
                                 wrt=("T", 1), n_angles=8)
    assert jac["T"]["tau"].shape == tud["tau"].shape + (5,)

    # central finite differences on layer 2
    from radtxfr_tpu.core.planck import planckian as B_of
    from radtxfr_tpu.products import compute_od_layers as od_of

    def f(atm_):
        od = od_of(store, iso_tables, grid, atm_, chunk=64)
        B = jnp.swapaxes(B_of(grid, atm_.T), 0, 1)
        t = tud_from_od(grid, od, B, atm_.z0, alts, n_angles=8)
        return t

    for var, col, h in (("T", None, 1e-3), ("1", 0, 1e-9)):
        k = 2
        if var == "T":
            up = atm.replace(T=atm.T.at[k].add(h))
            dn = atm.replace(T=atm.T.at[k].add(-h))
        else:
            up = atm.replace(vmr=atm.vmr.at[k, col].add(h))
            dn = atm.replace(vmr=atm.vmr.at[k, col].add(-h))
        fd_tau = (np.asarray(f(up).tau) - np.asarray(f(dn).tau)) / (2 * h)
        got = np.asarray(jac[var]["tau"][..., k])
        scale = np.abs(fd_tau).max() + 1e-30
        np.testing.assert_allclose(got, fd_tau, rtol=0, atol=5e-5 * scale)


def test_continuum_models():
    from radtxfr_tpu.atmos.continuum import continuum_od, register_continuum

    atm = std_atmosphere()
    nu = jnp.linspace(800.0, 1200.0, 64)
    zero = np.asarray(continuum_od(nu, atm, model="none"))
    assert zero.shape == (66, 64) and (zero == 0).all()

    od = np.asarray(continuum_od(nu, atm, model="h2o_empirical"))
    assert od.shape == (66, 64)
    assert (od >= 0).all() and np.isfinite(od).all()
    # continuum concentrated in the moist lower atmosphere
    assert od[0].mean() > 100 * od[40].mean()
    # scale factors act linearly on the self term
    od_half = np.asarray(continuum_od(nu, atm, model="h2o_empirical",
                                      continuum_factors=[0.0, 1.0] + [1.0] * 5))
    assert od_half.mean() < od.mean()

    register_continuum("flat", lambda nu, T, p, vmr, mids, pl, cf: jnp.ones_like(nu))
    flat = np.asarray(continuum_od(nu, atm, model="flat"))
    np.testing.assert_array_equal(flat, 1.0)


def test_rayleigh_continuum():
    from radtxfr_tpu.atmos.continuum import continuum_od

    atm = std_atmosphere()
    nu = jnp.asarray([500.0, 1000.0, 2000.0])
    od = np.asarray(continuum_od(nu, atm, model="rayleigh"))
    assert (od > 0).all() and np.isfinite(od).all()
    # nu^4 spectral law, exact per layer
    np.testing.assert_allclose(od[:, 2] / od[:, 1], 16.0, rtol=1e-5)
    # sanity vs the known visible-band value: sigma(0.55 um) ~ 4.5e-27 cm^2
    # (Bodhaine et al. 1999 table 3 gives 4.51e-27 at sea level)
    sigma_1000 = od[0, 1] / (np.asarray(atm.p)[0] * 10.0
                             / (1.380649e-16 * np.asarray(atm.T)[0])
                             * np.asarray(atm.pl)[0] * 1e5)
    sigma_vis = sigma_1000 * (1e4 / 0.55 / 1000.0) ** 4
    assert 3.5e-27 < sigma_vis < 5.5e-27
    # scale-factor slot 7 controls it
    off = np.asarray(continuum_od(nu, atm, model="rayleigh",
                                  continuum_factors=[1.0] * 6 + [0.0]))
    np.testing.assert_array_equal(off, 0.0)
    # combined model = sum of parts
    both = np.asarray(continuum_od(nu, atm, model="empirical"))
    h2o = np.asarray(continuum_od(nu, atm, model="h2o_empirical"))
    np.testing.assert_allclose(both, h2o + od, rtol=1e-6)


def test_tau_monotone_in_absorber_amount(iso_tables):
    """SURVEY §4 property test: transmittance decreases pointwise as the
    absorber amount grows (more H2O -> more OD -> lower tau), and downwelling
    radiance grows toward the blackbody limit."""
    lines = synthetic_lines(80, nu_min=896.0, nu_max=914.0, seed=3)
    axis = jnp.asarray(arange_drift_free(900.0, 910.0, 0.01))
    atm = std_atmosphere()
    alts = jnp.asarray([500.0])

    taus, lds = [], []
    for scale in (0.5, 1.0, 2.0, 4.0):
        a = atm.replace(vmr=atm.vmr * scale)
        od = compute_od_layers(lines, iso_tables, axis, a)
        B = jnp.swapaxes(planckian(axis, a.T), 0, 1).astype(od.dtype)
        t = tud_from_od(axis, od, B, a.z0, alts, n_angles=12)
        taus.append(np.asarray(t.tau)[:, 0, 0])
        lds.append(np.asarray(t.Ld))
    for lo, hi in zip(taus[1:], taus[:-1]):
        assert (lo <= hi + 1e-12).all()
        assert lo.mean() < hi.mean()
    for hi, lo in zip(lds[1:], lds[:-1]):
        assert hi.mean() > lo.mean()
    # physical bounds hold at every absorber amount
    for t, ld in zip(taus, lds):
        assert (t >= 0).all() and (t <= 1).all() and (ld >= 0).all()


def test_gauss_downwelling_quadrature():
    """Gauss-Legendre (in mu^2) downwelling: 8 nodes beat the reference's
    uniform-30 rule against a dense-quadrature truth."""
    rng = np.random.default_rng(11)
    nL, nX = 12, 120
    grid = np.linspace(800, 820, nX)
    od = rng.exponential(0.08, (nL, nX))
    B = np.asarray(planckian(grid, np.linspace(290, 220, nL))).T
    z0 = np.linspace(0, 11, nL)
    alts = jnp.asarray([100.0])
    kw = dict(mu=1.0, return_od=False)

    truth = np.asarray(tud_from_od(grid, od, B, z0, alts, n_angles=4000,
                                   quadrature="uniform", **kw).Ld)
    ld_u30 = np.asarray(tud_from_od(grid, od, B, z0, alts, n_angles=30,
                                    quadrature="uniform", **kw).Ld)
    ld_g8 = np.asarray(tud_from_od(grid, od, B, z0, alts, n_angles=8,
                                   quadrature="gauss", **kw).Ld)
    err_u30 = np.abs(ld_u30 - truth).max()
    err_g8 = np.abs(ld_g8 - truth).max()
    assert err_g8 < err_u30, (err_g8, err_u30)
    assert err_g8 < 1e-4 * np.abs(truth).max()

    with pytest.raises(ValueError, match="quadrature"):
        tud_from_od(grid, od, B, z0, alts, n_angles=8, quadrature="simpson")


def test_jacobian_tangent_batching_matches_full(iso_tables):
    """tangent_batch streams jacfwd without changing values."""
    store = synthetic_lines(30, nu_min=798.0, nu_max=812.0, seed=62)
    grid = jnp.asarray(arange_drift_free(800.0, 810.0, 0.05))
    full = std_atmosphere()
    sl = slice(0, 5)
    atm = full.replace(**{f: getattr(full, f)[sl] for f in
                          ("z0", "z1", "pl", "p", "T")},
                       vmr=full.vmr[sl])
    alts = jnp.asarray([100.0])
    _, j_full = tud_with_jacobian(store, iso_tables, grid, atm, alts,
                                  wrt=("T", 1), n_angles=6)
    _, j_bat = tud_with_jacobian(store, iso_tables, grid, atm, alts,
                                 wrt=("T", 1), n_angles=6, tangent_batch=2)
    for key in ("T", "1"):
        for prod in ("tau", "Lu", "Ld"):
            np.testing.assert_allclose(np.asarray(j_bat[key][prod]),
                                       np.asarray(j_full[key][prod]),
                                       rtol=1e-10, atol=1e-14)


def test_od_layers_sdvoigt_profile_forwarded(iso_tables):
    """Regression: compute_od_layers(profile='sdvoigt') must build
    SDVoigt-mode line params (shift applied inside the HT profile, not at
    the center too — a Voigt-mode params object double-shifts)."""
    hapi = load_hapi()
    store = synthetic_lines(40, nu_min=795.0, nu_max=855.0, seed=52,
                            species=((1, 1),))
    grid = arange_drift_free(800.0, 850.0, 0.02)
    atm = std_atmosphere()
    layer = 2
    T = float(atm.T[layer]); p_pa = float(atm.p[layer])
    pl = float(atm.pl[layer]); x = float(atm.vmr[layer, 0])
    _, k = hapi_xsect(store, grid, T, p_pa / 101325.0,
                      diluent={"air": 1.0 - x, "self": x}, profile="SDVoigt")
    u = float(species_column(p_pa, T, pl, x))
    sub = atm.replace(T=atm.T[layer:layer+1], p=atm.p[layer:layer+1],
                      pl=atm.pl[layer:layer+1], vmr=atm.vmr[layer:layer+1],
                      z0=atm.z0[layer:layer+1], z1=atm.z1[layer:layer+1])
    od = np.asarray(compute_od_layers(store, iso_tables, jnp.asarray(grid),
                                      sub, profile="sdvoigt"))[0]
    np.testing.assert_allclose(od, k * u, rtol=1e-7,
                               atol=1e-10 * (k * u).max())


def test_jacobian_continuum_passthrough(iso_tables):
    """tud_with_jacobian(continuum=...) includes the continuum in the
    primal AND differentiates through it (round 5: the CLI used to drop
    --continuum silently on the single-device Jacobian path)."""
    import jax

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.lines.synthetic import synthetic_lines
    from radtxfr_tpu.products.jacobian import tud_with_jacobian

    lines = synthetic_lines(40, 990.0, 1010.0, seed=3)
    atm = std_atmosphere()
    grid = arange_drift_free(995.0, 1005.0, 0.05)
    alts = [500.0]
    tud0, _ = tud_with_jacobian(lines, iso_tables, grid, atm, alts,
                                wrt=("T",), n_angles=4, engine="jnp")
    tud1, jac1 = tud_with_jacobian(lines, iso_tables, grid, atm, alts,
                                   wrt=("T",), n_angles=4, engine="jnp",
                                   continuum="mt_ckd")
    d = np.abs(np.asarray(tud1["tau"]) - np.asarray(tud0["tau"])).max()
    assert d > 1e-5, "continuum did not reach the Jacobian primal"
    assert np.isfinite(np.asarray(jac1["T"]["tau"])).all()
