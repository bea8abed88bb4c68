"""Compat layer: reference-named API drop-in behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

import radtxfr_tpu.compat as rt
from radtxfr_tpu.lines.synthetic import synthetic_lines


def test_constants_and_stdatmos():
    assert rt.c1 == 1.19104295315e-16
    assert rt.c2 == 1.43877736830e-02
    assert rt.StdAtmos.shape == (66, 15)
    assert rt.StdAtmos[0, 5] == pytest.approx(287.87)


def test_planckian_wavelength_heuristic():
    # mean(X) < 50 -> interpreted as wavelength (radiative_transfer.py:836)
    lam = np.linspace(8.0, 12.0, 16)
    L_heur = rt.planckian(lam, 296.0)
    L_expl = rt.planckian(lam, 296.0, wavelength=True)
    np.testing.assert_allclose(L_heur, L_expl)


def test_bt_round_trip_with_spectral_dim():
    X = np.linspace(600, 1400, 32)
    T = np.full((4, 32), 300.0)  # spectral axis LAST
    L = rt.BT2L(X, T, spectral_dim=1)
    Tb = rt.brightnessTemperature(X, L, spectral_dim=1)
    np.testing.assert_allclose(Tb, T, rtol=1e-10)


def test_rs_round_trip():
    y = np.arange(24.0).reshape(2, 3, 4)
    y1, dims = rt.rs1D(y)
    assert y1.shape == (24,)
    y2, dims2 = rt.rs2D(y)
    assert y2.shape == (2, 12)
    np.testing.assert_array_equal(rt.rsND(y2, dims2), y)


def test_compute_od_requires_lines():
    with pytest.raises(ValueError, match="line database"):
        rt.compute_OD(800.0, 810.0)


def test_compute_od_and_tud(iso_tables):
    lines = synthetic_lines(60, nu_min=795.0, nu_max=815.0, seed=71)
    X, od = rt.compute_OD(
        800.0, 810.0, lines=lines, iso=iso_tables, DVOUT=0.01,
        T=280.0, P=90000.0, PL=0.5,
        MF_ID=np.array([1, 2, 3]), MF_VAL=np.array([7000.0, 380.0, 0.03]),
    )
    assert X.shape == od.shape and (od >= 0).all() and od.max() > 0

    X, tau, Lu, Ld = rt.compute_TUD(
        800.0, 810.0, lines=lines, iso=iso_tables, DVOUT=0.05, N_angle=8,
        Altitudes=np.array([500.0]),
    )
    # reference squeeze: scalar altitude & mu -> 1-D outputs
    assert tau.shape == X.shape and Lu.shape == X.shape and Ld.shape == X.shape
    assert (tau >= 0).all() and (tau <= 1).all()

    # defaults are not mutated across calls (divergence from the reference's
    # aliasing behavior, by design)
    assert rt.DEFAULT_OPTIONS["DVOUT"] == 0.0005
    assert rt.DEFAULT_OPTIONS["lines"] is None


def test_ils_mako_compat():
    X = np.linspace(700.0, 1400.0, 2000)
    x_out, y = rt.ILS_MAKO(X, np.ones(2000))
    np.testing.assert_allclose(y, 1.0, rtol=1e-6)
    y_only = rt.ILS_MAKO(X, np.ones(2000), returnX=False)
    np.testing.assert_allclose(y_only, y)


def test_get_help_index_and_lookup(capsys):
    """hapi getHelp equivalent (misc/hapi.py:4987): index + name lookup."""
    rt.getHelp()
    out = capsys.readouterr().out
    assert "radtxfr_tpu.core" in out and "radtxfr_tpu.kernels" in out

    rt.getHelp("planckian")  # bare-name resolution across subpackages
    out = capsys.readouterr().out
    assert "planckian" in out and "radiance" in out.lower()

    from radtxfr_tpu.utils import get_help
    get_help(rt.compute_TUD)  # object form
    assert "compute_TUD" in capsys.readouterr().out

    import pytest as _pytest
    with _pytest.raises(ValueError, match="no such name"):
        get_help("definitely_not_a_thing")


def test_run_lblrtm_matches_compute_od(iso_tables):
    """run_LBLRTM (radiative_transfer.py:459-501): same options -> same
    (nu, od) as compute_OD, with no subprocess/tempdir machinery."""
    lines = synthetic_lines(40, nu_min=896.0, nu_max=914.0, seed=5)
    kw = dict(lines=lines, iso=iso_tables, DVOUT=0.02, T=285.0, P=95000.0,
              PL=0.8, MF_ID=np.array([1, 2, 3]),
              MF_VAL=np.array([8000.0, 400.0, 0.05]))
    nu1, od1 = rt.compute_OD(900.0, 910.0, **kw)
    nu2, od2 = rt.run_LBLRTM(900.0, 910.0, **kw)
    np.testing.assert_array_equal(nu1, nu2)
    np.testing.assert_array_equal(od1, od2)


def test_write_tape5_read_tape12_compat(tmp_path):
    """Reference-signature TAPE5/TAPE12 interop at the compat surface
    (radiative_transfer.py:504-727, :730-789)."""
    deck = tmp_path / "TAPE5"
    rt.write_tape5(str(deck), V1=690.0, V2=1410.0, T=280.0, P=90000.0,
                   PL=0.5, MF_ID=np.array([1, 2]),
                   MF_VAL=np.array([10000.0, 400.0]), DVOUT=0.0025)
    text = deck.read_text()
    assert "HI=1" in text and "CN=6" in text and "690.000" in text

    from radtxfr_tpu.io.lblrtm import write_tape12
    f = str(tmp_path / "TAPE12")
    nu = np.linspace(690.0, 700.0, 4001)
    od = np.random.default_rng(3).gamma(1.0, 0.5, nu.size).astype(np.float32)
    write_tape12(f, nu, od, panel_size=1500)
    nu2, od2 = rt.read_tape12(f)
    np.testing.assert_allclose(nu2, nu, atol=2e-3)
    np.testing.assert_array_equal(od2, od)
