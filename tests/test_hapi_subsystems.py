"""hapi-equivalent subsystems: query DSL, local DB loader, spectra, fetch."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from radtxfr_tpu.lines.query import evaluate, select, sort
from radtxfr_tpu.lines.hapi_db import HapiDatabase, load_table, parse_format
from radtxfr_tpu.lines.fetch import build_query_url
from radtxfr_tpu.lines.synthetic import synthetic_lines
from radtxfr_tpu.kernels.spectra import (
    HAPI_SLITS, absorption_spectrum, convolve_spectrum,
    radiance_spectrum, transmittance_spectrum,
)

from oracle import load_hapi


def test_query_select_matches_hapi_semantics():
    store = synthetic_lines(500, seed=81)
    cond = ("and", ("between", "nu", 700.0, 900.0), ("==", "molec_id", 1))
    sub = select(store, cond)
    nu = np.asarray(sub.nu0)
    assert ((nu >= 700) & (nu <= 900)).all()
    assert (np.asarray(sub.mol_id) == 1).all()
    # equivalent numpy mask
    m = ((np.asarray(store.nu0) >= 700) & (np.asarray(store.nu0) <= 900)
         & (np.asarray(store.mol_id) == 1))
    assert sub.n_lines == int(m.sum())


def test_query_arithmetic_and_sort():
    store = synthetic_lines(100, seed=82)
    # gamma ratio expression
    r = evaluate(store, ("/", "gamma_self", "gamma_air"))
    assert (r >= 1.0).all()
    s = sort(store, by="sw", descending=True)
    sw = np.asarray(s.sw)
    assert (np.diff(sw) <= 0).all()


def test_parse_format():
    w, conv = parse_format("%12.6f")
    assert w == 12 and conv(" 1001.5 ") == 1001.5
    w, conv = parse_format("%2d")
    assert w == 2 and conv(" 7") == 7


def test_hapi_db_round_trip(tmp_path):
    """Write a table with hapi itself; read it back with our loader."""
    hapi = load_hapi()
    from radtxfr_tpu.lines.synthetic import to_hapi_cache

    store = synthetic_lines(120, seed=83)
    to_hapi_cache(store, "tbl", hapi)
    # give the cache a serializable format spec
    fmt = {"molec_id": "%2d", "local_iso_id": "%1d", "nu": "%12.6f",
           "sw": "%10.3E", "elower": "%10.4f", "gamma_air": "%6.4f",
           "gamma_self": "%6.4f", "n_air": "%4.2f", "delta_air": "%9.6f",
           "SD_air": "%9.6f"}
    order = list(fmt.keys())
    hapi.LOCAL_TABLE_CACHE["tbl"]["header"]["order"] = order
    hapi.LOCAL_TABLE_CACHE["tbl"]["header"]["format"] = fmt
    hapi.LOCAL_TABLE_CACHE["tbl"]["header"]["default"] = {k: 0 for k in order}
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        hapi.VARIABLES["BACKEND_DATABASE_NAME"] = str(tmp_path / "db")
        os.makedirs(tmp_path / "db", exist_ok=True)
        # hapi expects db_begin to have pre-created the .data file
        open(tmp_path / "db" / "tbl.data", "w").close()
        hapi.cache2storage("tbl")
    finally:
        os.chdir(cwd)

    db = HapiDatabase(str(tmp_path / "db"))
    assert "tbl" in db.table_names()
    back = db.load("tbl")
    assert back.n_lines == store.n_lines
    np.testing.assert_allclose(np.asarray(back.nu0), np.asarray(store.nu0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.sw), np.asarray(store.sw),
                               rtol=1e-3)
    d = db.describe("tbl")
    assert d["number_of_rows"] == 120


def test_spectra_match_hapi():
    hapi = load_hapi()
    omega = np.linspace(800.0, 810.0, 2001)
    k = np.abs(np.sin(omega)) * 1e-20
    for ours, theirs in [
        (transmittance_spectrum, hapi.transmittanceSpectrum),
        (absorption_spectrum, hapi.absorptionSpectrum),
        (radiance_spectrum, hapi.radianceSpectrum),
    ]:
        _, want = theirs(omega, k)
        got = np.asarray(ours(omega, k))
        np.testing.assert_allclose(got, want, rtol=1e-10, err_msg=str(ours))


@pytest.mark.parametrize("slit,hapi_name", [
    ("rectangular", "SLIT_RECTANGULAR"), ("triangular", "SLIT_TRIANGULAR"),
    ("gaussian", "SLIT_GAUSSIAN"), ("michelson", "SLIT_MICHELSON"),
    ("diffraction", "SLIT_DIFFRACTION"), ("cosinus", "SLIT_COSINUS"),
    ("dispersion", "SLIT_DISPERSION"),
])
def test_convolve_spectrum_matches_hapi(slit, hapi_name):
    hapi = load_hapi()
    omega = np.linspace(800.0, 820.0, 4001)
    y = np.exp(-0.5 * ((omega - 810) / 0.5) ** 2)
    w_t, y_t, i1, i2, _ = convolve_spectrum(omega, y, resolution=1.0,
                                            af_wing=5.0, slit=slit)
    # hapi's convolveSpectrum crashes under python3/modern numpy (float
    # slice bounds, misc/hapi.py:11863-11866); replicate its documented
    # semantics with hapi's own slit functions as the oracle.
    from radtxfr_tpu.core.grid import arange_drift_free
    step = omega[1] - omega[0]
    # (hapi's own arange_ also crashes on modern numpy; ours is the same math)
    x = arange_drift_free(-5.0, 5.0 + step, step)
    slit_vals = getattr(hapi, hapi_name)(x.copy(), 1.0)
    slit_vals = slit_vals / (slit_vals.sum() * step)
    want_full = np.convolve(y, slit_vals, mode="same") * step
    j1 = len(x) // 2
    j2 = len(omega) - len(x) // 2
    assert (i1, i2) == (j1, j2)
    np.testing.assert_allclose(w_t, omega[j1:j2])
    np.testing.assert_allclose(np.asarray(y_t), want_full[j1:j2],
                               rtol=1e-8, atol=1e-12)


def test_fetch_url_construction():
    url = build_query_url([1, 2, 4], 690.0, 1410.0)
    assert url.startswith("http://hitran.org/lbl/api?")
    assert "iso_ids_list=1%2C2%2C4" in url
    assert "numin=690.0" in url and "numax=1410.0" in url


def _ht_extras(store, rng):
    """Synthetic HT parameter columns for every line."""
    n = store.n_lines
    return {
        "gamma_HT_0_air_296": np.asarray(store.gamma_air) * rng.uniform(0.9, 1.1, n),
        "n_HT_air_296": rng.uniform(0.4, 0.8, n),
        "delta_HT_0_air_296": rng.normal(0.0, 0.005, n),
        "deltap_HT_air_296": rng.normal(0.0, 1e-5, n),
        "gamma_HT_2_air_296": np.asarray(store.gamma_air) * rng.uniform(0.05, 0.15, n),
        "delta_HT_2_air_296": rng.normal(0.0, 5e-4, n),
        "nu_HT_air": rng.uniform(0.0, 0.05, n),
        "kappa_HT_air": rng.uniform(0.0, 1.0, n),
        "eta_HT_air": rng.uniform(0.0, 0.3, n),
    }


def test_ht_driver_matches_hapi(iso_tables):
    """absorptionCoefficient_HT parity with full HT columns present."""
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.ht_driver import xsect_ht
    from radtxfr_tpu.lines.synthetic import synthetic_lines, to_hapi_cache

    hapi = load_hapi()
    rng = np.random.default_rng(91)
    store = synthetic_lines(80, nu_min=795.0, nu_max=815.0, seed=91)
    extras = _ht_extras(store, rng)
    to_hapi_cache(store, "ht_tbl", hapi)
    for k, v in extras.items():
        hapi.LOCAL_TABLE_CACHE["ht_tbl"]["data"][k] = np.asarray(v, dtype=np.float64)

    grid = arange_drift_free(800.0, 810.0, 0.005)
    mols = sorted(set(np.asarray(store.mol_id).tolist()))
    from radtxfr_tpu.lines.tips import load_tips_tables
    _, iso_ids, _, _ = load_tips_tables()
    comps = sorted(set(zip(np.asarray(store.mol_id).tolist(),
                           iso_ids[np.asarray(store.iso_row)].tolist())))
    _, want = hapi.absorptionCoefficient_HT(
        Components=comps, SourceTables="ht_tbl",
        Environment={"T": 280.0, "p": 0.8},
        OmegaGrid=grid, OmegaWing=0.0, OmegaWingHW=50.0, HITRAN_units=True)
    got = np.asarray(xsect_ht(jnp.asarray(grid), store, iso_tables,
                              280.0, 0.8, extras=extras))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12 * np.abs(want).max())


def test_ht_driver_fallback_to_voigt_columns(iso_tables):
    """Without HT columns the driver must fall back to gamma_air/SD_air."""
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.ht_driver import xsect_ht
    from radtxfr_tpu.lines.synthetic import synthetic_lines, to_hapi_cache

    hapi = load_hapi()
    store = synthetic_lines(60, nu_min=795.0, nu_max=815.0, seed=92)
    to_hapi_cache(store, "ht_tbl2", hapi)
    grid = arange_drift_free(800.0, 810.0, 0.01)
    from radtxfr_tpu.lines.tips import load_tips_tables
    _, iso_ids, _, _ = load_tips_tables()
    comps = sorted(set(zip(np.asarray(store.mol_id).tolist(),
                           iso_ids[np.asarray(store.iso_row)].tolist())))
    _, want = hapi.absorptionCoefficient_HT(
        Components=comps, SourceTables="ht_tbl2",
        Environment={"T": 296.0, "p": 1.0},
        OmegaGrid=grid, HITRAN_units=True)
    got = np.asarray(xsect_ht(jnp.asarray(grid), store, iso_tables, 296.0, 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12 * np.abs(want).max())
