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


def test_fetch_custom_url_construction():
    """ParameterGroups switch to the custom par-search URL
    (misc/hapi.py:3130-3135): comma-separated request_params after the
    fixwidth/sep flags."""
    url = build_query_url([1], 690.0, 1410.0, pargroups=["sdvoigt"])
    assert "head=False" in url
    assert "fixwidth=0" in url
    assert "sep=[comma]" in url
    assert ("request_params=par_line,deltap_air,SD_air,delta_self,"
            "deltap_self,n_self,SD_self" in url)


def test_prepare_parlist_matches_reference():
    """prepare_parlist reproduces hapi's prepareParlist for every group
    and for single-parameter requests."""
    from oracle import load_hapi
    from radtxfr_tpu.lines.fetch import PARAMETER_GROUPS, prepare_parlist

    hapi = load_hapi()
    for group in PARAMETER_GROUPS:
        want = hapi.prepareParlist(pargroups=[group])
        got = prepare_parlist(pargroups=[group])
        assert got == want, (group, got, want)
    assert (prepare_parlist(params=["SD_air", "voigt_something"])
            == hapi.prepareParlist(params=["SD_air", "voigt_something"]))
    assert (prepare_parlist(pargroups=["ht"], params=["y_air"])
            == hapi.prepareParlist(pargroups=["ht"], params=["y_air"]))


def test_parse_custom_payload_sd_air(tmp_path):
    """Offline parse of a custom-search payload: .par record + SD_air +
    deltap columns -> LineStore with sd_air merged, extras nu-aligned."""
    from radtxfr_tpu.lines.fetch import parse_custom_payload, prepare_parlist
    from radtxfr_tpu.lines.hapi_db import write_par
    from radtxfr_tpu.lines.synthetic import synthetic_lines

    store = synthetic_lines(40, nu_min=900.0, nu_max=950.0, seed=13)
    path = tmp_path / "lines.par"
    write_par(store, str(path))
    par_rows = path.read_text().splitlines()

    rng = np.random.default_rng(2)
    # payload rows arrive UNSORTED from the server; shuffle to prove the
    # parser re-aligns extras with the nu-sorted store
    perm = rng.permutation(len(par_rows))
    sd = rng.uniform(0.05, 0.2, len(par_rows))
    dp = rng.normal(0.0, 1e-5, len(par_rows))
    rows = [f"{par_rows[i]},{dp[i]:.6E},{sd[i]:.4f}" for i in perm]
    # one row with hapi's missing-value markers
    rows[0] = rows[0].rsplit(",", 2)[0] + ",#,"

    parlist = prepare_parlist(params=["deltap_air", "SD_air"])
    assert parlist == ["par_line", "deltap_air", "sd_air"]
    got, extras = parse_custom_payload(rows, ["par_line", "deltap_air",
                                              "SD_air"])
    assert got.n_lines == store.n_lines
    nu_sorted = np.sort(np.asarray([float(r[3:15]) for r in par_rows])[perm])
    np.testing.assert_allclose(np.asarray(got.nu0), nu_sorted, atol=1e-6)

    # extras follow the store's nu order; the '#,'-marked row maps to 0
    order = np.argsort(np.array([float(par_rows[i][3:15]) for i in perm]),
                       kind="stable")
    sd_want = sd[perm][order]
    dp_want = dp[perm][order]
    marked = order.tolist().index(0)  # shuffled row 0 carried the markers
    sd_want[marked] = 0.0
    dp_want[marked] = 0.0
    np.testing.assert_allclose(extras["SD_air"], sd_want, atol=1e-4)
    np.testing.assert_allclose(extras["deltap_air"], dp_want, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.sd_air), sd_want, atol=1e-4)


def test_fetched_sd_air_drives_sdvoigt_engine(tmp_path, iso_tables):
    """End-to-end: a parsed custom payload's SD_air column changes the
    SD-Voigt spectrum exactly as the same column set directly."""
    import jax.numpy as jnp

    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.kernels.lineparams import compute_line_params
    from radtxfr_tpu.kernels.xsect import xsect_from_params
    from radtxfr_tpu.lines.fetch import parse_custom_payload
    from radtxfr_tpu.lines.hapi_db import write_par
    from radtxfr_tpu.lines.synthetic import synthetic_lines

    store = synthetic_lines(20, nu_min=995.0, nu_max=1005.0, seed=7)
    path = tmp_path / "x.par"
    write_par(store, str(path))
    sd = np.full(20, 0.12)
    rows = [f"{r},{sd[i]:.4f}" for i, r in
            enumerate(path.read_text().splitlines())]
    fetched, _ = parse_custom_payload(rows, ["par_line", "SD_air"])

    axis = jnp.asarray(arange_drift_free(998.0, 1002.0, 0.01))
    k_f = np.asarray(xsect_from_params(
        axis, compute_line_params(fetched, iso_tables, 296.0, 1.0,
                                  profile="sdvoigt"), profile="sdvoigt"))
    import dataclasses
    direct = store  # same lines, but sd_air from the synthetic generator
    direct2 = dataclasses.replace(
        direct, sd_air=jnp.full_like(direct.sd_air, 0.12))
    k_d = np.asarray(xsect_from_params(
        axis, compute_line_params(direct2, iso_tables, 296.0, 1.0,
                                  profile="sdvoigt"), profile="sdvoigt"))
    # .par round-trip quantizes gamma/sw at HITRAN print precision
    np.testing.assert_allclose(k_f, k_d, rtol=2e-3)


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


def test_query_full_operator_set():
    """All reference OPERATORS aliases (misc/hapi.py:1998-2066) evaluate."""
    from radtxfr_tpu.lines.query import filter_mask

    store = synthetic_lines(300, seed=84)
    nu = np.asarray(store.nu0)
    mol = np.asarray(store.mol_id)
    # alias families agree with their canonical operator
    for fam, canon in [
        (("RANGE", "BETWEEN", "between"), None),
        (("<", "LESS", "LT"), None),
        ((">", "MORE", "MT"), None),
        (("<=", "LESSOREQUAL", "LTE"), None),
        ((">=", "MOREOREQUAL", "MTE"), None),
        (("=", "==", "EQ", "EQUAL", "EQUALS"), None),
        (("!=", "<>", "~=", "NE", "NOTEQUAL"), None),
    ]:
        vals = []
        for op in fam:
            if op.upper() in ("RANGE", "BETWEEN"):
                vals.append(evaluate(store, (op, "nu", 700.0, 900.0)))
            else:
                vals.append(evaluate(store, (op, "nu", 800.0)))
        for v in vals[1:]:
            np.testing.assert_array_equal(vals[0], v)
    # chained many-arg comparison: pairwise along the chain
    np.testing.assert_array_equal(
        evaluate(store, ("<", 0.0, "nu", 5000.0)),
        (nu > 0) & (nu < 5000))
    # arithmetic aliases, many args
    np.testing.assert_allclose(
        evaluate(store, ("SUM", "nu", "nu", 1.0)), 2 * nu + 1)
    np.testing.assert_allclose(
        evaluate(store, ("MUL", "nu", 2.0, 3.0)), nu * 6.0)
    np.testing.assert_allclose(evaluate(store, ("DIFF", "nu", 1.0)), nu - 1)
    np.testing.assert_allclose(evaluate(store, ("DIV", "nu", 2.0)), nu / 2)
    np.testing.assert_allclose(evaluate(store, ("ABS", ("-", 0.0, "nu"))), nu)
    # IN/SUBSET + logic aliases
    np.testing.assert_array_equal(
        evaluate(store, ("IN", "molec_id", (1, 2))), np.isin(mol, [1, 2]))
    np.testing.assert_array_equal(
        evaluate(store, ("&&", ("NOT", ("IN", "molec_id", (1,))),
                         ("||", ("==", "molec_id", 2), ("==", "molec_id", 3)))),
        (mol != 1) & ((mol == 2) | (mol == 3)))
    # STR/SET/LIST literals
    assert evaluate(store, ("STR", "abc")) == "abc"
    assert evaluate(store, ("SET", (1, 2, 3))) == [1, 2, 3]
    assert evaluate(store, ("LIST", 1.0, 2.0)) == [1.0, 2.0]
    # regex ops over a string column (dict source)
    tbl = {"name": ["H2O", "CO2", "O3", "HDO"], "nu": np.arange(4.0)}
    np.testing.assert_array_equal(
        evaluate(tbl, ("MATCH", ("STR", "H.*"), "name")),
        [True, False, False, True])
    np.testing.assert_array_equal(
        evaluate(tbl, ("SEARCH", ("STR", "O2"), "name")),
        [False, True, False, False])
    assert evaluate(tbl, ("FINDALL", ("STR", "O"), "name"))[0] == ["O"]
    # filter_mask broadcasts scalar conditions
    assert filter_mask(store, ("==", 1, 1)).all()


def test_query_group_aggregation():
    """group() matches numpy per-group reductions (hapi group verb)."""
    from radtxfr_tpu.lines.query import group

    store = synthetic_lines(400, seed=85)
    mol = np.asarray(store.mol_id)
    sw = np.asarray(store.sw)
    out = group(store, by="molec_id", aggregates={
        "n": ("COUNT", None),
        "sw_sum": ("SUM", "sw"),
        "sw_avg": ("AVG", "sw"),
        "sw_min": ("MIN", "sw"),
        "sw_max": ("MAX", "sw"),
        "sw_ssq": ("SSQ", "sw"),
    })
    for k, m in enumerate(out["molec_id"]):
        sel = sw[mol == m]
        assert out["n"][k] == sel.size
        np.testing.assert_allclose(out["sw_sum"][k], sel.sum())
        np.testing.assert_allclose(out["sw_avg"][k], sel.mean())
        np.testing.assert_allclose(out["sw_min"][k], sel.min())
        np.testing.assert_allclose(out["sw_max"][k], sel.max())
        np.testing.assert_allclose(out["sw_ssq"][k], (sel ** 2).sum())
    # multi-key grouping + expression aggregate
    out2 = group(store, by=("molec_id",), aggregates={
        "r": ("MAX", ("/", "gamma_self", "gamma_air"))})
    assert len(out2["r"]) == len(np.unique(mol))


def test_extract_columns():
    from radtxfr_tpu.lines.query import extract_columns

    tbl = {"raw": [" 42  3.50 foo", " 7 -1.25 bar"]}
    out = extract_columns(tbl, "raw", ("%3d", "%6f", "%4s"),
                          ("a", "b", "c"))
    np.testing.assert_array_equal(out["a"], [42, 7])
    np.testing.assert_allclose(out["b"], [3.5, -1.25])
    assert out["c"] == ["foo", "bar"]
    # fixed-column mode slices by spec widths
    tbl2 = {"raw": ["123ab", "456cd"]}
    out2 = extract_columns(tbl2, "raw", ("%3d", "%2s"), ("n", "s"),
                           fix_col=True)
    np.testing.assert_array_equal(out2["n"], [123, 456])
    assert out2["s"] == ["ab", "cd"]


def test_stick_xy_matches_reference_layout():
    """x/y polyline has the reference's triple-point layout
    (getStickXY, misc/hapi.py:11684)."""
    from radtxfr_tpu.lines.query import stick_xy

    store = synthetic_lines(50, seed=86)
    x, y = stick_xy(store)
    nu = np.asarray(store.nu0)
    sw = np.asarray(store.sw)
    assert x.shape == y.shape == (150,)
    np.testing.assert_array_equal(x[0::3], nu)
    np.testing.assert_array_equal(x[1::3], nu)
    np.testing.assert_array_equal(x[2::3], nu)
    assert (y[0::3] == 0).all() and (y[2::3] == 0).all()
    np.testing.assert_array_equal(y[1::3], sw)


def test_save_table_round_trip(tmp_path):
    """save_table is the inverse of load_table (db_commit/cache2storage)."""
    from radtxfr_tpu.lines.hapi_db import save_table

    store = synthetic_lines(150, seed=87)
    save_table(store, str(tmp_path), "mytbl")
    back = load_table(str(tmp_path / "mytbl.data"))
    assert back.n_lines == store.n_lines
    np.testing.assert_allclose(np.asarray(back.nu0), np.asarray(store.nu0),
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(back.sw), np.asarray(store.sw),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(back.gamma_air),
                               np.asarray(store.gamma_air), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(back.mol_id),
                                  np.asarray(store.mol_id))
    # the written table also parses with hapi itself (storage2cache)
    hapi = load_hapi()
    hapi.VARIABLES["BACKEND_DATABASE_NAME"] = str(tmp_path)
    hapi.storage2cache("mytbl")
    got = np.asarray(hapi.LOCAL_TABLE_CACHE["mytbl"]["data"]["nu"])
    np.testing.assert_allclose(got, np.asarray(store.nu0), atol=5e-7)


def test_write_par_round_trip(tmp_path):
    from radtxfr_tpu.lines.hapi_db import write_par
    from radtxfr_tpu.lines.store import parse_par

    store = synthetic_lines(120, seed=88)
    path = str(tmp_path / "export.par")
    write_par(store, path)
    with open(path) as f:
        lines = f.read().splitlines()
    assert all(len(l) == 160 for l in lines)
    back = parse_par(path, native=False)
    np.testing.assert_allclose(np.asarray(back.nu0), np.asarray(store.nu0),
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(back.sw), np.asarray(store.sw),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(back.delta_air),
                               np.asarray(store.delta_air), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.mol_id),
                                  np.asarray(store.mol_id))


def test_db_commit(tmp_path):
    db = HapiDatabase(str(tmp_path))
    store = synthetic_lines(40, seed=89)
    db.commit("t1", store)
    assert "t1" in db.table_names()
    db2 = HapiDatabase(str(tmp_path))
    assert db2.load("t1").n_lines == 40
