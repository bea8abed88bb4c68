"""The hapi-named drop-in layer vs the reference hapi itself.

``radtxfr_tpu.hapi_compat`` promises hapi's names, conventions, defaults
and return shapes (``misc/hapi.py``); these tests drive both sides on
identical synthetic tables and compare.
"""

import numpy as np
import pytest

from oracle import load_hapi
from radtxfr_tpu import hapi_compat as hc
from radtxfr_tpu.lines.hapi_db import save_table
from radtxfr_tpu.lines.synthetic import synthetic_lines, to_hapi_cache

GRID = np.arange(1000.0, 1020.0, 0.01)


@pytest.fixture()
def db(tmp_path):
    """A db_begin'd directory holding one synthetic table 'syn'."""
    store = synthetic_lines(60, 990.0, 1030.0, seed=7)
    save_table(store, str(tmp_path), "syn")
    hc._TABLES.clear()
    hc._EXTRAS.clear()
    hc.db_begin(str(tmp_path))
    return store


def _hapi_with(db, table="syn"):
    # Mirror the RELOADED table (fixed-column text quantizes the values,
    # hapi's own cache2storage behavior) so both sides see identical data.
    hapi = load_hapi()
    to_hapi_cache(hc._get_table(table), table, hapi)
    return hapi


# ---------------------------------------------------------------------------
# DB verbs
# ---------------------------------------------------------------------------

def test_db_begin_table_list(db):
    assert "syn" in hc.tableList()
    assert len(hc.getColumn("syn", "nu")) == 60


def test_select_conditions_match_reference_semantics(db):
    out = hc.select("syn", Conditions=("between", "nu", 1000.0, 1010.0),
                    DestinationTableName="band")
    nu = np.asarray(out.nu0)
    assert "band" in hc.tableList()
    assert nu.size > 0 and nu.min() >= 1000.0 and nu.max() <= 1010.0


def test_sort_descending(db):
    out = hc.sort("syn", DestinationTableName="s", ParameterNames=["sw"],
                  Accending=False)
    sw = np.asarray(out.sw)
    assert np.all(np.diff(sw) <= 0)


def test_group_count(db):
    out = hc.group("syn", ParameterNames=[("COUNT",)],
                   GroupParameterNames=["molec_id"], Output=False)
    assert int(sum(out["count_0"])) == 60


def test_db_commit_roundtrip(db, tmp_path):
    hc.db_commit()
    hc._TABLES.clear()
    hc.db_begin(str(tmp_path))
    assert len(hc.getColumn("syn", "nu")) == 60


def test_stick_xy(db):
    x, y = hc.getStickXY("syn")
    assert x.size == 3 * 60 and y[0] == 0.0 and y[1] > 0


def test_describe_and_drop(db, capsys):
    hc.describeTable("syn")
    assert "Number of rows: 60" in capsys.readouterr().out
    hc.dropTable("syn")
    assert "syn" not in hc.tableList()


# ---------------------------------------------------------------------------
# Registry / partition sums
# ---------------------------------------------------------------------------

def test_registry_matches_hapi():
    hapi = load_hapi()
    for m, i in ((1, 1), (2, 1), (3, 1), (6, 3)):
        assert hc.abundance(m, i) == pytest.approx(hapi.abundance(m, i))
        assert hc.molecularMass(m, i) == pytest.approx(hapi.molecularMass(m, i))
        assert hc.moleculeName(m) == hapi.moleculeName(m)
        assert hc.isotopologueName(m, i) == hapi.isotopologueName(m, i)
    assert hc.ISO[(1, 1)][0] == hapi.ISO[(1, 1)][0]
    assert hc.ISO_ID[7][:2] == hapi.ISO_ID[7][:2]


def test_partition_sum_matches_hapi():
    hapi = load_hapi()
    assert hc.partitionSum(1, 1, 250.0) == pytest.approx(
        hapi.partitionSum(1, 1, 250.0), rel=1e-12)
    ours = hc.partitionSum(2, 1, [250.0, 300.0])
    ref = hapi.partitionSum(2, 1, [250.0, 300.0])
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
    tt, q = hc.partitionSum(1, 1, [250.0, 260.0], step=2.0)
    tt_r, q_r = hapi.partitionSum(1, 1, [250.0, 260.0], step=2.0)
    np.testing.assert_allclose(tt, tt_r)
    np.testing.assert_allclose(q, q_r, rtol=1e-12)


# ---------------------------------------------------------------------------
# Profiles / CPF
# ---------------------------------------------------------------------------

def test_profile_voigt_matches_hapi():
    hapi = load_hapi()
    sg = np.linspace(999.0, 1001.0, 501)
    ours = np.asarray(hc.PROFILE_VOIGT(1000.0, 0.005, 0.05, sg)[0])
    ref = np.asarray(hapi.PROFILE_VOIGT(1000.0, 0.005, 0.05, sg)[0])
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_profile_lorentz_doppler_match_hapi():
    hapi = load_hapi()
    sg = np.linspace(999.0, 1001.0, 501)
    np.testing.assert_allclose(
        np.asarray(hc.PROFILE_LORENTZ(1000.0, 0.05, sg)),
        hapi.PROFILE_LORENTZ(1000.0, 0.05, sg), rtol=1e-12)
    # atol covers denormal-tail underflow-order differences (~1e-307)
    np.testing.assert_allclose(
        np.asarray(hc.PROFILE_DOPPLER(1000.0, 0.005, sg)),
        hapi.PROFILE_DOPPLER(1000.0, 0.005, sg), rtol=1e-12, atol=1e-300)


def test_cpf_family():
    import scipy.special as sp

    hapi = load_hapi()
    x = np.linspace(-14.0, 14.0, 401)
    y = np.full_like(x, 0.5)
    # hum1_wei: exact match vs the reference implementation
    wr, wi = hc.hum1_wei(x, y)
    wr_ref, wi_ref = hapi.hum1_wei(x.copy(), y)
    np.testing.assert_allclose(np.asarray(wr), wr_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(wi), wi_ref, rtol=1e-12)
    # cef: matches hapi's cef
    np.testing.assert_allclose(np.asarray(hc.cef(x, y, 24)),
                               hapi.cef(x, y, 24), rtol=1e-9, atol=1e-14)
    # cpf3 (asymptotic): compare against hapi in its validity region
    xa = np.linspace(10.0, 40.0, 101)
    ya = np.full_like(xa, 2.0)
    np.testing.assert_allclose(np.asarray(hc.cpf3(xa, ya)[0]),
                               hapi.cpf3(xa, ya)[0], rtol=1e-12)
    # cpf (full Humlicek): accuracy-checked against scipy wofz; the
    # reference's region-1 branch has a bug (Y read from X,
    # misc/hapi.py:9757) documented & fixed in kernels/faddeeva.py
    w = sp.wofz(x + 1j * y)
    wr_h, wi_h = hc.cpf(x, y)
    np.testing.assert_allclose(np.asarray(wr_h), w.real, rtol=5e-4, atol=1e-15)
    np.testing.assert_allclose(np.asarray(wi_h), w.imag, rtol=5e-4, atol=1e-15)


def test_volume_concentration_matches_hapi():
    hapi = load_hapi()
    assert hc.volumeConcentration(0.7, 250.0) == pytest.approx(
        hapi.volumeConcentration(0.7, 250.0), rel=1e-12)


# ---------------------------------------------------------------------------
# Absorption-coefficient drivers (hapi signature end-to-end)
# ---------------------------------------------------------------------------

def test_voigt_driver_matches_hapi(db):
    hapi = _hapi_with(db)
    kw = dict(SourceTables="syn", Environment={"T": 280.0, "p": 0.8},
              OmegaGrid=GRID)
    nu_r, k_r = hapi.absorptionCoefficient_Voigt(**kw)
    nu, k = hc.absorptionCoefficient_Voigt(**kw)
    np.testing.assert_allclose(nu, nu_r)
    np.testing.assert_allclose(k, k_r, rtol=1e-8, atol=1e-30)


def test_voigt_driver_default_grid_and_range(db):
    hapi = _hapi_with(db)
    # hapi's own arange_ passes a float count to np.linspace — broken on
    # modern numpy (misc/hapi.py:133-139); patch in the equivalent with the
    # int cast so the oracle can run the default-grid path at all.
    hapi.arange_ = lambda lo, hi, st: np.asarray(hc.arange_(lo, hi, st))
    kw = dict(SourceTables="syn", WavenumberRange=(1000.0, 1020.0),
              WavenumberStep=0.02)
    nu_r, k_r = hapi.absorptionCoefficient_Voigt(**kw)
    nu, k = hc.absorptionCoefficient_Voigt(**kw)
    np.testing.assert_allclose(nu, nu_r)
    np.testing.assert_allclose(k, k_r, rtol=1e-8, atol=1e-30)


def test_voigt_driver_gamma_self_and_units(db):
    hapi = _hapi_with(db)
    kw = dict(SourceTables="syn", OmegaGrid=GRID, GammaL="gamma_self",
              HITRAN_units=False, Environment={"T": 296.0, "p": 1.0})
    nu_r, k_r = hapi.absorptionCoefficient_Voigt(**kw)
    _, k = hc.absorptionCoefficient_Voigt(**kw)
    np.testing.assert_allclose(k, k_r, rtol=1e-8)


def test_voigt_driver_components_and_abundance(db):
    hapi = _hapi_with(db)
    comps = [(1, 1, 0.5)]
    kw = dict(Components=comps, SourceTables="syn", OmegaGrid=GRID)
    nu_r, k_r = hapi.absorptionCoefficient_Voigt(**kw)
    _, k = hc.absorptionCoefficient_Voigt(**kw)
    np.testing.assert_allclose(k, k_r, rtol=1e-8, atol=1e-30)


def test_voigt_driver_intensity_threshold(db):
    hapi = _hapi_with(db)
    kw = dict(SourceTables="syn", OmegaGrid=GRID, IntensityThreshold=1e-23,
              Environment={"T": 310.0, "p": 1.2})
    nu_r, k_r = hapi.absorptionCoefficient_Voigt(**kw)
    _, k = hc.absorptionCoefficient_Voigt(**kw)
    np.testing.assert_allclose(k, k_r, rtol=1e-8, atol=1e-30)


def test_doppler_driver_no_line_shift(db):
    # LineShift is only honored by hapi's Doppler driver
    # (misc/hapi.py:11511); the Voigt/SDVoigt/Lorentz/HT drivers accept and
    # ignore it — replicated in the shim.
    hapi = _hapi_with(db)
    kw = dict(SourceTables="syn", OmegaGrid=GRID, LineShift=False,
              Environment={"T": 296.0, "p": 1.0})
    nu_r, k_r = hapi.absorptionCoefficient_Doppler(**kw)
    _, k = hc.absorptionCoefficient_Doppler(**kw)
    np.testing.assert_allclose(k, k_r, rtol=1e-7, atol=1e-30)


def test_lorentz_doppler_sdvoigt_drivers_match_hapi(db):
    hapi = _hapi_with(db)
    for name in ("Lorentz", "Doppler", "SDVoigt"):
        kw = dict(SourceTables="syn", OmegaGrid=GRID,
                  Environment={"T": 290.0, "p": 0.9})
        nu_r, k_r = getattr(hapi, f"absorptionCoefficient_{name}")(**kw)
        _, k = getattr(hc, f"absorptionCoefficient_{name}")(**kw)
        np.testing.assert_allclose(k, k_r, rtol=1e-7, atol=1e-30,
                                   err_msg=name)


def test_ht_driver_matches_hapi(db):
    hapi = _hapi_with(db)
    kw = dict(SourceTables="syn", OmegaGrid=GRID,
              Environment={"T": 296.0, "p": 1.0})
    nu_r, k_r = hapi.absorptionCoefficient_HT(**kw)
    _, k = hc.absorptionCoefficient_HT(**kw)
    np.testing.assert_allclose(k, k_r, rtol=1e-7, atol=1e-30)


def test_driver_file_output(db, tmp_path):
    out = tmp_path / "xs.txt"
    hc.absorptionCoefficient_Voigt(SourceTables="syn", OmegaGrid=GRID,
                                   File=str(out))
    data = np.loadtxt(out)
    assert data.shape == (GRID.size, 2)


# ---------------------------------------------------------------------------
# Spectra + convolution
# ---------------------------------------------------------------------------

def test_spectra_match_hapi(db):
    hapi = _hapi_with(db)
    _, k = hc.absorptionCoefficient_Voigt(SourceTables="syn", OmegaGrid=GRID)
    for name, env in (("transmittanceSpectrum", {"l": 50.0}),
                      ("absorptionSpectrum", {"l": 50.0}),
                      ("radianceSpectrum", {"l": 50.0, "T": 300.0})):
        nu_r, s_r = getattr(hapi, name)(GRID, k, Environment=env)
        nu, s = getattr(hc, name)(GRID, k, Environment=env)
        np.testing.assert_allclose(s, s_r, rtol=1e-10, err_msg=name)


def test_convolve_spectrum_variants(db):
    _, k = hc.absorptionCoefficient_Voigt(SourceTables="syn", OmegaGrid=GRID)
    om, y, i1, i2, slit = hc.convolveSpectrum(GRID, k, Resolution=0.5,
                                              AF_wing=2.0,
                                              SlitFunction=hc.SLIT_GAUSSIAN)
    assert om.size == y.shape[0] == GRID.size - 2 * (i1)
    om_s, y_s, *_ = hc.convolveSpectrumSame(GRID, k, Resolution=0.5,
                                            AF_wing=2.0)
    assert y_s.shape[0] == GRID.size
    # 'Same' matches the reference's convolveSpectrumSame exactly
    hapi = load_hapi()
    _, y_ref, *_ = hapi.convolveSpectrumSame(GRID.copy(), np.asarray(k),
                                             Resolution=0.5, AF_wing=2.0)
    np.testing.assert_allclose(y_s, y_ref, rtol=1e-10)
    _, y_f, *_ = hc.convolveSpectrumFull(GRID, k, Resolution=0.5, AF_wing=2.0)
    assert y_f.shape[0] >= GRID.size


# ---------------------------------------------------------------------------
# Straggler surface: aliases, filter/selectInto, AtoB/BD_TIPS, pcqsdhc,
# tutorial printers
# ---------------------------------------------------------------------------

def test_table_aliases_and_verbs(db):
    assert hc.getTableList() == hc.tableList()
    assert hc.length("syn") == 60
    hc.describe("syn")  # prints the describeTable summary

    hc.filter("syn", ("between", "nu", 1000.0, 1010.0))
    n_buf = hc.length("__BUFFER__")
    hc.selectInto("sel", "syn", ["nu", "sw"],
                  ("between", "nu", 1000.0, 1010.0))
    assert hc.length("sel") == n_buf
    nu = np.asarray(hc.getColumn("sel", "nu"))
    assert nu.size and nu.min() >= 1000.0 and nu.max() <= 1010.0

    # second selectInto APPENDS (hapi number_of_rows += row_count,
    # misc/hapi.py:2555); rows stay nu-sorted
    hc.selectInto("sel", "syn", ["nu", "sw"],
                  ("between", "nu", 1010.0, 1020.0))
    nu2 = np.asarray(hc.getColumn("sel", "nu"))
    assert nu2.size > n_buf and (np.diff(nu2) >= 0).all()
    assert nu2.max() <= 1020.0


def test_atob_and_bd_tips_match_hapi():
    hapi = load_hapi()
    A = np.array(hapi.Tdat)
    B = np.array(hapi.TIPS_ISO_HASH[(2, 1)], dtype=np.float64)
    ts = [70.5, 120.0, 296.0, 1234.5, 2999.0]
    ours = hc.AtoB(np.array(ts), A, B, len(A))
    ref = [hapi.AtoB(t, A, B, len(A)) for t in ts]
    np.testing.assert_allclose(ours, ref, rtol=1e-12)

    gi, q = hc.BD_TIPS_2011_PYTHON(2, 1, 296.0)
    gi_r, q_r = hapi.BD_TIPS_2011_PYTHON(2, 1, 296.0)
    assert gi == gi_r
    np.testing.assert_allclose(q, q_r, rtol=1e-6)
    with pytest.raises(Exception, match="70K"):
        hc.BD_TIPS_2011_PYTHON(2, 1, 50.0)


def test_pcqsdhc_matches_hapi():
    hapi = load_hapi()
    sg = np.arange(999.0, 1001.0, 0.001)
    args = (1000.0, 0.005, 0.05, 0.01, 0.002, 0.0005, 0.01, 0.1)
    re_r, im_r = hapi.pcqsdhc(*args, sg)
    re, im = hc.pcqsdhc(*args, sg)
    np.testing.assert_allclose(np.asarray(re), re_r, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(im), im_r, rtol=2e-5, atol=1e-10)


def test_tutorial_printers(capsys):
    for fn in (hc.print_profiles, hc.print_slit_functions,
               hc.print_data_tutorial, hc.print_spectra_tutorial,
               hc.print_plotting_tutorial, hc.print_python_tutorial):
        fn()
    out = capsys.readouterr().out
    assert "PROFILE_HT" in out and "SLIT_GAUSSIAN" in out
    assert "db_begin" in out and "convolveSpectrum" in out


def test_sort_multi_key(db):
    """Multi-column lexicographic sort (hapi quickSort tuple comparator)."""
    hc.sort("syn", DestinationTableName="s2",
            ParameterNames=["molec_id", "nu"])
    mol = np.asarray(hc.getColumn("s2", "molec_id"))
    nu = np.asarray(hc.getColumn("s2", "nu"))
    assert (np.diff(mol) >= 0).all()
    for m in np.unique(mol):
        assert (np.diff(nu[mol == m]) >= 0).all()
    # nu0 stays host float64 through the sort
    assert np.asarray(hc._get_table("s2").nu0).dtype == np.float64


# ---------------------------------------------------------------------------
# Driver extension hooks (VERDICT r2 #8): EnvDependences + partitionFunction
# ---------------------------------------------------------------------------

def test_voigt_driver_env_dependences_matches_hapi(db):
    """Custom EnvDependences (per-line callback overriding gamma_air and
    sw) against the reference hapi running the SAME callback
    (misc/hapi.py:11056-11138)."""
    hapi = _hapi_with(db)

    def env_dep(Env, Line):
        out = {"gamma_air": 0.08 * (Env["p"] / Env["pref"])
               * (Env["Tref"] / Env["T"]) ** 0.6}
        if Line["nu"] > 1010.0:
            out["sw"] = Line["sw"] * 1.5   # raw-sw override, no T scaling
        return out

    kw = dict(SourceTables="syn", Environment={"T": 280.0, "p": 0.8},
              OmegaGrid=GRID, EnvDependences=env_dep)
    nu_r, k_r = hapi.absorptionCoefficient_Voigt(**kw)
    _, k = hc.absorptionCoefficient_Voigt(**kw)
    assert k.max() > 0
    np.testing.assert_allclose(k, k_r, rtol=1e-8, atol=1e-30)


def test_voigt_driver_custom_partition_function_matches_hapi(db):
    """Custom partitionFunction (hapi calls it at T and Tref;
    misc/hapi.py:11069-11070), incl. the post-override threshold."""
    hapi = _hapi_with(db)

    def pf(M, I, T):
        return float(hapi.PYTIPS(M, I, T)) * (T / 296.0)

    kw = dict(SourceTables="syn", Environment={"T": 260.0, "p": 1.0},
              OmegaGrid=GRID, partitionFunction=pf)
    nu_r, k_r = hapi.absorptionCoefficient_Voigt(**kw)
    _, k = hc.absorptionCoefficient_Voigt(**kw)
    np.testing.assert_allclose(k, k_r, rtol=1e-8, atol=1e-30)
    # the pf actually changed the answer (vs default TIPS)
    _, k0 = hc.absorptionCoefficient_Voigt(
        SourceTables="syn", Environment={"T": 260.0, "p": 1.0},
        OmegaGrid=GRID)
    assert np.abs(k - k0).max() > 1e-3 * k0.max()


def test_sdvoigt_driver_hooks_with_self_diluent_matches_hapi(db):
    """Both hooks on the SD-Voigt driver with an air/self diluent mix:
    covers the SD_<sp> override path, whose Gamma0DB factor sits OUTSIDE
    the override (misc/hapi.py:10889-10890), and the n_self fallback."""
    hapi = _hapi_with(db)

    def env_dep(Env, Line):
        return {"SD_self": 0.12 * Env["p"], "delta_air": 0.001}

    def pf(M, I, T):
        return float(hapi.PYTIPS(M, I, T)) * (1.0 + T / 1000.0)

    kw = dict(SourceTables="syn", Environment={"T": 290.0, "p": 0.9},
              OmegaGrid=GRID, Diluent={"air": 0.7, "self": 0.3},
              EnvDependences=env_dep, partitionFunction=pf)
    nu_r, k_r = hapi.absorptionCoefficient_SDVoigt(**kw)
    _, k = hc.absorptionCoefficient_SDVoigt(**kw)
    np.testing.assert_allclose(k, k_r, rtol=1e-7, atol=1e-30)


def test_doppler_driver_ignores_env_dependences_like_hapi(db):
    """hapi's Doppler driver accepts EnvDependences but never calls it
    (misc/hapi.py:11384-11581) — the compat driver must not raise and
    must not change its answer."""
    def env_dep(Env, Line):
        raise AssertionError("must never be called")

    kw = dict(SourceTables="syn", Environment={"T": 280.0, "p": 0.8},
              OmegaGrid=GRID)
    _, k0 = hc.absorptionCoefficient_Doppler(**kw)
    _, k = hc.absorptionCoefficient_Doppler(EnvDependences=env_dep, **kw)
    np.testing.assert_allclose(k, k0, rtol=0, atol=0)




def test_ht_driver_hooks_match_hapi(db):
    """EnvDependences + custom partitionFunction on the HT driver
    (misc/hapi.py:10455-10650): hapi's override-key quirks — the shift
    override under deltap_*, eta built from the OVERRIDDEN
    Gamma0T/Shift0T — against the reference running the same callbacks."""
    hapi = _hapi_with(db)

    def env_dep(Env, Line):
        out = {"gamma_HT_2_air_296": 0.004 * Env["p"]}
        if Line["nu"] > 1010.0:
            out["deltap_air"] = -0.002 * Env["p"]       # Shift0T override
        return out

    def pf(M, I, T):
        return float(hapi.PYTIPS(M, I, T)) * (T / 296.0) ** 0.5

    kw = dict(SourceTables="syn", Environment={"T": 280.0, "p": 0.8},
              OmegaGrid=GRID, EnvDependences=env_dep, partitionFunction=pf)
    nu_r, k_r = hapi.absorptionCoefficient_HT(**kw)
    _, k = hc.absorptionCoefficient_HT(**kw)
    assert k.max() > 0
    np.testing.assert_allclose(k, k_r, rtol=2e-7, atol=1e-30)


# ---------------------------------------------------------------------------
# Table-editing verbs (misc/hapi.py:1710-2960; the hapi no-op stubs
# renameColumn/insertRow/deleteRows/splitColumn are implemented for real
# here — divergence documented in MIGRATION.md)
# ---------------------------------------------------------------------------

def test_add_delete_rename_column(db):
    col = hc.addColumn("syn", "tag", Expression=("*", "nu", 2.0))
    np.testing.assert_allclose(col, 2.0 * np.asarray(hc.getColumn("syn", "nu")),
                               rtol=1e-12)
    assert "tag" in hc._EXTRAS["syn"]
    hc.renameColumn("syn", "tag", "nu2")
    assert "nu2" in hc._EXTRAS["syn"] and "tag" not in hc._EXTRAS["syn"]
    hc.deleteColumn("syn", "nu2")
    assert "nu2" not in hc._EXTRAS["syn"]
    with pytest.raises(ValueError):
        hc.deleteColumn("syn", "nu")          # core columns protected
    with pytest.raises(KeyError):
        hc.deleteColumn("syn", "missing")


def test_add_column_constant_and_before(db):
    hc.addColumn("syn", "flag", Type=int, Default=3)
    assert np.all(np.asarray(hc._EXTRAS["syn"]["flag"]) == 3)
    hc.addColumn("syn", "w", Before="flag")
    order = hc._META["syn"]["order"]
    assert order.index("w") == order.index("flag") - 1
    hc.deleteColumns("syn", ["flag", "w"])


def test_delete_rows_condition_and_extras_alignment(db):
    hc.addColumn("syn", "twice_nu", Expression=("*", "nu", 2.0))
    n0 = hc.length("syn")
    hc.deleteRows("syn", Conditions=(">", "nu", 1010.0))
    store = hc._get_table("syn")
    assert store.n_lines < n0
    assert np.all(np.asarray(store.nu0) <= 1010.0)
    np.testing.assert_allclose(hc._EXTRAS["syn"]["twice_nu"],
                               2.0 * np.asarray(store.nu0), rtol=1e-12)


def test_arrange_table_reorders_rows(db):
    ids = [5, 1, 3]
    hc.arrangeTable("syn", DestinationTableName="arr", RowIDList=ids)
    # the store stays nu-sorted (LineStore invariant; documented divergence
    # from hapi's preserve-RowIDList-order), so compare sorted centers
    want = np.sort(np.asarray(hc.getColumn("syn", "nu"))[ids])
    np.testing.assert_allclose(np.asarray(hc._get_table("arr").nu0), want)


def test_create_table_insert_row_roundtrip(db):
    hc.createTable("fresh", [("molec_id", 1, "%2d"), ("local_iso_id", 1, "%1d"),
                             ("nu", 0.0, "%12.6f"), ("sw", 0.0, "%10.3E"),
                             ("elower", 0.0, "%10.4f"),
                             ("gamma_air", 0.05, "%6.4f"),
                             ("gamma_self", 0.3, "%6.4f"),
                             ("n_air", 0.5, "%7.4f"),
                             ("delta_air", 0.0, "%9.6f"),
                             ("note", 0.0, "%5.1f")])
    assert hc.length("fresh") == 0
    hc.insertRow("fresh", {"nu": 1000.5, "sw": 1e-21, "note": 7.0})
    hc.insertRow("fresh", {"nu": 999.5, "sw": 2e-21})
    assert hc.length("fresh") == 2
    store = hc._get_table("fresh")
    np.testing.assert_allclose(np.asarray(store.nu0), [999.5, 1000.5])
    # extras follow the nu-sort permutation
    np.testing.assert_allclose(hc._EXTRAS["fresh"]["note"], [0.0, 7.0])
    # createTable defaults applied to unspecified core columns
    np.testing.assert_allclose(np.asarray(store.gamma_air), [0.05, 0.05])
    assert hc.insertRow() is None             # bare-call = hapi no-op stub


def test_split_column(db):
    hc._EXTRAS["syn"]["pair"] = np.asarray(
        [f"{i}|{i * 10}" for i in range(hc.length("syn"))], dtype=object)
    out = hc.splitColumn("syn", "pair", ["a", "b"], "|")
    np.testing.assert_allclose(out["b"], 10.0 * out["a"])


def test_save_load_cache_roundtrip(db, tmp_path):
    hc.select("syn", Conditions=("between", "nu", 1000.0, 1010.0))  # __BUFFER__
    n = hc.length("syn")
    hc.saveCache()
    assert "__BUFFER__" not in hc.tableList()
    hc.loadCache()
    assert hc.length("syn") == n


def test_abscoef_aliases_match_drivers(db):
    nu0, k0 = hc.absorptionCoefficient_Lorentz(SourceTables="syn",
                                               OmegaGrid=GRID)
    nu, k = hc.abscoef(table="syn", grid=GRID)   # hapi default = Lorentz
    np.testing.assert_allclose(k, k0, rtol=0, atol=0)
    _, kd = hc.abscoef_Doppler(table="syn", grid=GRID)
    _, kd0 = hc.absorptionCoefficient_Doppler(SourceTables="syn",
                                              OmegaGrid=GRID)
    np.testing.assert_allclose(kd, kd0, rtol=0, atol=0)
    assert hc.abscoef_Gauss is hc.abscoef_Doppler
    assert hc.absorptionCoefficient_Gauss is hc.absorptionCoefficient_Doppler


def test_read_hotw(tmp_path):
    p = tmp_path / "xs.txt"
    p.write_text("# header line\n100.0 1.5e-20\n100.5 2.5e-20\nbad line\n")
    nu, coef = hc.read_hotw(str(p))
    np.testing.assert_allclose(nu, [100.0, 100.5])
    np.testing.assert_allclose(coef, [1.5e-20, 2.5e-20])
    assert hc.read_xsect is hc.read_hotw
