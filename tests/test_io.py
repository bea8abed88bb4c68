"""IO layer: HDF5 units metadata, MBI and AFIT_XS binaries, LBLRTM interop."""

import numpy as np
import pytest

from radtxfr_tpu.io import (
    Var, write_h5, read_h5, gen_indices,
    mbi_export, mbi_read,
    xs_write, xs_read, xs_default_filename,
    read_tape12, write_tape12, write_tape5,
)


def test_h5_round_trip_with_metadata(tmp_path):
    f = str(tmp_path / "tud.h5")
    X = np.linspace(800, 900, 100)
    tau = np.random.default_rng(0).random((100, 3))
    write_h5(f, {
        "X": Var(X, units="cm^{-1}", name="Wavenumbers",
                 label=r"$\tilde{\nu}$"),
        "tau": Var(tau, units="none", name="Transmittance",
                   info="monochromatic transmittance"),
    }, attrs={"generator": "radtxfr_tpu"})
    back = read_h5(f)
    np.testing.assert_array_equal(back["X"].data, X)
    assert back["X"].units == "cm^{-1}"
    assert back["tau"].info == "monochromatic transmittance"


def test_gen_indices_split():
    tr, te, va = gen_indices(1000)
    assert len(tr) == 750 and len(te) == 125 and len(va) == 125
    all_idx = np.sort(np.concatenate([tr, te, va]))
    np.testing.assert_array_equal(all_idx, np.arange(1000))
    tr2, _, _ = gen_indices(1000)
    np.testing.assert_array_equal(tr, tr2)  # deterministic


@pytest.mark.parametrize("ext", ["bsq", "bip"])
def test_mbi_round_trip(tmp_path, ext):
    rng = np.random.default_rng(1)
    data = rng.random((4, 8, 6)).astype(np.float32)  # (nB, nR, nC)
    f = str(tmp_path / f"cube.{ext}")
    mbi_export(f, data, bands=np.arange(4) * 10.0, sensor="MAKO", run=3)
    back, rows, cols, bands, header = mbi_read(f)
    np.testing.assert_allclose(back, data)
    np.testing.assert_array_equal(bands, np.arange(4) * 10.0)
    np.testing.assert_array_equal(rows, np.arange(8))


def test_mbi_yaml_sidecar(tmp_path):
    """Sidecar=True contract of the reference format (AFIT_MBI.py:45,74-76;
    documented there but never actually written — implemented here)."""
    import yaml

    data = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    f = str(tmp_path / "cube.bsq")
    mbi_export(f, data, sidecar=True, sensor="MAKO",
               gains=np.array([1.0, 2.0]))
    with open(tmp_path / "cube.yaml") as fh:
        doc = yaml.safe_load(fh)
    assert doc["shape"] == {"rows": 3, "cols": 4, "bands": 2}
    assert doc["interleave"] == "bsq" and doc["dtype"] == "double"
    assert doc["Header"]["sensor"] == "MAKO"
    assert doc["Header"]["gains"] == [1.0, 2.0]
    # the binary is unaffected by the sidecar option
    back, *_ = mbi_read(f)
    np.testing.assert_allclose(back, data)


def test_afit_xs_round_trip(tmp_path):
    X = np.linspace(400.0, 7100.0, 5000)
    Y = np.random.default_rng(2).random(5000)
    f = str(tmp_path / xs_default_filename(1, 296, 101325))
    xs_write(X, Y, 296.0, 101325.0, 1, "HITRAN2016 - test", fname=f)
    X2, Y2, meta = xs_read(f)
    np.testing.assert_allclose(X2, X)
    np.testing.assert_allclose(Y2, Y)
    assert meta["mol_id"] == 1 and meta["T"] == 296.0
    assert meta["db_name"] == "HITRAN2016 - test"


def test_tape12_round_trip(tmp_path):
    f = str(tmp_path / "TAPE12")
    nu = np.linspace(800.0, 820.0, 5001)
    od = np.random.default_rng(3).exponential(0.2, 5001).astype(np.float32)
    write_tape12(f, nu, od, panel_size=1200)  # multiple panels + remainder
    nu2, od2 = read_tape12(f)
    np.testing.assert_allclose(nu2, nu, rtol=1e-12)
    np.testing.assert_array_equal(od2, od)


def test_tape5_deck_structure(tmp_path):
    f = str(tmp_path / "TAPE5")
    write_tape5(f, 690.0, 1410.0, T=280.0, P_pa=90000.0, PL_km=0.5,
                mf_ppmv=np.array([7000.0, 380.0]), mf_ids=np.array([1, 2]),
                dvout=0.0025)
    text = open(f).read().splitlines()
    assert text[-1] == "%%"
    assert any("HI=1 F4=1 CN=6" in ln for ln in text)
    # continuum flags: H2O (self+foreign) and CO2 present -> 1 1 1 0 0 0 0
    cn_line = text[5]
    assert cn_line.split()[:4] == ["1.000000", "1.000000", "1.000000", "0.000000"]
    # species card holds H2O ppmv in first column
    assert "7.00000000E+03" in "".join(text)


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_envi_round_trip(tmp_path, interleave):
    from radtxfr_tpu.io.envi import read_envi, write_envi

    rng = np.random.default_rng(4)
    cube = rng.random((5, 7, 9)).astype(np.float32)
    hdr = str(tmp_path / "cube.hdr")
    wl = np.linspace(7.5, 13.2, 5)
    write_envi(hdr, cube, interleave=interleave, wavelength=wl)
    back, h = read_envi(hdr)
    np.testing.assert_array_equal(back, cube)
    np.testing.assert_allclose(h["wavelength"], wl, rtol=1e-6)
    assert h["interleave"] == interleave


def test_tape3_round_trip():
    """TAPE3 (LNFL LINFIL layout) synthetic writer -> reader round trip,
    incl. interleaved line-coupling entries and block splitting
    (VERDICT r3 #5; reference consumption site
    radiative_transfer.py:491)."""
    import tempfile

    import numpy as np

    from radtxfr_tpu.io.lblrtm import read_tape3, write_tape3

    rng = np.random.default_rng(5)
    n = 700
    nu0 = np.sort(rng.uniform(600.0, 800.0, n))
    sw = 10.0 ** rng.uniform(-26, -20, n)
    ga = rng.uniform(0.02, 0.12, n)
    el = rng.uniform(0.0, 3000.0, n)
    mol = rng.integers(1, 8, n)
    iso = rng.integers(1, 3, n)
    gs = ga * rng.uniform(1.0, 5.0, n)
    na = rng.uniform(0.4, 0.8, n)
    da = rng.normal(0.0, 0.005, n)
    # coupling on a scattered subset (CO2-style Y/G quadruples)
    coup = {int(i): rng.normal(0.0, 0.05, 8).astype(np.float32)
            for i in rng.choice(n, 40, replace=False)}

    with tempfile.TemporaryDirectory() as d:
        f = d + "/TAPE3"
        write_tape3(f, nu0, sw, ga, el, mol, iso, gs, na, da,
                    coupling=coup, block_lines=100)
        t3 = read_tape3(f)

    assert t3["nu0"].size == n
    np.testing.assert_allclose(t3["nu0"], nu0, rtol=0, atol=0)  # f64 exact
    np.testing.assert_allclose(t3["sw"], sw.astype(np.float32), rtol=1e-7)
    np.testing.assert_allclose(t3["gamma_air"], ga.astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(t3["elower"], el.astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_array_equal(t3["mol_id"], mol)
    np.testing.assert_array_equal(t3["local_iso_id"], iso)
    np.testing.assert_allclose(t3["n_air"], na.astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(t3["delta_air"], da.astype(np.float32),
                               rtol=1e-5, atol=1e-8)
    # coupling entries recovered at the right lines with the right pairs
    c = t3["coupling"]
    assert c["index"].size == len(coup)
    got = {int(i): yg for i, yg in zip(c["index"], c["yg"])}
    for i, yg in coup.items():
        np.testing.assert_array_equal(got[i], yg)
    # flagged lines carry IFLG=1
    assert (t3["iflg"][c["index"]] == 1).all()


def test_tape3_to_linestore_and_od():
    """TAPE3 -> LineStore -> the engine computes finite OD; the 296 K
    coupling column lands as a line_mixing dict."""
    import tempfile

    import numpy as np
    import jax.numpy as jnp

    from radtxfr_tpu.atmos import std_atmosphere
    from radtxfr_tpu.core.grid import arange_drift_free
    from radtxfr_tpu.io.lblrtm import tape3_to_linestore, write_tape3
    from radtxfr_tpu.lines.store import IsoTables
    from radtxfr_tpu.products import compute_od_layers

    rng = np.random.default_rng(6)
    n = 80
    nu0 = np.sort(rng.uniform(690.0, 720.0, n))
    coup = {5: np.asarray([0.0, 0.0, 0.01, -0.001, 0.02, -0.002, 0.03,
                           -0.003], dtype=np.float32)}
    with tempfile.TemporaryDirectory() as d:
        f = d + "/TAPE3"
        write_tape3(f, nu0, 10.0 ** rng.uniform(-24, -20, n),
                    rng.uniform(0.05, 0.1, n), rng.uniform(0.0, 1000.0, n),
                    np.full(n, 2), np.ones(n, dtype=int),
                    rng.uniform(0.06, 0.15, n), rng.uniform(0.5, 0.8, n),
                    np.zeros(n), coupling=coup)
        store, lm = tape3_to_linestore(f)

    assert int(np.asarray(store.nu0).size) == n
    assert lm is not None and np.count_nonzero(lm["y_air"]) == 1
    # y at 296 K (pair index 2) attached to the right line center
    k = int(np.nonzero(lm["y_air"])[0][0])
    assert abs(float(np.asarray(store.nu0)[k]) - nu0[5]) < 1e-9
    assert lm["y_air"][k] == np.float32(0.02)

    iso = IsoTables.load()
    atm = std_atmosphere()
    axis = arange_drift_free(695.0, 715.0, 0.01)
    od = np.asarray(compute_od_layers(store, iso, jnp.asarray(axis), atm,
                                      line_mixing=lm))
    assert np.isfinite(od).all() and od.max() > 0


def test_tape3_band_selection():
    """read_tape3(nu_min, nu_max): block-level band selection via the
    pointer records — out-of-band blocks are skipped without parsing
    (the 970 MB AER-file sharded-parse pattern, SURVEY.md §7), and the
    selected lines equal the full parse filtered to the covering blocks."""
    import tempfile

    import numpy as np

    from radtxfr_tpu.io.lblrtm import read_tape3, tape3_to_linestore, write_tape3

    rng = np.random.default_rng(7)
    n = 900
    nu0 = np.sort(rng.uniform(500.0, 1400.0, n))
    sw = 10.0 ** rng.uniform(-26, -20, n)
    ga = rng.uniform(0.02, 0.12, n)
    el = rng.uniform(0.0, 3000.0, n)
    mol = rng.integers(1, 8, n)
    iso = rng.integers(1, 3, n)
    gs = ga * 2.0
    na = rng.uniform(0.4, 0.8, n)
    da = rng.normal(0.0, 0.005, n)

    with tempfile.TemporaryDirectory() as d:
        f = d + "/TAPE3"
        write_tape3(f, nu0, sw, ga, el, mol, iso, gs, na, da,
                    block_lines=50)
        full = read_tape3(f)
        band = read_tape3(f, nu_min=800.0, nu_max=1000.0)
        st, _ = tape3_to_linestore(f, nu_min=800.0, nu_max=1000.0)
        with np.testing.assert_raises(ValueError):
            read_tape3(f, nu_min=5000.0, nu_max=6000.0)

    # exactly the union of blocks intersecting the band
    keep = np.zeros(full["nu0"].size, dtype=bool)
    lo = 0
    for vmin, vmax, nrec in full["blocks"]:
        if vmax >= 800.0 and vmin <= 1000.0:
            keep[lo:lo + nrec] = True
        lo += nrec
    np.testing.assert_array_equal(band["nu0"], full["nu0"][keep])
    np.testing.assert_array_equal(band["sw"], full["sw"][keep])
    assert band["nu0"].size < full["nu0"].size
    assert st.n_lines == band["nu0"].size
    # every in-band line is present (blocks only ADD margin lines)
    in_band = full["nu0"][(full["nu0"] >= 800.0) & (full["nu0"] <= 1000.0)]
    assert np.isin(in_band, band["nu0"]).all()
