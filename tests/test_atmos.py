"""Atmosphere ingestion: TIGR .mat loading, profile regrid, FD Jacobian inputs."""

import numpy as np
import pytest

from radtxfr_tpu.atmos import (
    jacobian_inputs,
    load_tigr_mat,
    regrid_profiles,
    std_atmosphere,
)


def test_regrid_profiles_matches_reference_interp():
    """Per-profile cubic interp1d onto the StdAtmos levels
    (Generate_LWIR_TUD.py:42-49)."""
    import scipy.interpolate

    base = std_atmosphere()
    z_out = np.asarray(base.z0)
    rng = np.random.default_rng(0)
    z_src = np.linspace(0.0, 90.0, 40)
    T = 280.0 + rng.normal(0, 5, (3, 40)).cumsum(axis=1) * 0.1
    h2o = np.abs(rng.normal(5e-3, 1e-3, (3, 40)))

    st = regrid_profiles(z_src, T=T, h2o=h2o)
    assert np.asarray(st.T).shape == (3, 66)
    for i in range(3):
        want = scipy.interpolate.interp1d(z_src, T[i], kind="cubic",
                                          bounds_error=False,
                                          fill_value="extrapolate")(z_out)
        np.testing.assert_allclose(np.asarray(st.T)[i], want, rtol=1e-6)
    # H2O lands in the mol-1 vmr column; O3 column keeps StdAtmos values
    col = {m: j for j, m in enumerate(st.mol_ids)}
    assert not np.allclose(np.asarray(st.vmr)[0, :, col[1]],
                           np.asarray(base.vmr)[:, col[1]])
    np.testing.assert_allclose(
        np.asarray(st.vmr)[:, :, col[3]],
        np.broadcast_to(np.asarray(base.vmr)[:, col[3]], (3, 66)), rtol=1e-6)
    # pressure untouched (reference keeps StdAtmos P)
    np.testing.assert_allclose(
        np.asarray(st.p), np.broadcast_to(np.asarray(base.p), (3, 66)),
        rtol=1e-6)


def test_regrid_requires_a_profile():
    with pytest.raises(ValueError, match="at least one"):
        regrid_profiles(np.linspace(0, 80, 30))


def test_jacobian_inputs_reference_tiling():
    """3*nL+1 rows, row 0 unperturbed, per-level steps of rel*max|x|
    (JacIn, Generate_LWIR_TUD.py:55-71)."""
    nL = 5
    T = np.linspace(300.0, 220.0, nL)
    h2o = np.linspace(8e-3, 1e-6, nL)
    o3 = np.linspace(1e-8, 8e-6, nL)
    Tj, hj, oj = jacobian_inputs(T, h2o, o3, rel_step=1e-3)
    assert Tj.shape == (3 * nL + 1, nL)
    np.testing.assert_array_equal(Tj[0], T)
    np.testing.assert_array_equal(hj[0], h2o)
    # T rows 1..nL: diagonal bump of 1e-3 * max|T|
    d = Tj[1:nL + 1] - T[None, :]
    np.testing.assert_allclose(np.diag(d), 1e-3 * np.max(np.abs(T)))
    assert np.count_nonzero(d) == nL
    # H2O rows nL+1..2nL perturb h2o only
    np.testing.assert_array_equal(Tj[nL + 1:2 * nL + 1], np.tile(T, (nL, 1)))
    dh = hj[nL + 1:2 * nL + 1] - h2o[None, :]
    np.testing.assert_allclose(np.diag(dh), 1e-3 * np.max(np.abs(h2o)))
    # O3 rows 2nL+1..3nL
    do = oj[2 * nL + 1:] - o3[None, :]
    np.testing.assert_allclose(np.diag(do), 1e-3 * np.max(np.abs(o3)))


def test_load_tigr_mat_units(tmp_path):
    from scipy.io import savemat

    p = str(tmp_path / "tigr.mat")
    savemat(p, {
        "P": np.asarray([1013.25, 900.0]),        # hPa
        "T": np.asarray([[290.0, 280.0]]),
        "H2O": np.asarray([[8000.0, 100.0]]),     # ppmv
        "O3": np.asarray([[1e-8, 1e-6]]),
        "z": np.asarray([[0.0, 10.0]]),
    })
    d = load_tigr_mat(p)
    np.testing.assert_allclose(d["P"], [101325.0, 90000.0])
    np.testing.assert_allclose(d["H2O"], [[8e-3, 1e-4]])
    assert d["T"].shape == (1, 2) and d["z"].shape == (1, 2)
