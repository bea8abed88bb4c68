"""Hartmann-Tran profile family vs the reference pcqsdhc (float64)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radtxfr_tpu.kernels.htp import (
    pcqsdhc, profile_ht, profile_rautian, profile_sdrautian, profile_sdvoigt,
)
from radtxfr_tpu.kernels.profiles import voigt

from oracle import load_hapi

SG = np.linspace(999.0, 1001.0, 2001)


CASES = [
    # (GamD, Gam0, Gam2, Shift0, Shift2, anuVC, eta)
    (0.005, 0.05, 0.005, 0.01, 0.0, 0.0, 0.0),      # SDVoigt-like
    (0.005, 0.05, 0.005, 0.01, 0.001, 0.0, 0.0),    # + Shift2
    (0.002, 0.08, 0.01, -0.005, 0.0, 0.02, 0.0),    # SDRautian
    (0.003, 0.06, 0.0, 0.0, 0.0, 0.05, 0.0),        # Rautian (c2t == 0)
    (0.004, 0.07, 0.008, 0.01, 0.001, 0.03, 0.1),   # full HT
    (0.005, 0.0005, 0.00005, 0.0, 0.0, 0.0, 0.0),   # Doppler-dominated
    (0.0005, 0.3, 0.03, 0.02, 0.002, 0.0, 0.0),     # pressure-dominated
]


@pytest.mark.parametrize("gd,g0,g2,s0,s2,nvc,eta", CASES)
def test_pcqsdhc_matches_hapi(gd, g0, g2, s0, s2, nvc, eta):
    hapi = load_hapi()
    want_r, want_i = hapi.pcqsdhc(1000.0, gd, g0, g2, s0, s2, nvc, eta, SG.copy())
    got_r, got_i = pcqsdhc(1000.0, gd, g0, g2, s0, s2, nvc, eta, jnp.asarray(SG))
    np.testing.assert_allclose(np.asarray(got_r), want_r, rtol=1e-8,
                               atol=1e-12 * np.abs(want_r).max())
    np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=1e-8,
                               atol=1e-10 * np.abs(want_i).max())


def test_sdvoigt_collapses_to_voigt():
    """Gamma2 = Shift2 = 0 must reproduce the Voigt profile."""
    got = profile_sdvoigt(1000.0, 0.005, 0.05, 0.0, 0.0, 0.0, jnp.asarray(SG))[0]
    want = voigt(jnp.asarray(SG) - 1000.0, 0.005, 0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_profile_normalization():
    """HT profiles integrate to ~1 over a wide window."""
    sg = np.linspace(990.0, 1010.0, 200001)
    for args in [(0.005, 0.05, 0.005, 0.01, 0.001, 0.02, 0.05),
                 (0.01, 0.02, 0.002, 0.0, 0.0, 0.0, 0.0)]:
        gd, g0, g2, s0, s2, nvc, eta = args
        vals = pcqsdhc(1000.0, gd, g0, g2, s0, s2, nvc, eta, jnp.asarray(sg))[0]
        integral = np.trapezoid(np.asarray(vals), sg)
        # Lorentzian tails outside the +-10 cm^-1 window carry ~2*g0/(pi*10)
        assert abs(integral - 1.0) < 2.0 * 0.06 / (np.pi * 10.0) + 1e-3, (args, integral)


def test_rautian_wrapper_matches_hapi():
    hapi = load_hapi()
    want = hapi.PROFILE_RAUTIAN(1000.0, 0.004, 0.06, 0.01, 0.03, 0.0, SG.copy())[0]
    got = profile_rautian(1000.0, 0.004, 0.06, 0.01, 0.03, jnp.asarray(SG))[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8)
