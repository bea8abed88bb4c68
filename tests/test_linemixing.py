"""First-order Rosenkranz line mixing: jnp engine vs float64 wofz oracle,
Pallas 'mix' mode, production wiring (flag-gated toward LBLRTM ILBLF4=1,
/root/reference/radiative_transfer.py:621)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.constants import PA_PER_ATM, SQRT_LN2, T_REF
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.kernels.lineparams import compute_line_params
from radtxfr_tpu.kernels.linemixing import mixing_coefficient, xsect_voigt_mixing
from radtxfr_tpu.kernels.xsect import xsect_from_params
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.synthetic import synthetic_lines


@pytest.fixture(scope="module")
def mix_setup(iso_tables):
    store = synthetic_lines(40, nu_min=715.0, nu_max=725.0, seed=61)
    axis = arange_drift_free(712.0, 728.0, 0.005)
    rng = np.random.default_rng(5)
    y_air = rng.normal(0.0, 3e-3, 40)   # typical CO2 Q-branch magnitudes
    return store, axis, y_air


def test_mixing_coefficient_scaling():
    y = mixing_coefficient(2e-3, 0.5, 296.0)
    np.testing.assert_allclose(float(y), 1e-3, rtol=1e-12)
    # default is the plain Rosenkranz Y(p) convention: NO T dependence
    # (HITRAN first-order columns define none; ADVICE r2)
    y_cold = mixing_coefficient(2e-3, 0.5, 250.0)
    np.testing.assert_allclose(float(y_cold), float(y), rtol=1e-12)
    # opt-in empirical exponent
    y_cold_n = mixing_coefficient(2e-3, 0.5, 250.0, n_T=0.75)
    np.testing.assert_allclose(float(y_cold_n) / float(y),
                               (296.0 / 250.0) ** 0.75, rtol=1e-10)
    # diluent mix
    y_m = mixing_coefficient(2e-3, 1.0, 296.0, y_self=4e-3, x_self=0.5)
    np.testing.assert_allclose(float(y_m), 3e-3, rtol=1e-12)


def test_xsect_mixing_matches_wofz_oracle(mix_setup, iso_tables):
    """Engine vs a direct float64 scipy.wofz evaluation of
    S (Re w + Y Im w) with the hapi window mask."""
    from scipy.special import wofz

    store, axis, y_air = mix_setup
    params = compute_line_params(store, iso_tables, 250.0, 0.4)
    Y = np.asarray(mixing_coefficient(y_air, 0.4, 250.0))
    got = np.asarray(xsect_voigt_mixing(jnp.asarray(axis), params, Y))

    p = jax.device_get(params)
    want = np.zeros_like(axis)
    for i in range(len(y_air)):
        cte = SQRT_LN2 / p.gamma_d[i]
        z = (axis - p.nu0_shifted[i]) * cte + 1j * p.gamma_0[i] * cte
        w = wofz(z)
        vals = cte / np.sqrt(np.pi) * (w.real + Y[i] * w.imag)
        mask = (axis > p.nu0[i] - p.wing[i]) & (axis <= p.nu0[i] + p.wing[i])
        want += np.where(mask, p.strength[i] * vals, 0.0)
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-6 * peak


def test_zero_mixing_reduces_to_voigt(mix_setup, iso_tables):
    store, axis, _ = mix_setup
    params = compute_line_params(store, iso_tables, 296.0, 1.0)
    got = np.asarray(xsect_voigt_mixing(jnp.asarray(axis), params,
                                        jnp.zeros(len(store))))
    want = np.asarray(xsect_from_params(jnp.asarray(axis), params))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0.0)


def test_asymmetry_sign(mix_setup, iso_tables):
    """Positive Y skews absorption toward nu > nu0 (Im w > 0 above the
    shifted center for z in the upper half plane... sign convention check
    against the oracle-verified engine)."""
    store, axis, _ = mix_setup
    one = store.subset(np.asarray([17]))
    params = compute_line_params(one, iso_tables, 296.0, 1.0)
    k_p = np.asarray(xsect_voigt_mixing(jnp.asarray(axis), params,
                                        jnp.asarray([0.05])))
    k_0 = np.asarray(xsect_voigt_mixing(jnp.asarray(axis), params,
                                        jnp.asarray([0.0])))
    nu0 = float(one.nu0[0])
    above = axis > nu0 + 0.05
    below = axis < nu0 - 0.05
    d = k_p - k_0
    assert (d[below].mean() > 0) != (d[above].mean() > 0)  # antisymmetric skew


def test_od_layers_line_mixing_jnp(mix_setup, iso_tables):
    """compute_od_layers(line_mixing=...) on the jnp engine: equals the
    per-layer engine composition."""
    from radtxfr_tpu.products import compute_od_layers

    store, axis, y_air = mix_setup
    atm = std_atmosphere()
    lm = {"y_air": y_air, "n_T": 0.75}
    od = np.asarray(compute_od_layers(store, iso_tables, jnp.asarray(axis),
                                      atm, line_mixing=lm))
    # layer 0 cross-check
    from radtxfr_tpu.products.od import _line_species_cols, species_column

    cols = np.asarray(_line_species_cols(store, atm.mol_ids))
    T0, p0, pl0 = float(atm.T[0]), float(atm.p[0]), float(atm.pl[0])
    vmr0 = np.asarray(atm.vmr[0])
    u = np.asarray(species_column(p0, T0, pl0, jnp.asarray(vmr0)))
    prm = compute_line_params(store, iso_tables, T0, p0 / PA_PER_ATM,
                              vmr_self=jnp.asarray(vmr0)[cols],
                              strength_scale=jnp.asarray(u)[cols])
    Y0 = mixing_coefficient(jnp.asarray(y_air), p0 / PA_PER_ATM, T0,
                            x_self=jnp.asarray(vmr0)[cols], n_T=0.75)
    want0 = np.asarray(xsect_voigt_mixing(jnp.asarray(axis), prm, Y0))
    np.testing.assert_allclose(od[0], want0, rtol=1e-10, atol=1e-300)


def test_pallas_mix_mode_matches_jnp(mix_setup, iso_tables):
    """make_od_pallas_fn(line_mixing=...): mixing lines through the 'mix'
    kernel mode, zero-y lines through the ordinary Voigt passes."""
    from radtxfr_tpu.products import compute_od_layers
    from radtxfr_tpu.products.od import make_od_pallas_fn

    store, axis, y_air = mix_setup
    y_air = y_air.copy()
    y_air[::3] = 0.0          # mixed population: some lines unmixed
    atm = std_atmosphere()
    lm = {"y_air": y_air}
    want = np.asarray(compute_od_layers(store, iso_tables, jnp.asarray(axis),
                                        atm, line_mixing=lm))
    fn = make_od_pallas_fn(store, iso_tables, axis, atm, line_mixing=lm)
    got = np.asarray(fn(atm.T, atm.p, atm.pl, atm.vmr))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() < 5e-6 * peak, \
        np.abs(got - want).max() / peak


def test_pallas_ht_line_mixing_raises_clearly(mix_setup, iso_tables):
    """profile='ht' + line_mixing on the pallas engine: a clear
    NotImplementedError, not a TypeError from the builder signature
    (ADVICE r3)."""
    import pytest

    from radtxfr_tpu.products import compute_od_layers

    store, axis, y_air = mix_setup
    atm = std_atmosphere()
    with pytest.raises(NotImplementedError, match="Voigt"):
        compute_od_layers(store, iso_tables, jnp.asarray(axis), atm,
                          profile="ht", engine="pallas",
                          line_mixing={"y_air": y_air})
