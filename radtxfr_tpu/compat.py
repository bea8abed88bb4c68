"""Drop-in compatibility layer mirroring the reference's public API.

Functions carry the reference's names, argument conventions, units and
return shapes (``radiative_transfer.py``), backed by the TPU engine. A user
of westi024/RadTxfr can ``import radtxfr_tpu.compat as rt`` and keep their
scripts, with two deliberate differences:

* **No LBLRTM binary.** ``compute_OD``/``compute_TUD`` take a line database
  (:class:`~radtxfr_tpu.lines.store.LineStore`, e.g. from ``parse_par``)
  via the ``lines=`` option; the default options dict carries none.
* **No mutable module-global options.** The reference's ``options`` dict is
  mutated by every call (``opts.update(kwargs)``,
  ``radiative_transfer.py:303,421,483,523``), so kwargs silently persist
  across calls — a documented aliasing hazard (SURVEY.md §2.2). Here each
  call composes ``DEFAULT_OPTIONS`` + ``opts`` + ``kwargs`` functionally.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .atmos.profile import AtmosphericState, std_atmosphere_raw
from .core import grid as _grid
from .core import planck as _planck
from .core.reshape import rs1d, rs2d, rsnd
from .io import lblrtm as _lblrtm_io
from .lines.store import IsoTables
from .products.od import compute_od_layers
from .products.radiance import apparent_radiance
from .products.tud import tud_from_od
from .sensor.ils import ils_mako
from .sensor.resolution import reduce_resolution, smooth  # noqa: F401  (re-export)

__all__ = [
    "c1", "c2", "StdAtmos", "options", "DEFAULT_OPTIONS",
    "rs1D", "rs2D", "rsND", "make_spectral_axis",
    "planckian", "brightnessTemperature", "BT2L",
    "compute_OD", "compute_TUD", "compute_LWIR_apparent_radiance",
    "ILS_MAKO", "smooth", "reduceResolution", "getHelp",
    "run_LBLRTM", "write_tape5", "read_tape12",
]

c1 = 1.19104295315e-16
c2 = 1.43877736830e-02

#: The 66-layer 1976 US Standard Atmosphere table, same column layout as the
#: reference's ``StdAtmos`` (radiative_transfer.py:146).
StdAtmos = std_atmosphere_raw()

DEFAULT_OPTIONS = {
    # write_tape5-equivalents (radiative_transfer.py:152-183)
    "V1": 2000.00, "V2": 3333.33, "T": 296.0, "P": 101325.0, "PL": 1.0,
    "MF_ID": np.array([]), "MF_VAL": np.array([]),
    "DVOUT": 0.0005,
    # engine selection (replaces LBLRTM paths)
    "lines": None, "iso": None, "profile": "voigt", "engine": "jnp",
    "wing_abs": 0.0, "wing_hw": 50.0,
    # continuum model: 'none' = hapi parity; 'mt_ckd' mirrors the
    # reference's LBLRTM ICNTNM=6 production setting
    # (radiative_transfer.py:622); factors follow TAPE5 record 1.2a.
    "continuum": "none", "continuum_factors": None,
    # compute_TUD options
    "Zs": StdAtmos[:, 1], "Ts": StdAtmos[:, 5], "Ps": StdAtmos[:, 4],
    "PLs": StdAtmos[:, 3],
    "MFs_VAL": StdAtmos[:, 6:14] * 1e6,  # [ppmv]
    "MFs_ID": np.array([1, 2, 3, 4, 5, 6, 7, 22]),
    "theta_r": 0.0, "N_angle": 30, "Altitudes": np.asarray([500]),
    "returnOD": False,
}

#: Reference-style alias. NOT mutated by calls (see module docstring).
options = DEFAULT_OPTIONS


def _merge_opts(opts, kwargs):
    """The reference's options composition (defaults <- opts <- kwargs),
    without its global-dict mutation (``radiative_transfer.py:303`` etc.)."""
    o = dict(DEFAULT_OPTIONS)
    if opts is not None:
        o.update(opts)
    o.update(kwargs)
    return o


def _opts(opts, kwargs):
    o = _merge_opts(opts, kwargs)
    if o["lines"] is None:
        raise ValueError(
            "compat.compute_OD/compute_TUD need a line database: pass "
            "lines=<LineStore> (e.g. radtxfr_tpu.lines.parse_par(...)); the "
            "reference used the LBLRTM binary + TAPE3 here"
        )
    if o["iso"] is None:
        o["iso"] = IsoTables.load()
    return o


def rs1D(y):
    a, dims = rs1d(y)
    return np.asarray(a), dims


def rs2D(y):
    a, dims = rs2d(y)
    return np.asarray(a), dims


def rsND(y, dims):
    return np.asarray(rsnd(y, dims))


def make_spectral_axis(Xmin, Xmax, DVOUT):
    return _grid.make_spectral_axis(Xmin, Xmax, DVOUT)


def _wavelength_mode(X, wavelength):
    # the reference's mean(X) < 50 heuristic (radiative_transfer.py:836)
    return wavelength or (float(np.mean(np.asarray(X))) < 50.0)


def planckian(X, T, wavelength=False):
    return np.asarray(_planck.planckian(X, T, wavelength=_wavelength_mode(X, wavelength)))


def brightnessTemperature(X, L, wavelength=False, bad_value=np.nan, spectral_dim=0):
    L = np.asarray(L)
    if spectral_dim != 0:
        L = np.swapaxes(L, 0, spectral_dim)
    T = np.asarray(_planck.brightness_temperature(
        X, L, wavelength=_wavelength_mode(X, wavelength), bad_value=bad_value))
    if spectral_dim != 0:
        T = np.swapaxes(T, 0, spectral_dim)
    return T


def BT2L(X, T, wavelength=False, bad_value=np.nan, spectral_dim=0):
    T = np.asarray(T)
    if spectral_dim != 0:
        T = np.swapaxes(T, 0, spectral_dim)
    L = np.asarray(_planck.bt2l(
        X, T, wavelength=_wavelength_mode(X, wavelength), bad_value=bad_value))
    if spectral_dim != 0:
        L = np.swapaxes(L, 0, spectral_dim)
    return L


def _atmos_from_opts(o) -> AtmosphericState:
    z0 = np.asarray(o["Zs"], dtype=np.float64)
    mf = np.asarray(o["MFs_VAL"], dtype=np.float64) * 1e-6  # ppmv -> fraction
    return AtmosphericState(
        z0=jnp.asarray(z0),
        z1=jnp.asarray(z0),  # layer tops not used by the engine
        pl=jnp.asarray(np.asarray(o["PLs"], dtype=np.float64)),
        p=jnp.asarray(np.asarray(o["Ps"], dtype=np.float64)),
        T=jnp.asarray(np.asarray(o["Ts"], dtype=np.float64)),
        vmr=jnp.asarray(mf),
        mol_ids=tuple(int(m) for m in np.asarray(o["MFs_ID"]).ravel()),
    )


def compute_OD(Xmin, Xmax, opts=None, **kwargs):
    """Single-layer monochromatic OD, reference signature
    (``radiative_transfer.py:395-456``).

    Layer state comes from T [K], P [Pa], PL [km] and MF_ID/MF_VAL [ppmv]
    options. No 2020 cm^-1 band chunking is needed — the engine evaluates
    any band in one pass.
    """
    o = _opts(opts, kwargs)
    X = make_spectral_axis(Xmin, Xmax, o["DVOUT"])
    mf_ids = tuple(int(m) for m in np.asarray(o["MF_ID"]).ravel())
    mf_val = np.asarray(o["MF_VAL"], dtype=np.float64).ravel() * 1e-6
    atmos = AtmosphericState(
        z0=jnp.zeros(1), z1=jnp.zeros(1),
        pl=jnp.asarray([float(o["PL"])]),
        p=jnp.asarray([float(o["P"])]),
        T=jnp.asarray([float(o["T"])]),
        vmr=jnp.asarray(mf_val)[None, :],
        mol_ids=mf_ids,
    )
    od = compute_od_layers(
        o["lines"], o["iso"], jnp.asarray(X), atmos, profile=o["profile"],
        wing_abs=o["wing_abs"], wing_hw=o["wing_hw"], engine=o["engine"],
        continuum=o["continuum"], continuum_factors=o["continuum_factors"],
    )
    return X, np.asarray(jnp.asarray(od)[0])


def compute_TUD(Xmin, Xmax, opts=None, **kwargs):
    """Monochromatic TUD, reference signature and return convention
    (``radiative_transfer.py:274-392``): returns (X, tau, Lu, Ld) with
    singleton altitude/angle axes squeezed.
    """
    o = _opts(opts, kwargs)
    X = make_spectral_axis(Xmin, Xmax, o["DVOUT"])
    atmos = _atmos_from_opts(o)
    od = jnp.asarray(compute_od_layers(
        o["lines"], o["iso"], jnp.asarray(X), atmos, profile=o["profile"],
        wing_abs=o["wing_abs"], wing_hw=o["wing_hw"], engine=o["engine"],
        continuum=o["continuum"], continuum_factors=o["continuum_factors"],
    ))
    B = jnp.swapaxes(_planck.planckian(X, atmos.T), 0, 1).astype(od.dtype)
    mu = 1.0 / np.cos(float(o["theta_r"]))
    tud = tud_from_od(
        jnp.asarray(X, dtype=od.dtype), od, B, atmos.z0,
        jnp.asarray(np.atleast_1d(o["Altitudes"]), dtype=od.dtype),
        mu=mu, n_angles=int(o["N_angle"]), return_od=bool(o["returnOD"]),
    ).squeezed()
    return X, np.asarray(tud.tau), np.asarray(tud.Lu), np.asarray(tud.Ld)


def compute_LWIR_apparent_radiance(X, emis, Ts, tau, La, Ld, dT=None, return_Ls=False):
    out = apparent_radiance(X, emis, Ts, tau, La, Ld, dT=dT, return_Ls=return_Ls)
    if return_Ls:
        return np.asarray(out[0]), np.asarray(out[1])
    return np.asarray(out)


def ILS_MAKO(X, Y, resFactor=None, returnX=True, fwhm_sf=1.0, shift=0.0, scale=1.0):
    out = ils_mako(X, Y, res_factor=resFactor, return_x=returnX,
                   fwhm_sf=fwhm_sf, shift=shift, scale=scale)
    if returnX:
        return out[0], np.asarray(out[1])
    return np.asarray(out)


def reduceResolution(X, Y, dX, N=4, window="hanning", X_out=None):
    out = reduce_resolution(X, Y, dX, N=N, window=window, X_out=X_out)
    if X_out is None:
        return out[0], np.asarray(out[1])
    return np.asarray(out)


def getHelp(target=None):
    """hapi-style interactive help (``misc/hapi.py:4987``): no argument
    prints the API index; a name or object prints its documentation."""
    from .utils.help import get_help
    get_help(target)


def write_tape5(fname="TAPE5", opts=None, **kwargs):
    """Reference-signature TAPE5 writer (``radiative_transfer.py:504-727``):
    writes the single-layer OD-mode LBLRTM punch-card deck described by the
    V1/V2/T/P/PL/MF_ID/MF_VAL/DVOUT options. Interop only — the engine never
    consumes it."""
    o = _merge_opts(opts, kwargs)
    _lblrtm_io.write_tape5(
        fname, float(o["V1"]), float(o["V2"]), T=float(o["T"]),
        P_pa=float(o["P"]), PL_km=float(o["PL"]),
        mf_ppmv=np.asarray(o["MF_VAL"], dtype=np.float64).ravel(),
        mf_ids=np.asarray(o["MF_ID"]).ravel(), dvout=float(o["DVOUT"]),
        continuum_factors=o.get("continuum_factors"),
        continuum_override=bool(o.get("continuum_override", False)),
    )


def read_tape12(fname="TAPE12"):
    """Reference-signature TAPE12 reader (``radiative_transfer.py:730-789``):
    returns flat (nu, od) concatenated over the file's panels."""
    return _lblrtm_io.read_tape12(fname)


def run_LBLRTM(V1, V2, opts=None, **kwargs):
    """Reference-signature single-layer OD run (``radiative_transfer.py:459-501``),
    with the TPU engine in place of the LBLRTM subprocess: no TAPE3 symlink,
    no temporary directory, no Fortran binary — the same options produce
    (nu, od) directly from the line database. Requires ``lines=`` exactly
    like :func:`compute_OD`."""
    nu, od = compute_OD(V1, V2, opts=opts, **kwargs)
    return nu, od
