"""Sounding/ensemble ingestion: regrid measured profiles onto a layer grid.

Covers the reference's TIGR data path (``Generate_LWIR_TUD.py:16-49``):
load a ``.mat`` ensemble (P [hPa], T [K], H2O [ppmv], O3 [fraction],
z [km]), cubic-interpolate each profile's T/H2O/O3 onto the 66-level 1976
US Standard Atmosphere altitude grid, and assemble batched
:class:`~radtxfr_tpu.atmos.profile.AtmosphericState` pytrees ready for the
SPMD ensemble driver. Also provides the finite-difference Jacobian input
builder (``JacIn`` + the 3·nL+1 tiling, ``Generate_LWIR_TUD.py:55-71``)
for parity — :mod:`radtxfr_tpu.products.jacobian`'s ``jax.jacfwd`` path is
the recommended TPU-native replacement.

All functions here are host-side NumPy: regridding is one-time data
ingestion, not the compute path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .profile import AtmosphericState, std_atmosphere

__all__ = ["load_tigr_mat", "regrid_profiles", "jacobian_inputs"]


def load_tigr_mat(path: str) -> dict:
    """Load a TIGR-style ``.mat`` ensemble with the reference's unit
    conversions (``Generate_LWIR_TUD.py:34-38``): P hPa→Pa, H2O ppmv→
    mixing fraction; T [K], O3 [fraction], z [km] pass through.

    Returns a dict with keys ``P (nAtm? or nz,), T/H2O/O3 (nAtm, nz),
    z (nAtm, nz)``.
    """
    from scipy.io import loadmat

    m = loadmat(path)
    return {
        "P": np.asarray(m["P"]).ravel() * 100.0,
        "T": np.atleast_2d(np.asarray(m["T"], dtype=np.float64)),
        "H2O": np.atleast_2d(np.asarray(m["H2O"], dtype=np.float64)) / 1e6,
        "O3": np.atleast_2d(np.asarray(m["O3"], dtype=np.float64)),
        "z": np.atleast_2d(np.asarray(m["z"], dtype=np.float64)),
    }


def _interp_cubic(x_src, y_src, x_out):
    """Global natural cubic spline, the semantics of the reference's
    ``scipy.interpolate.interp1d(kind='cubic')`` (``Generate_LWIR_TUD.py:45``)."""
    from scipy.interpolate import interp1d

    return interp1d(x_src, y_src, kind="cubic", bounds_error=False,
                    fill_value="extrapolate")(x_out)


def regrid_profiles(z_src, T=None, h2o=None, o3=None, base=None,
                    dtype=jnp.float32) -> AtmosphericState:
    """Cubic-regrid ensemble profiles onto ``base``'s altitude levels and
    return a **batched** :class:`AtmosphericState` (leading axis = member).

    Parameters
    ----------
    z_src : (nz,) or (nAtm, nz) source altitudes [km], ascending.
    T, h2o, o3 : optional (nAtm, nz) profiles — temperature [K] and volume
        mixing fractions. Omitted quantities keep ``base``'s values
        (mirroring the reference, which regrids only T/H2O/O3 and keeps
        StdAtmos pressure and the other species,
        ``Generate_LWIR_TUD.py:42-49``).
    base : template :class:`AtmosphericState` (default: 66-level StdAtmos).
    """
    base = base or std_atmosphere(dtype=dtype)
    z_out = np.asarray(base.z0, dtype=np.float64)
    given = [a for a in (T, h2o, o3) if a is not None]
    if not given:
        raise ValueError("provide at least one of T, h2o, o3")
    n_atm = np.atleast_2d(np.asarray(given[0])).shape[0]
    z_src = np.asarray(z_src, dtype=np.float64)
    if z_src.ndim == 1:
        z_src = np.broadcast_to(z_src, (n_atm, z_src.size))

    def regrid(a):
        if a is None:
            return None
        a = np.atleast_2d(np.asarray(a, dtype=np.float64))
        return np.stack([_interp_cubic(z_src[i], a[i], z_out)
                         for i in range(n_atm)])

    T_g, h2o_g, o3_g = regrid(T), regrid(h2o), regrid(o3)
    rep = lambda a: np.broadcast_to(np.asarray(a, dtype=np.float64),
                                    (n_atm,) + a.shape)
    T_out = T_g if T_g is not None else rep(np.asarray(base.T))
    vmr = np.array(rep(np.asarray(base.vmr)))
    mol_col = {m: i for i, m in enumerate(base.mol_ids)}
    if h2o_g is not None:
        vmr[:, :, mol_col[1]] = h2o_g
    if o3_g is not None:
        vmr[:, :, mol_col[3]] = o3_g
    return base.replace(
        z0=jnp.asarray(rep(np.asarray(base.z0)), dtype=dtype),
        z1=jnp.asarray(rep(np.asarray(base.z1)), dtype=dtype),
        pl=jnp.asarray(rep(np.asarray(base.pl)), dtype=dtype),
        p=jnp.asarray(rep(np.asarray(base.p)), dtype=dtype),
        T=jnp.asarray(T_out, dtype=dtype),
        vmr=jnp.asarray(vmr, dtype=dtype),
    )


def jacobian_inputs(T_mean, h2o_mean, o3_mean, rel_step: float = 1e-3):
    """The reference's finite-difference Jacobian ensemble: 3·nL+1 profiles
    — row 0 unperturbed, then per-level perturbations of T, H2O, O3 in turn
    with step ``rel_step·max|x|`` (``JacIn``, ``Generate_LWIR_TUD.py:55-71``).

    Returns (T, h2o, o3) each of shape (3·nL+1, nL). Prefer
    ``products.jacobian`` (autodiff) on TPU; this exists so reference
    workflows (and FD-vs-AD validation) reproduce exactly.
    """
    prof = [np.asarray(a, dtype=np.float64)
            for a in (T_mean, h2o_mean, o3_mean)]
    nL = prof[0].size
    out = [np.tile(a, (3 * nL + 1, 1)) for a in prof]
    for q in range(3):
        step = rel_step * np.max(np.abs(prof[q]))
        rows = 1 + q * nL + np.arange(nL)
        out[q][rows, np.arange(nL)] += step
    return tuple(out)
