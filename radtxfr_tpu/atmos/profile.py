"""Layered-atmosphere state container.

The reference keeps the atmosphere as loose options-dict entries
(Zs/Ts/Ps/PLs/MFs_VAL/MFs_ID, ``radiative_transfer.py:172-177``) mutated in
place by every call. Here it is an immutable pytree, jit/vmap-safe, with the
1976 US Standard Atmosphere (66 layers) loadable from packaged data
(extracted from ``/root/reference/StandardAtmosphere.csv``; also embedded at
``radiative_transfer.py:75-146``).

Layer convention: index 0 is the ground layer; ``z0 < z1`` are the layer
bottom/top altitudes [km]; ``pl`` is the path length through the layer [km];
``vmr`` columns follow ``mol_ids`` (HITRAN molecule numbers), as volume
mixing fractions (dimensionless, not ppmv).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")

#: HITRAN molecule numbers of the StdAtmos VMR columns (H2O CO2 O3 N2O CO
#: CH4 O2 N2 [Ar dropped — not a HITRAN molecule]); reference
#: ``MFs_ID = [1,2,3,4,5,6,7,22]`` (radiative_transfer.py:177).
STD_ATMOS_MOL_IDS = (1, 2, 3, 4, 5, 6, 7, 22)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AtmosphericState:
    """One layered atmospheric state (or a batch, with leading axes)."""

    z0: jax.Array   # (nL,) layer bottom altitude [km]
    z1: jax.Array   # (nL,) layer top altitude [km]
    pl: jax.Array   # (nL,) path length [km]
    p: jax.Array    # (nL,) pressure [Pa]
    T: jax.Array    # (nL,) temperature [K]
    vmr: jax.Array  # (nL, nM) volume mixing fractions
    mol_ids: tuple = dataclasses.field(
        default=STD_ATMOS_MOL_IDS, metadata=dict(static=True)
    )

    @property
    def n_layers(self) -> int:
        return int(self.T.shape[-1])

    def replace(self, **kw) -> "AtmosphericState":
        return dataclasses.replace(self, **kw)


@functools.lru_cache(maxsize=1)
def _std_atmos_table() -> np.ndarray:
    with np.load(os.path.join(_DATA, "std_atmosphere_1976.npz")) as f:
        return f["table"].copy()


def std_atmosphere(dtype=jnp.float64) -> AtmosphericState:
    """The 66-layer 1976 US Standard Atmosphere of the reference."""
    t = _std_atmos_table()
    return AtmosphericState(
        z0=jnp.asarray(t[:, 1], dtype=dtype),
        z1=jnp.asarray(t[:, 2], dtype=dtype),
        pl=jnp.asarray(t[:, 3], dtype=dtype),
        p=jnp.asarray(t[:, 4], dtype=dtype),
        T=jnp.asarray(t[:, 5], dtype=dtype),
        vmr=jnp.asarray(t[:, 6:14], dtype=dtype),
        mol_ids=STD_ATMOS_MOL_IDS,
    )


def std_atmosphere_raw() -> np.ndarray:
    """The raw (66, 15) StdAtmos table (for compat / regridding code)."""
    return _std_atmos_table().copy()
