"""Monochromatic optical depth of layered atmospheres.

TPU-native replacement for the reference's ``compute_OD``
(``radiative_transfer.py:395-456``), which shells out to the LBLRTM Fortran
binary once per layer-chunk. Here the layer OD spectrum comes from the
line-by-line engine directly:

    OD_l(nu) = sum_lines  u_l(mol(line)) * S_line(T_l) * profile(nu)

with u the species column density [molec/cm^2] of the layer:
u = vmr * n_total * path,  n_total = p/(k_B T) in CGS
(the same number-density convention as hapi's ``volumeConcentration``,
``misc/hapi.py:10163-10164``).

No band chunking / pad-overlap stitching is needed (that machinery,
``radiative_transfer.py:425-455``, worked around LBLRTM's 2020 cm^-1 hard
limit): the kernel evaluates any band in one pass, and wide bands shard
across devices along nu instead (see :mod:`radtxfr_tpu.dist`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import BARYE_PER_ATM, CM_PER_KM, K_BOLTZMANN_CGS, PA_PER_ATM
from ..kernels.lineparams import compute_line_params
from ..kernels.xsect import xsect_from_params
from ..lines.store import IsoTables, LineStore

__all__ = ["species_column", "compute_od_layer", "compute_od_layers"]


def species_column(p_pa, T, pl_km, vmr):
    """Species column density [molec/cm^2] for a homogeneous layer.

    ``vmr`` is the volume mixing fraction (scalar or array); broadcasting
    applies.
    """
    p_barye = (p_pa / PA_PER_ATM) * BARYE_PER_ATM
    n_total = p_barye / (K_BOLTZMANN_CGS * T)  # [molec/cm^3]
    return vmr * n_total * pl_km * CM_PER_KM


def _line_species_cols(lines: LineStore, mol_ids) -> np.ndarray:
    """Host-side: map each line's molecule id to its vmr column index."""
    mol_ids = list(mol_ids)
    lut = {m: i for i, m in enumerate(mol_ids)}
    line_mols = np.asarray(lines.mol_id)
    missing = set(np.unique(line_mols).tolist()) - set(lut)
    if missing:
        raise ValueError(f"lines contain molecules with no vmr column: {sorted(missing)}")
    return np.array([lut[int(m)] for m in line_mols], dtype=np.int32)


def compute_od_layer(
    lines: LineStore,
    iso: IsoTables,
    grid,
    T,
    p_pa,
    pl_km,
    vmr_row,
    species_cols,
    profile: str = "voigt",
    wing_abs=0.0,
    wing_hw=50.0,
    chunk: int = 512,
):
    """OD spectrum of one homogeneous layer. All thermodynamics traced-OK."""
    u = species_column(p_pa, T, pl_km, vmr_row)         # (nM,)
    params = compute_line_params(
        lines,
        iso,
        T,
        jnp.asarray(p_pa) / PA_PER_ATM,
        vmr_self=vmr_row[species_cols],
        wing_abs=wing_abs,
        wing_hw=wing_hw,
        strength_scale=u[species_cols],
    )
    return xsect_from_params(grid, params, profile=profile, chunk=chunk)


@functools.partial(
    jax.jit,
    static_argnames=("profile", "wing_abs", "wing_hw", "chunk", "mol_ids"),
)
def _od_layers_jit(
    lines, iso, grid, T, p, pl, vmr, species_cols, profile, wing_abs, wing_hw, chunk, mol_ids
):
    def one(args):
        T_l, p_l, pl_l, vmr_l = args
        return compute_od_layer(
            lines, iso, grid, T_l, p_l, pl_l, vmr_l, species_cols,
            profile=profile, wing_abs=wing_abs, wing_hw=wing_hw, chunk=chunk,
        )

    return jax.lax.map(one, (T, p, pl, vmr))


def compute_od_layers(
    lines: LineStore,
    iso: IsoTables,
    grid,
    atmos,
    profile: str = "voigt",
    wing_abs: float = 0.0,
    wing_hw: float = 50.0,
    chunk: int = 512,
):
    """(nL, nX) optical-depth tensor for a layered atmosphere.

    Sequential ``lax.map`` over layers (each layer's lines x nu block fills
    the vector unit); batching/sharding over atmospheres and nu happens a
    level up in :mod:`radtxfr_tpu.dist`.
    """
    cols = jnp.asarray(_line_species_cols(lines, atmos.mol_ids))
    return _od_layers_jit(
        lines, iso, jnp.asarray(grid), atmos.T, atmos.p, atmos.pl, atmos.vmr,
        cols, profile, float(wing_abs), float(wing_hw), int(chunk), tuple(atmos.mol_ids),
    )
