"""Line database: a packed structure-of-arrays replacing TAPE3 / hapi tables.

The reference consumes line data either through the 970 MB binary TAPE3 blob
(LBLRTM path) or hapi's directory-of-text-tables ``LOCAL_TABLE_CACHE``
(``misc/hapi.py:1615-1672``), both read record-at-a-time in the hot loop.
Here lines are a :class:`LineStore` — flat arrays (nu0, sw, elower,
gamma_air, gamma_self, n_air, delta_air, iso_row, ...) sorted by line center,
ready to device_put, shard, and feed to the Voigt kernels.

Sources:
* :func:`parse_par` — the standard HITRAN 160-character ``.par`` record
  format (the same fixed-column layout hapi's PARAMETER_META describes,
  ``misc/hapi.py:583``).
* :func:`from_arrays` — direct construction (used by the synthetic
  generator and by tests that mirror data into hapi's table cache).

Per-isotopologue metadata (molar mass, natural abundance, TIPS Q tables)
is bundled in :class:`IsoTables`, indexed by the compact ``iso_row`` id.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterable

import numpy as np
import jax
import jax.numpy as jnp

from .tips import load_tips_tables, iso_row_index

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")


@functools.lru_cache(maxsize=1)
def _iso_registry():
    with np.load(os.path.join(_DATA, "iso_registry.npz")) as f:
        return {
            (int(m), int(i)): (float(a), float(mm))
            for m, i, a, mm in zip(
                f["mol"], f["iso"], f["abundance"], f["molar_mass"]
            )
        }


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IsoTables:
    """Per-isotopologue physical data, indexed by compact row id."""

    q: jax.Array           # (n_iso, 119) TIPS-2011 partition sums
    abundance: jax.Array   # (n_iso,) natural abundance
    molar_mass: jax.Array  # (n_iso,) [g/mol]
    mol: jax.Array         # (n_iso,) HITRAN molecule number
    iso: jax.Array         # (n_iso,) local isotopologue number

    @staticmethod
    def load(dtype=jnp.float64) -> "IsoTables":
        mol, iso, _gsi, q = load_tips_tables()
        reg = _iso_registry()
        abundance = np.array(
            [reg.get((int(m), int(i)), (np.nan, np.nan))[0] for m, i in zip(mol, iso)]
        )
        molar_mass = np.array(
            [reg.get((int(m), int(i)), (np.nan, np.nan))[1] for m, i in zip(mol, iso)]
        )
        return IsoTables(
            q=jnp.asarray(q, dtype=dtype),
            abundance=jnp.asarray(abundance, dtype=dtype),
            molar_mass=jnp.asarray(molar_mass, dtype=dtype),
            mol=jnp.asarray(mol, dtype=jnp.int32),
            iso=jnp.asarray(iso, dtype=jnp.int32),
        )


#: columns static planning reads (host cache keys; nu0 is always host f64)
_HOST_PLANNING_FIELDS = ("sw", "elower", "gamma_air", "gamma_self", "n_air",
                         "delta_air", "sd_air", "iso_row", "mol_id")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LineStore:
    """Structure-of-arrays HITRAN line list, sorted by ``nu0``."""

    nu0: jax.Array         # (L,) line center [cm^-1]
    sw: jax.Array          # (L,) intensity at 296 K [cm^-1/(molec cm^-2)]
    elower: jax.Array      # (L,) lower-state energy [cm^-1]
    gamma_air: jax.Array   # (L,) air-broadened HWHM at 296 K, 1 atm [cm^-1/atm]
    gamma_self: jax.Array  # (L,) self-broadened HWHM [cm^-1/atm]
    n_air: jax.Array       # (L,) T-exponent for gamma_air
    delta_air: jax.Array   # (L,) air pressure shift [cm^-1/atm]
    iso_row: jax.Array     # (L,) int32 index into IsoTables
    mol_id: jax.Array      # (L,) int32 HITRAN molecule number
    sd_air: jax.Array      # (L,) speed-dependence ratio Gamma2/Gamma0 ('SD_air')

    def __len__(self) -> int:
        return int(self.nu0.shape[0])

    def host_view(self) -> "LineStore":
        """A LineStore whose leaves are host NumPy arrays, for static
        planning.

        Uses the host-side column cache populated at construction
        (from_arrays / subset) when available — on remote-tunnel TPU
        backends a device_get of the line columns can take MINUTES
        (measured ~4 min for 100k lines), while the data was born on the
        host in the first place. Falls back to one batched device_get.
        """
        host = getattr(self, "_host", None)
        if host is not None and all(f in host for f in _HOST_PLANNING_FIELDS):
            return dataclasses.replace(
                self, nu0=np.asarray(self.nu0, dtype=np.float64), **host)
        return jax.device_get(self)

    @property
    def n_lines(self) -> int:
        return int(self.nu0.shape[0])

    def subset(self, keep) -> "LineStore":
        """Row subset by boolean mask / index array, **preserving the host
        float64 line centers**.

        Any generic ``jax.tree.map(jnp.asarray, ...)`` over a LineStore
        silently downcasts ``nu0`` to float32 on f32 backends — quantizing
        centers by ~6e-5 cm^-1 and costing 0.1-0.4% at sharp line cores
        (the exact failure mode the host-f64 ``nu0`` exists to prevent).
        All row-filtering must go through this method.
        """
        host = {f: np.asarray(getattr(self, f))[keep]
                for f in _HOST_PLANNING_FIELDS}
        sub = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[keep]), self)
        sub = dataclasses.replace(
            sub, nu0=np.asarray(self.nu0, dtype=np.float64)[keep])
        object.__setattr__(sub, "_host", host)
        return sub

    def select_band(self, nu_min: float, nu_max: float, margin: float = 0.0) -> "LineStore":
        """Host-side trim to lines within [nu_min - margin, nu_max + margin]."""
        nu0 = np.asarray(self.nu0)
        keep = (nu0 >= nu_min - margin) & (nu0 <= nu_max + margin)
        return self.subset(keep)

    def select_molecules(self, mol_ids: Iterable[int]) -> "LineStore":
        mol = np.asarray(self.mol_id)
        keep = np.isin(mol, np.asarray(list(mol_ids)))
        return self.subset(keep)


def from_arrays(
    nu0, sw, elower, gamma_air, gamma_self, n_air, delta_air, mol_id, local_iso_id,
    sd_air=None, dtype=jnp.float64,
) -> LineStore:
    """Build a sorted :class:`LineStore` from NumPy columns.

    ``mol_id``/``local_iso_id`` are HITRAN numbers; they are mapped to the
    compact ``iso_row`` index used by :class:`IsoTables`. ``sd_air`` (the
    SD-Voigt speed-dependence ratio) defaults to zero — absent from ``.par``
    files, as in hapi (``misc/hapi.py:10870-10874``).
    """
    row_of = iso_row_index()
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    nu0 = np.asarray(nu0, dtype=np.float64)
    order = np.argsort(nu0, kind="stable")
    iso_row = np.array(
        [row_of[(int(m), int(i))] for m, i in zip(np.asarray(mol_id), np.asarray(local_iso_id))],
        dtype=np.int32,
    )
    if sd_air is None:
        sd_air = np.zeros_like(nu0)
    cols = dict(
        sw=sw, elower=elower, gamma_air=gamma_air,
        gamma_self=gamma_self, n_air=n_air, delta_air=delta_air, sd_air=sd_air,
    )
    f = lambda a: jnp.asarray(np.asarray(a, dtype=np.float64)[order], dtype=dtype)
    host = {k: np.asarray(v, dtype=np.float64)[order] for k, v in cols.items()}
    host["iso_row"] = iso_row[order]
    host["mol_id"] = np.asarray(mol_id, dtype=np.int32)[order]
    store = LineStore(
        # nu0 stays a HOST float64 array: the Pallas bucket plans decompose
        # line centers into exact (int grid index, fraction) pairs host-side,
        # and a float32 device copy would quantize centers by ~6e-5 cm^-1 —
        # a ~0.1% profile error at sharp line cores. As a pytree leaf it is
        # converted (and on float32 backends downcast) only where traced
        # math actually consumes it.
        nu0=nu0[order],
        **{k: f(v) for k, v in cols.items()},
        iso_row=jnp.asarray(iso_row[order]),
        mol_id=jnp.asarray(np.asarray(mol_id, dtype=np.int32)[order]),
    )
    object.__setattr__(store, "_host", host)
    return store


# Fixed-column layout of the 160-char HITRAN2004+ .par record.
# (field, start, width) — matches hapi's PARAMETER_META par_line slices
# (misc/hapi.py:583ff) and the HITRAN definition.
_PAR_FIELDS = {
    "molec_id": (0, 2),
    "local_iso_id": (2, 1),
    "nu": (3, 12),
    "sw": (15, 10),
    "a": (25, 10),
    "gamma_air": (35, 5),
    "gamma_self": (40, 5),
    "elower": (45, 10),
    "n_air": (55, 4),
    "delta_air": (59, 8),
}

# hapi maps local iso id '0' to 10 (e.g. CO2 isotopologue 10); '11'/'12'
# appear as alphanumeric in some lists — handled minimally here.
_ISO_CHAR = {**{str(d): d for d in range(10)}, "0": 10,
             "A": 11, "a": 11, "B": 12, "b": 12}  # match the C++ parser


def parse_par(path_or_lines, dtype=jnp.float64, native: bool = True) -> LineStore:
    """Parse a HITRAN ``.par`` file (160-char fixed-column records).

    File paths go through the native C++ streaming parser when available
    (``native/par_parser.cpp``; hundreds of MB/s); lists of record strings
    and toolchain-less environments use the Python path.
    """
    if isinstance(path_or_lines, (str, os.PathLike)) and native:
        from .native_parser import parse_par_native

        cols = parse_par_native(str(path_or_lines))
        if cols is not None:
            return from_arrays(
                nu0=cols["nu"], sw=cols["sw"], elower=cols["elower"],
                gamma_air=cols["gamma_air"], gamma_self=cols["gamma_self"],
                n_air=cols["n_air"], delta_air=cols["delta_air"],
                mol_id=cols["mol"], local_iso_id=cols["iso"], dtype=dtype,
            )
    if isinstance(path_or_lines, (str, os.PathLike)):
        with open(path_or_lines) as f:
            lines = f.read().splitlines()
    else:
        lines = list(path_or_lines)
    lines = [ln for ln in lines if len(ln) >= 67]

    def col(name, conv):
        s, w = _PAR_FIELDS[name]
        return np.array([conv(ln[s : s + w]) for ln in lines])

    mol = col("molec_id", lambda s: int(s))
    iso = np.array([_ISO_CHAR[ln[2]] for ln in lines], dtype=np.int32)
    return from_arrays(
        nu0=col("nu", float),
        sw=col("sw", float),
        elower=col("elower", float),
        gamma_air=col("gamma_air", float),
        gamma_self=col("gamma_self", float),
        n_air=col("n_air", float),
        delta_air=col("delta_air", float),
        mol_id=mol,
        local_iso_id=iso,
        dtype=dtype,
    )
