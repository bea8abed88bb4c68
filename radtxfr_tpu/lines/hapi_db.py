"""Reader for hapi's directory-as-database local table format.

Users of the reference hold line data as hapi ``.data``/``.header`` table
pairs (fixed-column text rows + JSON header with ``order``/``format``
metadata — written by ``cache2storage``, parsed by ``storage2cache``,
``misc/hapi.py:1595-1672``). This module loads those tables directly into
packed :class:`~radtxfr_tpu.lines.store.LineStore` columns, and discovers
tables (plus raw ``.par`` files, cf. ``scanForNewParfiles``,
``misc/hapi.py:1689``) in a database directory.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from .store import LineStore, from_arrays, parse_par

__all__ = ["parse_format", "load_table_columns", "load_table", "HapiDatabase"]

_FMT_RE = re.compile(r"^%(\d*)(?:\.(\d*))?([edfsEDFS])$")

#: columns LineStore consumes, in hapi naming
_STORE_COLS = {
    "nu": "nu0", "sw": "sw", "elower": "elower", "gamma_air": "gamma_air",
    "gamma_self": "gamma_self", "n_air": "n_air", "delta_air": "delta_air",
}


def parse_format(fmt: str):
    """'%12.6f' -> (width, converter)."""
    m = _FMT_RE.match(fmt.strip())
    if not m:
        raise ValueError(f"unsupported column format {fmt!r}")
    width = int(m.group(1) or 0)
    kind = m.group(3).lower()
    if kind == "d":
        conv = lambda s: int(s) if s.strip() else 0
    elif kind in ("e", "f"):
        conv = lambda s: float(s) if s.strip() else 0.0
    else:
        conv = lambda s: s.strip()
    return width, conv


def load_table_columns(data_path: str, header_path: str | None = None) -> dict:
    """Parse one hapi table -> {column_name: np.ndarray/list}."""
    if header_path is None:
        header_path = os.path.splitext(data_path)[0] + ".header"
    with open(header_path) as f:
        header = json.load(f)
    order = header["order"]
    fmts = [parse_format(header["format"][name]) for name in order]

    cols = {name: [] for name in order}
    with open(data_path) as f:
        for line in f:
            line = line.rstrip("\n")
            pos = 0
            row = {}
            ok = True
            for name, (width, conv) in zip(order, fmts):
                piece = line[pos:pos + width]
                try:
                    row[name] = conv(piece)
                except ValueError:
                    ok = False
                    break
                pos += width
            if ok and pos <= len(line) + 1:
                for name in order:
                    cols[name].append(row[name])
    out = {}
    for name in order:
        vals = cols[name]
        if vals and isinstance(vals[0], (int, float)):
            out[name] = np.asarray(vals)
        else:
            out[name] = vals
    return out


def load_table(data_path: str, header_path: str | None = None,
               dtype=None) -> LineStore:
    """Parse one hapi table into a :class:`LineStore`."""
    import jax.numpy as jnp

    cols = load_table_columns(data_path, header_path)
    missing = [k for k in ("nu", "sw", "molec_id", "local_iso_id") if k not in cols]
    if missing:
        raise ValueError(f"table lacks required columns: {missing}")
    n = len(cols["nu"])
    get = lambda k: cols.get(k, np.zeros(n))
    return from_arrays(
        nu0=cols["nu"], sw=cols["sw"], elower=get("elower"),
        gamma_air=get("gamma_air"), gamma_self=get("gamma_self"),
        n_air=get("n_air"), delta_air=get("delta_air"),
        mol_id=np.asarray(cols["molec_id"], dtype=np.int32),
        local_iso_id=np.asarray(cols["local_iso_id"], dtype=np.int32),
        sd_air=get("SD_air"),
        dtype=dtype or jnp.float64,
    )


class HapiDatabase:
    """A directory of hapi tables / .par files (hapi ``db_begin`` analog)."""

    def __init__(self, directory: str):
        self.directory = directory
        self._tables: dict[str, LineStore] = {}

    def table_names(self) -> list[str]:
        names = set()
        for fn in os.listdir(self.directory):
            base, ext = os.path.splitext(fn)
            if ext in (".data", ".par"):
                names.add(base)
        return sorted(names)

    def load(self, name: str, dtype=None) -> LineStore:
        if name not in self._tables:
            data = os.path.join(self.directory, name + ".data")
            par = os.path.join(self.directory, name + ".par")
            if os.path.exists(data):
                self._tables[name] = load_table(data, dtype=dtype)
            elif os.path.exists(par):
                import jax.numpy as jnp

                self._tables[name] = parse_par(par, dtype=dtype or jnp.float64)
            else:
                raise FileNotFoundError(f"no table {name!r} in {self.directory}")
        return self._tables[name]

    def describe(self, name: str) -> dict:
        store = self.load(name)
        nu = np.asarray(store.nu0)
        return {
            "name": name,
            "number_of_rows": store.n_lines,
            "nu_range": (float(nu.min()), float(nu.max())) if nu.size else None,
            "molecules": sorted(set(np.asarray(store.mol_id).tolist())),
        }
