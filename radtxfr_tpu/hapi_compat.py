"""hapi-named drop-in API (the reference's ``misc/hapi.py`` surface).

A user of HITRAN's hapi — the pure-Python LBL engine vendored by the
reference (``misc/hapi.py``, 11,901 LoC) — can ``import
radtxfr_tpu.hapi_compat as hapi`` and keep the same program: the database
verbs (``db_begin``/``fetch``/``select``/``tableList``…), the isotopologue
registry accessors, TIPS partition sums, the PROFILE_*/CPF families, the
five ``absorptionCoefficient_*`` drivers, spectra synthesis, and the slit
convolutions all carry hapi's names, argument conventions, defaults, and
return shapes — backed by the TPU engine (:mod:`radtxfr_tpu.kernels`)
instead of hapi's serial per-line Python loop.

Deliberate divergences (all documented per function):

* Tables are packed :class:`~radtxfr_tpu.lines.store.LineStore` arrays, not
  per-row dicts; row-object internals (``getRowObject`` etc.) have no
  equivalent.
* ``EnvDependences`` / custom ``partitionFunction`` are honored by ALL
  drivers (per-line callbacks evaluated host-side, exactly hapi's loop
  semantics incl. the post-override intensity threshold and the HT
  driver's override-key quirks); the Doppler driver ignores
  ``EnvDependences`` as hapi's own does (``misc/hapi.py:11384-11581``).
* ``fetch`` requires network access and is gated exactly like
  :mod:`radtxfr_tpu.lines.fetch`.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

from .kernels import faddeeva as _fad
from .kernels import htp as _htp
from .kernels import profiles as _prof
from .kernels import spectra as _spec
from .kernels.ht_driver import xsect_ht as _xsect_ht
from .kernels.lineparams import compute_line_params as _line_params
from .kernels.xsect import xsect_from_params as _xsect
from .lines import fetch as _fetch
from .lines import hapi_db as _db
from .lines import query as _query
from .lines import tips as _tips
from .lines.store import IsoTables, LineStore, parse_par

__all__ = [
    # DB / tables
    "db_begin", "db_commit", "tableList", "describeTable", "dropTable",
    "select", "sort", "group", "getColumn", "getColumns", "extractColumns",
    "fetch", "fetch_by_ids", "getStickXY",
    # table editing (misc/hapi.py:1710-2960; stubs-in-hapi implemented here)
    "createTable", "insertRow", "deleteRows", "arrangeTable",
    "addColumn", "deleteColumn", "deleteColumns", "renameColumn",
    "splitColumn", "saveCache", "loadCache", "databaseBegin",
    "databaseCommit",
    # registry
    "ISO", "ISO_ID", "abundance", "molecularMass", "moleculeName",
    "isotopologueName", "print_iso", "print_iso_id",
    # partition sums
    "partitionSum", "PYTIPS",
    # profiles / CPF
    "PROFILE_HT", "PROFILE_HTP", "PROFILE_SDRAUTIAN", "PROFILE_RAUTIAN",
    "PROFILE_SDVOIGT", "PROFILE_VOIGT", "PROFILE_LORENTZ", "PROFILE_DOPPLER",
    "cpf", "cpf3", "hum1_wei", "cef",
    # environment dependences
    "EnvironmentDependency_Intensity", "EnvironmentDependency_GammaD",
    "EnvironmentDependency_Gamma0", "EnvironmentDependency_Gamma2",
    "EnvironmentDependency_Delta0", "EnvironmentDependency_Delta2",
    "EnvironmentDependency_anuVC", "volumeConcentration",
    # absorption drivers
    "absorptionCoefficient_Voigt", "absorptionCoefficient_SDVoigt",
    "absorptionCoefficient_Lorentz", "absorptionCoefficient_Doppler",
    "absorptionCoefficient_HT",
    # spectra + instrument functions
    "transmittanceSpectrum", "absorptionSpectrum", "radianceSpectrum",
    "SLIT_RECTANGULAR", "SLIT_TRIANGULAR", "SLIT_GAUSSIAN",
    "SLIT_DISPERSION", "SLIT_COSINUS", "SLIT_DIFFRACTION", "SLIT_MICHELSON",
    "convolveSpectrum", "convolveSpectrumSame", "convolveSpectrumFull",
    # legacy shortcuts / readers (misc/hapi.py:11555-11734)
    "absorptionCoefficient_Gauss", "abscoef_HT", "abscoef_Voigt",
    "abscoef_Lorentz", "abscoef_Doppler", "abscoef_Gauss", "abscoef",
    "read_hotw", "read_xsect",
    # misc
    "arange_", "save_to_file", "getHelp",
    # table aliases / verbs / internals (documented hapi surface)
    "getTableList", "describe", "length", "filter", "selectInto",
    "AtoB", "BD_TIPS_2011_PYTHON", "pcqsdhc",
    "print_profiles", "print_slit_functions", "print_data_tutorial",
    "print_spectra_tutorial", "print_plotting_tutorial",
    "print_python_tutorial",
]

T_REF = 296.0
_K_BOLTS_CGS = 1.380648813e-16  # hapi cBolts (misc/hapi.py:84)


# ===========================================================================
# Local table registry (hapi LOCAL_TABLE_CACHE, misc/hapi.py:5205-5243)
# ===========================================================================

#: name -> LineStore (the in-memory database)
_TABLES: dict[str, LineStore] = {}
#: name -> extra non-.par columns (HT columns etc.), host arrays
_EXTRAS: dict[str, dict] = {}
_DB_DIR: str | None = None


def db_begin(db: str | None = None) -> None:
    """Open a directory-as-database and load every table
    (hapi ``db_begin``, ``misc/hapi.py:5205``; also scans ``.par`` files
    like ``scanForNewParfiles`` ``:1689``)."""
    global _DB_DIR
    _DB_DIR = db or "."
    os.makedirs(_DB_DIR, exist_ok=True)
    hdb = _db.HapiDatabase(_DB_DIR)
    for name in hdb.table_names():
        data = os.path.join(_DB_DIR, name + ".data")
        if os.path.exists(data):
            cols = _db.load_table_columns(data)
            core = {"nu", "sw", "elower", "gamma_air", "gamma_self", "n_air",
                    "delta_air", "molec_id", "local_iso_id", "SD_air"}
            # LineStore rows are nu-sorted (from_arrays); keep the extra
            # columns aligned with them.
            order = np.argsort(np.asarray(cols["nu"], dtype=np.float64),
                               kind="stable")
            _EXTRAS[name] = {k: np.asarray(v)[order] for k, v in cols.items()
                             if k not in core and np.asarray(v).dtype != object}
        _TABLES[name] = hdb.load(name)


def db_commit() -> None:
    """Write every in-memory table back to the database directory
    (hapi ``db_commit``, ``misc/hapi.py:5223``)."""
    if _DB_DIR is None:
        raise RuntimeError("no database opened; call db_begin(dir) first")
    for name, store in _TABLES.items():
        _db.save_table(store, _DB_DIR, name)


def tableList() -> list[str]:
    """Names of all loaded tables (hapi ``tableList``, ``misc/hapi.py:5168``)."""
    return sorted(_TABLES)


def describeTable(TableName: str) -> None:
    """Print a table summary (hapi ``describeTable``, ``misc/hapi.py:2316``)."""
    store = _get_table(TableName)
    nu = np.asarray(store.nu0)
    print("-----------------------------------------")
    print(f"{TableName} summary:")
    print(f"Number of rows: {store.n_lines}")
    if nu.size:
        print(f"nu range: {nu.min():.6f} .. {nu.max():.6f} cm-1")
    print(f"Molecules: {sorted(set(np.asarray(store.mol_id).tolist()))}")
    print("-----------------------------------------")


def dropTable(TableName: str) -> None:
    """Remove a table from memory (hapi ``dropTable``, ``misc/hapi.py:2398``)."""
    _TABLES.pop(TableName, None)
    _EXTRAS.pop(TableName, None)


def _get_table(name: str) -> LineStore:
    if name not in _TABLES:
        raise KeyError(
            f"{name}: no such table. Check tableList() for more info.")
    return _TABLES[name]


def _register(name: str, store: LineStore) -> None:
    _TABLES[name] = store


# ===========================================================================
# Table editing verbs (hapi misc/hapi.py:1710-2960)
#
# hapi's table model is a per-column dict under LOCAL_TABLE_CACHE; ours is a
# packed LineStore (the engine's nine .par columns) plus an ``extras`` dict
# for everything else. The editing verbs below therefore split naturally:
# row operations (insertRow/deleteRows/arrangeTable) act on both, column
# operations (addColumn/deleteColumn/renameColumn/splitColumn) act on the
# extras only — the core schema is what the TPU engine consumes and cannot
# be dropped or renamed (attempting it raises, rather than silently
# corrupting the store).
#
# Four of these are **no-op stubs in hapi itself** (``renameColumn``
# ``misc/hapi.py:2516``, ``insertRow`` ``:2519``, ``deleteRows`` ``:2522``,
# ``splitColumn`` ``:2937`` — all ``pass``); they are implemented with real
# semantics here and the divergence is documented in MIGRATION.md.
# ===========================================================================

#: per-table column metadata for generic (createTable) tables:
#: name -> {"order": [...], "format": {...}, "default": {...}}
_META: dict[str, dict] = {}

#: the engine's packed columns (hapi-visible names)
_CORE_COLUMNS = ("molec_id", "local_iso_id", "nu", "sw", "elower",
                 "gamma_air", "gamma_self", "n_air", "delta_air", "SD_air")
_CORE_DEFAULTS = {"molec_id": 1, "local_iso_id": 1}


def _row_source(name: str) -> dict:
    """Merged {column: host array} view (core + extras + LineNumber) for
    expression evaluation — richer than hapi's VarDictionary, which sees
    core columns only."""
    store = _get_table(name)
    src = dict(_db._store_rows(store))
    src["SD_air"] = np.asarray(store.sd_air, dtype=np.float64)
    for k, v in _EXTRAS.get(name, {}).items():
        src[k] = np.asarray(v)
    src["LineNumber"] = np.arange(store.n_lines)
    return src


def _take_rows(name: str, dest: str, idx) -> LineStore:
    """Row subset by index array, keeping extras aligned.

    The result is re-sorted by line center: a :class:`LineStore` is
    nu-sorted by invariant (the engine's bucket planning depends on it), so
    an arbitrary ``idx`` order cannot be preserved — a documented
    divergence from hapi's ``arrangeTable`` row-order semantics.
    """
    store = _get_table(name)
    idx = np.asarray(idx)
    idx = idx[np.argsort(np.asarray(store.nu0, dtype=np.float64)[idx],
                         kind="stable")]
    out = store.subset(idx)
    _TABLES[dest] = out
    if name in _EXTRAS:
        _EXTRAS[dest] = {k: np.asarray(v)[idx]
                         for k, v in _EXTRAS[name].items()}
    if name in _META:
        _META[dest] = {k: (list(v) if isinstance(v, list) else dict(v))
                       for k, v in _META[name].items()}
    return out


def createTable(TableName, RowObjectDefault):
    """Create an empty table from a ``(name, default, format)`` row spec
    (hapi ``createTable``, ``misc/hapi.py:2373``).

    Core ``.par`` columns land in an (empty) :class:`LineStore`; any other
    names become extras columns. Defaults/formats are kept per table and
    used by :func:`insertRow`.
    """
    order, formats, defaults = [], {}, {}
    for par_name, par_value, par_format in RowObjectDefault:
        order.append(par_name)
        formats[par_name] = par_format
        defaults[par_name] = par_value
    empty = np.zeros(0)
    from .lines.store import from_arrays

    _TABLES[TableName] = from_arrays(
        empty, empty, empty, empty, empty, empty, empty,
        np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64),
        dtype=jnp.float64)
    _EXTRAS[TableName] = {k: np.zeros(0) for k in order
                          if k not in _CORE_COLUMNS}
    _META[TableName] = {"order": order, "format": formats,
                        "default": defaults}


def insertRow(TableName=None, RowDict=None, **values):
    """Append one row (column-name -> value).

    hapi's ``insertRow`` is an argument-less no-op stub
    (``misc/hapi.py:2519``); this one actually inserts. Missing core
    columns take the table's :func:`createTable` defaults (else 0, with
    ``molec_id``/``local_iso_id`` defaulting to (1, 1) so the isotopologue
    registry lookup stays valid); missing extras take their defaults.
    """
    if TableName is None:
        return None  # exact hapi signature/behavior: insertRow() is a no-op
    vals = dict(RowDict or {})
    vals.update(values)
    store = _get_table(TableName)
    defaults = _META.get(TableName, {}).get("default", {})

    def core(name, fallback=0.0):
        return vals.get(name, defaults.get(
            name, _CORE_DEFAULTS.get(name, fallback)))

    rows = _db._store_rows(store)
    new = {k: np.concatenate([np.asarray(rows[k], dtype=np.float64),
                              [float(core(k))]])
           for k in rows}
    sd = np.concatenate([np.asarray(store.sd_air, dtype=np.float64),
                         [float(core("SD_air"))]])
    from .lines.store import from_arrays

    _TABLES[TableName] = from_arrays(
        new["nu"], new["sw"], new["elower"], new["gamma_air"],
        new["gamma_self"], new["n_air"], new["delta_air"],
        new["molec_id"].astype(np.int64),
        new["local_iso_id"].astype(np.int64), sd_air=sd, dtype=jnp.float64)
    # from_arrays re-sorts by nu; extras must follow the same permutation
    order = np.argsort(new["nu"], kind="stable")
    extras = _EXTRAS.get(TableName, {})
    for k, v in list(extras.items()):
        v = np.concatenate([np.asarray(v),
                            np.asarray([vals.get(k, defaults.get(k, 0))],
                                       dtype=np.asarray(v).dtype)])
        extras[k] = v[order]
    if extras:
        _EXTRAS[TableName] = extras
    return _TABLES[TableName]


def deleteRows(TableName, ParameterNames=None, Conditions=None):
    """Drop rows matching a condition expression (query DSL).

    hapi's ``deleteRows`` is a no-op stub (``misc/hapi.py:2522``);
    ``ParameterNames`` is kept for signature compatibility and ignored,
    as there. Conditions may reference extras columns too.
    """
    if Conditions is None:
        return _get_table(TableName)
    mask = np.asarray(_query.filter_mask(_row_source(TableName), Conditions),
                      dtype=bool)
    return _take_rows(TableName, TableName, np.nonzero(~mask)[0])


def arrangeTable(TableName, DestinationTableName=None, RowIDList=None):
    """Subset/reorder rows by explicit row ids (hapi ``arrangeTable``,
    ``misc/hapi.py:2609``)."""
    dest = DestinationTableName or TableName
    if RowIDList is None:
        RowIDList = np.arange(_get_table(TableName).n_lines)
    return _take_rows(TableName, dest, np.asarray(RowIDList, dtype=np.int64))


def addColumn(TableName, ParameterName, Before=None, Expression=None,
              Type=None, Default=None, Format=None):
    """Add an extras column, constant or computed from an ``Expression`` in
    the condition/arithmetic DSL (hapi ``addColumn``, ``misc/hapi.py:2462``;
    expression semantics per ``evaluateExpression`` ``:2144`` with the
    ``LineNumber`` pseudo-column available, as in hapi)."""
    store = _get_table(TableName)
    extras = _EXTRAS.setdefault(TableName, {})
    if ParameterName in _CORE_COLUMNS or ParameterName in extras:
        raise ValueError(f'Column "{ParameterName}" already exists')
    if Type is None:
        Type = float
    if Default is None:
        Default = {int: 0, float: 0.0, str: "", bool: False}.get(Type, 0.0)
    if Expression is None:
        col = np.full(store.n_lines, Default,
                      dtype=object if Type is str else None)
    else:
        col = np.broadcast_to(
            np.asarray(_query.evaluate(_row_source(TableName), Expression)),
            (store.n_lines,)).copy()
    extras[ParameterName] = col
    meta = _META.setdefault(
        TableName, {"order": list(_CORE_COLUMNS), "format": {},
                    "default": {}})
    if Before is not None and Before in meta["order"]:
        meta["order"].insert(meta["order"].index(Before), ParameterName)
    else:
        meta["order"].append(ParameterName)
    if Format is not None:
        meta["format"][ParameterName] = Format
    meta["default"][ParameterName] = Default
    return col


def deleteColumn(TableName, ParameterName):
    """Remove an extras column (hapi ``deleteColumn``, ``misc/hapi.py:2497``).
    Core engine columns cannot be dropped — raises instead."""
    if ParameterName in _CORE_COLUMNS:
        raise ValueError(
            f'"{ParameterName}" is a core engine column of the packed '
            "LineStore and cannot be deleted (documented divergence)")
    extras = _EXTRAS.get(TableName, {})
    if ParameterName not in extras:
        raise KeyError(f'No such column "{ParameterName}"')
    del extras[ParameterName]
    meta = _META.get(TableName)
    if meta and ParameterName in meta["order"]:
        meta["order"].remove(ParameterName)
        meta["format"].pop(ParameterName, None)
        meta["default"].pop(ParameterName, None)


def deleteColumns(TableName, ParameterNames):
    """Remove several extras columns (hapi ``deleteColumns``,
    ``misc/hapi.py:2510``)."""
    for p in (ParameterNames if isinstance(ParameterNames, (list, tuple, set))
              else [ParameterNames]):
        deleteColumn(TableName, p)


def renameColumn(TableName, OldParameterName, NewParameterName):
    """Rename an extras column. hapi's ``renameColumn`` is a no-op stub
    (``misc/hapi.py:2516``); this one renames. Core columns raise."""
    if OldParameterName in _CORE_COLUMNS:
        raise ValueError(
            f'"{OldParameterName}" is a core engine column and cannot be '
            "renamed")
    extras = _EXTRAS.get(TableName, {})
    if OldParameterName not in extras:
        raise KeyError(f'No such column "{OldParameterName}"')
    extras[NewParameterName] = extras.pop(OldParameterName)
    meta = _META.get(TableName)
    if meta and OldParameterName in meta["order"]:
        meta["order"][meta["order"].index(OldParameterName)] = \
            NewParameterName
        for d in (meta["format"], meta["default"]):
            if OldParameterName in d:
                d[NewParameterName] = d.pop(OldParameterName)


def splitColumn(TableName, SourceParameterName, ParameterNames, Splitter):
    """Split a string extras column on a delimiter into typed columns.

    hapi's ``splitColumn`` is a no-op stub (``misc/hapi.py:2937``); this is
    the delimiter-based sibling of :func:`extractColumns`. Fields that
    parse as numbers become float columns, the rest stay strings; short
    rows pad with empty fields.
    """
    extras = _EXTRAS.get(TableName, {})
    if SourceParameterName not in extras:
        raise KeyError(f"{SourceParameterName}: not an extra column of "
                       f"{TableName}")
    src = [str(s) for s in extras[SourceParameterName]]
    parts = [s.split(Splitter) for s in src]
    for j, name in enumerate(ParameterNames):
        vals = [p[j].strip() if j < len(p) else "" for p in parts]
        try:
            col = np.asarray([float(v) for v in vals])
        except ValueError:
            col = np.asarray(vals, dtype=object)
        extras[name] = col
    return {n: extras[n] for n in ParameterNames}


def saveCache():
    """Write every loaded table back to the database directory (hapi
    ``saveCache``, ``misc/hapi.py:1732``; drops the query buffer first,
    as there)."""
    _TABLES.pop("__BUFFER__", None)
    _EXTRAS.pop("__BUFFER__", None)
    db_commit()


def loadCache():
    """(Re)load every table from the database directory (hapi
    ``loadCache``, ``misc/hapi.py:1718``)."""
    if _DB_DIR is None:
        raise RuntimeError("no database opened; call db_begin(dir) first")
    db_begin(_DB_DIR)


def databaseBegin(db=None):
    """DB-backend-level open (hapi ``databaseBegin``,
    ``misc/hapi.py:1745``) — same as :func:`db_begin`."""
    db_begin(db)


def databaseCommit():
    """DB-backend-level commit (hapi ``databaseCommit``,
    ``misc/hapi.py:1753``) — same as :func:`saveCache`."""
    saveCache()


def select(TableName, DestinationTableName="__BUFFER__", ParameterNames=None,
           Conditions=None, Output=False, File=None):
    """Rows matching a condition expression into a destination table
    (hapi ``select``, ``misc/hapi.py:2567``; expression DSL per
    :mod:`radtxfr_tpu.lines.query`).

    Divergence: hapi prints by default (``Output=True``); here the result
    is registered under ``DestinationTableName`` and printing is opt-in.
    """
    store = _get_table(TableName)
    out = _query.select(store, Conditions) if Conditions is not None else store
    _register(DestinationTableName, out)
    if Output or File:
        rows = _db._store_rows(out)
        names = ParameterNames or list(rows)
        lines = [" ".join(str(rows[p][k]) for p in names)
                 for k in range(out.n_lines)]
        if File:
            with open(File, "w") as f:
                f.write("\n".join(lines) + "\n")
        else:
            print("\n".join(lines))
    return out


def sort(TableName, DestinationTableName=None, ParameterNames=None,
         Accending=True, Output=False, File=None):
    """Reorder rows by column(s) (hapi ``sort``, ``misc/hapi.py:2679``);
    a list of names sorts lexicographically, first name most significant."""
    store = _get_table(TableName)
    out = _query.sort(store, by=ParameterNames or "nu",
                      descending=not Accending)
    _register(DestinationTableName or TableName, out)
    return out


def group(TableName, DestinationTableName="__BUFFER__", ParameterNames=None,
          GroupParameterNames=None, Output=True):
    """Group-by aggregation (hapi ``group``, ``misc/hapi.py:2731``).

    ``ParameterNames`` entries are ``(FUNC, expr)`` pairs with FUNC in
    :data:`radtxfr_tpu.lines.query.GROUP_FUNCTIONS`. Returns the
    ``{key: values, agg: values}`` dict (hapi mutates a destination table).
    """
    store = _get_table(TableName)
    aggs = {}
    for i, p in enumerate(ParameterNames or []):
        how, expr = (p[0], p[1] if len(p) > 1 else None) \
            if isinstance(p, (tuple, list)) else ("COUNT", None)
        aggs[f"{str(how).lower()}_{expr if isinstance(expr, str) else i}"] = (how, expr)
    out = _query.group(store, GroupParameterNames or "molec_id", aggs)
    if Output:
        print(out)
    return out


def getColumn(TableName, ParameterName):
    """One column as a list (hapi ``getColumn``, ``misc/hapi.py:2422``)."""
    return _query._col(_get_table(TableName), ParameterName).tolist()


def getColumns(TableName, ParameterNames):
    """Several columns (hapi ``getColumns``, ``misc/hapi.py:2441``)."""
    return [getColumn(TableName, p) for p in ParameterNames]


def extractColumns(TableName, SourceParameterName, ParameterFormats,
                   ParameterNames=None, FixCol=False):
    """Split a string column into typed columns (hapi ``extractColumns``,
    ``misc/hapi.py:2815``) — operates on the table's extras dict."""
    extras = _EXTRAS.get(TableName, {})
    table = dict(extras)
    if SourceParameterName not in table:
        raise KeyError(f"{SourceParameterName}: not an extra column of "
                       f"{TableName}")
    names = ParameterNames or [f"col{i}" for i in range(len(ParameterFormats))]
    _EXTRAS[TableName] = _query.extract_columns(
        table, SourceParameterName, ParameterFormats, names, fix_col=FixCol)
    return _EXTRAS[TableName]


def fetch(TableName, M, I, numin, numax, ParameterGroups=None,
          Parameters=None):
    """Download lines from hitran.org into a table (hapi ``fetch``,
    ``misc/hapi.py:5276``). Network-gated like
    :func:`radtxfr_tpu.lines.fetch.fetch`.

    ``ParameterGroups``/``Parameters`` request hitran.org's extended column
    sets (e.g. ``['sdvoigt']``, ``['ht']``); the extra columns land in the
    table's extras (consumed by the HT driver) and an ``SD_air`` column is
    merged into the line store for the SD-Voigt engine
    (``misc/hapi.py:3118-3168``)."""
    return fetch_by_ids(
        TableName,
        _fetch._global_ids(M, I if isinstance(I, (list, tuple)) else [I]),
        numin, numax, ParameterGroups=ParameterGroups, Parameters=Parameters)


def fetch_by_ids(TableName, iso_id_list, numin, numax, ParameterGroups=None,
                 Parameters=None):
    """hapi ``fetch_by_ids`` (``misc/hapi.py:5245``) — global iso ids."""
    out = _fetch.fetch_by_ids(iso_id_list, numin, numax,
                              pargroups=tuple(ParameterGroups or ()),
                              params=tuple(Parameters or ()))
    if isinstance(out, tuple):
        store, extras = out
        _EXTRAS[TableName] = {
            k: v for k, v in extras.items()
            if np.asarray(v).dtype != object}
    else:
        store = out
    _register(TableName, store)
    if _DB_DIR is not None:
        _db.save_table(store, _DB_DIR, TableName)
    return store


def getStickXY(TableName):
    """Stick-spectrum polyline (hapi ``getStickXY``, ``misc/hapi.py:11684``)."""
    return _query.stick_xy(_get_table(TableName))


# ===========================================================================
# Isotopologue registry (hapi ISO/ISO_ID, misc/hapi.py:3234,3372)
# ===========================================================================

@functools.lru_cache(maxsize=1)
def _registry_full():
    path = os.path.join(os.path.dirname(__file__), "data", "iso_registry.npz")
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


@functools.lru_cache(maxsize=1)
def _iso_dicts():
    r = _registry_full()
    iso = {}
    iso_id = {}
    for k in range(len(r["mol"])):
        m, i = int(r["mol"][k]), int(r["iso"][k])
        gid = int(r["global_id"][k])
        row = [gid, str(r["iso_name"][k]), float(r["abundance"][k]),
               float(r["molar_mass"][k]), str(r["mol_name"][k])]
        iso[(m, i)] = row
        iso_id[gid] = [m, i, row[1], row[2], row[3], row[4]]
    return iso, iso_id


def __getattr__(name):  # lazy ISO / ISO_ID module attributes
    if name == "ISO":
        return _iso_dicts()[0]
    if name == "ISO_ID":
        return _iso_dicts()[1]
    raise AttributeError(name)


def abundance(M, I):
    """Natural abundance (hapi ``abundance``, ``misc/hapi.py:5088``)."""
    return _iso_dicts()[0][(int(M), int(I))][2]


def molecularMass(M, I):
    """Molar mass [g/mol] (hapi ``molecularMass``, ``misc/hapi.py:5109``)."""
    return _iso_dicts()[0][(int(M), int(I))][3]


def moleculeName(M):
    """Molecule name (hapi ``moleculeName``, ``misc/hapi.py:5130``)."""
    for (m, _i), row in _iso_dicts()[0].items():
        if m == int(M):
            return row[4]
    raise KeyError(f"unknown molecule number {M}")


def isotopologueName(M, I):
    """Isotopologue name (hapi ``isotopologueName``, ``misc/hapi.py:5150``)."""
    return _iso_dicts()[0][(int(M), int(I))][1]


def print_iso():
    """Registry listing keyed by (M, I) (hapi ``print_iso``)."""
    print("The dictionary \"ISO\" contains information on isotopologues in HITRAN")
    print("M    I    id    iso_name    abundance    mass    mol_name")
    for (m, i), (gid, iname, ab, mass, mname) in sorted(_iso_dicts()[0].items()):
        print(f"{m:4d} {i:4d} : {gid:5d} {iname:>18s} {ab:.6E} {mass:10.6f} {mname:>8s}")


def print_iso_id():
    """Registry listing keyed by global id (hapi ``print_iso_id``)."""
    print("The dictionary \"ISO_ID\" contains information on \"global\" IDs of isotopologues in HITRAN")
    print("id    M    I    iso_name    abundance    mass    mol_name")
    for gid, (m, i, iname, ab, mass, mname) in sorted(_iso_dicts()[1].items()):
        print(f"{gid:5d} : {m:4d} {i:4d} {iname:>18s} {ab:.6E} {mass:10.6f} {mname:>8s}")


# ===========================================================================
# Partition sums (hapi partitionSum/PYTIPS, misc/hapi.py:9589,10030)
# ===========================================================================

def PYTIPS(M, I, T):
    """Q(T) for one isotopologue (hapi ``PYTIPS``, ``misc/hapi.py:10030``)."""
    row = _tips.iso_row_index()[(int(M), int(I))]
    _m, _i, _g, q = _tips.load_tips_tables()
    return float(np.asarray(_tips.partition_sum(jnp.asarray(q),
                                                jnp.asarray([row]),
                                                jnp.asarray(float(T))))[0])


def partitionSum(M, I, T, step=None):
    """hapi ``partitionSum`` (``misc/hapi.py:9589``): scalar/list T -> Q
    values; (Tmin, Tmax) + ``step`` -> (T grid, Q array)."""
    if not step:
        if not isinstance(T, (list, tuple)):
            return PYTIPS(M, I, T)
        return [PYTIPS(M, I, t) for t in T]
    TT = np.arange(T[0], T[1], step)
    return TT, np.array([PYTIPS(M, I, t) for t in TT])


# ===========================================================================
# Line profiles + CPF (hapi PROFILE_*/cpf family, misc/hapi.py:9645-10160)
# ===========================================================================

def PROFILE_HT(sg0, GamD, Gam0, Gam2, Shift0, Shift2, anuVC, eta, sg):
    """Hartmann-Tran pCqSDHC -> (Re, Im) (hapi ``PROFILE_HT``,
    ``misc/hapi.py:10034``)."""
    return _htp.profile_ht(sg0, GamD, Gam0, Gam2, Shift0, Shift2, anuVC, eta, sg)


PROFILE_HTP = PROFILE_HT  # hapi backwards-compat alias (misc/hapi.py:10087)


def PROFILE_SDRAUTIAN(sg0, GamD, Gam0, Gam2, Shift0, Shift2, anuVC, sg):
    """hapi ``PROFILE_SDRAUTIAN`` (``misc/hapi.py:10089``)."""
    return _htp.profile_sdrautian(sg0, GamD, Gam0, Gam2, Shift0, Shift2, anuVC, sg)


def PROFILE_RAUTIAN(sg0, GamD, Gam0, Shift0, anuVC, eta, sg):
    """hapi ``PROFILE_RAUTIAN`` (``misc/hapi.py:10104``; its ``eta`` argument
    is ignored there too)."""
    return _htp.profile_rautian(sg0, GamD, Gam0, Shift0, anuVC, sg)


def PROFILE_SDVOIGT(sg0, GamD, Gam0, Gam2, Shift0, Shift2, sg):
    """hapi ``PROFILE_SDVOIGT`` (``misc/hapi.py:10117``)."""
    return _htp.profile_sdvoigt(sg0, GamD, Gam0, Gam2, Shift0, Shift2, sg)


def PROFILE_VOIGT(sg0, GamD, Gam0, sg):
    """hapi ``PROFILE_VOIGT`` (``misc/hapi.py:10131``) -> (Re, Im)."""
    return _htp.profile_ht(sg0, GamD, Gam0, 0.0, 0.0, 0.0, 0.0, 0.0, sg)


def PROFILE_LORENTZ(sg0, Gam0, sg):
    """hapi ``PROFILE_LORENTZ`` (``misc/hapi.py:10142``)."""
    return _prof.lorentz(jnp.asarray(sg) - sg0, Gam0)


def PROFILE_DOPPLER(sg0, GamD, sg):
    """hapi ``PROFILE_DOPPLER`` (``misc/hapi.py:10152``)."""
    return _prof.doppler(jnp.asarray(sg) - sg0, GamD)


def cpf(X, Y):
    """Full Humlicek 3-region CPF (hapi ``cpf``, ``misc/hapi.py:9677``)."""
    return _fad.cpf_humlicek(X, Y)


def cpf3(X, Y):
    """15-term asymptotic CPF (hapi ``cpf3``, ``misc/hapi.py:9645``)."""
    return _fad.cpf3(X, Y)


def hum1_wei(x, y, n=24):
    """Humlicek-1 + Weideman blend, hapi's default CPF
    (``misc/hapi.py:9833-9846``)."""
    return _fad.wofz_real(x, y, n)


def cef(x, y, N=24):
    """Weideman rational series -> complex w (hapi ``cef``,
    ``misc/hapi.py:9812``)."""
    return _fad.cef(x, y, N)


# ===========================================================================
# Environment dependences (misc/hapi.py:10169-10200)
# ===========================================================================

def EnvironmentDependency_Intensity(LineIntensityRef, T, Tref, SigmaT,
                                    SigmaTref, LowerStateEnergy, LineCenter):
    """hapi ``misc/hapi.py:10169``."""
    const = 1.4388028496642257
    ch = np.exp(-const * LowerStateEnergy / T) * (1 - np.exp(-const * LineCenter / T))
    zn = np.exp(-const * LowerStateEnergy / Tref) * (1 - np.exp(-const * LineCenter / Tref))
    return LineIntensityRef * SigmaTref / SigmaT * ch / zn


def EnvironmentDependency_GammaD(GammaD_ref, T, Tref):
    """hapi ``misc/hapi.py:10178``."""
    return GammaD_ref * np.sqrt(T / Tref)


def EnvironmentDependency_Gamma0(Gamma0_ref, T, Tref, p, pref,
                                 TempRatioPower):
    """hapi ``misc/hapi.py:10183``."""
    return Gamma0_ref * p / pref * (Tref / T) ** TempRatioPower


def EnvironmentDependency_Gamma2(Gamma2_ref, T, Tref, p, pref,
                                 TempRatioPower):
    """hapi ``misc/hapi.py:10187``."""
    return Gamma2_ref * p / pref * (Tref / T) ** TempRatioPower


def EnvironmentDependency_Delta0(Delta0_ref, p, pref):
    """hapi ``misc/hapi.py:10191``."""
    return Delta0_ref * p / pref


def EnvironmentDependency_Delta2(Delta2_ref, p, pref):
    """hapi ``misc/hapi.py:10195``."""
    return Delta2_ref * p / pref


def EnvironmentDependency_anuVC(anuVC_ref, T, Tref, p, pref):
    """hapi ``misc/hapi.py:10199``."""
    return anuVC_ref * Tref / T * p / pref


def volumeConcentration(p, T):
    """Number density [molecules/cm^3] at p [atm], T [K]
    (hapi ``volumeConcentration``, ``misc/hapi.py:10163``)."""
    return (p / 9.869233e-7) / (_K_BOLTS_CGS * T)


# ===========================================================================
# Absorption-coefficient drivers (misc/hapi.py:10302-11580)
# ===========================================================================

def arange_(lower, upper, step):
    """Drift-free uniform grid (hapi ``arange_``, ``misc/hapi.py:133``)."""
    return np.asarray(_spec.arange_drift_free(lower, upper, step))


def save_to_file(fname, fformat, *arg):
    """Column text dump (hapi ``save_to_file``, ``misc/hapi.py:10287``)."""
    with open(fname, "w") as f:
        for vals in zip(*arg):
            f.write((fformat + "\n") % tuple(vals))


def _list_of(a):
    return a if isinstance(a, (list, tuple)) else [a]


def _driver_common(Components, SourceTables, Environment, OmegaRange,
                   OmegaStep, OmegaWing, OmegaGrid,
                   WavenumberRange, WavenumberStep, WavenumberWing,
                   WavenumberWingHW, WavenumberGrid, OmegaWingHW):
    """hapi ``getDefaultValuesForXsect`` semantics (``misc/hapi.py:10231``)."""
    if WavenumberRange is not None:
        OmegaRange = WavenumberRange
    if WavenumberStep is not None:
        OmegaStep = WavenumberStep
    if WavenumberWing is not None:
        OmegaWing = WavenumberWing
    if WavenumberWingHW is not None:
        OmegaWingHW = WavenumberWingHW
    if WavenumberGrid is not None:
        OmegaGrid = WavenumberGrid

    tables = [t for t in _list_of(SourceTables) if t is not None] or ["__BUFFER__"]
    stores = [_get_table(t) for t in tables]

    if Components is None:
        comps = set()
        for s in stores:
            iso_tab = IsoTables.load()
            local = np.asarray(iso_tab.iso)[np.asarray(s.iso_row)]
            comps |= set(zip(np.asarray(s.mol_id).tolist(), local.tolist()))
        Components = sorted(comps)
    else:
        Components = [tuple(c) for c in _list_of(Components)]
        if Components and not isinstance(Components[0], tuple):
            Components = [tuple(Components)]

    env = {"T": 296.0, "p": 1.0}
    env.update(Environment or {})

    if OmegaGrid is not None:
        grid = np.asarray(OmegaGrid, dtype=np.float64)
    else:
        if OmegaRange is None:
            nus = np.concatenate([np.asarray(s.nu0) for s in stores])
            OmegaRange = (float(nus.min()), float(nus.max()))
        step = 0.01 if OmegaStep is None else float(OmegaStep)
        grid = arange_(OmegaRange[0], OmegaRange[1], step)
    wing = 0.0 if OmegaWing is None else float(OmegaWing)
    return tables, stores, Components, env, grid, wing, float(OmegaWingHW)


def _component_mask_and_ratio(store: LineStore, components):
    """Line keep-mask + per-line abundance ratio for hapi Components tuples
    (M, I[, D]) (``misc/hapi.py:10996-11009``)."""
    iso_tab = IsoTables.load()
    local = np.asarray(iso_tab.iso)[np.asarray(store.iso_row)]
    mol = np.asarray(store.mol_id)
    keep = np.zeros(store.n_lines, dtype=bool)
    ratio = np.ones(store.n_lines)
    for comp in components:
        m, i = int(comp[0]), int(comp[1])
        sel = (mol == m) & (local == i)
        keep |= sel
        if len(comp) > 2 and comp[2] is not None:
            ratio[sel] = float(comp[2]) / abundance(m, i)
    return keep, ratio


def _mask_store(store: LineStore, keep: np.ndarray) -> LineStore:
    # LineStore.subset preserves the host-f64 line centers
    return store.subset(np.nonzero(keep)[0])


def _threshold_mask(store: LineStore, T: float, threshold: float) -> np.ndarray:
    """hapi cuts lines whose T-scaled intensity (before the abundance
    factor) is below ``IntensityThreshold`` (``misc/hapi.py:11078-11082``)."""
    if threshold <= 0.0:
        return np.ones(store.n_lines, dtype=bool)
    iso_tab = IsoTables.load()
    rows = np.asarray(store.iso_row)
    q = np.asarray(iso_tab.q)
    qt = np.asarray(_tips.partition_sum(jnp.asarray(q),
                                        jnp.arange(q.shape[0]),
                                        jnp.asarray(float(T))))
    qref = np.asarray(_tips.partition_sum(jnp.asarray(q),
                                          jnp.arange(q.shape[0]),
                                          jnp.asarray(T_REF)))
    const = 1.4388028496642257
    e = np.asarray(store.elower)
    nu = np.asarray(store.nu0)
    ch = np.exp(-const * e / T) * (1 - np.exp(-const * nu / T))
    zn = np.exp(-const * e / T_REF) * (1 - np.exp(-const * nu / T_REF))
    s = np.asarray(store.sw) * (qref[rows] / qt[rows]) * ch / zn
    return s >= threshold


def _resolve_diluent(Diluent, GammaL):
    if Diluent:
        d = {str(k).lower(): float(v) for k, v in dict(Diluent).items()}
        if abs(sum(d.values()) - 1.0) > 1e-6:
            import warnings

            warnings.warn("diluent fractions do not sum to 1")
        return d
    if GammaL == "gamma_air":
        return {"air": 1.0}
    if GammaL == "gamma_self":
        return {"self": 1.0}
    raise ValueError(f"unknown GammaL value: {GammaL!r}")


def _hooked_xsect(profile, sub, iso_tab, name, keep, T, p, diluent,
                  grid, wing_abs, wing_hw, pf, env_dep, ratio,
                  Environment, threshold, line_shift):
    """Driver hot loop with the user extension hooks evaluated host-side
    (hapi ``EnvDependences`` / custom ``partitionFunction``,
    ``misc/hapi.py:10931-11138``): per-line parameters are assembled in
    NumPy exactly as the reference loop does — custom ``sw`` /
    ``gamma_<sp>`` / ``delta_<sp>`` / ``SD_<sp>`` overrides, the hapi
    ``n_self``/``deltap`` fallback rules, the post-override intensity
    threshold — then handed to the vectorized engine as a ready-made
    :class:`LineParams`. The per-line Python callback costs what hapi's
    own loop costs; without callbacks the default vectorized path is used
    instead, so only hook users pay it.
    """
    from .core.constants import T_REF
    from .kernels.lineparams import LineParams

    import jax

    h = sub.host_view()
    n = h.nu0.size
    iso_h = jax.device_get(iso_tab)
    mol = np.asarray(h.mol_id)
    loc = np.asarray(iso_h.iso)[np.asarray(h.iso_row)]
    mass = np.asarray(iso_h.molar_mass)[np.asarray(h.iso_row)]

    cols = {"nu": np.asarray(h.nu0, dtype=np.float64),
            "sw": np.asarray(h.sw, dtype=np.float64),
            "elower": np.asarray(h.elower, dtype=np.float64),
            "gamma_air": np.asarray(h.gamma_air, dtype=np.float64),
            "gamma_self": np.asarray(h.gamma_self, dtype=np.float64),
            "n_air": np.asarray(h.n_air, dtype=np.float64),
            "delta_air": np.asarray(h.delta_air, dtype=np.float64),
            "SD_air": np.asarray(h.sd_air, dtype=np.float64),
            "molec_id": mol, "local_iso_id": loc}
    extras = _EXTRAS.get(name) or {}
    idx = np.nonzero(keep)[0]
    for k, v in extras.items():
        if np.ndim(v) == 1 and len(v) == keep.size:
            cols.setdefault(k, np.asarray(v)[idx])

    pf = pf or PYTIPS
    Tref, pref = float(T_REF), 1.0
    q_t, q_ref = {}, {}
    for m_i in {(int(m), int(i)) for m, i in zip(mol, loc)}:
        q_t[m_i] = float(pf(m_i[0], m_i[1], T))
        q_ref[m_i] = float(pf(m_i[0], m_i[1], Tref))
    sig_t = np.array([q_t[(int(m), int(i))] for m, i in zip(mol, loc)])
    sig_ref = np.array([q_ref[(int(m), int(i))] for m, i in zip(mol, loc)])

    Env = {"T": T, "p": p}
    Env.update({k: v for k, v in (Environment or {}).items()})
    Env["Tref"], Env["pref"] = Tref, pref

    col = lambda nm, d=0.0: cols.get(nm, np.full(n, d))

    def custom(i):
        if env_dep is None:
            return {}
        return env_dep(Env, {k: v[i] for k, v in cols.items()}) or {}

    cds = [custom(i) for i in range(n)]
    get = lambda cd, key, default: float(cd[key]) if key in cd else default

    s_def = np.asarray(EnvironmentDependency_Intensity(
        cols["sw"], T, Tref, sig_t, sig_ref, cols["elower"], cols["nu"]))
    strength = np.array([get(cd, "sw", s_def[i]) for i, cd in enumerate(cds)])

    c_mass_mol = 1.66053873e-27
    m_kg = mass * c_mass_mol * 1000.0
    c_bolts, cc = 1.380648813e-16, 2.99792458e10
    gamma_d = np.sqrt(2 * c_bolts * T * np.log(2) / m_kg / cc**2) * cols["nu"]

    gamma0 = np.zeros(n)
    shift0 = np.zeros(n)
    gamma2 = np.zeros(n)
    if profile != "doppler":
        for sp, abun in diluent.items():
            sp = sp.lower()
            g_db = col(f"gamma_{sp}")
            n_db = col(f"n_{sp}", np.nan)
            if sp == "self":
                # hapi: present-but-zero n_self falls back to n_air
                n_db = np.where(np.isnan(n_db) | (n_db == 0.0),
                                cols["n_air"], n_db)
            else:
                n_db = np.where(np.isnan(n_db), cols["n_air"], n_db)
            d_db = col(f"delta_{sp}")
            dp_db = col(f"deltap_{sp}")
            g_def = np.asarray(EnvironmentDependency_Gamma0(
                g_db, T, Tref, p, pref, n_db))
            s_def_sp = (d_db + dp_db * (T - Tref)) * p / pref
            sd_def = col(f"SD_{sp}") * p / pref
            for i, cd in enumerate(cds):
                gamma0[i] += abun * get(cd, f"gamma_{sp}", g_def[i])
                shift0[i] += abun * get(cd, f"delta_{sp}", s_def_sp[i])
                if profile == "sdvoigt":
                    # hapi: Gamma0DB multiplies OUTSIDE the override
                    # (misc/hapi.py:10889-10890)
                    gamma2[i] += (abun * get(cd, f"SD_{sp}", sd_def[i])
                                  * g_db[i])
    elif line_shift:
        shift0 = cols["delta_air"] * p / pref

    wing = np.maximum(wing_abs,
                      np.maximum(wing_hw * gamma0, wing_hw * gamma_d))
    m = strength >= threshold
    if not m.any():
        return jnp.zeros(grid.shape[0], dtype=jnp.float64)
    centered_inside = profile in ("sdvoigt", "ht")
    params = LineParams(
        nu0=jnp.asarray(cols["nu"][m]),
        nu0_shifted=jnp.asarray(cols["nu"][m] if centered_inside
                                else cols["nu"][m] + shift0[m]),
        strength=jnp.asarray(strength[m] * np.asarray(ratio)[m]),
        gamma_d=jnp.asarray(gamma_d[m]),
        gamma_0=jnp.asarray(gamma0[m]),
        wing=jnp.asarray(wing[m]),
        gamma_2=jnp.asarray(gamma2[m]),
        shift0=jnp.asarray(shift0[m]))
    return _xsect(jnp.asarray(grid), params, profile=profile)


def _hooked_xsect_ht(sub, iso_tab, name, keep, T, p, diluent, grid,
                     wing_abs, wing_hw, pf, env_dep, ratio, Environment,
                     threshold):
    """HT driver hot loop with the user extension hooks, host-side
    (``misc/hapi.py:10455-10650``): per-line HT parameters are assembled
    with hapi's exact override keys — ``gamma_HT_0_<sp>_296`` falling
    back to ``gamma_<sp>``, the shift override under the ``deltap_*``
    keys (hapi's quirk), ``gamma_HT_2/delta_HT_2/nu_HT`` overrides, eta
    built from the OVERRIDDEN Gamma0T/Shift0T — then evaluated by the
    vectorized pcqsdhc engine
    (:func:`~radtxfr_tpu.kernels.ht_driver.ht_xsect_from_params`)."""
    import jax
    from .core.constants import T_REF as Tref
    from .kernels.ht_driver import ht_xsect_from_params

    h = sub.host_view()
    n = h.nu0.size
    iso_h = jax.device_get(iso_tab)
    mol = np.asarray(h.mol_id)
    loc = np.asarray(iso_h.iso)[np.asarray(h.iso_row)]
    mass = np.asarray(iso_h.molar_mass)[np.asarray(h.iso_row)]

    cols = {"nu": np.asarray(h.nu0, dtype=np.float64),
            "sw": np.asarray(h.sw, dtype=np.float64),
            "elower": np.asarray(h.elower, dtype=np.float64),
            "gamma_air": np.asarray(h.gamma_air, dtype=np.float64),
            "gamma_self": np.asarray(h.gamma_self, dtype=np.float64),
            "n_air": np.asarray(h.n_air, dtype=np.float64),
            "delta_air": np.asarray(h.delta_air, dtype=np.float64),
            "SD_air": np.asarray(h.sd_air, dtype=np.float64),
            "molec_id": mol, "local_iso_id": loc}
    extras = _EXTRAS.get(name) or {}
    idx = np.nonzero(keep)[0]
    for k, v in extras.items():
        if np.ndim(v) == 1 and len(v) == keep.size:
            cols.setdefault(k, np.asarray(v)[idx])
    col = lambda nm, d=0.0: cols.get(nm, np.full(n, d))
    nz = lambda a, b: np.where(a != 0.0, a, b)

    pf = pf or PYTIPS
    q_t, q_ref = {}, {}
    for m_i in {(int(m), int(i)) for m, i in zip(mol, loc)}:
        q_t[m_i] = float(pf(m_i[0], m_i[1], T))
        q_ref[m_i] = float(pf(m_i[0], m_i[1], Tref))
    sig_t = np.array([q_t[(int(m), int(i))] for m, i in zip(mol, loc)])
    sig_ref = np.array([q_ref[(int(m), int(i))] for m, i in zip(mol, loc)])

    Env = {"T": T, "p": p}
    Env.update({k: v for k, v in (Environment or {}).items()})
    Env["Tref"], Env["pref"] = Tref, 1.0

    def custom(i):
        if env_dep is None:
            return {}
        return env_dep(Env, {k: v[i] for k, v in cols.items()}) or {}

    cds = [custom(i) for i in range(n)]
    get = lambda cd, key, default: float(cd[key]) if key in cd else default

    s_def = np.asarray(EnvironmentDependency_Intensity(
        cols["sw"], T, Tref, sig_t, sig_ref, cols["elower"], cols["nu"]))
    strength = np.array([get(cd, "sw", s_def[i]) for i, cd in enumerate(cds)])

    c_mass_mol = 1.66053873e-27
    m_kg = mass * c_mass_mol * 1000.0
    c_bolts, cc = 1.380648813e-16, 2.99792458e10
    gamma_d = np.sqrt(2 * c_bolts * T * np.log(2) / m_kg / cc**2) * cols["nu"]

    gamma0 = np.zeros(n)
    shift0 = np.zeros(n)
    gamma2 = np.zeros(n)
    shift2 = np.zeros(n)
    nuvc = np.zeros(n)
    eta_num = np.zeros(n, dtype=np.complex128)
    for sp, abun in diluent.items():
        sp = sp.lower()
        g_plain = col(f"gamma_{sp}")
        g0db = nz(col(f"gamma_HT_0_{sp}_296"), g_plain)
        n_plain = col(f"n_{sp}", np.nan)
        if sp == "self":
            n_plain = np.where(np.isnan(n_plain) | (n_plain == 0.0),
                               cols["n_air"], n_plain)
        else:
            n_plain = np.where(np.isnan(n_plain), cols["n_air"], n_plain)
        ndb = nz(col(f"n_HT_{sp}_296"), n_plain)
        d0 = nz(col(f"delta_HT_0_{sp}_296"), col(f"delta_{sp}"))
        dp = nz(col(f"deltap_HT_{sp}_296"), col(f"deltap_{sp}"))
        g2db = nz(col(f"gamma_HT_2_{sp}_296"), col(f"SD_{sp}") * g0db)
        d2db = col(f"delta_HT_2_{sp}_296")
        nuvc_db = col(f"nu_HT_{sp}")
        kap_db = col(f"kappa_HT_{sp}")
        eta_db = col(f"eta_HT_{sp}")

        g0t_def = g0db * p * (Tref / T) ** ndb
        s0t_def = (d0 + dp * (T - Tref)) * p
        g2_def = g2db * p
        d2_def = d2db * p
        nv_def = nuvc_db * (Tref / T) ** kap_db * p
        for i, cd in enumerate(cds):
            g0t = get(cd, f"gamma_HT_0_{sp}_296",
                      get(cd, f"gamma_{sp}", g0t_def[i]))
            # hapi's shift override lives under the deltap_* keys
            # (misc/hapi.py:10579-10582)
            s0t = get(cd, f"deltap_HT_{sp}_296",
                      get(cd, f"deltap_{sp}", s0t_def[i]))
            gamma0[i] += abun * g0t
            shift0[i] += abun * s0t
            gamma2[i] += abun * get(cd, f"gamma_HT_2_{sp}_296", g2_def[i])
            shift2[i] += abun * get(cd, f"delta_HT_2_{sp}_296", d2_def[i])
            nuvc[i] += abun * get(cd, f"nu_HT_{sp}", nv_def[i])
            eta_num[i] += eta_db[i] * abun * (g0t + 1j * s0t)
    with np.errstate(invalid="ignore", divide="ignore"):
        eta = eta_num / (gamma0 + 1j * shift0)
    eta = np.where(np.isfinite(eta), eta, 0.0)

    wing = np.maximum(wing_abs,
                      np.maximum(wing_hw * gamma0, wing_hw * gamma_d))
    m = strength >= threshold
    if not m.any():
        return jnp.zeros(grid.shape[0], dtype=jnp.float64)
    prm = dict(
        strength=jnp.asarray(strength[m] * np.asarray(ratio)[m]),
        gamma_d=jnp.asarray(gamma_d[m]), gamma0=jnp.asarray(gamma0[m]),
        shift0=jnp.asarray(shift0[m]), gamma2=jnp.asarray(gamma2[m]),
        shift2=jnp.asarray(shift2[m]), nuvc=jnp.asarray(nuvc[m]),
        eta=jnp.asarray(eta[m]), wing=jnp.asarray(wing[m]))
    eval_jit = jax.jit(ht_xsect_from_params, static_argnames=("chunk",))
    return eval_jit(jnp.asarray(grid), jnp.asarray(cols["nu"][m]), prm,
                    chunk=128)


def _abs_coefficient(profile, Components, SourceTables, partitionFunction,
                     Environment, OmegaRange, OmegaStep, OmegaWing,
                     IntensityThreshold, OmegaWingHW, GammaL, HITRAN_units,
                     LineShift, File, Format, OmegaGrid,
                     WavenumberRange, WavenumberStep, WavenumberWing,
                     WavenumberWingHW, WavenumberGrid, Diluent,
                     EnvDependences):
    import dataclasses

    # hapi's Doppler driver accepts EnvDependences but never calls it
    # (misc/hapi.py:11384-11581) — faithful: ignore it there.
    hooked = ((EnvDependences is not None and profile != "doppler")
              or partitionFunction not in (None, PYTIPS))

    tables, stores, comps, env, grid, wing_abs, wing_hw = _driver_common(
        Components, SourceTables, Environment, OmegaRange, OmegaStep,
        OmegaWing, OmegaGrid, WavenumberRange, WavenumberStep,
        WavenumberWing, WavenumberWingHW, WavenumberGrid, OmegaWingHW)

    T = float(env["T"])
    p = float(env["p"])
    diluent = _resolve_diluent(Diluent, GammaL) if profile != "doppler" else {}

    iso_tab = IsoTables.load()
    k_total = jnp.zeros(grid.shape[0], dtype=jnp.float64)
    for name, store in zip(tables, stores):
        keep, ratio = _component_mask_and_ratio(store, comps)
        if hooked:
            # the intensity threshold applies AFTER a custom 'sw'/pf
            # (misc/hapi.py:11075-11082) — it lives inside the hooked path
            if not keep.any():
                continue
            sub = _mask_store(store, keep)
            if profile == "ht":
                k_total = k_total + _hooked_xsect_ht(
                    sub, iso_tab, name, keep, T, p, diluent, grid,
                    wing_abs, wing_hw, partitionFunction, EnvDependences,
                    ratio[keep], Environment, float(IntensityThreshold))
            else:
                k_total = k_total + _hooked_xsect(
                    profile, sub, iso_tab, name, keep, T, p, diluent, grid,
                    wing_abs, wing_hw, partitionFunction, EnvDependences,
                    ratio[keep], Environment, float(IntensityThreshold),
                    bool(LineShift))
            continue
        keep &= _threshold_mask(store, T, float(IntensityThreshold))
        if not keep.any():
            continue
        sub = _mask_store(store, keep)
        ratio = ratio[keep]
        if not LineShift and profile == "doppler":
            # hapi quirk: every driver accepts LineShift but only the
            # Doppler one honors it (misc/hapi.py:11511; the Voigt/SDVoigt/
            # Lorentz/HT drivers always apply the Diluent delta columns)
            sub = dataclasses.replace(
                sub, delta_air=jnp.zeros_like(sub.delta_air))

        exotic = set(diluent) - {"air", "self"}
        if profile == "ht" or exotic:
            if profile in ("lorentz", "doppler"):
                raise NotImplementedError(
                    f"diluents {sorted(exotic)} are not supported by the "
                    f"{profile} driver (hapi supports air/self there too)")
            extras = _EXTRAS.get(name) or None
            if extras is not None:
                idx = np.nonzero(keep)[0]
                extras = {k: v[idx] for k, v in extras.items()
                          if np.ndim(v) == 1 and len(v) == keep.size}
            if not np.all(ratio == 1.0):
                # the HT driver computes strengths itself; fold the
                # abundance ratio into sw (misc/hapi.py:10536-10540)
                sub = dataclasses.replace(
                    sub, sw=jnp.asarray(np.asarray(sub.sw) * ratio))
            k = _xsect_ht(jnp.asarray(grid), sub, iso_tab, T, p,
                          diluent=diluent, extras=extras,
                          wing_abs=wing_abs, wing_hw=wing_hw)
        else:
            params = _line_params(
                sub, iso_tab, T, p,
                vmr_self=diluent.get("self", 0.0),
                wing_abs=wing_abs, wing_hw=wing_hw,
                abundance_ratio=jnp.asarray(ratio),
                profile=profile)
            k = _xsect(jnp.asarray(grid), params, profile=profile)
        k_total = k_total + k

    if not HITRAN_units:
        k_total = k_total * volumeConcentration(p, T)
    k_np = np.asarray(k_total)
    if File:
        save_to_file(File, Format or "%.12f %e", grid, k_np)
    return grid, k_np


def _make_driver(profile, hapi_name, ref_line):
    def driver(Components=None, SourceTables=None, partitionFunction=None,
               Environment=None, OmegaRange=None, OmegaStep=None,
               OmegaWing=None, IntensityThreshold=0.0, OmegaWingHW=50.0,
               GammaL="gamma_air", HITRAN_units=True, LineShift=True,
               File=None, Format=None, OmegaGrid=None, WavenumberRange=None,
               WavenumberStep=None, WavenumberWing=None,
               WavenumberWingHW=None, WavenumberGrid=None, Diluent={},
               EnvDependences=None):
        return _abs_coefficient(
            profile, Components, SourceTables, partitionFunction,
            Environment, OmegaRange, OmegaStep, OmegaWing,
            IntensityThreshold, OmegaWingHW, GammaL, HITRAN_units, LineShift,
            File, Format, OmegaGrid, WavenumberRange, WavenumberStep,
            WavenumberWing, WavenumberWingHW, WavenumberGrid, Diluent,
            EnvDependences)

    driver.__name__ = hapi_name
    driver.__doc__ = (
        f"hapi ``{hapi_name}`` (``misc/hapi.py:{ref_line}``): absorption "
        f"coefficient on a uniform grid using the {profile} profile, "
        f"hapi argument conventions and defaults, TPU engine underneath. "
        f"Returns (Wavenum, Xsect).")
    return driver


absorptionCoefficient_Voigt = _make_driver("voigt", "absorptionCoefficient_Voigt", 10906)
absorptionCoefficient_SDVoigt = _make_driver("sdvoigt", "absorptionCoefficient_SDVoigt", 10657)
absorptionCoefficient_Lorentz = _make_driver("lorentz", "absorptionCoefficient_Lorentz", 11144)
absorptionCoefficient_Doppler = _make_driver("doppler", "absorptionCoefficient_Doppler", 11384)
absorptionCoefficient_HT = _make_driver("ht", "absorptionCoefficient_HT", 10302)

#: hapi alias (``misc/hapi.py:11560``)
absorptionCoefficient_Gauss = absorptionCoefficient_Doppler


def _abscoef_alias(driver, hapi_name, ref_line):
    """Legacy ``abscoef*`` shortcut (hapi ``misc/hapi.py:11563-11578``):
    positional (table, step, grid, env, file) -> keyword driver call."""

    def alias(table=None, step=None, grid=None, env=None, file=None):
        return driver(SourceTables=table, OmegaStep=step, OmegaGrid=grid,
                      Environment=env if env is not None
                      else {"T": 296.0, "p": 1.0},
                      File=file)

    alias.__name__ = hapi_name
    alias.__doc__ = (f"Legacy shortcut for ``{driver.__name__}`` "
                     f"(hapi ``{hapi_name}``, ``misc/hapi.py:{ref_line}``).")
    return alias


abscoef_HT = _abscoef_alias(absorptionCoefficient_HT, "abscoef_HT", 11563)
abscoef_Voigt = _abscoef_alias(absorptionCoefficient_Voigt, "abscoef_Voigt",
                               11566)
abscoef_Lorentz = _abscoef_alias(absorptionCoefficient_Lorentz,
                                 "abscoef_Lorentz", 11569)
abscoef_Doppler = _abscoef_alias(absorptionCoefficient_Doppler,
                                 "abscoef_Doppler", 11572)
abscoef_Gauss = abscoef_Doppler  # hapi ``misc/hapi.py:11575``
#: hapi's bare ``abscoef`` default is the LORENTZ driver (``:11577``)
abscoef = _abscoef_alias(absorptionCoefficient_Lorentz, "abscoef", 11577)


def read_hotw(filename):
    """Read a two-column (nu, coef) cross-section text file as fetched from
    HITRAN-on-the-Web (hapi ``read_hotw``, ``misc/hapi.py:11711``); lines
    that do not parse as two floats are skipped, as there."""
    nu, coef = [], []
    with open(filename) as f:
        for line in f:
            parts = line.split()
            try:
                v, c = float(parts[0]), float(parts[1])
            except (ValueError, IndexError):
                continue
            nu.append(v)
            coef.append(c)
    return np.asarray(nu), np.asarray(coef)


#: hapi backwards-compatibility alias (``misc/hapi.py:11734``)
read_xsect = read_hotw


# ===========================================================================
# Spectra + slit convolution (misc/hapi.py:11582-11900)
# ===========================================================================

def transmittanceSpectrum(Omegas, AbsorptionCoefficient, Environment=None,
                          File=None, Format="%e %e", Wavenumber=None):
    """Beer-Lambert transmittance (hapi ``transmittanceSpectrum``,
    ``misc/hapi.py:11582``)."""
    if Wavenumber is not None:
        Omegas = Wavenumber
    path = float((Environment or {}).get("l", 100.0))
    out = np.asarray(_spec.transmittance_spectrum(Omegas,
                                                  AbsorptionCoefficient,
                                                  path_cm=path))
    if File:
        save_to_file(File, Format, Omegas, out)
    return np.asarray(Omegas), out


def absorptionSpectrum(Omegas, AbsorptionCoefficient, Environment=None,
                       File=None, Format="%e %e", Wavenumber=None):
    """hapi ``absorptionSpectrum`` (``misc/hapi.py:11613``)."""
    if Wavenumber is not None:
        Omegas = Wavenumber
    path = float((Environment or {}).get("l", 100.0))
    out = np.asarray(_spec.absorption_spectrum(Omegas, AbsorptionCoefficient,
                                               path_cm=path))
    if File:
        save_to_file(File, Format, Omegas, out)
    return np.asarray(Omegas), out


def radianceSpectrum(Omegas, AbsorptionCoefficient, Environment=None,
                     File=None, Format="%e %e", Wavenumber=None):
    """Single-temperature radiance [W/sr/cm^2/cm^-1]
    (hapi ``radianceSpectrum``, ``misc/hapi.py:11644``)."""
    if Wavenumber is not None:
        Omegas = Wavenumber
    env = {"l": 100.0, "T": 296.0}
    env.update(Environment or {})
    out = np.asarray(_spec.radiance_spectrum(
        Omegas, AbsorptionCoefficient, path_cm=float(env["l"]),
        T=float(env["T"])))
    if File:
        save_to_file(File, Format, Omegas, out)
    return np.asarray(Omegas), out


SLIT_RECTANGULAR = _spec.HAPI_SLITS["rectangular"]
SLIT_TRIANGULAR = _spec.HAPI_SLITS["triangular"]
SLIT_GAUSSIAN = _spec.HAPI_SLITS["gaussian"]
SLIT_DISPERSION = _spec.HAPI_SLITS["dispersion"]
SLIT_COSINUS = _spec.HAPI_SLITS["cosinus"]
SLIT_DIFFRACTION = _spec.HAPI_SLITS["diffraction"]
SLIT_MICHELSON = _spec.HAPI_SLITS["michelson"]


def convolveSpectrum(Omega, CrossSection, Resolution=0.1, AF_wing=10.0,
                     SlitFunction=SLIT_RECTANGULAR, Wavenumber=None,
                     CrossSectionV=None):
    """Slit convolution, edge-trimmed (hapi ``convolveSpectrum``,
    ``misc/hapi.py:11826``). Returns (omega, y, i_low, i_high, slit)."""
    if Wavenumber is not None:
        Omega = Wavenumber
    if CrossSectionV is not None:
        CrossSection = CrossSectionV
    om, y, i1, i2, slit = _spec.convolve_spectrum(
        Omega, CrossSection, resolution=Resolution, af_wing=AF_wing,
        slit=SlitFunction)
    return om, np.asarray(y), i1, i2, np.asarray(slit)


def convolveSpectrumSame(Omega, CrossSection, Resolution=0.1, AF_wing=10.0,
                         SlitFunction=SLIT_RECTANGULAR):
    """'same'-mode slit convolution, no trim (hapi ``convolveSpectrumSame``,
    ``misc/hapi.py:11868``)."""
    Omega = np.asarray(Omega, dtype=np.float64)
    y = np.asarray(CrossSection, dtype=np.float64)
    step = float(Omega[1] - Omega[0])
    x = arange_(-AF_wing, AF_wing + step, step)
    w = np.asarray(SlitFunction(x, Resolution), dtype=np.float64)
    w = w / (w.sum() * step)
    return Omega, np.convolve(y, w, mode="same") * step, 0, len(Omega), w


def convolveSpectrumFull(Omega, CrossSection, Resolution=0.1, AF_wing=10.0,
                         SlitFunction=SLIT_RECTANGULAR):
    """'full'-mode slit convolution (hapi ``convolveSpectrumFull``,
    ``misc/hapi.py:11886``)."""
    Omega = np.asarray(Omega, dtype=np.float64)
    y = np.asarray(CrossSection, dtype=np.float64)
    step = float(Omega[1] - Omega[0])
    x = arange_(-AF_wing, AF_wing + step, step)
    w = np.asarray(SlitFunction(x, Resolution), dtype=np.float64)
    w = w / (w.sum() * step)
    return Omega, np.convolve(y, w, mode="full") * step, None, None, w


def getHelp(arg=None):
    """hapi-style interactive help (``misc/hapi.py:4987``)."""
    from .utils.help import get_help

    get_help(arg)


# ===========================================================================
# Remaining documented hapi surface: table aliases, the filter/selectInto
# verbs, the TIPS internals, the bare HTP profile, and the tutorial printers
# (misc/hapi.py:2313,2526,3216,5186,5311,9568,9850,3519-4006)
# ===========================================================================

def getTableList():
    """hapi ``getTableList`` (``misc/hapi.py:2313``) — same as
    :func:`tableList`."""
    return tableList()


def describe(TableName):
    """hapi ``describe`` (``misc/hapi.py:5186``) — same summary as
    :func:`describeTable`."""
    describeTable(TableName)


def length(TableName):
    """Row count of a table (hapi ``length``, ``misc/hapi.py:2557``)."""
    return _get_table(TableName).n_lines


def filter(TableName, Conditions):  # noqa: A001 — hapi's own name
    """hapi ``filter`` (``misc/hapi.py:3216``): ``select`` with output
    suppressed, result into the buffer table."""
    select(TableName=TableName, Conditions=Conditions, Output=False)


def selectInto(DestinationTableName, TableName, ParameterNames, Conditions):
    """hapi ``selectInto`` (``misc/hapi.py:2526``): select into a named
    destination table, **appending** if it already exists (hapi does
    ``number_of_rows += row_count``, ``:2555``).

    Divergences: tables are fixed-schema :class:`LineStore` arrays, so
    ``ParameterNames`` does not project columns (all line-parameter columns
    are kept), and rows stay nu-sorted rather than in insertion order.
    """
    store = _get_table(TableName)
    out = _query.select(store, Conditions) if Conditions is not None else store
    if DestinationTableName in _TABLES:
        import jax as _jax

        prev = _TABLES[DestinationTableName]
        cat = _jax.tree.map(
            lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]),
            prev, out)
        order = np.argsort(np.asarray(cat.nu0), kind="stable")
        # subset() keeps nu0 as host float64 through the reorder
        out = cat.subset(order)
    _register(DestinationTableName, out)
    return out


def AtoB(aa, A, B, npt):
    """Lagrange 3-/4-point interpolation of the tabulated map A -> B at
    ``aa`` (hapi ``AtoB``, ``misc/hapi.py:5311``; the TIPS-2011
    interpolator): 3-point at the table edges (I < 3 or I == npt), 4-point
    in the interior. Vectorized over ``aa``."""
    A = np.asarray(A, dtype=np.float64)[:npt]
    B = np.asarray(B, dtype=np.float64)[:npt]
    scalar = np.ndim(aa) == 0
    aa = np.atleast_1d(np.asarray(aa, dtype=np.float64))
    i = np.searchsorted(A, aa, side="left") + 1          # hapi's 1-based I
    edge = (i < 3) | (i >= npt)
    j3 = np.clip(i, 3, npt) - 1                          # 3-point J (0-based)
    x0, x1, x2 = A[j3 - 2], A[j3 - 1], A[j3]
    bb3 = (B[j3 - 2] * (aa - x1) * (aa - x2) / ((x0 - x1) * (x0 - x2))
           + B[j3 - 1] * (aa - x0) * (aa - x2) / ((x1 - x0) * (x1 - x2))
           + B[j3] * (aa - x0) * (aa - x1) / ((x2 - x0) * (x2 - x1)))
    j4 = np.clip(i, 3, npt - 1) - 1                      # 4-point J (0-based)
    xs = [A[j4 - 2], A[j4 - 1], A[j4], A[j4 + 1]]
    ys = [B[j4 - 2], B[j4 - 1], B[j4], B[j4 + 1]]
    bb4 = np.zeros_like(aa)
    for k in range(4):
        term = ys[k]
        for m in range(4):
            if m != k:
                term = term * (aa - xs[m]) / (xs[k] - xs[m])
        bb4 = bb4 + term
    bb = np.where(edge, bb3, bb4)
    return float(bb[0]) if scalar else bb


def BD_TIPS_2011_PYTHON(M, I, T):
    """TIPS-2011 (gi, Q(T)) for one isotopologue (hapi
    ``BD_TIPS_2011_PYTHON``, ``misc/hapi.py:9568``), with its 70-3000 K
    range check."""
    T = float(T)
    if T < 70.0 or T > 3000.0:
        raise Exception("TIPS: T must be between 70K and 3000K.")
    try:
        row = _tips.iso_row_index()[(int(M), int(I))]
    except KeyError:
        # hapi's diagnostic for unknown isotopologues (misc/hapi.py:9579-9580)
        raise Exception("TIPS: no data for M,I = %d,%d." % (int(M), int(I)))
    _m, _i, gsi, q = _tips.load_tips_tables()
    return float(gsi[row]), PYTIPS(M, I, T)


def pcqsdhc(sg0, GamD, Gam0, Gam2, Shift0, Shift2, anuVC, eta, sg):
    """The bare pCqSDHC profile -> (Re, Im) (hapi ``pcqsdhc``,
    ``misc/hapi.py:9850``); same as :func:`PROFILE_HT`."""
    return _htp.pcqsdhc(sg0, GamD, Gam0, Gam2, Shift0, Shift2, anuVC, eta, sg)


def _print_help_section(title, names):
    print(title)
    print("-" * len(title))
    for n in names:
        print(f"  {n}")
    print("Use getHelp(<name>) for details.")


def print_profiles():
    """Profile overview (hapi ``print_profiles``, ``misc/hapi.py:3519``)."""
    _print_help_section(
        "Line-shape profiles (all jit/vmap-capable, TPU-backed):",
        ["PROFILE_HT", "PROFILE_SDRAUTIAN", "PROFILE_RAUTIAN",
         "PROFILE_SDVOIGT", "PROFILE_VOIGT", "PROFILE_LORENTZ",
         "PROFILE_DOPPLER", "pcqsdhc"])


def print_slit_functions():
    """Slit-function overview (hapi ``print_slit_functions``)."""
    _print_help_section(
        "Instrument slit functions (for convolveSpectrum):",
        ["SLIT_RECTANGULAR", "SLIT_TRIANGULAR", "SLIT_GAUSSIAN",
         "SLIT_DISPERSION", "SLIT_COSINUS", "SLIT_DIFFRACTION",
         "SLIT_MICHELSON"])


def print_data_tutorial():
    """Database-layer overview (hapi ``print_data_tutorial``)."""
    _print_help_section(
        "Local database verbs (directory of .data/.header/.par tables):",
        ["db_begin", "db_commit", "fetch", "fetch_by_ids", "tableList",
         "describeTable", "select", "selectInto", "filter", "sort", "group",
         "getColumn", "getColumns", "extractColumns", "dropTable",
         "save_to_file"])


def print_spectra_tutorial():
    """Spectra-layer overview (hapi ``print_spectra_tutorial``)."""
    _print_help_section(
        "Absorption/spectra pipeline:",
        ["absorptionCoefficient_Voigt (and _SDVoigt/_HT/_Lorentz/_Doppler)",
         "transmittanceSpectrum", "absorptionSpectrum", "radianceSpectrum",
         "convolveSpectrum", "getStickXY"])


def print_plotting_tutorial():
    """Plotting pointer (hapi ``print_plotting_tutorial``)."""
    print("Plot with matplotlib: nu, k = absorptionCoefficient_Voigt(...);\n"
          "plt.plot(nu, k). getStickXY(table) gives stick-spectrum polylines.")


def print_python_tutorial():
    """Python pointer (hapi ``print_python_tutorial``)."""
    print("All functions return numpy arrays; the engines underneath are\n"
          "jax-jitted and run on TPU. See MIGRATION.md for the native API.")
