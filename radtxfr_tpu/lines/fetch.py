"""HITRAN online fetch (hapi ``fetch``/``fetch_by_ids`` equivalent).

Builds the same ``/lbl/api`` query URLs as the reference
(``queryHITRAN``, ``misc/hapi.py:3118-3168``) and parses the returned
``.par``-formatted payload into a :class:`LineStore`. Network access is
optional and failure-isolated: in air-gapped environments (like this
build's zero-egress container) the URL builder still works and the download
raises a clear error instead of hanging.
"""

from __future__ import annotations

import functools
import os
import urllib.parse
import urllib.request

from .store import LineStore, parse_par
from .tips import load_tips_tables

__all__ = ["build_query_url", "fetch_by_ids", "fetch"]

HITRAN_HOST = "http://hitran.org"


@functools.lru_cache(maxsize=1)
def _registry_lut():
    import os
    import numpy as np

    with np.load(os.path.join(os.path.dirname(__file__), "..", "data",
                              "iso_registry.npz")) as f:
        return {(int(m), int(i)): int(g)
                for m, i, g in zip(f["mol"], f["iso"], f["global_id"])}


def _global_ids(mol_id: int, iso_ids) -> list[int]:
    """Map (molecule, local iso) to HITRAN global isotopologue ids."""
    lut = _registry_lut()
    return [lut[(mol_id, int(i))] for i in iso_ids]


def build_query_url(global_iso_ids, nu_min: float, nu_max: float,
                    host: str = HITRAN_HOST) -> str:
    """The reference's lbl/api GET URL (``misc/hapi.py:3130-3144``)."""
    # the old-fashioned .par search (misc/hapi.py:3136-3140): NO
    # head/fixwidth/sep flags — those belong to the custom request_params
    # branch and would switch the payload to comma-separated rows that the
    # fixed-column .par parser cannot read.
    params = {
        "iso_ids_list": ",".join(str(int(i)) for i in global_iso_ids),
        "numin": float(nu_min),
        "numax": float(nu_max),
    }
    return f"{host}/lbl/api?{urllib.parse.urlencode(params)}"


def fetch_by_ids(global_iso_ids, nu_min: float, nu_max: float,
                 timeout: float = 60.0, host: str = HITRAN_HOST) -> LineStore:
    """Download lines for explicit global isotopologue ids."""
    url = build_query_url(global_iso_ids, nu_min, nu_max, host=host)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            text = r.read().decode()
    except OSError as e:
        raise ConnectionError(
            f"HITRAN fetch failed ({e}); in offline environments load lines "
            f"from a .par file (lines.parse_par) or hapi table "
            f"(lines.hapi_db) instead"
        ) from e
    return parse_par(text.splitlines())


def fetch(mol_id: int, iso_ids, nu_min: float, nu_max: float, **kw) -> LineStore:
    """hapi ``fetch`` analog: molecule number + local isotopologue list."""
    return fetch_by_ids(_global_ids(mol_id, iso_ids), nu_min, nu_max, **kw)
