"""CPU float64 oracle: the reference's hapi module, imported read-only.

SURVEY.md §4: hapi *is* the available numerical ground truth (LBLRTM is an
LFS stub and not runnable). Tests mirror synthetic line lists into hapi's
LOCAL_TABLE_CACHE and compare the TPU engine against
``absorptionCoefficient_*`` / ``PROFILE_*`` / ``partitionSum`` evaluated in
float64 NumPy. Nothing from the reference is copied into the package —
this module only *imports* it for test-time comparison.
"""

from __future__ import annotations

import sys
import warnings

_REF_MISC = "/root/reference/misc"


def load_hapi():
    if _REF_MISC not in sys.path:
        sys.path.insert(0, _REF_MISC)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        import hapi
    return hapi


def hapi_xsect(store, grid, T, p_atm, diluent=None, profile="Voigt",
               wing_abs=0.0, wing_hw=50.0, table="oracle"):
    """Reference absorption cross-section on an explicit grid [cm^2/molec]."""
    import numpy as np

    from radtxfr_tpu.lines.synthetic import to_hapi_cache

    hapi = load_hapi()
    to_hapi_cache(store, table, hapi)
    fn = getattr(hapi, f"absorptionCoefficient_{profile}")
    # Components: every (M, I) present in the store, natural abundance.
    mols = np.asarray(store.mol_id)
    isos = np.asarray(_local_iso_ids(store))
    comps = sorted(set(zip(mols.tolist(), isos.tolist())))
    kwargs = dict(
        Components=comps,
        SourceTables=table,
        Environment={"T": float(T), "p": float(p_atm)},
        OmegaGrid=np.asarray(grid, dtype=np.float64),
        OmegaWing=float(wing_abs),
        OmegaWingHW=float(wing_hw),
        HITRAN_units=True,
    )
    if profile != "Doppler":  # the Doppler driver has no Diluent machinery
        kwargs["Diluent"] = dict(diluent) if diluent else {}
    nu, k = fn(**kwargs)
    return np.asarray(nu), np.asarray(k)


def _local_iso_ids(store):
    from radtxfr_tpu.lines.tips import load_tips_tables
    import numpy as np

    _, iso, _, _ = load_tips_tables()
    return iso[np.asarray(store.iso_row)]
