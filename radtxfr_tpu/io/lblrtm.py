"""LBLRTM file interop: TAPE12 OD reader/writer and TAPE5 deck writer.

The TPU framework does not run LBLRTM (its line-by-line engine replaces it),
but users migrating from the reference hold TAPE12 archives and may still
drive LBLRTM elsewhere; these utilities keep that interop:

* :func:`read_tape12` — parses the single-precision little-endian
  Fortran-unformatted OD panel stream (format per
  ``radiative_transfer.py:730-789``: 266 x int32 header, then repeated
  records ``[reclen][v1:f64 v2:f64 dv:f32 n:i4][reclen] [len][payload
  n x f32][len]``), reconstructing the wavenumber axis per panel.
* :func:`write_tape12` — emits the same panel structure (new here; enables
  round-trip tests and producing LBLRTM-compatible OD files from the TPU
  engine).
* :func:`write_tape5` — the single-layer OD-mode punch-card deck with the
  reference's control-record settings (Voigt, LBLF4, user continuum scale
  factors, LBLATM horizontal path; ``radiative_transfer.py:504-727``) and
  its per-species continuum-flag defaulting (``:591-601``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_tape12", "write_tape12", "write_tape5", "HITRAN_MOLECULES"]

#: HITRAN molecule order used by TAPE5 record 3.6 (radiative_transfer.py:539-578)
HITRAN_MOLECULES = (
    "H2O", "CO2", "O3", "N2O", "CO", "CH4", "O2", "NO", "SO2", "NO2",
    "NH3", "HNO3", "OH", "HF", "HCl", "HBr", "HI", "ClO", "OCS", "H2CO",
    "HOCl", "N2", "HCN", "CH3Cl", "H2O2", "C2H2", "C2H6", "PH3", "COF2",
    "SF6", "H2S", "HCOOH", "HO2", "O+", "ClONO2", "NO+", "HOBr", "C2H4",
)


def read_tape12(fname: str = "TAPE12"):
    """Parse an LBLRTM OD TAPE12 file -> (nu, od) float64/float32 arrays."""
    with open(fname, "rb") as f:
        raw = f.read()
    off = 266 * 4
    v1s, v2s, ns, chunks = [], [], [], []
    total = len(raw)
    while off < total:
        reclen = int(np.frombuffer(raw, "<i4", 1, off)[0])
        if reclen != 24:
            raise ValueError(f"unexpected panel-header record length {reclen}")
        off += 4
        v1 = float(np.frombuffer(raw, "<f8", 1, off)[0]); off += 8
        v2 = float(np.frombuffer(raw, "<f8", 1, off)[0]); off += 8
        off += 4  # dv: f32 (axis rebuilt from v1/v2/n, like the reference)
        n = int(np.frombuffer(raw, "<i4", 1, off)[0]); off += 4
        off += 4  # trailing record length
        if n <= 0:
            # real LBLRTM archives terminate with an NLIM = -99 marker panel
            break
        l1 = int(np.frombuffer(raw, "<i4", 1, off)[0]); off += 4
        if l1 != n * 4:
            raise ValueError(f"panel payload length {l1} != 4*{n}")
        chunks.append(np.frombuffer(raw, "<f4", n, off)); off += n * 4
        l2 = int(np.frombuffer(raw, "<i4", 1, off)[0]); off += 4
        if l2 != l1:
            raise ValueError("inconsistent panel record lengths")
        v1s.append(v1); v2s.append(v2); ns.append(n)
    nu = np.concatenate([np.linspace(a, b, n) for a, b, n in zip(v1s, v2s, ns)]) \
        if ns else np.array([])
    od = np.concatenate(chunks) if chunks else np.array([], np.float32)
    return nu, od


def write_tape12(fname: str, nu, od, panel_size: int = 2400) -> None:
    """Write (nu, od) as an LBLRTM-compatible TAPE12 panel stream."""
    nu = np.asarray(nu, dtype=np.float64)
    od = np.asarray(od, dtype=np.float32)
    with open(fname, "wb") as f:
        np.zeros(266, dtype="<i4").tofile(f)
        for s in range(0, nu.size, panel_size):
            seg_nu = nu[s:s + panel_size]
            seg_od = od[s:s + panel_size]
            n = seg_nu.size
            dv = (seg_nu[-1] - seg_nu[0]) / (n - 1) if n > 1 else 0.0
            np.array([24], "<i4").tofile(f)
            np.array([seg_nu[0], seg_nu[-1]], "<f8").tofile(f)
            np.array([dv], "<f4").tofile(f)
            np.array([n], "<i4").tofile(f)
            np.array([24], "<i4").tofile(f)
            np.array([n * 4], "<i4").tofile(f)
            seg_od.astype("<f4").tofile(f)
            np.array([n * 4], "<i4").tofile(f)


def default_continuum_factors(mf: np.ndarray, cf=None,
                              override: bool = False) -> np.ndarray:
    """Per-species continuum scale-factor defaulting
    (radiative_transfer.py:591-601): enable H2O self+foreign, CO2, O3, O2,
    N2 continua only for species present in the mixture."""
    cf = np.zeros(7) if cf is None else np.asarray(cf, dtype=float).copy()
    if not override:
        if mf[0] > 0:
            cf[0] = cf[1] = 1
        if mf[1] > 0:
            cf[2] = 1
        if mf[2] > 0:
            cf[3] = 1
        if mf[6] > 0:
            cf[4] = 1
        if mf[21] > 0:
            cf[5] = 1
    return cf


def write_tape5(
    fname: str,
    v1: float,
    v2: float,
    T: float = 296.0,
    P_pa: float = 101325.0,
    PL_km: float = 1.0,
    mf_ppmv=None,
    mf_ids=None,
    dvout: float = 0.0025,
    continuum_factors=None,
    continuum_override: bool = False,
    description: str = "TAPE5 single-layer OD (radtxfr_tpu interop)",
) -> None:
    """Write a single-layer OD-mode TAPE5 deck (LBLRTM punch-card format).

    Control settings match the reference's OD configuration
    (``radiative_transfer.py:619-656``): Voigt (HI=1), line-by-line F4,
    user-supplied continuum scale factors (CN=6), OD-only (EM=0), LBLATM
    user-defined single homogeneous layer.
    """
    mf = np.zeros(len(HITRAN_MOLECULES))
    if mf_ids is not None and mf_ppmv is not None:
        for mid, val in zip(np.asarray(mf_ids).ravel(), np.asarray(mf_ppmv).ravel()):
            mf[int(mid) - 1] = val
    cf = default_continuum_factors(mf, continuum_factors, continuum_override)

    cards = [description]
    cards.append("         1         2         3         4         5"
                 "         6         7         8         9         0")
    cards.append("123456789 " * 11)
    cards.append("$ None")
    # Record 1.2: control flags for a single-layer OD run
    cards.append(
        " HI=1 F4=1 CN=6 AE=0 EM=0 SC=0 FI=0 PL=0 TS=0 AM=1 MG=0 LA=0 MS=1"
        " XS=0   0   0"
    )
    # Record 1.2a: continuum scale factors
    cards.append((len(cf) * "{:8.6f} ").format(*cf).rstrip())
    # Record 1.3: spectral range
    rec = 8 * "{:10.3f}" + "    {:1d}     {:10.3E}   {:2d}"
    cards.append(rec.format(v1, v2, 4, 0, 0.04, 36, 0, 0, 0, dvout, 0))
    # Record 3.1: LBLATM, user model, horizontal path
    cards.append((5 * "{:5d}").format(0, 1, 0, 0, 0, len(mf)))
    # Record 3.2: path length
    cards.append("{:10.3E}                    {:10.3E}".format(0, PL_km))
    # Record 3.4
    cards.append("    1 (1 homogeneous layer)")
    # Record 3.5: thermodynamic state (atm, degC)
    cards.append(
        "{0:10.3E}{1:10.3E}{2:10.3E}     BB L {3}".format(
            0, P_pa / 101325.0, T - 273.15, "A" * 39
        )
    )
    # Record 3.6: species columns, 8 per card
    for s in range(0, len(mf), 8):
        row = mf[s:s + 8]
        cards.append((len(row) * "{:15.8E}").format(*row))
    cards.append(r"%%")
    with open(fname, "w") as f:
        f.write("\n".join(cards))
