#!/usr/bin/env python
"""Extract physical/instrument DATA tables from the reference into .npz files.

This pulls *data* (not code) out of the read-only reference checkout:

* TIPS-2011 partition-sum tables (144 isotopologues x 119 temperatures) and
  the isotopologue registry (id, abundance, molar mass, names) from hapi
  (``misc/hapi.py:5393-9564``, ``:3372``). These are published HITRAN/TIPS
  physical data (Laraia et al., Icarus 215 (2011) 391-400).
* The 1976 US Standard Atmosphere 66-layer table
  (``/root/reference/StandardAtmosphere.csv``; also embedded at
  ``radiative_transfer.py:75-146``).
* The MAKO 128-channel wavelength axis (``radiative_transfer.py:1092-1223``)
  — instrument calibration data.

Run from the repo root:  python tools/extract_refdata.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "radtxfr_tpu", "data")


def extract_tips_and_iso():
    sys.path.insert(0, os.path.join(REF, "misc"))
    import hapi  # noqa: E402  (reference module used as a data source only)

    keys = sorted(hapi.TIPS_ISO_HASH.keys())
    n = len(keys)
    npt = int(hapi.TIPS_NPT)
    mol = np.array([k[0] for k in keys], dtype=np.int32)
    iso = np.array([k[1] for k in keys], dtype=np.int32)
    gsi = np.array([hapi.TIPS_GSI_HASH[k] for k in keys], dtype=np.float64)
    q = np.zeros((n, npt), dtype=np.float64)
    for i, k in enumerate(keys):
        q[i] = np.asarray(hapi.TIPS_ISO_HASH[k], dtype=np.float64)
    tdat = np.asarray(hapi.Tdat, dtype=np.float64)

    # isotopologue registry: (M, I) -> [global id, iso_name, abundance, mass, mol_name]
    iso_keys = sorted(k for k in hapi.ISO.keys())
    reg_mol = np.array([k[0] for k in iso_keys], dtype=np.int32)
    reg_iso = np.array([k[1] for k in iso_keys], dtype=np.int32)
    reg_gid = np.array([hapi.ISO[k][0] for k in iso_keys], dtype=np.int32)
    reg_abundance = np.array([hapi.ISO[k][2] for k in iso_keys], dtype=np.float64)
    reg_mass = np.array([hapi.ISO[k][3] for k in iso_keys], dtype=np.float64)
    reg_iso_name = np.array([hapi.ISO[k][1] for k in iso_keys])
    reg_mol_name = np.array([hapi.ISO[k][4] for k in iso_keys])

    np.savez_compressed(
        os.path.join(OUT, "tips2011.npz"),
        tdat=tdat,
        mol=mol,
        iso=iso,
        gsi=gsi,
        q=q,
    )
    np.savez_compressed(
        os.path.join(OUT, "iso_registry.npz"),
        mol=reg_mol,
        iso=reg_iso,
        global_id=reg_gid,
        abundance=reg_abundance,
        molar_mass=reg_mass,
        iso_name=reg_iso_name,
        mol_name=reg_mol_name,
    )
    print(f"TIPS: {n} isotopologues x {npt} temperatures")
    print(f"ISO registry: {len(iso_keys)} entries")


def extract_std_atmosphere():
    src = os.path.join(REF, "StandardAtmosphere.csv")
    table = np.loadtxt(src, delimiter=",", skiprows=1)
    header = open(src).readline().strip()
    np.savez_compressed(
        os.path.join(OUT, "std_atmosphere_1976.npz"),
        table=table,
        header=np.array(header),
    )
    print(f"StdAtmos: {table.shape}")


def extract_mako_axis():
    # Parse the hard-coded wavelength literals inside ILS_MAKO
    # (radiative_transfer.py:1092-1223) without importing the module
    # (it needs matplotlib/LBLRTM paths).
    text = open(os.path.join(REF, "radiative_transfer.py")).read()
    m = re.search(r"# MAKO spectral axis in µm\s*\n\s*X_out = np\.array\(\s*\[(.*?)\]\s*\)",
                  text, re.S)
    vals = np.array([float(v) for v in re.findall(r"\d+\.\d+", m.group(1))])
    assert vals.size == 128, vals.size
    np.save(os.path.join(OUT, "mako_channels_um.npy"), vals)
    print(f"MAKO axis: {vals.size} channels, {vals[0]}–{vals[-1]} µm")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    extract_tips_and_iso()
    extract_std_atmosphere()
    extract_mako_axis()
