"""Surface emissivity database: ingest, resampling, mixtures.

Re-expresses the reference's emissivity data layer (L3):

* ``Generate_ASTER_emissivity_DB.py`` — per-material reflectance ->
  emissivity (eps = 1 - R), µm -> cm^-1 with sort/trim/dedup, cubic resample
  onto a common axis, clamp to [0, 1] (``:81-117``);
* ``Generate_Emissivity_DB.py`` — pairwise linear mixtures over a fraction
  grid with tolerance clamping (``:23-46``).

The ASTER 2.0 SQLite payload itself is licensed data the repo cannot ship;
:func:`synthetic_db` generates physically-plausible LWIR emissivities
(Lorentzian reststrahlen dips on a high-emissivity continuum) for tests,
demos and benchmarks, and :func:`EmissivityDB.from_spectra` ingests real
ASTER exports when the user has them.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..sensor.resolution import apply_resample, cubic_resample_weights

__all__ = ["EmissivityDB", "synthetic_db", "save_db", "load_db",
           "read_aster_export", "load_aster_dir"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmissivityDB:
    """A set of surface emissivity spectra on a common wavenumber axis."""

    X: jax.Array       # (nX,) wavenumber axis [cm^-1]
    emis: jax.Array    # (nE, nX) emissivities in [0, 1]
    material_id: jax.Array  # (nE,) integer material ids
    names: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def n_materials(self) -> int:
        return int(self.emis.shape[0])

    @staticmethod
    def from_spectra(spectra, X_out, reflectance: bool = False, names=(),
                     wavelength_um: bool = False) -> "EmissivityDB":
        """Build a DB from per-material (x, y) spectra.

        Mirrors the ASTER ingest steps (``Generate_ASTER_emissivity_DB.py:81-117``):
        optional reflectance->emissivity, µm->cm^-1 conversion, sort + dedup,
        cubic resample onto ``X_out``, clamp to [0, 1].
        """
        X_out = np.asarray(X_out, dtype=np.float64)
        rows = []
        for x, y in spectra:
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            if reflectance:
                y = 1.0 - y / 100.0 if y.max() > 1.5 else 1.0 - y
            if wavelength_um:
                x = 10000.0 / x
            order = np.argsort(x)
            x, y = x[order], y[order]
            keep = np.concatenate([[True], np.diff(x) > 0])
            x, y = x[keep], y[keep]
            idx, w = cubic_resample_weights(x, X_out)
            rows.append(np.clip(np.asarray(apply_resample(idx, w, jnp.asarray(y))), 0.0, 1.0))
        emis = np.stack(rows)
        return EmissivityDB(
            X=jnp.asarray(X_out),
            emis=jnp.asarray(emis),
            material_id=jnp.arange(emis.shape[0], dtype=jnp.int32),
            names=tuple(names) if names else tuple(f"material_{i}" for i in range(emis.shape[0])),
        )

    def resample(self, X_new) -> "EmissivityDB":
        X_new = np.asarray(X_new, dtype=np.float64)
        idx, w = cubic_resample_weights(np.asarray(self.X, dtype=np.float64), X_new)
        emis = jnp.clip(apply_resample(idx, w, self.emis.T).T, 0.0, 1.0)
        return dataclasses.replace(self, X=jnp.asarray(X_new), emis=emis)

    def pairwise_mixtures(self, n_fractions: int = 11, tol: float = 1e-3) -> "EmissivityDB":
        """All unordered material pairs mixed at a uniform fraction grid.

        Reference: ``Generate_Emissivity_DB.py:23-46`` (11 fractions,
        tolerance clamp to [tol, 1 - tol]).
        """
        n = self.n_materials
        fr = np.linspace(0.0, 1.0, n_fractions)
        ii, jj = np.triu_indices(n, k=1)
        e = np.asarray(self.emis)
        mixes = (fr[None, :, None] * e[ii][:, None, :]
                 + (1.0 - fr[None, :, None]) * e[jj][:, None, :])
        mixes = np.clip(mixes.reshape(-1, e.shape[1]), tol, 1.0 - tol)
        return EmissivityDB(
            X=self.X,
            emis=jnp.asarray(mixes),
            material_id=jnp.arange(mixes.shape[0], dtype=jnp.int32),
            names=(),
        )


def save_db(db: EmissivityDB, basename: str) -> None:
    """Export an emissivity DB the way the reference does
    (``Generate_ASTER_emissivity_DB.py:123-170``): NPZ + HDF5 with units
    metadata + a CSV material-label map."""
    import csv

    import numpy as np

    from ..io.h5 import Var, write_h5

    X = np.asarray(db.X)
    emis = np.asarray(db.emis)
    ids = np.asarray(db.material_id)
    np.savez(basename + ".npz", X=X, emis=emis, material_ID=ids)
    write_h5(basename + ".h5", {
        "X": Var(X, units="cm^{-1}", name="Wavenumbers"),
        "emis": Var(emis, units="none", name="Emissivity",
                    info="(n_materials, nX), 0 <= emis <= 1"),
        "material_ID": Var(ids, units="none", name="Material ID"),
    })
    with open(basename + ".csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["material_ID", "name"])
        names = db.names or tuple(f"material_{i}" for i in range(db.n_materials))
        for i, name in zip(ids.tolist(), names):
            w.writerow([i, name])


def load_db(basename: str) -> EmissivityDB:
    """Load a DB written by :func:`save_db` (or the reference's NPZ layout,
    cf. ``LWIR_HSI_Generator.py:86-90``)."""
    import numpy as np

    with np.load(basename + ".npz") as f:
        return EmissivityDB(
            X=jnp.asarray(f["X"]),
            emis=jnp.asarray(f["emis"]),
            material_id=jnp.asarray(f["material_ID"], dtype=jnp.int32),
        )


def synthetic_db(n_materials: int = 24, X=None, seed: int = 0) -> EmissivityDB:
    """Plausible LWIR emissivities: near-unity continuum with reststrahlen dips."""
    if X is None:
        X = np.arange(690.0, 1411.0, 1.0)
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_materials):
        base = rng.uniform(0.88, 0.99)
        e = np.full_like(X, base)
        for _ in range(rng.integers(0, 4)):
            center = rng.uniform(X.min(), X.max())
            width = rng.uniform(10.0, 80.0)
            depth = rng.uniform(0.05, 0.5)
            e = e - depth / (1.0 + ((X - center) / width) ** 2)
        rows.append(np.clip(e, 0.02, 1.0))
    emis = np.stack(rows)
    return EmissivityDB(
        X=jnp.asarray(X),
        emis=jnp.asarray(emis),
        material_id=jnp.arange(n_materials, dtype=jnp.int32),
        names=tuple(f"synthetic_{i}" for i in range(n_materials)),
    )


# ---------------------------------------------------------------------------
# ASTER / ECOSTRESS spectral-library ASCII export ingest
# ---------------------------------------------------------------------------

def read_aster_export(path):
    """Parse one ASTER 2.0 / ECOSTRESS spectral-library ASCII export file.

    The distribution's per-spectrum text format is a ``Key: value`` header
    (Name, Type, Class, Measurement, "X Units: Wavelength (micrometers)",
    "Y Units: Reflectance (percent)", ...) followed by two whitespace- or
    tab-separated columns of (wavelength [µm], reflectance [percent]).
    Returns ``(meta: dict, wavelength_um: ndarray, reflectance_frac:
    ndarray)`` with reflectance converted to [0, 1] fractional values and
    clamped like the reference ingest
    (``Generate_ASTER_emissivity_DB.py:96-101``).
    """
    meta = {}
    xs, ys = [], []
    with open(path, errors="replace") as f:
        for line in f:
            s = line.strip()
            if not s:
                continue
            parts = s.split()
            if len(parts) >= 2:
                try:
                    x, y = float(parts[0]), float(parts[1])
                    xs.append(x)
                    ys.append(y)
                    continue
                except ValueError:
                    pass
            if ":" in s:
                k, _, v = s.partition(":")
                meta[k.strip()] = v.strip()
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    y_units = meta.get("Y Units", "").lower()
    if "percent" in y_units or (y.size and y.max() > 1.5):
        y = y / 100.0
    return meta, x, np.clip(y, 0.0, 1.0)


def load_aster_dir(directory, lambda_min_um: float = 6.75,
                   lambda_max_um: float = 14.5, dX: float = 1.0,
                   pattern: str = "*.txt", coverage_margin_um: float = 0.25):
    """Build an :class:`EmissivityDB` from a directory of ASTER/ECOSTRESS
    export files — the reference's licensed-data workflow
    (``Generate_ASTER_emissivity_DB.py:58-117``) without the
    ``spectral.AsterDatabase`` SQL layer:

    * keep only spectra whose wavelength range covers
      [lambda_min - margin, lambda_max + margin] µm (the reference's
      MinWavelength/MaxWavelength query, ``:66-71``);
    * common axis ``X = linspace(1e4/lambda_max, 1e4/lambda_min,
      int((X_max - X_min)/dX))`` (``:79-80``);
    * percent -> fractional reflectance with [0, 1] clamp, µm -> cm^-1,
      sort/trim/dedup, cubic resample, eps = 1 - R, final clamp
      (``:92-117``) — via :meth:`EmissivityDB.from_spectra`.

    Returns (db, skipped) where ``skipped`` lists files that failed the
    coverage filter or contained no spectrum.
    """
    import glob as _glob

    X_min = 10000.0 / lambda_max_um
    X_max = 10000.0 / lambda_min_um
    X = np.linspace(X_min, X_max, int((X_max - X_min) / dX))

    spectra, names, skipped = [], [], []
    for path in sorted(_glob.glob(os.path.join(directory, pattern))):
        meta, wl, refl = read_aster_export(path)
        if wl.size < 4:
            skipped.append(path)
            continue
        if (wl.min() > lambda_min_um - coverage_margin_um
                or wl.max() < lambda_max_um + coverage_margin_um):
            skipped.append(path)
            continue
        spectra.append((wl, refl))
        names.append(meta.get("Name", os.path.basename(path)))
    if not spectra:
        raise ValueError(
            f"no export files in {directory!r} cover "
            f"[{lambda_min_um - coverage_margin_um}, "
            f"{lambda_max_um + coverage_margin_um}] µm")
    db = EmissivityDB.from_spectra(spectra, X, reflectance=True,
                                   wavelength_um=True, names=names)
    return db, skipped
