"""Device-mesh construction for the (ensemble x spectrum) 2-D layout.

SURVEY.md §2.3: the reference's only parallelism is a 6-process pool over
atmospheres with shared-memory aggregation (``Generate_LWIR_TUD.py:98-149``).
The TPU-native layout is a 2-D logical mesh:

* ``ensemble`` — data-parallel over atmospheric states (DCN-friendly,
  embarrassingly parallel);
* ``spectrum`` — the fine wavenumber grid sharded across devices (the
  sequence/context-parallel analog; line lists are replicated, so each
  spectral shard computes its sub-band exactly — the line-wing halo exchange
  becomes necessary only once lines themselves are sharded).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ENSEMBLE", "SPECTRUM", "P", "pad_axis_to"]

ENSEMBLE = "ensemble"
SPECTRUM = "spectrum"


def make_mesh(n_ensemble: int, n_spectrum: int, devices=None) -> Mesh:
    """A (n_ensemble, n_spectrum) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = n_ensemble * n_spectrum
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(n_ensemble, n_spectrum)
    return Mesh(dev, (ENSEMBLE, SPECTRUM))


def pad_axis_to(x, multiple: int, axis: int = 0, fill=0.0):
    """Pad ``axis`` of ``x`` up to a multiple (for even sharding)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)
