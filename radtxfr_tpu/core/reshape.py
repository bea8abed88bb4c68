"""Array shape utilities (spectral-axis-first convention).

jnp equivalents of the reference's ``rs1D``/``rs2D``/``rsND``
(``radiative_transfer.py:186-248``): collapse trailing dimensions for 2-D
batched spectral math, restore afterwards. All shape information is static,
so these are jit-safe.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["rs1d", "rs2d", "rsnd"]


def rs1d(y):
    """Flatten to 1-D; return (flat, original_shape)."""
    y = jnp.asarray(y)
    return y.reshape(-1), y.shape


def rs2d(y):
    """Collapse to 2-D with the spectral (first) axis preserved.

    1-D/0-D inputs become a row vector, matching ``rs2D``
    (``radiative_transfer.py:222-225``).
    """
    y = jnp.asarray(y)
    if y.ndim < 2:
        y = y.reshape(1, -1)
        return y, y.shape
    dims = y.shape
    return y.reshape(dims[0], int(np.prod(dims[1:]))), dims


def rsnd(y, dims):
    """Restore an array collapsed by :func:`rs1d`/:func:`rs2d`."""
    return jnp.asarray(y).reshape(dims)
