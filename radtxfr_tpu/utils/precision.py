"""Numeric-precision guards."""

from __future__ import annotations

import functools

__all__ = ["f32_matmuls"]


def f32_matmuls(fn):
    """Trace-time guard: full float32 matmuls inside ``fn``.

    The TPU matmul default truncates operands to bfloat16 (~1e-3 relative)
    — acceptable for NN training, not for parity surfaces or small-matrix
    statistics. Applied to the scene-model entry points (PCA/GMM/ICA/NMF/
    B-spline) and usable on any function whose matmuls must stay exact.
    """
    import jax

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)
    return wrapped
