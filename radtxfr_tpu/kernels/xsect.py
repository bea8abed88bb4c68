"""Absorption cross-section / optical-depth spectrum synthesis (jnp engine).

Replaces the serial per-line Python loop of hapi's
``absorptionCoefficient_Voigt`` (``misc/hapi.py:11050-11138``) with a
fixed-shape lines x wavenumbers evaluation: lines are processed in static
chunks under ``lax.scan``; each chunk evaluates a dense (chunk, N) profile
block with the hapi wing-window mask applied as compute-and-mask
(replacing the per-line ``bisect`` at ``misc/hapi.py:11133-11134``).

This is the *reference engine*: correct for any grid, dtype-polymorphic
(float64 on CPU for oracle tests), differentiable, and already fast on TPU
because the (chunk, N) blocks map onto the VPU. The Pallas engine
(:mod:`radtxfr_tpu.kernels.pallas_xsect`) accelerates the same contract
with line bucketing and VMEM tiling.

Window-mask semantics match ``bisect_right`` exactly: a grid point g
contributes iff  nu0 - wing < g <= nu0 + wing  (window centered on the
*unshifted* line center, profile centered on the shifted one — see
``misc/hapi.py:11133-11135``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lineparams import LineParams
from .profiles import doppler, lorentz, voigt

__all__ = ["xsect_from_params", "pad_params"]


def pad_params(params: LineParams, multiple: int) -> LineParams:
    """Pad line arrays to a multiple of ``multiple`` with inert lines."""
    n = params.nu0.shape[0]
    n_pad = (-n) % multiple
    if n_pad == 0:
        return params
    pad = lambda a, v: jnp.concatenate([a, jnp.full((n_pad,), v, dtype=a.dtype)])
    return LineParams(
        nu0=pad(params.nu0, -1e9),
        nu0_shifted=pad(params.nu0_shifted, -1e9),
        strength=pad(params.strength, 0.0),
        gamma_d=pad(params.gamma_d, 1.0),
        gamma_0=pad(params.gamma_0, 1.0),
        wing=pad(params.wing, 0.0),
        gamma_2=pad(params.gamma_2, 0.0),
        shift0=pad(params.shift0, 0.0),
    )


@functools.partial(jax.jit, static_argnames=("profile", "chunk"))
def xsect_from_params(
    grid,
    params: LineParams,
    profile: str = "voigt",
    chunk: int = 512,
):
    """Sum line contributions onto ``grid``.

    Parameters
    ----------
    grid : (N,) monotone wavenumber axis [cm^-1].
    params : :class:`LineParams` (any length; padded internally).
    profile : 'voigt' | 'lorentz' | 'doppler'.
    chunk : static line-chunk size for the scan.

    Returns
    -------
    (N,) spectrum: sum_l strength_l * profile_l(grid), masked to each
    line's wing window.
    """
    grid = jnp.asarray(grid)
    params = pad_params(params, chunk)
    n_chunks = params.nu0.shape[0] // chunk
    stacked = jax.tree.map(
        lambda a: a.reshape(n_chunks, chunk), params
    )

    def body(acc, p: LineParams):
        dnu = grid[None, :] - p.nu0_shifted[:, None]
        if profile == "voigt":
            vals = voigt(dnu, p.gamma_d[:, None], p.gamma_0[:, None])
        elif profile == "lorentz":
            vals = lorentz(dnu, p.gamma_0[:, None])
        elif profile == "doppler":
            vals = doppler(dnu, p.gamma_d[:, None])
        elif profile == "sdvoigt":
            from .htp import profile_sdvoigt

            vals = profile_sdvoigt(
                0.0, p.gamma_d[:, None], p.gamma_0[:, None],
                p.gamma_2[:, None], p.shift0[:, None], 0.0, dnu,
            )[0]
        else:
            raise ValueError(profile)
        # hapi bisect window: nu0 - wing < g <= nu0 + wing
        g = grid[None, :]
        mask = (g > (p.nu0 - p.wing)[:, None]) & (g <= (p.nu0 + p.wing)[:, None])
        contrib = jnp.where(mask, p.strength[:, None] * vals, 0.0)
        return acc + contrib.sum(axis=0), None

    init = jnp.zeros_like(grid)
    acc, _ = jax.lax.scan(body, init, stacked)
    return acc
