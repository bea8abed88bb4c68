"""Fused TUD composition: one Pallas pass over ν-tiles.

Replaces the XLA-scan composition of :func:`radtxfr_tpu.products.tud
.tud_from_od` (the reference's three loop nests,
``radiative_transfer.py:346-372``) with a single kernel whose grid runs
over wavenumber tiles. Per tile, the full layer column (nL, T) of optical
depth sits in VMEM and every recurrence runs with its carry register/
VMEM-resident:

* transmittance — cumulative OD accumulated up the column, snapshotted at
  each sensor altitude's (static) layer count (``radiative_transfer.py:
  346-352``);
* upwelling — the ground→top affine recurrence Lu ← t·Lu + (1−t)·B_l
  (``:354-356``), one sweep per slant secant, snapshotted with tau;
* downwelling — the top→ground recurrence over all quadrature angles at
  once (``:369-372``) as an (nA, T) carry, then the normalized-weight
  hemispheric average (``:387-388``).

Motivation (docs/ROOFLINE.md §8): at the production 1.44M-point grid the
scan-based composition costs ~203 ms against a ~10-30 ms traffic+compute
roofline — the (30, nX) downwelling carry streams through HBM on all 66
scan steps, and each XLA while-loop iteration pays fixed dispatch. Here
the carry never leaves VMEM and od/B are read exactly once.

Two structure rules, both chip-measured (ROOFLINE §8):

* **No per-layer (1, T) transcendentals.** A first cut evaluated the
  Planck source and the layer transmittance row by row; at 1/8 sublane
  occupancy plus per-row fixed costs that put BOTH passes at ~120 ms
  regardless of angle count. The kernel now computes B(ν, T_l) for all
  layers as one (nL, T) broadcast expression into VMEM scratch and the
  up-pass layer transmittances as one (nL, T) exp, leaving only 2-3
  cheap ops per layer inside the sequential recurrences.
* **The down pass is a fori_loop, not a trace-time unroll.** Its (nA, T)
  per-iteration temporaries would otherwise each get their own VMEM
  stack slot across nL unrolled steps and blow the 16 MB scoped-vmem
  limit. No altitude snapshots happen on the way down, so the dynamic
  layer index costs nothing in structure.

The Planck source follows ``core/planck.py::planckian`` (wavenumber
mode, µW/(cm²·sr·cm⁻¹)): B = c1 ν³ / (exp(c2 ν / T) − 1), ν = 100·x
(``expm1`` has no Mosaic lowering; exp−1 is rounding-equivalent for
c2·ν/T ≥ ~3, the LWIR regime).

The up-pass layer loop is unrolled at trace time (the altitude snapshot
layers are static), so sensor altitudes, slant secants and the
downwelling quadrature are baked into the kernel as compile-time
constants. Autodiff is NOT supported — Jacobian paths keep the jnp
composition (which XLA differentiates); see ``products/jacobian.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import C1, C2

__all__ = ["TudCfg", "tud_compose_pallas"]


class TudCfg(NamedTuple):
    """Static (hashable) configuration of the fused composition kernel."""

    n_lay: int
    mus: tuple            # slant secants (floats), one Lu/tau sweep each
    snap: tuple           # per altitude: number of layers below (n_below)
    valid: tuple          # per altitude: n_below > 0
    n_angles: int         # downwelling quadrature size
    return_od: bool
    planck: bool          # compute B in-kernel from (x, 1/T_layers)
    t_lanes: int          # ν-tile width (lane dimension, multiple of 128)


def _build_kernel(cfg: TudCfg):
    n_mu = len(cfg.mus)
    # altitude snapshots keyed by layer count (static)
    snap_map: dict[int, list[int]] = {}
    for zi, nb in enumerate(cfg.snap):
        if cfg.valid[zi]:
            snap_map.setdefault(int(nb), []).append(zi)

    def kernel(*refs):
        if cfg.planck:
            (od_ref, x_ref, invt_ref, sec_ref, w_ref,
             out_ref, b_s, t_s) = refs
        else:
            (od_ref, b_in_ref, sec_ref, w_ref,
             out_ref, b_s, t_s) = refs
        # single (8-aligned) output buffer: rows [0, R) tau, [R, 2R) Lu,
        # row 2R Ld — separate 9-sublane outputs measured ~4x slower
        # (partial-tile read-modify-write; ROOFLINE §8)
        n_rows = len(cfg.snap) * n_mu
        tau_ref = out_ref
        lu_off = n_rows
        ld_row = 2 * n_rows

        dt = od_ref.dtype
        od_block = od_ref[...]                         # (nL, T)

        # Planck source for ALL layers in one full-occupancy broadcast op
        # (see module docstring: per-layer (1, T) rows measured ~8x slower)
        if cfg.planck:
            nu = x_ref[0:1, :] * 100.0
            a3 = (nu * nu * nu) * dt.type(C1 * 1e4)
            b_s[...] = a3 / (jnp.exp((nu * dt.type(C2)) * invt_ref[:, 0:1])
                             - 1.0)
            b_ref = b_s
        else:
            b_ref = b_in_ref

        zero = jnp.zeros((1, cfg.t_lanes), dtype=dt)

        # altitudes below the ground layer: tau = 1 (or path OD = 0), Lu = 0
        # (reference: zero layers contribute; tud.py:137,151)
        for zi in range(len(cfg.snap)):
            if not cfg.valid[zi]:
                for j in range(n_mu):
                    row = zi * n_mu + j
                    out_ref[row:row + 1, :] = (zero if cfg.return_od
                                               else zero + 1.0)
                    out_ref[lu_off + row:lu_off + row + 1, :] = zero

        # --- up pass: one sweep per slant secant --------------------------
        for j, m in enumerate(cfg.mus):
            # all layer transmittances at this secant in one (nL, T) exp
            t_s[...] = jnp.exp(od_block * dt.type(-m))
            cum = zero
            lu = zero
            for l in range(cfg.n_lay):
                t_row = t_s[l:l + 1, :]
                lu = t_row * lu + (1.0 - t_row) * b_ref[l:l + 1, :]
                cum = cum + od_block[l:l + 1, :]
                for zi in snap_map.get(l + 1, ()):
                    row = zi * n_mu + j
                    out_ref[row:row + 1, :] = (
                        cum * dt.type(m) if cfg.return_od
                        else jnp.exp(cum * dt.type(-m)))
                    out_ref[lu_off + row:lu_off + row + 1, :] = lu

        # --- down pass: all quadrature angles at once ---------------------
        sec_col = sec_ref[:, 0:1]                      # (nA, 1)

        def one_down(ld, l):
            od_row = od_ref[pl.ds(l, 1), :]
            b_row = b_ref[pl.ds(l, 1), :]
            t = jnp.exp(od_row * (-sec_col))           # (nA, T)
            return t * ld + (1.0 - t) * b_row

        # manual unroll-by-2 (Pallas fori supports only unroll=1/full, and
        # a full unroll blows the scoped-vmem stack — module docstring)
        top_even = cfg.n_lay - 1 - (cfg.n_lay % 2)

        def down_body(i, ld):
            l = top_even - 2 * i
            return one_down(one_down(ld, l), l - 1)

        ld = jnp.zeros((cfg.n_angles, cfg.t_lanes), dtype=dt)
        if cfg.n_lay % 2:
            ld = one_down(ld, cfg.n_lay - 1)
        ld = jax.lax.fori_loop(0, cfg.n_lay // 2, down_body, ld)
        out_ref[ld_row:ld_row + 1, :] = jnp.sum(ld * w_ref[:, 0:1], axis=0,
                                                keepdims=True)
        # rows past 2R+1 are 8-alignment padding: undefined, sliced away
        # by the wrapper (products/tud.py::make_tud_pallas_fn)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def tud_compose_pallas(cfg: TudCfg, od, src, aux, sec, w, interpret=False):
    """Run the fused composition kernel.

    Parameters
    ----------
    cfg : TudCfg (static).
    od : (nL, nXp) float32 layer OD, nXp a multiple of ``cfg.t_lanes``.
    src : ``cfg.planck``: (1, nXp) wavenumber axis [cm⁻¹] (padded columns
        must hold a positive wavenumber); else (nL, nXp) Planck radiance.
    aux : (nL, 1) float32 reciprocal layer temperatures 1/T (planck mode;
        ignored otherwise but must be passed with that shape).
    sec : (nA, 1) float32 downwelling secants.
    w : (nA, 1) float32 normalized quadrature weights.

    Returns one (R_pad8, nXp) buffer: rows [0, R) tau, [R, 2R) Lu, row
    2R Ld, remaining rows 8-alignment padding (R = nZs·nMu).
    """
    n_lay = cfg.n_lay
    n_rows = len(cfg.snap) * len(cfg.mus)
    nxp = od.shape[1]
    grid = (nxp // cfg.t_lanes,)
    band = pl.BlockSpec((n_lay, cfg.t_lanes), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, cfg.t_lanes), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [band,
                row if cfg.planck else band,
                fixed((cfg.n_angles, 1)), fixed((cfg.n_angles, 1))]
    operands = [od, src, sec, w]
    if cfg.planck:
        in_specs.insert(2, fixed((n_lay, 1)))
        operands.insert(2, aux)
    # one 8-aligned output buffer (tau rows | Lu rows | Ld row | padding)
    n_all = -(-(2 * n_rows + 1) // 8) * 8
    out_shape = jax.ShapeDtypeStruct((n_all, nxp), od.dtype)
    out_specs = pl.BlockSpec((n_all, cfg.t_lanes), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _build_kernel(cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_lay, cfg.t_lanes), od.dtype),   # b_s
            pltpu.VMEM((n_lay, cfg.t_lanes), od.dtype),   # t_s
        ],
        interpret=interpret,
    )(*operands)
