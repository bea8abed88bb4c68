"""Line-sharded SPMD optical depth: memory-scalable spectral sharding.

The basic SPMD path (:func:`~radtxfr_tpu.products.od.make_od_pallas_local_fn`)
replicates the full line list on every device — simple and fast, but
per-device line memory does not shrink as the pod grows. This module shards
the *lines themselves*: each spectral shard holds only the lines whose wing
windows can reach its sub-band (its in-band lines plus a halo of boundary
lines, the replication strategy SURVEY.md §7 recommends over exchanging OD
strips — the line-wing "halo" of the reference's pad/overlap band chunking,
``radiative_transfer.py:425-455``, materialized as data placement).

Per-device line memory drops from O(L) to O(L/S + halo·density); per-shard
line-parameter evaluation shrinks the same way. Everything remains one SPMD
program: per-shard data are stacked sharded operands (line columns, per-tile
block ranges, gather maps from kernel call slots into the local line set),
and the kernels are identical.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..lines.store import LineStore
from .od import (
    PA_PER_ATM,
    _build_od_calls,
    _as_states,
    _line_species_cols,
    species_column,
)
from ..kernels.lineparams import compute_line_params

__all__ = ["make_od_sharded_lines_fn"]


def _pad_to(a, n, fill):
    pad = n - a.shape[0]
    if pad <= 0:
        return a[:n]
    return np.concatenate([a, np.full(pad, fill, dtype=a.dtype)])


def make_od_sharded_lines_fn(lines, iso, grid, atmos_class, n_shards: int,
                             wing_abs=0.0, wing_hw=50.0, max_groups: int = 8,
                             tile: int = 512, n_weideman: int = 16,
                             two_pass: bool = True, group_ratio: float = 1.6,
                             fast_rcp: bool = True):
    """Build the line-sharded per-device OD function.

    Returns (local_fn, shard_data, padded_grid):

    * ``shard_data`` — pytree of arrays with leading shard axis, to pass
      through ``shard_map`` with ``P(SPECTRUM)``;
    * ``local_fn(T, p_pa, pl, vmr, local_shard_data, k_offset) ->
      (nLay, n_local)``.
    """
    from ..kernels.pallas_xsect import UniformGrid, xsect_pallas

    g0 = grid if isinstance(grid, UniformGrid) else UniformGrid.from_axis(np.asarray(grid))
    align = 1024 * n_shards
    n_pad = -(-g0.n // align) * align
    g = UniformGrid(x0=g0.x0, dx=g0.dx, n=n_pad)
    n_local = n_pad // n_shards

    from .od import _host_planning_views

    lines_h, iso_h, states_h = _host_planning_views(lines, iso, atmos_class)
    nu0 = np.asarray(lines_h.nu0, dtype=np.float64)
    cols_global = _line_species_cols(lines_h, states_h[0].mol_ids)

    calls = _build_od_calls(
        lines_h, iso_h, states_h, g, wing_abs=wing_abs, wing_hw=wing_hw,
        max_groups=max_groups, tile=tile,
        two_pass=two_pass, far_tile=None, far_block=None,
        group_ratio=group_ratio)
    halo = max(c[2].max_wing for c in calls)

    # --- per-shard local line sets (in-band + halo, sorted) ----------------
    shard_lo = g.x0 + g.dx * n_local * np.arange(n_shards)
    shard_hi = shard_lo + g.dx * n_local
    s_beg = np.searchsorted(nu0, shard_lo - halo, side="left")
    s_end = np.searchsorted(nu0, shard_hi + halo, side="right")
    l_max = int((s_end - s_beg).max())
    # one extra inert slot at the end of every local set for padded gathers
    l_pad = l_max + 1

    def stack_col(arr, fill):
        arr = np.asarray(arr)
        return jnp.asarray(np.stack([
            _pad_to(arr[b:e], l_pad, fill) for b, e in zip(s_beg, s_end)
        ]))

    line_cols = {
        "nu0": stack_col(lines_h.nu0, 1.0e9),
        "sw": stack_col(lines_h.sw, 0.0),
        "elower": stack_col(lines_h.elower, 0.0),
        "gamma_air": stack_col(lines_h.gamma_air, 1e-4),
        "gamma_self": stack_col(lines_h.gamma_self, 1e-4),
        "n_air": stack_col(lines_h.n_air, 0.5),
        "delta_air": stack_col(lines_h.delta_air, 0.0),
        "sd_air": stack_col(lines_h.sd_air, 0.0),
        "iso_row": stack_col(np.asarray(lines_h.iso_row), np.int32(0)),
        "mol_id": stack_col(np.asarray(lines_h.mol_id), np.int32(0)),
        "species_col": stack_col(cols_global, np.int32(0)),
    }

    # --- per-call, per-shard bucket plans + gather maps --------------------
    call_meta = []   # (lay_idx, plan_template, mode)
    call_data = []   # dict(starts, counts, k_line, frac0, gather) stacked
    from ..kernels.pallas_xsect import BucketPlan, plan_buckets

    nt_loc = None
    for lay_idx, cls_idx, gplan, mode in calls:
        cls_idx = np.asarray(cls_idx)
        cls_nu0 = nu0[cls_idx]
        tile_c, block_c = gplan.tile, gplan.block
        nt_loc_c = n_local // tile_c
        per_shard = []
        nb_max, mb_max = 1, 1
        for s in range(n_shards):
            # this shard's members of the class (within the call's halo)
            lo_i = np.searchsorted(cls_nu0, shard_lo[s] - gplan.max_wing, "left")
            hi_i = np.searchsorted(cls_nu0, shard_hi[s] + gplan.max_wing, "right")
            sub = cls_idx[lo_i:hi_i]            # global line indices, sorted
            # local plan on this subset
            if sub.size:
                p = plan_buckets(nu0[sub], UniformGrid(g.x0, g.dx, n_pad),
                                 gplan.max_wing, tile=tile_c, block=block_c)
                # keep only this shard's tiles
                t0 = s * nt_loc_c
                starts = p.starts[t0:t0 + nt_loc_c]
                counts = p.counts[t0:t0 + nt_loc_c]
                k_line = p.k_line.reshape(-1)
                frac0 = p.frac0.reshape(-1)
                nb = p.n_blocks
            else:
                starts = np.zeros(nt_loc_c, np.int32)
                counts = np.zeros(nt_loc_c, np.int32)
                k_line = np.full(block_c, -(2**30), np.int32)
                frac0 = np.zeros(block_c, np.float32)
                nb = 1
            # map call slots to indices within the shard's local line set
            idx_local = (sub - s_beg[s]).astype(np.int32)
            gather = _pad_to(idx_local, nb * block_c, np.int32(l_pad - 1))
            per_shard.append((starts, counts, k_line, frac0, gather, nb))
            nb_max = max(nb_max, nb)
            mb_max = max(mb_max, int(counts.max()) if counts.size else 0)
        mb_max = max(mb_max, 1)

        # pad per-shard arrays to common nb_max
        S, C, K, F, G = [], [], [], [], []
        for starts, counts, k_line, frac0, gather, nb in per_shard:
            K.append(_pad_to(k_line, nb_max * block_c, np.int32(-(2**30))))
            F.append(_pad_to(frac0, nb_max * block_c, np.float32(0.0)))
            G.append(_pad_to(gather, nb_max * block_c, np.int32(l_pad - 1)))
            S.append(np.minimum(starts, nb_max - 1))
            C.append(counts)
        template = BucketPlan(
            grid=UniformGrid(g.x0, g.dx, n_local), tile=tile_c, block=block_c,
            n_tiles=nt_loc_c, n_blocks=nb_max, max_blocks=mb_max,
            starts=np.zeros(nt_loc_c, np.int32),
            counts=np.zeros(nt_loc_c, np.int32),
            k_line=np.zeros((nb_max, 1, block_c), np.int32),
            frac0=np.zeros((nb_max, 1, block_c), np.float32),
            max_wing=gplan.max_wing,
        )
        call_meta.append((jnp.asarray(np.sort(np.asarray(lay_idx))), template, mode))
        call_data.append({
            "starts": jnp.asarray(np.stack(S)),
            "counts": jnp.asarray(np.stack(C)),
            "k_line": jnp.asarray(np.stack(K)),
            "frac0": jnp.asarray(np.stack(F)),
            "gather": jnp.asarray(np.stack(G)),
        })

    shard_data = {"lines": line_cols, "calls": call_data}

    def local_fn(T, p_pa, pl, vmr, local, k_offset):
        lc = {k: v.reshape(v.shape[1:]) for k, v in local["lines"].items()}
        store = LineStore(
            nu0=lc["nu0"], sw=lc["sw"], elower=lc["elower"],
            gamma_air=lc["gamma_air"], gamma_self=lc["gamma_self"],
            n_air=lc["n_air"], delta_air=lc["delta_air"],
            iso_row=lc["iso_row"], mol_id=lc["mol_id"], sd_air=lc["sd_air"],
        )
        sp_col = lc["species_col"]
        p_atm = p_pa / PA_PER_ATM

        def one(T_l, p_l, pl_l, vmr_l):
            u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
            return compute_line_params(
                store, iso, T_l, p_l, vmr_self=vmr_l[sp_col],
                wing_abs=wing_abs, wing_hw=wing_hw, strength_scale=u[sp_col],
            )

        params = jax.vmap(one)(T, p_atm, pl, vmr)
        out = jnp.zeros((T.shape[0], n_local), dtype=jnp.float32)
        for (lay_idx, template, mode), data in zip(call_meta, local["calls"]):
            d = {k: v.reshape(v.shape[1:]) for k, v in data.items()}
            sub = jax.tree.map(lambda a: a[lay_idx][:, d["gather"]], params)
            od_c = xsect_pallas(
                template, sub, n_weideman=n_weideman, mode=mode,
                fused_layers=True, fast_rcp=fast_rcp,
                starts=d["starts"], counts=d["counts"],
                k_line=d["k_line"], frac0=d["frac0"], k_offset=k_offset,
                n_tiles=template.n_tiles, n_out=n_local,
            )
            out = out.at[lay_idx].add(od_c)
        return out

    return local_fn, shard_data, g
