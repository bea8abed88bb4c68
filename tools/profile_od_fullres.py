#!/usr/bin/env python
"""Per-call timing of the FULL-RES production OD decomposition.

Same idea as profile_od.py but on the bench `tud_fullres` configuration:
derived clustered list, 690-1410 @ 5e-4 (1.44M pts), hw-50 wings, CO2
Q-branch mixing handled by the production builder. Times the classic
(layer-group x wing-class [+ core]) calls; mixing/continuum extras are
measured as the difference to the full od_fn.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from radtxfr_tpu.utils import enable_persistent_cache, device_sync
enable_persistent_cache()
from radtxfr_tpu.atmos import std_atmosphere
from radtxfr_tpu.core.grid import arange_drift_free
from radtxfr_tpu.kernels.pallas_xsect import UniformGrid, xsect_pallas
from radtxfr_tpu.lines.store import IsoTables
from radtxfr_tpu.lines.derived import derived_lwir_linelist
from radtxfr_tpu.products.od import (
    _build_od_calls, _line_species_cols, compute_line_params,
    species_column, PA_PER_ATM)

dtype = jnp.float32
iso = IsoTables.load(dtype=dtype)
atm = std_atmosphere(dtype=dtype)
lines = derived_lwir_linelist(665.0, 1435.0, dtype=dtype)
X = arange_drift_free(690.0, 1410.0, 0.0005)
g = UniformGrid.from_axis(X)
env = [atm.replace(T=atm.T - 20.0),
       atm.replace(T=atm.T + 20.0, vmr=atm.vmr.at[:, 0].mul(2.0))]

calls = _build_od_calls(lines, iso, env, g, wing_abs=0.0, wing_hw=50.0,
                        max_groups=8, tile=512, two_pass=True,
                        far_tile=None, far_block=None, group_ratio=4.0)

cols = jnp.asarray(_line_species_cols(lines, atm.mol_ids))
p_atm = atm.p / PA_PER_ATM

def one(T_l, p_l, pl_l, vmr_l):
    u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
    return compute_line_params(lines, iso, T_l, p_l, vmr_self=vmr_l[cols],
                               wing_abs=0.0, wing_hw=50.0,
                               strength_scale=u[cols])

params = jax.vmap(one)(atm.T, p_atm, atm.pl, atm.vmr)
sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)

total_t = total_ev = 0.0
print(f"{'mode':8s} {'nLay':>4s} {'nLines':>6s} {'tile':>5s} {'blk':>4s} "
      f"{'mb':>5s} {'Geval(pad)':>10s} {'ms':>8s} {'Gev/s':>8s}")
for lay_idx, cls_idx, plan, mode in calls:
    p_sub = jax.tree.map(jnp.asarray, sub(params, lay_idx, cls_idx))
    fn = jax.jit(lambda ps, plan=plan, mode=mode: xsect_pallas(
        plan, ps, n_weideman=16, mode=mode, fused_layers=True, fast_rcp=True))
    out = fn(p_sub); device_sync(out)
    n_rep = 6
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(p_sub)
    device_sync(out)
    dt = (time.perf_counter() - t0 - 0.033) / n_rep
    n_lay = int(lay_idx.size)
    ev = float(plan.counts.astype(np.int64).sum()) * plan.block * plan.tile * n_lay
    total_t += dt; total_ev += ev
    print(f"{mode:8s} {n_lay:4d} {int(cls_idx.size):6d} {plan.tile:5d} "
          f"{plan.block:4d} {plan.max_blocks:5d} {ev/1e9:10.2f} "
          f"{dt*1e3:8.2f} {ev/dt/1e9:8.2f}")
print(f"TOTAL padded {total_ev/1e9:.2f} Geval  {total_t*1e3:.1f} ms  "
      f"{total_ev/total_t/1e9:.2f} Gev/s")
