"""Pallas-powered sharded ensemble TUD: the production fast path.

Combines the bucketed Pallas OD engine with the (ensemble x spectrum) mesh:
one SPMD program where every device owns an (atmosphere-subset x nu-subband)
tile, runs the same static kernel plans on its local data (per-shard
line-block ranges + a global grid offset — see
:func:`radtxfr_tpu.products.od.make_od_pallas_local_fn`), and composes TUD
locally. Line-wing spill across spectral shard boundaries is handled by the
bucketing itself: line data is replicated and each shard's tile ranges
already include every line whose wing reaches the shard.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..atmos.profile import AtmosphericState
from ..core.planck import planckian
from ..products.od import make_od_pallas_local_fn
from ..products.tud import tud_from_od
from .mesh import ENSEMBLE, SPECTRUM

__all__ = ["make_tud_ensemble_fn", "tud_ensemble_pallas",
           "make_tud_jacobian_fn", "jacobian_directions"]


def make_tud_ensemble_fn(
    lines,
    iso,
    grid,
    batch: AtmosphericState,
    altitudes,
    mesh,
    atmos_class: AtmosphericState | None = None,
    mu=1.0,
    n_angles: int = 30,
    quadrature: str = "uniform",
    return_od: bool = False,
    compose_engine: str = "auto",
    **od_opts,
):
    """Sharded ensemble TUD using the Pallas OD engine.

    ``batch`` carries a leading ensemble axis on every field; ``atmos_class``
    (default: first ensemble member) sizes the static wing plans and must
    envelope the batch's thermodynamics.

    ``compose_engine``: ``'auto'`` composes TUD with the fused Pallas
    kernel (:mod:`radtxfr_tpu.kernels.pallas_tud` — carries VMEM-resident,
    in-kernel Planck source; float32) whenever every member shares the
    same layer grid, falling back to the jnp scan composition otherwise;
    ``'pallas'`` requires it; ``'jnp'`` forces the scan path (e.g. for a
    float64 oracle run).

    Returns (padded_grid, run): ``run(batch) -> (tau, Lu, Ld)`` is the
    reusable jitted SPMD program; ``padded_grid`` is the exact
    :class:`UniformGrid` the outputs live on (padded up to the sharding
    alignment — slice to the original ``len(grid)``); tau/Lu are
    (B, nXp, nZs, nMu), Ld is (B, nXp).
    """
    n_spec = mesh.shape[SPECTRUM]
    n_ens = mesh.shape[ENSEMBLE]
    if batch.T.shape[0] % n_ens:
        raise ValueError(f"batch {batch.T.shape[0]} not divisible by ensemble axis {n_ens}")
    if atmos_class is None:
        # Envelope the batch: the static wing upper bounds and core-region
        # lower bounds must cover every member. [mins, maxs] alone misses
        # mixed extremes (g0 is increasing in p/vmr but DEcreasing in T, so
        # its max lives at (T_min, p_max, vmr_max), which is in neither
        # all-min nor all-max state); add both mixed corners so every
        # monotone combination is bounded.
        import numpy as _np

        mins = jax.tree.map(lambda a: jnp.asarray(_np.asarray(a).min(axis=0)), batch)
        maxs = jax.tree.map(lambda a: jnp.asarray(_np.asarray(a).max(axis=0)), batch)
        cold_dense = mins.replace(p=maxs.p, pl=maxs.pl, vmr=maxs.vmr)
        hot_thin = maxs.replace(p=mins.p, pl=mins.pl, vmr=mins.vmr)
        atmos_class = [mins, maxs, cold_dense, hot_thin]

    local_fn, spec_data, gpad = make_od_pallas_local_fn(
        lines, iso, grid, atmos_class, n_spec, **od_opts)
    n_local = gpad.n // n_spec
    x_global = gpad.values(np.float64)
    if local_fn.point_index is not None:
        # weighted partition (od_opts partition='weighted'): each shard's
        # points are a non-contiguous permutation of the global grid —
        # feed the permuted axis in, gather the outputs back to global
        # grid order on the way out (TUD is pointwise in nu, so the
        # permutation commutes with everything in between)
        flat_idx = np.asarray(local_fn.point_index).ravel()
        x_pad = jnp.asarray(x_global[flat_idx], dtype=jnp.float32)
        pos_of = np.empty(gpad.n, dtype=np.int64)
        pos_of[flat_idx] = np.arange(gpad.n)
        unpermute = jax.jit(lambda a: jnp.take(a, jnp.asarray(pos_of),
                                               axis=1))
    else:
        x_pad = jnp.asarray(x_global, dtype=jnp.float32)
        unpermute = None
    z0_np = np.asarray(batch.z0)
    uniform_z0 = bool((z0_np == z0_np[0]).all())
    if compose_engine == "pallas" and not uniform_z0:
        raise ValueError("compose_engine='pallas' needs every member on the "
                         "same layer grid (the altitude snapshot layers are "
                         "compile-time constants)")
    use_fused = compose_engine in ("auto", "pallas") and uniform_z0
    if use_fused:
        from ..products.tud import make_tud_pallas_fn

        tud_fn = make_tud_pallas_fn(
            z0_np[0], np.atleast_1d(np.asarray(altitudes)), mu=np.asarray(mu),
            n_angles=n_angles, quadrature=quadrature, return_od=return_od)

    altitudes = jnp.atleast_1d(jnp.asarray(altitudes))
    mu_arr = jnp.atleast_1d(jnp.asarray(mu))

    def body(grid_loc, T, p, pl, vmr, z0, spec_local):
        k_off = jax.lax.axis_index(SPECTRUM) * n_local

        def one_atmos(args):
            T_a, p_a, pl_a, vmr_a, z0_a = args
            od = local_fn(T_a, p_a, pl_a, vmr_a, spec_local, k_off)
            if use_fused:
                tud = tud_fn(grid_loc, od, T_a)
            else:
                B = jnp.swapaxes(planckian(grid_loc, T_a), 0,
                                 1).astype(od.dtype)
                tud = tud_from_od(grid_loc, od, B, z0_a, altitudes,
                                  mu=mu_arr, n_angles=n_angles,
                                  return_od=return_od, quadrature=quadrature)
            return tud.tau, tud.Lu, tud.Ld

        return jax.lax.map(one_atmos, (T, p, pl, vmr, z0))

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(SPECTRUM),
            P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE), P(ENSEMBLE),
            jax.tree.map(lambda _: P(SPECTRUM), spec_data),
        ),
        out_specs=(
            P(ENSEMBLE, SPECTRUM, None, None),
            P(ENSEMBLE, SPECTRUM, None, None),
            P(ENSEMBLE, SPECTRUM),
        ),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(b: AtmosphericState):
        tau, Lu, Ld = jitted(x_pad, b.T, b.p, b.pl, b.vmr, b.z0, spec_data)
        if unpermute is not None:
            tau, Lu, Ld = unpermute(tau), unpermute(Lu), unpermute(Ld)
        return tau, Lu, Ld

    return gpad, run


def jacobian_directions(atmos: AtmosphericState, wrt=("T", 1, 3)):
    """One-hot tangent bases for the reference's Jacobian ensemble.

    The reference's Jacobian product is 3*66+1 = 199 finite-difference
    profiles — the unperturbed run plus one perturbed profile per (layer,
    variable) for T, H2O, O3 (``Generate_LWIR_TUD.py:55-71``). In autodiff
    terms that is the primal plus 198 directional derivatives; this helper
    returns the (n_dirs, nLay) one-hot tangents ``(V_T, V_vmr)`` (V_vmr has
    shape (n_dirs, nLay, nSpecies)) and their labels.
    """
    n_lay = int(np.asarray(atmos.T).size)
    n_sp = int(np.asarray(atmos.vmr).shape[1])
    mol_col = {m: i for i, m in enumerate(atmos.mol_ids)}
    V_T, V_vmr, labels = [], [], []
    eye = np.eye(n_lay, dtype=np.float32)
    zT = np.zeros((n_lay,), dtype=np.float32)
    zV = np.zeros((n_lay, n_sp), dtype=np.float32)
    for key in wrt:
        for l in range(n_lay):
            if key == "T":
                V_T.append(eye[l]); V_vmr.append(zV)
            else:
                c = mol_col[int(key)]
                v = zV.copy(); v[l, c] = 1.0
                V_T.append(zT); V_vmr.append(v)
            labels.append((str(key), l))
    return np.stack(V_T), np.stack(V_vmr), labels


def make_tud_jacobian_fn(
    lines,
    iso,
    grid,
    atmos: AtmosphericState,
    altitudes,
    mesh,
    mu=1.0,
    n_angles: int = 30,
    quadrature: str = "uniform",
    **od_opts,
):
    """Spectrum- AND direction-sharded TUD Jacobian (VERDICT r4 #4).

    JVPs run through the sharded Pallas builder: the fine grid shards over
    the mesh's SPECTRUM axis (``make_od_pallas_local_fn(differentiable=
    True)`` — the analytic custom-JVP kernels accept the per-shard tile
    ranges/offsets), and tangent *directions* shard over the ENSEMBLE axis
    (the role atmosphere batches play in the forward ensemble). One call
    evaluates a batch of directions; a full 199-profile-equivalent product
    is the primal plus 198 one-hot directions from
    :func:`jacobian_directions`, streamed in batches.

    Returns ``(gpad, run)`` with ``run(T, vmr, V_T, V_vmr) ->
    (primal, tangent)``, each a dict of tau (nXp, nZs, nMu) / Lu / Ld
    (nXp,); tangent entries gain a leading (n_dirs,) axis. ``V_T`` is
    (n_dirs, nLay) with n_dirs divisible by the ENSEMBLE axis size.
    Replaces the reference's 199 finite-difference forward runs
    (``Generate_LWIR_TUD.py:55-71``) with machine-precision directional
    derivatives at ~one forward-equivalent cost per direction.
    """
    n_spec = mesh.shape[SPECTRUM]
    n_ens = mesh.shape[ENSEMBLE]
    od_opts.setdefault("partition", "weighted")
    local_fn, spec_data, gpad = make_od_pallas_local_fn(
        lines, iso, grid, atmos, n_spec, differentiable=True, **od_opts)
    n_local = gpad.n // n_spec
    x_global = gpad.values(np.float64)
    if local_fn.point_index is not None:
        flat_idx = np.asarray(local_fn.point_index).ravel()
        x_pad = jnp.asarray(x_global[flat_idx], dtype=jnp.float32)
        pos_of = np.empty(gpad.n, dtype=np.int64)
        pos_of[flat_idx] = np.arange(gpad.n)
        # primal leaves carry the spectral axis first; tangent leaves gain
        # a leading (n_dirs,) axis, so their spectral axis is 1
        unpermute = jax.jit(
            lambda t: jax.tree.map(
                lambda a: jnp.take(a, jnp.asarray(pos_of), axis=1), t))
        unpermute_p = jax.jit(
            lambda t: jax.tree.map(
                lambda a: jnp.take(a, jnp.asarray(pos_of), axis=0), t))
    else:
        x_pad = jnp.asarray(x_global, dtype=jnp.float32)
        unpermute = unpermute_p = None
    altitudes = jnp.atleast_1d(jnp.asarray(altitudes))
    mu_arr = jnp.atleast_1d(jnp.asarray(mu))

    def body(grid_loc, T, vmr, V_T, V_vmr, spec_local):
        k_off = jax.lax.axis_index(SPECTRUM) * n_local

        def forward(T_a, vmr_a):
            od = local_fn(T_a, atmos.p, atmos.pl, vmr_a, spec_local, k_off)
            B = jnp.swapaxes(planckian(grid_loc, T_a), 0, 1).astype(od.dtype)
            tud = tud_from_od(grid_loc, od, B, atmos.z0, altitudes,
                              mu=mu_arr, n_angles=n_angles,
                              quadrature=quadrature)
            return {"tau": tud.tau, "Lu": tud.Lu, "Ld": tud.Ld}

        primal = forward(T, vmr)

        def one_dir(v):
            vT, vv = v
            _, tangent = jax.jvp(forward, (T, vmr), (vT, vv))
            return tangent

        tangents = jax.lax.map(one_dir, (V_T, V_vmr))
        return primal, tangents

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SPECTRUM), P(), P(), P(ENSEMBLE), P(ENSEMBLE),
                  jax.tree.map(lambda _: P(SPECTRUM), spec_data)),
        out_specs=(
            {"tau": P(SPECTRUM), "Lu": P(SPECTRUM), "Ld": P(SPECTRUM)},
            {"tau": P(ENSEMBLE, SPECTRUM), "Lu": P(ENSEMBLE, SPECTRUM),
             "Ld": P(ENSEMBLE, SPECTRUM)},
        ),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(T, vmr, V_T, V_vmr):
        # tangent dtypes must match the primal dtypes exactly (jax.jvp)
        T = jnp.asarray(T)
        vmr = jnp.asarray(vmr)
        V_T = jnp.asarray(V_T, dtype=T.dtype)
        V_vmr = jnp.asarray(V_vmr, dtype=vmr.dtype)
        if V_T.shape[0] % n_ens:
            raise ValueError(
                f"direction batch {V_T.shape[0]} not divisible by the "
                f"ensemble mesh axis {n_ens}")
        primal, tangent = jitted(x_pad, T, vmr, V_T, V_vmr, spec_data)
        # primal is replicated over ENSEMBLE; each device computed the
        # shard-local copy once. shard_map averages nothing: out_specs
        # P(SPECTRUM) takes one replica per spectral shard.
        if unpermute is not None:
            primal = unpermute_p(primal)
            tangent = unpermute(tangent)
        return primal, tangent

    return gpad, run


def tud_ensemble_pallas(lines, iso, grid, batch, altitudes, mesh, **kw):
    """One-shot convenience around :func:`make_tud_ensemble_fn`.

    For production loops build the function once and call it per batch —
    re-tracing the SPMD program costs seconds.
    """
    gpad, run = make_tud_ensemble_fn(lines, iso, grid, batch, altitudes,
                                     mesh, **kw)
    tau, Lu, Ld = run(batch)
    return gpad, tau, Lu, Ld
