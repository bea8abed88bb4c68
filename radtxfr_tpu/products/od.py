"""Monochromatic optical depth of layered atmospheres.

TPU-native replacement for the reference's ``compute_OD``
(``radiative_transfer.py:395-456``), which shells out to the LBLRTM Fortran
binary once per layer-chunk. Here the layer OD spectrum comes from the
line-by-line engine directly:

    OD_l(nu) = sum_lines  u_l(mol(line)) * S_line(T_l) * profile(nu)

with u the species column density [molec/cm^2] of the layer:
u = vmr * n_total * path,  n_total = p/(k_B T) in CGS
(the same number-density convention as hapi's ``volumeConcentration``,
``misc/hapi.py:10163-10164``).

No band chunking / pad-overlap stitching is needed (that machinery,
``radiative_transfer.py:425-455``, worked around LBLRTM's 2020 cm^-1 hard
limit): the kernel evaluates any band in one pass, and wide bands shard
across devices along nu instead (see :mod:`radtxfr_tpu.dist`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import BARYE_PER_ATM, CM_PER_KM, K_BOLTZMANN_CGS, PA_PER_ATM
from ..kernels.lineparams import compute_line_params
from ..kernels.xsect import xsect_from_params
from ..lines.store import IsoTables, LineStore

__all__ = ["species_column", "compute_od_layer", "compute_od_layers",
           "make_od_pallas_fn", "make_xsect_pallas_fn", "make_ht_pallas_fn",
           "make_od_pallas_local_fn", "make_od_plan"]


def species_column(p_pa, T, pl_km, vmr):
    """Species column density [molec/cm^2] for a homogeneous layer.

    ``vmr`` is the volume mixing fraction (scalar or array); broadcasting
    applies.
    """
    p_barye = (p_pa / PA_PER_ATM) * BARYE_PER_ATM
    n_total = p_barye / (K_BOLTZMANN_CGS * T)  # [molec/cm^3]
    return vmr * n_total * pl_km * CM_PER_KM


def _line_species_cols(lines: LineStore, mol_ids) -> np.ndarray:
    """Host-side: map each line's molecule id to its vmr column index."""
    mol_ids = list(mol_ids)
    lut = {m: i for i, m in enumerate(mol_ids)}
    line_mols = np.asarray(lines.mol_id)
    missing = set(np.unique(line_mols).tolist()) - set(lut)
    if missing:
        raise ValueError(f"lines contain molecules with no vmr column: {sorted(missing)}")
    return np.array([lut[int(m)] for m in line_mols], dtype=np.int32)


def compute_od_layer(
    lines: LineStore,
    iso: IsoTables,
    grid,
    T,
    p_pa,
    pl_km,
    vmr_row,
    species_cols,
    profile: str = "voigt",
    wing_abs=0.0,
    wing_hw=50.0,
    chunk: int = 512,
):
    """OD spectrum of one homogeneous layer. All thermodynamics traced-OK."""
    u = species_column(p_pa, T, pl_km, vmr_row)         # (nM,)
    # `profile` must reach BOTH calls: per-profile parameter rules differ
    # (shift handling, wing formula, Doppler gamma_d), and sdvoigt/ht center
    # on the unshifted nu0 with the shift applied inside the HT profile —
    # a Voigt-mode params object would double-shift them.
    params = compute_line_params(
        lines,
        iso,
        T,
        jnp.asarray(p_pa) / PA_PER_ATM,
        vmr_self=vmr_row[species_cols],
        wing_abs=wing_abs,
        wing_hw=wing_hw,
        strength_scale=u[species_cols],
        profile=profile,
    )
    return xsect_from_params(grid, params, profile=profile, chunk=chunk)


@functools.partial(
    jax.jit,
    static_argnames=("profile", "wing_abs", "wing_hw", "chunk", "mol_ids"),
)
def _od_layers_jit(
    lines, iso, grid, T, p, pl, vmr, species_cols, profile, wing_abs, wing_hw, chunk, mol_ids
):
    def one(args):
        T_l, p_l, pl_l, vmr_l = args
        return compute_od_layer(
            lines, iso, grid, T_l, p_l, pl_l, vmr_l, species_cols,
            profile=profile, wing_abs=wing_abs, wing_hw=wing_hw, chunk=chunk,
        )

    return jax.lax.map(one, (T, p, pl, vmr))


def compute_od_layers(
    lines: LineStore,
    iso: IsoTables,
    grid,
    atmos,
    profile: str = "voigt",
    wing_abs: float = 0.0,
    wing_hw: float = 50.0,
    chunk: int = 512,
    engine: str = "jnp",
    plan=None,
    pallas_opts: dict | None = None,
    continuum: str = "none",
    continuum_factors=None,
    line_mixing: dict | None = None,
    ht_extras: dict | None = None,
):
    """(nL, nX) optical-depth tensor for a layered atmosphere.

    ``engine='jnp'``: chunked lines x nu evaluation under ``lax.map`` over
    layers (dtype-polymorphic, any profile — the correctness path).
    ``engine='pallas'``: the bucketed TPU kernel
    (:mod:`radtxfr_tpu.kernels.pallas_xsect`) — float32, Voigt/SD-Voigt/
    Lorentz/Doppler/HT, fastest. Pass a prebuilt ``plan``
    (:func:`make_od_plan`) to amortize bucketing.

    ``profile='ht'`` evaluates the full Hartmann-Tran pcqsdhc per layer
    with the air/self diluent mix (``abun = [1-x_self, x_self]`` from each
    layer's vmr) and hapi's HT-column fallbacks; ``ht_extras`` supplies
    HT-specific columns (e.g. fetched with ``pargroups=['ht']``) keyed as
    in :func:`~radtxfr_tpu.kernels.ht_driver.resolve_ht_columns`.

    ``continuum``: additive continuum model name (default ``'none'`` — the
    hapi-parity setting; ``'mt_ckd'`` matches the reference's LBLRTM
    ``ICNTNM=6`` production configuration, ``radiative_transfer.py:622``).
    ``continuum_factors`` follows the 7-element TAPE5 record-1.2a scale
    convention (``radiative_transfer.py:658-660``).
    """
    if engine == "pallas":
        opts = dict(pallas_opts or {})
        if line_mixing is not None:
            if profile == "ht":
                # make_od_ht_pallas_fn has no line_mixing parameter; fail
                # with the same message as the jnp branch instead of a
                # TypeError from the builder's signature
                raise NotImplementedError(
                    "line mixing composes with Voigt only")
            opts.setdefault("line_mixing", line_mixing)
        if profile == "ht" and ht_extras is not None:
            opts.setdefault("extras", ht_extras)
        od = _od_layers_pallas(
            lines, iso, grid, atmos, profile=profile, wing_abs=wing_abs,
            wing_hw=wing_hw, plan=plan, **opts,
        )
    elif line_mixing is not None:
        if profile != "voigt":
            raise NotImplementedError("line mixing composes with Voigt only")
        from ..kernels.linemixing import mixing_coefficient, xsect_voigt_mixing

        cols = jnp.asarray(_line_species_cols(lines, atmos.mol_ids))
        y_air = jnp.asarray(np.asarray(line_mixing["y_air"]))
        y_self_arr = line_mixing.get("y_self")
        y_self = None if y_self_arr is None else jnp.asarray(np.asarray(y_self_arr))
        n_T = float(line_mixing.get("n_T", 0.0))
        gridj = jnp.asarray(grid)

        def one(args):
            T_l, p_l, pl_l, vmr_l = args
            p_atm = p_l / PA_PER_ATM
            u = species_column(p_l, T_l, pl_l, vmr_l)
            prm = compute_line_params(
                lines, iso, T_l, p_atm, vmr_self=vmr_l[cols],
                wing_abs=wing_abs, wing_hw=wing_hw, strength_scale=u[cols])
            Y = mixing_coefficient(y_air, p_atm, T_l, y_self=y_self,
                                   x_self=vmr_l[cols], n_T=n_T)
            return xsect_voigt_mixing(gridj, prm, Y, chunk=chunk)

        # first-order mixing can leave small negative excursions next to
        # a Q branch (truncation artifact; LTE absorption is nonnegative)
        # — clamp, as the Pallas builders do (round-5 full-res finding)
        od = jnp.maximum(
            jax.lax.map(one, (atmos.T, atmos.p, atmos.pl, atmos.vmr)), 0.0)
    elif profile == "ht":
        from ..kernels.ht_driver import (ht_params, ht_xsect_from_params,
                                         resolve_ht_columns)

        cols = jnp.asarray(_line_species_cols(lines, atmos.mol_ids))
        resolved = resolve_ht_columns(lines.host_view(), ht_extras,
                                      {"air": 1.0, "self": 1.0})
        gridj = jnp.asarray(grid.values() if hasattr(grid, "values")
                            else grid)
        nu0j = jnp.asarray(lines.nu0)

        def one_ht(args):
            T_l, p_l, pl_l, vmr_l = args
            p_atm = p_l / PA_PER_ATM
            x_self = vmr_l[cols]
            u = species_column(p_l, T_l, pl_l, vmr_l)
            prm = ht_params(resolved, lines, iso, T_l, p_atm,
                            wing_abs=wing_abs, wing_hw=wing_hw,
                            abun=[1.0 - x_self, x_self])
            return ht_xsect_from_params(gridj, nu0j, prm, chunk=chunk,
                                        strength_scale=u[cols])

        od = jax.lax.map(one_ht, (atmos.T, atmos.p, atmos.pl, atmos.vmr))
    else:
        cols = jnp.asarray(_line_species_cols(lines, atmos.mol_ids))
        od = _od_layers_jit(
            lines, iso, jnp.asarray(grid), atmos.T, atmos.p, atmos.pl,
            atmos.vmr, cols, profile, float(wing_abs), float(wing_hw),
            int(chunk), tuple(atmos.mol_ids),
        )
    if continuum != "none":
        from ..atmos.continuum import continuum_od

        nu = grid.values() if hasattr(grid, "values") else np.asarray(grid)
        od = od + continuum_od(
            jnp.asarray(nu, dtype=od.dtype), atmos, model=continuum,
            continuum_factors=continuum_factors).astype(od.dtype)
    return od


def layer_line_params(lines, iso, atmos, species_cols, wing_abs=0.0,
                      wing_hw=50.0, profile="voigt"):
    """vmap :func:`compute_line_params` over layers with OD strength scaling.

    Returns :class:`LineParams` with (n_layers, n_lines) arrays whose
    ``strength`` already includes species column density x path length.
    """
    p_atm = atmos.p / PA_PER_ATM

    def one(T, p, pl, vmr):
        u = species_column(p * PA_PER_ATM, T, pl, vmr)
        return compute_line_params(
            lines, iso, T, p,
            vmr_self=vmr[species_cols],
            wing_abs=wing_abs, wing_hw=wing_hw,
            strength_scale=u[species_cols],
            profile=profile,
        )

    return jax.vmap(one)(atmos.T, p_atm, atmos.pl, atmos.vmr)


def _gd_coeff(lines, iso) -> np.ndarray:
    """Per-line Doppler-width coefficient: gamma_D = sqrt(T) * _gd_coeff."""
    from ..core.constants import C_LIGHT_CGS, C_MASS_MOL, K_BOLTZMANN_CGS

    nu0 = np.asarray(lines.nu0, dtype=np.float64)
    mass = np.asarray(iso.molar_mass)[np.asarray(lines.iso_row)]
    mass_g = mass * C_MASS_MOL * 1000.0
    return (np.sqrt(2.0 * K_BOLTZMANN_CGS * np.log(2.0) / mass_g)
            / C_LIGHT_CGS * nu0)


def wing_bound_matrix(lines, iso, atmos, wing_abs=0.0, wing_hw=50.0,
                      vmr_margin: float = 1.5) -> np.ndarray:
    """Host-side (nLay, nLines) upper bound on each line's wing cutoff.

    Requires a concrete (non-traced) atmosphere; replicates the wing rule of
    :func:`~radtxfr_tpu.kernels.lineparams.compute_line_params` in NumPy to
    size the static Pallas bucketing. The self-broadening mix uses the
    concrete state's vmr inflated by ``vmr_margin`` (gamma_self can be ~5x
    gamma_air, but self mixing fractions are small — bounding the mix by
    max(gamma_air, gamma_self) as if vmr were 1 inflated wing-pass work
    ~3x). Traced atmospheres whose vmr exceeds margin x class vmr get their
    wings clamped to the plan bound (graceful truncation, never mis-binned);
    pass envelope states via the ``atmos_class`` list to widen the bound.
    Set ``vmr_margin=None`` for the fully conservative vmr=1 bound.
    """
    from ..core.constants import T_REF

    nu0 = np.asarray(lines.nu0, dtype=np.float64)
    g_air = np.asarray(lines.gamma_air, dtype=np.float64)
    g_self = np.asarray(lines.gamma_self, dtype=np.float64)
    n_air = np.asarray(lines.n_air, dtype=np.float64)
    gd_coeff = _gd_coeff(lines, iso)

    T = np.asarray(atmos.T, dtype=np.float64)          # (nLay,)
    p_atm = np.asarray(atmos.p, dtype=np.float64) / PA_PER_ATM
    if vmr_margin is None:
        g_mix = np.broadcast_to(np.maximum(g_air, g_self), (T.size, nu0.size))
    else:
        cols = _line_species_cols(lines, atmos.mol_ids)
        x = np.asarray(atmos.vmr, dtype=np.float64)[:, cols]   # (nLay, L)
        x = np.minimum(x * vmr_margin, 1.0)
        g_mix = g_air[None, :] * (1.0 - x) + g_self[None, :] * x
        g_mix = np.maximum(g_mix, g_air[None, :])  # n_self != n_air safety
    t_pow = (T_REF / T)[:, None] ** n_air[None, :]      # (nLay, L)
    g0 = p_atm[:, None] * t_pow * g_mix
    gd = np.sqrt(T)[:, None] * gd_coeff[None, :]
    return np.maximum(wing_abs, wing_hw * np.maximum(g0, gd))


def max_wing_per_layer(lines, iso, atmos, wing_abs=0.0, wing_hw=50.0) -> np.ndarray:
    """Host-side per-layer upper bound on line wing cutoffs (nL,) [cm^-1]."""
    return wing_bound_matrix(lines, iso, atmos, wing_abs, wing_hw).max(axis=1)


def core_wing_per_line(lines, iso, atmos) -> np.ndarray:
    """Per-line Weideman-core half-width bound (L,) [cm^-1].

    The hum1_wei region |x| + y < 15 lies within |dnu| < 15 * gamma_D /
    sqrt(ln2) of the *shifted* center; adding the pressure-shift bound gives
    a distance from the unshifted center, which is what the bucketing uses.
    """
    from ..kernels.faddeeva import REGION_BOUND

    t_max = float(np.asarray(atmos.T).max())
    gd_max = np.sqrt(t_max) * _gd_coeff(lines, iso)
    p_max = float(np.asarray(atmos.p).max()) / PA_PER_ATM
    shift_max = np.abs(np.asarray(lines.delta_air, dtype=np.float64)) * p_max
    return REGION_BOUND / np.sqrt(np.log(2.0)) * gd_max + shift_max


def core_y_matrix(lines, iso, atmos) -> np.ndarray:
    """Host-side (nLay, nLines) LOWER bound on the Voigt y parameter.

    y = sqrt(ln2) * Gamma0 / GammaD. hum1_wei applies the Weideman series
    only where |x| + y < 15 (``misc/hapi.py:9833-9844``), so a (layer, line)
    pair whose y lower bound is already >= 15 has an identically zero core
    correction everywhere — high-pressure layers drop out of the core pass
    entirely. The bound uses min(gamma_air, gamma_self) (the smallest any
    diluent mix can produce) so it holds for every vmr.
    """
    from ..core.constants import T_REF

    g_lo = np.minimum(np.asarray(lines.gamma_air, dtype=np.float64),
                      np.asarray(lines.gamma_self, dtype=np.float64))
    n_air = np.asarray(lines.n_air, dtype=np.float64)
    gd_coeff = _gd_coeff(lines, iso)
    T = np.asarray(atmos.T, dtype=np.float64)
    p_atm = np.asarray(atmos.p, dtype=np.float64) / PA_PER_ATM
    t_pow = (T_REF / T)[:, None] ** n_air[None, :]
    g0 = p_atm[:, None] * t_pow * g_lo[None, :]
    gd = np.sqrt(T)[:, None] * gd_coeff[None, :]
    return np.sqrt(np.log(2.0)) * g0 / gd


def sdvoigt_core_bound(lines, iso, atmos, margin: float = 1.15) -> np.ndarray:
    """Host-side (nLay, L) upper bound on the SD-Voigt core half-width.

    Outside |dnu| >= |delta·p| + Gamma2 (2c^2 + 30c + 225), both pcqsdhc
    CPF points satisfy min(|Z1|, |Z2|) >= 15 (derivation: |Z| >=
    sqrt(|X| - Y) - c with |X| >= (|dnu| - |s0|)/Gamma2, Y = c^2), which
    puts them in hum1_wei's asymptotic region and disables the CPF3
    sub-case — the double-asym 'sdvoigt_asym' kernel variant is exact
    there. c = Gamma_D/(2 sqrt(ln2) Gamma2) is evaluated at both the
    nominal and a half-strength Gamma2 (the self-diluent mix shrinks
    Gamma2 by (1 - x_self)) and the larger bound kept; ``margin`` pads for
    runtime states moderately outside the envelope.
    """
    sd = np.asarray(lines.sd_air, dtype=np.float64)
    ga = np.asarray(lines.gamma_air, dtype=np.float64)
    p_atm = np.asarray(atmos.p, dtype=np.float64)[:, None] / PA_PER_ATM
    g2_nom = np.maximum(sd * ga, 1e-30)[None, :] * p_atm
    k = (np.sqrt(np.asarray(atmos.T, dtype=np.float64))[:, None]
         * _gd_coeff(lines, iso)[None, :]) / (2.0 * np.sqrt(np.log(2.0)))

    def radius(g2):
        c = k / g2
        return g2 * (2.0 * c * c + 30.0 * c + 225.0)

    b = np.maximum(radius(g2_nom), radius(0.5 * g2_nom))
    shift = np.abs(np.asarray(lines.delta_air, dtype=np.float64))[None, :] * p_atm
    return margin * (shift + b)


def max_wing_bound(lines, iso, atmos, wing_abs=0.0, wing_hw=50.0) -> float:
    """Host-side upper bound on every line's wing over all layers."""
    return float(max_wing_per_layer(lines, iso, atmos, wing_abs, wing_hw).max())


def group_by_wing(wings: np.ndarray, max_groups: int = 4, ratio: float = 2.5):
    """Partition indices so each group's wings are within ``ratio`` of the
    group max (sorted descending, contiguous groups).

    Used both for layers (pressure spans orders of magnitude down the
    atmosphere) and for lines (gamma spans a wide range within a band).
    Returns a list of (indices, group_max_wing).
    """
    order = np.argsort(wings)[::-1]
    groups = []
    current = [order[0]]
    w_max = wings[order[0]]
    for idx in order[1:]:
        if wings[idx] * ratio < w_max and len(groups) < max_groups - 1:
            groups.append((np.array(current), float(w_max)))
            current, w_max = [idx], wings[idx]
        else:
            current.append(idx)
    groups.append((np.array(current), float(w_max)))
    return groups


# Backwards-compatible alias
group_layers_by_wing = group_by_wing


def make_od_plan(lines, iso, grid, atmos, wing_abs=0.0, wing_hw=50.0,
                 tile: int = 1024, block: int = 256):
    """Build the static Pallas bucket plan for (lines, grid, atmosphere class)."""
    from ..kernels.pallas_xsect import UniformGrid, plan_buckets

    g = grid if isinstance(grid, UniformGrid) else UniformGrid.from_axis(np.asarray(grid))
    mw = max_wing_bound(lines, iso, atmos, wing_abs=wing_abs, wing_hw=wing_hw)
    return plan_buckets(np.asarray(lines.nu0, dtype=np.float64), g, mw,
                        tile=tile, block=block)



def _pow2_tile(n: int, lo: int = 128, hi: int = 1024) -> int:
    """Round up to a power-of-two tile in [lo, hi] (keeps tiles divisors of
    any multiple of ``hi`` — required for even spectral sharding)."""
    t = lo
    while t < n and t < hi:
        t *= 2
    return t


def _as_states(atmos_class):
    return list(atmos_class) if isinstance(atmos_class, (list, tuple)) else [atmos_class]


def _host_planning_views(lines, iso, atmos_class):
    """Host NumPy views of everything static planning reads.

    Line columns come from the LineStore's construction-time host cache
    (:meth:`~radtxfr_tpu.lines.store.LineStore.host_view`) — on a
    remote-tunnel TPU backend pulling them back off the device measured
    MINUTES at 100k lines, for data that was born on the host. The small
    iso/atmosphere tables transfer in one batched device_get.
    """
    states = _as_states(atmos_class)
    iso_h, states_h = jax.device_get((iso, states))
    return lines.host_view(), iso_h, states_h


def _build_od_calls(lines, iso, atmos_class, g, wing_abs, wing_hw, max_groups,
                    tile, two_pass, far_tile, far_block,
                    group_ratio, core_tile=None, core_block=16,
                    profile: str = "voigt", mix_idx=None):
    """The static (layer-group x wing-class [+ core]) call decomposition.

    ``atmos_class`` may be a single representative state or a list of
    envelope states (e.g. the coldest and hottest ensemble members); wing
    bounds are taken elementwise over all of them.

    ``profile='sdvoigt'`` splits the line list host-side: lines with a
    nonzero speed-dependence ratio (``sd_air``) get dedicated
    ``mode='sdvoigt'`` kernel calls (the full pcqsdhc SD-Voigt block), while
    ``sd_air == 0`` lines route through the ordinary Voigt passes — exactly
    the hapi contract, where ``Gamma2 == 0`` reduces ``pcqsdhc`` to the
    Voigt profile at the shifted center (``misc/hapi.py:10117-10129``; the
    reference's production SD-Voigt workload is
    ``misc/RT_gen_AbsXS_files.py:87-92``).
    """
    from ..kernels.pallas_xsect import plan_buckets_packed

    states = _as_states(atmos_class)
    W = np.max([wing_bound_matrix(lines, iso, s, wing_abs=wing_abs,
                                  wing_hw=wing_hw) for s in states], axis=0)
    nu0 = np.asarray(lines.nu0, dtype=np.float64)

    if profile == "sdvoigt":
        sd_mask = np.asarray(lines.sd_air, dtype=np.float64) != 0.0
        special = [(np.nonzero(sd_mask)[0], "sdvoigt")]
        v_mask = ~sd_mask
    elif profile == "voigt":
        special = []
        v_mask = np.ones(nu0.size, dtype=bool)
    elif profile in ("lorentz", "doppler"):
        # single-pass dense modes: both forms are a handful of flops/eval,
        # so the asym/core far-wing split would buy nothing
        special = [(np.arange(nu0.size), profile)]
        v_mask = np.zeros(nu0.size, dtype=bool)
    else:
        raise NotImplementedError(
            f"pallas engine implements profiles 'voigt', 'sdvoigt', "
            f"'lorentz' and 'doppler', got {profile!r}")
    if mix_idx is not None and len(mix_idx):
        if profile != "voigt":
            raise NotImplementedError("line mixing composes with Voigt only")
        mix_idx = np.sort(np.asarray(mix_idx, dtype=np.int64))
        special.append((mix_idx, "mix"))
        v_mask[mix_idx] = False
    v_idx = np.nonzero(v_mask)[0]

    wing_mode = "asym" if two_pass else "full"
    # The asym wing passes are ~12 flops/eval — grid-step overhead bound —
    # so they get bigger tiles/blocks than the flop-heavy core pass.
    f_tile = far_tile or (2 * tile if two_pass else tile)
    f_block = far_block or "auto"
    calls = []  # (layer_idx jnp, line_idx jnp, plan, mode)

    for s_idx, s_mode in special:
        if not s_idx.size:
            continue
        # Special-profile lines (SD-Voigt pcqsdhc / Rosenkranz mixing):
        # single-pass dense evaluation over each line's own wing window
        # (no exact cheap far-wing split like the Voigt asym/core
        # decomposition applies to these forms).
        W_s = W[:, s_idx]
        # VMEM guard: the kernels hold ~15 dense (block x tile) f32
        # intermediates live; cap block so block*tile stays ~256K elements
        # (wing_abs-dominated workloads want wide tiles — 8192 at 350 cm^-1
        # wings — which would otherwise pair with density-driven blocks of
        # 256 and spill ~200 MB of registers; measured on v5e).
        # tighter budget than the Voigt passes: the pcqsdhc variants keep
        # ~15 dense (block x tile) f32 intermediates live vs ~8
        blk_cap = max(8, ((1 << 17) // tile) // 8 * 8)
        # SD-Voigt gets the same far-wing split as Voigt: a double-asym
        # pass over the full windows plus a narrow (full - asym) core pass
        # bounded by sdvoigt_core_bound (pointwise-exact decomposition).
        sd_split = two_pass and s_mode == "sdvoigt"
        if sd_split:
            B_core = np.max([sdvoigt_core_bound(lines, iso, s)
                             for s in states], axis=0)[:, s_idx]
        for lay_idx, _ in group_by_wing(W_s.max(axis=1),
                                        max_groups=max_groups,
                                        ratio=group_ratio):
            lay_idx = np.sort(lay_idx)
            w_line = W_s[lay_idx].max(axis=0)

            def packed(w, t, blk):
                p = plan_buckets_packed(nu0[s_idx], g, w, tile=t, block=blk)
                if blk == "auto" and p.block > blk_cap:
                    p = plan_buckets_packed(nu0[s_idx], g, w, tile=t,
                                            block=blk_cap)
                return p

            if sd_split:
                calls.append((jnp.asarray(lay_idx), jnp.asarray(s_idx),
                              packed(w_line, tile, "auto"), "sdvoigt_asym"))
                w_core = np.minimum(w_line, B_core[lay_idx].max(axis=0))
                c_tile = _pow2_tile(int(np.ceil(2.0 * w_core.max() / g.dx)),
                                    lo=256, hi=min(512, max(256, tile)))
                # the ~775-op sdvoigt_core kernel is register-pressure
                # bound: half the voigt-core block is measured faster
                # (3-5% on the XS lattice); the voigt core keeps
                # core_block (16) where 8 measured slower
                calls.append((jnp.asarray(lay_idx), jnp.asarray(s_idx),
                              packed(w_core, c_tile,
                                     max(8, core_block // 2)),
                              "sdvoigt_core"))
            else:
                calls.append((jnp.asarray(lay_idx), jnp.asarray(s_idx),
                              packed(w_line, tile, "auto"), s_mode))

    if not v_idx.size:
        return calls
    nu0_v = nu0[v_idx]
    W_v = W[:, v_idx]
    v_lines = jnp.asarray(v_idx)
    lay_groups = group_by_wing(W_v.max(axis=1), max_groups=max_groups,
                               ratio=group_ratio)
    f_cap = max(8, ((1 << 18) // f_tile) // 8 * 8)
    for lay_idx, _ in lay_groups:
        # Per-line wing bounds over the group's layers: packed planning
        # places each line only in the tiles its OWN wing touches, so no
        # wing-class partitioning (and its class-max inflation) is needed.
        w_line = W_v[np.sort(lay_idx)].max(axis=0)          # (Lv,)
        plan = plan_buckets_packed(nu0_v, g, w_line, tile=f_tile, block=f_block)
        if f_block == "auto" and plan.block > f_cap:
            # VMEM guard: keep block*tile <= ~256K elements (the kernels
            # hold several dense (block x tile) f32 intermediates live)
            plan = plan_buckets_packed(nu0_v, g, w_line, tile=f_tile,
                                       block=f_cap)
        calls.append((jnp.asarray(np.sort(lay_idx)), v_lines,
                      plan, wing_mode))
    if two_pass:
        # Core pass: the Weideman region spans only a few tens of grid
        # points around each line center, and exists at all only where the
        # Voigt y = sqrt(ln2)*Gamma0/GammaD can drop below hum1_wei's bound
        # (|x| + y < 15): high-pressure layers are purely asymptotic for
        # most lines, so the core pass is segmented by the same layer groups
        # with per-segment line filtering on the y lower bound (about half
        # the (layer, line) pairs drop out for the LWIR StdAtmos workload).
        # The 1.25 margin keeps exclusions valid for runtime atmospheres
        # moderately outside the envelope states. Tile/block measured on
        # v5e: narrow tiles starve the pipeline; block 16 beats 32+.
        from ..kernels.faddeeva import REGION_BOUND

        y_lo = np.min([core_y_matrix(lines, iso, s) for s in states],
                      axis=0)[:, v_idx]
        w_line = np.max([core_wing_per_line(lines, iso, s) for s in states],
                        axis=0)[v_idx]
        y_thresh = REGION_BOUND * 1.25
        ovh_pairs = 0.04 * W.shape[0] * nu0_v.size  # ~per-call fixed cost
        segs = []  # (lay_idx, line_mask)
        for lay_idx, _ in lay_groups:
            lay_idx = np.sort(lay_idx)
            m = (y_lo[lay_idx] < y_thresh).any(axis=0)
            if not m.any():
                continue
            if segs:
                p_idx, pm = segs[-1]
                um = pm | m
                uni = (len(p_idx) + len(lay_idx)) * int(um.sum())
                sep = len(p_idx) * int(pm.sum()) + len(lay_idx) * int(m.sum())
                if uni - sep <= ovh_pairs:
                    segs[-1] = (np.concatenate([p_idx, lay_idx]), um)
                    continue
            segs.append((lay_idx, m))
        for lay_idx, m in segs:
            cls_local = np.nonzero(m)[0]
            w_sub = w_line[cls_local]
            w_core = float(w_sub.max())
            seg_tile = core_tile
            if seg_tile is None:
                seg_tile = _pow2_tile(int(np.ceil(2.0 * w_core / g.dx)),
                                      lo=256, hi=min(512, max(256, tile)))
            core_plan = plan_buckets_packed(nu0_v[cls_local], g, w_sub,
                                            tile=seg_tile, block=core_block)
            calls.append((jnp.asarray(np.sort(lay_idx)),
                          jnp.asarray(v_idx[cls_local]), core_plan, "core"))
    return calls


def make_od_pallas_fn(lines, iso, grid, atmos_class, wing_abs=0.0, wing_hw=50.0,
                      max_groups: int = 8,
                      tile: int = 512, n_weideman: int = 16,
                      two_pass: bool = True, far_tile: int | None = None,
                      far_block: int | None = None, group_ratio: float = 4.0,
                      core_tile: int | None = None,
                      core_block: int = 16, fast_rcp: bool = True,
                      profile: str = "voigt",
                      continuum: str = "none", continuum_factors=None,
                      differentiable: bool = False,
                      line_mixing: dict | None = None,
                      far_method: str = "auto", coarse_r: int = 64,
                      near_width: float = 4.0):
    """Build a jitted (T, p_pa, pl, vmr) -> (nL, nX) OD function with static
    Pallas bucket plans baked in.

    Static work decomposition keeps the evaluated work close to — and the
    cost far below — the hapi window work:

    * **layer groups** — wing bounds scale with pressure, spanning orders of
      magnitude down the atmosphere; each group gets its own plans;
    * **per-line packed placement** within a group — per-line wings (50
      halfwidths) span a wide range too; each line lands only in the
      nu-tiles its OWN wing bound touches (no class-max inflation);
    * **two-pass far-wing split** (``two_pass=True``): everywhere in the
      window the ~12-flop Humlicek asymptotic form is exact except inside
      hum1_wei's tiny |x|+y<15 core (a few tens of grid points around each
      line center), so the wing passes run in 'asym' mode and one narrow
      'core' pass adds the (Weideman - asymptotic) correction. The sum is
      pointwise identical to the single-pass blend.

    ``atmos_class`` is a representative concrete atmosphere used only to
    size the groups; the returned jitted function accepts traced
    thermodynamics of the same layer count and wing envelope.

    ``group_ratio=4.0`` merges layers aggressively: for a single concrete
    state the per-call grid-step overhead dominates the extra wing padding
    (measured 16% faster on the north-star workload than 1.6). The
    spectrum-sharded builder (:func:`make_od_pallas_local_fn`) defaults to
    1.6 instead — its min/max envelope states already widen per-group wing
    spans, so there merging inflates padded work past the overhead saved.
    """
    from ..kernels.pallas_xsect import UniformGrid, xsect_pallas

    if differentiable:
        if profile not in ("voigt", "sdvoigt") or line_mixing is not None:
            raise NotImplementedError(
                "differentiable Pallas OD supports the Voigt and SD-Voigt "
                "profiles; mixing Jacobians ride the jnp engine")
        # the analytic JVP kernels implement the single-pass blends
        two_pass = False

    mix_idx = None
    y_air = y_self = None
    n_T = 0.0
    if line_mixing is not None:
        y_air = np.asarray(line_mixing["y_air"], dtype=np.float64)
        y_self_arr = line_mixing.get("y_self")
        y_self = (None if y_self_arr is None
                  else jnp.asarray(np.asarray(y_self_arr)))
        n_T = float(line_mixing.get("n_T", 0.0))
        mix_idx = np.nonzero(y_air != 0.0)[0]

    g = grid if isinstance(grid, UniformGrid) else UniformGrid.from_axis(np.asarray(grid))
    lines_h, iso_h, states_h = _host_planning_views(lines, iso, atmos_class)
    cols = jnp.asarray(_line_species_cols(lines_h, states_h[0].mol_ids))
    calls = _build_od_calls(
        lines_h, iso_h, states_h, g, wing_abs=wing_abs, wing_hw=wing_hw,
        max_groups=max_groups, tile=tile,
        two_pass=two_pass, far_tile=far_tile, far_block=far_block,
        group_ratio=group_ratio,
        core_tile=core_tile, core_block=core_block, profile=profile,
        mix_idx=mix_idx)
    cont = _make_continuum_term(g, states_h[0].mol_ids, continuum,
                                continuum_factors)
    y_air_j = None if y_air is None else jnp.asarray(y_air)

    # Coarse-far for statically-exact absolute wings (LBLRTM-convention
    # wing_abs runs): same scheme as the XS-lattice builder — the wings
    # are identical across layers, so the coarse/corr passes need no
    # layer grouping; the classic per-line-tight core passes stay.
    use_coarse = False
    if far_method in ("auto", "coarse") and profile in ("voigt", "sdvoigt") \
            and two_pass and not differentiable and line_mixing is None \
            and float(wing_abs) > 0.0:
        # static exactness under the engine's usual vmr-envelope contract
        # (wing_bound_matrix margin; runtime vmr beyond it already falls
        # back to graceful wing truncation in the classic path too)
        hw_wing = np.max([wing_bound_matrix(lines_h, iso_h, st,
                                            wing_abs=0.0, wing_hw=wing_hw)
                          for st in states_h])
        wide = float(wing_abs) >= max(
            16.0 * coarse_r * g.dx,
            _coarse_far_min_wing(g, coarse_r, near_width))
        use_coarse = bool(hw_wing <= float(wing_abs)) and wide
    if far_method == "coarse" and not use_coarse:
        raise ValueError(
            "far_method='coarse' requires profile voigt/sdvoigt, two_pass, "
            "no differentiable/line_mixing, and a wing_abs that dominates "
            "every line's halfwidth wing (statically exact windows) while "
            "clearing the near-zone/edge-band plan-disjointness bound "
            f"({_coarse_far_min_wing(g, coarse_r, near_width):.3g} cm^-1 "
            f"here); got wing_abs={wing_abs!r}")
    g_c = coarse_calls = corr_calls = None
    if use_coarse:
        calls = [c for c in calls if c[3] in ("core", "sdvoigt_core")]
        nw = _coarse_near_width(coarse_r, g.dx, near_width)
        g_c, coarse_calls, corr_calls = _build_coarse_far_calls(
            lines_h, g, wing_abs, profile, coarse_r, nw,
            tile_coarse=min(tile, 512),
            tile_corr=_coarse_tile_corr(g, coarse_r, nw, wing_abs))
    R = int(coarse_r)

    @jax.jit
    def od_fn(T, p_pa, pl, vmr):
        import dataclasses as _dc

        p_atm = p_pa / PA_PER_ATM

        def one(T_l, p_l, pl_l, vmr_l):
            u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
            return compute_line_params(
                lines, iso, T_l, p_l, vmr_self=vmr_l[cols],
                wing_abs=wing_abs, wing_hw=wing_hw, strength_scale=u[cols],
                profile=profile,
            )

        params = jax.vmap(one)(T, p_atm, pl, vmr)
        params_mix = None
        if y_air_j is not None:
            from ..kernels.linemixing import mixing_coefficient

            Y = jax.vmap(lambda T_l, p_l, vmr_l: mixing_coefficient(
                y_air_j, p_l, T_l, y_self=y_self,
                x_self=vmr_l[cols], n_T=n_T))(T, p_atm, vmr)
            # Y rides the kernel's spare gamma_2 slot in 'mix' mode
            params_mix = _dc.replace(params, gamma_2=Y.astype(params.gamma_2.dtype))
        sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)
        n_lay = T.shape[0]
        if use_coarse:
            all_lay = jnp.arange(n_lay)
            out_c = jnp.zeros((n_lay, g_c.n), dtype=jnp.float32)
            for cls_idx, plan, mode in coarse_calls:
                out_c = out_c + xsect_pallas(
                    plan, sub(params, all_lay, cls_idx),
                    n_weideman=n_weideman, mode=mode, fused_layers=True,
                    fast_rcp=fast_rcp)
            out = _coarse_upsample(out_c, g.n, R)
            for cls_idx, plan, mode in corr_calls:
                out = out + xsect_pallas(
                    plan, sub(params, all_lay, cls_idx),
                    n_weideman=n_weideman, mode=mode, fused_layers=True,
                    fast_rcp=fast_rcp)
        else:
            out = jnp.zeros((n_lay, g.n), dtype=jnp.float32)
        for lay_idx, cls_idx, plan, mode in calls:
            src = params_mix if mode == "mix" else params
            out = out.at[lay_idx].add(
                xsect_pallas(plan, sub(src, lay_idx, cls_idx),
                             n_weideman=n_weideman, mode=mode,
                             fused_layers=True, fast_rcp=fast_rcp,
                             differentiable=differentiable))
        if y_air_j is not None:
            # first-order Rosenkranz mixing can leave small negative
            # excursions next to a Q branch (a truncation artifact, not
            # physics: LTE absorption is nonnegative); clamp before the
            # continuum so exp(-od) downstream cannot blow up at steep
            # slant angles (round-5 full-res finding)
            out = jnp.maximum(out, 0.0)
        if cont is not None:
            out = out + cont(T, p_pa, pl, vmr)
        return out

    od_fn.work_report = _work_report(
        n_weideman,
        [(mode, plan, len(lay_idx)) for lay_idx, _, plan, mode in calls],
        coarse_calls, corr_calls,
        n_lay_full=int(np.asarray(states_h[0].T).size))
    return od_fn


def _make_continuum_term(g, mol_ids, continuum, continuum_factors,
                         n_local=None):
    """Optional per-layer continuum-OD term for the Pallas OD builders.

    Returns ``fn(T, p_pa, pl, vmr, k_offset=0) -> (nLay, n_local) float32``
    or None. ``n_local``/``k_offset`` select a contiguous grid slice
    (spectrum-sharded builders pass the shard's width and traced offset).

    Models with a layer-hoisted factory
    (:data:`~radtxfr_tpu.atmos.continuum.LAYERED_CONTINUUM_FACTORIES`,
    currently 'mt_ckd') evaluate through it: nu-only tables are
    interpolated once at build time in float64 instead of per layer
    inside the vmap — same math, tighter numerics, ~2x faster (the
    per-layer re-interpolation cost ~18% of the whole production Voigt
    OD). Other models fall back to the per-layer vmap of the pointwise
    form.
    """
    if continuum == "none":
        return None
    from ..atmos.continuum import (CONTINUUM_MODELS,
                                   LAYERED_CONTINUUM_FACTORIES,
                                   check_h2o_table_coverage)

    if continuum == "mt_ckd":
        check_h2o_table_coverage(g.x0, g.x0 + g.dx * (g.n - 1))
    cf = (jnp.ones(7) if continuum_factors is None
          else jnp.asarray(continuum_factors, dtype=jnp.float32))
    if cf.shape != (7,):
        raise ValueError("continuum_factors must have 7 elements")
    n = g.n if n_local is None else n_local
    mol_ids = tuple(mol_ids)

    factory = LAYERED_CONTINUUM_FACTORIES.get(continuum)
    if factory is not None:
        nu_full = g.x0 + g.dx * np.arange(g.n, dtype=np.float64)
        layered = factory(nu_full, mol_ids)

        def term(T, p_pa, pl, vmr, k_offset=0, k_index=None):
            # k_index: explicit per-point global grid indices (weighted/
            # permuted sharding); k_offset: contiguous-slice shorthand.
            if k_index is not None:
                k = jnp.asarray(k_index, dtype=jnp.int32)
            elif n_local is None and isinstance(k_offset, int) \
                    and k_offset == 0:
                k = None                    # whole grid: skip the gather
            else:
                k = (jnp.asarray(k_offset, dtype=jnp.int32)
                     + jnp.arange(n, dtype=jnp.int32))
            return layered(T, p_pa, pl, vmr, cf,
                           k=k).astype(jnp.float32)

        return term

    cfn = CONTINUUM_MODELS[continuum]

    def term(T, p_pa, pl, vmr, k_offset=0, k_index=None):
        # continuum coefficients are smooth — a float32 axis is plenty.
        # k_index: explicit per-point global grid indices (weighted/
        # permuted sharding); k_offset: contiguous-slice shorthand.
        if k_index is not None:
            k = jnp.asarray(k_index, dtype=jnp.float32)
        else:
            k = (jnp.asarray(k_offset, dtype=jnp.float32)
                 + jnp.arange(n, dtype=jnp.float32))
        nu = jnp.float32(g.x0) + jnp.float32(g.dx) * k
        one = lambda T_l, p_l, pl_l, vmr_l: cfn(nu, T_l, p_l, vmr_l,
                                                mol_ids, pl_l, cf)
        return jax.vmap(one)(T, p_pa, pl, vmr).astype(jnp.float32)

    return term


def _work_report(n_weideman, classic_calls, coarse_calls, corr_calls,
                 n_lay_full):
    """Executed-work manifest for a builder's kernel calls.

    One entry per Pallas call: ``{"mode", "evals", "n_weideman"}`` with
    ``evals`` = the dense (line-slot x point) work the chip executes
    (:func:`~radtxfr_tpu.kernels.pallas_xsect.plan_executed_evals` —
    padding slots included, skipped blocks excluded). bench.py's roofline
    multiplies by the hand-counted per-mode op cost
    (``pallas_xsect._ops_per_eval``; derivations in docs/ROOFLINE.md).
    ``classic_calls``: (mode, plan, n_lay) triples; coarse/corr calls run
    over all ``n_lay_full`` layers/states.
    """
    from ..kernels.pallas_xsect import plan_executed_evals

    report = [{"mode": mode, "evals": plan_executed_evals(plan, n_lay),
               "n_weideman": n_weideman}
              for mode, plan, n_lay in classic_calls]
    for _cls, plan, mode in (coarse_calls or []):
        report.append({"mode": mode,
                       "evals": plan_executed_evals(plan, n_lay_full),
                       "n_weideman": n_weideman})
    for _cls, plan, mode in (corr_calls or []):
        report.append({"mode": mode,
                       "evals": plan_executed_evals(plan, n_lay_full),
                       "n_weideman": n_weideman})
    return report


def _coarse_near_width(coarse_r, dx, near_width):
    """Near-zone half-width for the coarse-far scheme (cubic stencil).

    The 4-point Lagrange interpolation of a smooth 1/d^2-class wing has
    relative error ~2.8 (R dx / d)^4 (Lagrange remainder constant 0.0234
    x f''''/f ~ 120/d^4), so d >= 41 R dx keeps the per-line boundary
    error < 1e-6 of the local wing value — small enough that even dense
    lists summing thousands of coherent wing biases stay ~1e-5-of-peak.
    """
    return max(float(near_width), 41.0 * int(coarse_r) * dx)


def _coarse_tile_corr(g, coarse_r, near_width, wing_abs,
                      lo: int = 512, hi: int = 2048) -> int:
    """Largest power-of-two correction tile whose near/edge
    plan-disjointness bound (:func:`_coarse_far_min_wing`) still clears
    ``wing_abs``. Wider corr tiles amortize the correction kernels'
    per-grid-step overhead — 2048 measured 13% faster than 512 on the
    350 cm^-1-wing XS lattice — but they widen the disjointness bound,
    so moderate wings (the layered 25 cm^-1 LBLRTM convention on coarse
    grids) step down automatically. Must stay a multiple of coarse_r;
    eligibility itself is checked by the callers at ``lo``.
    """
    tc = hi
    while tc > lo and (tc % int(coarse_r)
                       or _coarse_far_min_wing(g, coarse_r, near_width,
                                               tile_corr=tc)
                       > float(wing_abs)):
        tc //= 2
    return max(tc, lo)


def _coarse_far_min_wing(g, coarse_r, near_width, tile_corr=512):
    """Minimum statically-safe ``wing_abs`` for the coarse-far scheme.

    The near-zone and window-edge correction passes are independent packed
    plans, and the corr kernel masks only by the TRUE window (the plans'
    placement is what localizes each pass). If the near interval
    [nu0 - nw, nu0 + nw] and an edge band [nu0 +- wing_abs -+ (2R+2) dx]
    (the cubic stencil's two-segment reach) ever share a ``tile_corr``
    tile, that (line, tile) membership applies the correction twice.
    Disjointness is guaranteed when the gap between the intervals exceeds
    one correction tile:

        wing_abs - (2R+2) dx - nw >= tile_corr dx  (+ slack for rounding)
    """
    R = int(coarse_r)
    nw = _coarse_near_width(R, g.dx, near_width)
    return nw + (2 * R + 2 + int(tile_corr) + 4) * g.dx


def _coarse_upsample(out_c, n_fine, R):
    """Uniform 4-point Lagrange-cubic upsample of the coarse far field.

    ``out_c`` is (nLay, n_coarse) on the extended coarse grid built by
    :func:`_build_coarse_far_calls` (column 0 one coarse step LEFT of the
    fine origin). Fine point i in segment j = i//R interpolates coarse
    nodes (j-1, j, j+1, j+2) = extended columns (j .. j+3). The weights
    MUST match the corr kernels' in-kernel stencil exactly — the
    correction passes subtract this same interpolation to make their
    zones exact.
    """
    i = jnp.arange(n_fine)
    j = i // R
    t = ((i - j * R) / R).astype(jnp.float32)
    wm1 = -t * (t - 1.0) * (t - 2.0) * (1.0 / 6.0)
    w0 = (t * t - 1.0) * (t - 2.0) * 0.5
    w1 = -t * (t + 1.0) * (t - 2.0) * 0.5
    w2 = t * (t * t - 1.0) * (1.0 / 6.0)
    return (out_c[:, j] * wm1 + out_c[:, j + 1] * w0
            + out_c[:, j + 2] * w1 + out_c[:, j + 3] * w2)


def _build_coarse_far_calls(lines_h, g, wing_abs, profile, coarse_r,
                            near_width, tile_coarse, tile_corr,
                            subsets=None):
    """Coarse-far decomposition for statically-exact absolute wings.

    Returns (g_coarse, coarse_calls, corr_calls): the far field is
    evaluated on an R-decimated grid (same guarded asym forms as the
    classic wing passes) and upsampled with the uniform 4-point Lagrange
    cubic; correction passes make the result EXACT near line centers
    (curvature region, +-near_width) and across the hapi window-edge
    discontinuity (+-2*R*dx bands at nu0 +- wing_abs, the cubic
    stencil's reach), by subtracting the same cubic interpolation of
    the per-line far field inside the kernel
    (:func:`~radtxfr_tpu.kernels.pallas_xsect._make_fused_kernel` mode
    ``corr:R:*``). Between those zones the only deviation from the
    classic two-pass result is smooth-wing interpolation error
    ~2.8 (R dx / d)^4 of the local wing value — per line ~1e-6 at the
    near-zone boundary, and still ~1e-5-of-peak for DENSE lists whose
    thousands of overlapping wing errors sum coherently (linear interp's
    O((R dx/d)^2) bias measured 2.7e-3-of-peak on the 30k-line XS
    lattice — the reason for the cubic). Work drops by ~R on the
    wing-dominated share.

    The coarse grid carries one extra node on each side (x0 - R dx) so
    every fine point, including the first and last segments, has the
    full 4-node stencil; the kernels' node row 0 is one coarse step left
    of each tile start to match.
    """
    from ..kernels.pallas_xsect import UniformGrid, plan_buckets_packed

    R = int(coarse_r)
    if tile_corr % R:
        raise ValueError(f"correction tile ({tile_corr}) must be a "
                         f"multiple of coarse_r ({R})")
    g_c = UniformGrid(x0=g.x0 - g.dx * R, dx=g.dx * R, n=(g.n - 1) // R + 4)
    nu0 = np.asarray(lines_h.nu0, dtype=np.float64)
    if subsets is None:
        # default routing by the store's sd_air column; callers with their
        # own per-line routing (the HT builder's resolved columns) pass
        # explicit (idx, far_mode, corr_kind) subsets instead
        if profile == "sdvoigt":
            sd_mask = np.asarray(lines_h.sd_air, dtype=np.float64) != 0.0
            subsets = [(np.nonzero(sd_mask)[0], "sdvoigt_asym", "sdvoigt"),
                       (np.nonzero(~sd_mask)[0], "asym", "voigt")]
        else:
            subsets = [(np.arange(nu0.size), "asym", "voigt")]

    coarse_calls, corr_calls = [], []
    h = R * g.dx
    for idx, far_mode, corr_kind in subsets:
        if not idx.size:
            continue
        nu_s = nu0[idx]
        idx_j = jnp.asarray(idx)
        plan_c = plan_buckets_packed(nu_s, g_c, float(wing_abs),
                                     tile=tile_coarse, block="auto")
        coarse_calls.append((idx_j, plan_c, far_mode))
        # near pass corrects the interp error of the (guarded-asym)
        # coarse field around line centers; the classic per-line-tight
        # core passes then add (full - asym) on top, exactly as in the
        # classic decomposition. (A 'corr:R:*full' variant that folds
        # the core into the near pass exists in the kernel, but sizing
        # its zone by the SD-Voigt core bound costs more than the tight
        # classic core passes — measured.)
        plan_n = plan_buckets_packed(nu_s, g, float(near_width),
                                     tile=tile_corr, block="auto")
        corr_calls.append((idx_j, plan_n, f"corr:{R}:{corr_kind}"))
        for side in (-1.0, 1.0):
            # 2h: a fine point's cubic stencil reaches two coarse
            # segments either way, so points within 2*R*dx of the
            # window edge mix masked and unmasked node values
            plan_e = plan_buckets_packed(
                nu_s, g, 2.0 * h + 2.0 * g.dx, tile=tile_corr,
                block="auto", place_center=nu_s + side * float(wing_abs))
            corr_calls.append((idx_j, plan_e, f"corr:{R}:{corr_kind}"))
    return g_c, coarse_calls, corr_calls


def make_xsect_pallas_fn(lines, iso, grid, T_class, p_atm_class,
                         profile: str = "voigt", wing_abs=0.0, wing_hw=50.0,
                         max_groups: int = 8, tile: int = 512,
                         n_weideman: int = 16, two_pass: bool = True,
                         group_ratio: float = 4.0, fast_rcp: bool = True,
                         far_method: str = "auto", coarse_r: int = 64,
                         near_width: float = 4.0):
    """Build a jitted (T_states, p_atm_states) -> (nStates, nX) cross-section
    function [cm^2/molec] on the Pallas engine.

    This is the production path for the reference's XS-table generator
    (``misc/RT_gen_AbsXS_files.py:15-31,87-92``: a (T, p) lattice of
    SD-Voigt cross-sections at 0.0025 cm^-1 with 350 cm^-1 absolute wings).
    The thermodynamic *states play the role of layers* in the fused kernel —
    the whole lattice evaluates in one set of kernel launches. HITRAN units:
    no column-density factor is folded into the strengths (hapi
    ``HITRAN_units=True``); ``vmr_self=0`` matches hapi's default
    ``Diluent={'air': 1}``.

    ``T_class/p_atm_class`` are concrete envelope state arrays used for the
    static wing planning; the returned function accepts traced arrays of the
    same length whose wings stay within the envelope.

    ``far_method``: ``'coarse'`` evaluates the far wings on an
    ``coarse_r``-decimated grid with exact correction passes near line
    centers and window edges (see :func:`_build_coarse_far_calls`) —
    ~R x less wing work. Requires statically-exact wings (``wing_abs``
    dominating every line's halfwidth wing at every class state);
    ``'auto'`` enables it when that condition holds and ``wing_abs``
    spans many tiles, ``'classic'`` never.
    """
    from ..atmos.profile import AtmosphericState
    from ..kernels.pallas_xsect import UniformGrid, xsect_pallas

    g = grid if isinstance(grid, UniformGrid) else UniformGrid.from_axis(np.asarray(grid))
    T_c = np.asarray(T_class, dtype=np.float64).ravel()
    p_c = np.asarray(p_atm_class, dtype=np.float64).ravel()
    mol_ids = tuple(int(m) for m in np.unique(np.asarray(lines.mol_id)))
    pseudo = AtmosphericState(
        z0=jnp.zeros(T_c.size), z1=jnp.ones(T_c.size), pl=jnp.ones(T_c.size),
        p=jnp.asarray(p_c * PA_PER_ATM), T=jnp.asarray(T_c),
        vmr=jnp.zeros((T_c.size, len(mol_ids))), mol_ids=mol_ids,
    )
    lines_h, iso_h, states_h = _host_planning_views(lines, iso, pseudo)

    use_coarse = False
    if far_method in ("auto", "coarse") and profile in ("voigt", "sdvoigt")             and two_pass and float(wing_abs) > 0.0:
        # static exactness: runtime wing = max(wing_abs, hw*max(g0, gd))
        # must equal wing_abs for every (state, line) in the class
        hw_wing = np.max([wing_bound_matrix(lines_h, iso_h, st,
                                            wing_abs=0.0, wing_hw=wing_hw,
                                            vmr_margin=None)
                          for st in states_h])
        wide = float(wing_abs) >= max(
            16.0 * coarse_r * g.dx,
            _coarse_far_min_wing(g, coarse_r, near_width))
        use_coarse = bool(hw_wing <= float(wing_abs)) and wide
    if far_method == "coarse" and not use_coarse:
        raise ValueError(
            "far_method='coarse' requires profile voigt/sdvoigt with "
            "two_pass and a wing_abs that dominates every line's "
            "halfwidth wing over the class states (statically exact "
            "windows) while clearing the near-zone/edge-band "
            "plan-disjointness bound "
            f"({_coarse_far_min_wing(g, coarse_r, near_width):.3g} cm^-1 "
            f"here); got wing_abs={wing_abs!r}, profile={profile!r}")

    calls = _build_od_calls(
        lines_h, iso_h, states_h, g, wing_abs=wing_abs, wing_hw=wing_hw,
        max_groups=max_groups, tile=tile, two_pass=two_pass,
        far_tile=None, far_block=None, group_ratio=group_ratio,
        profile=profile)
    g_c = coarse_calls = corr_calls = None
    if use_coarse:
        # wing passes are replaced by the coarse far field + correction
        # passes; the classic (full - asym) core passes stay (per-line
        # tight placement). The near zone only needs to bound the
        # smooth-wing cubic-interpolation error: ~2.8 (R dx / d)^4 of
        # the local wing value => d >= 41 R dx keeps it < 1e-6 per line
        # (_coarse_near_width).
        calls = [c for c in calls if c[3] in ("core", "sdvoigt_core")]
        nw = _coarse_near_width(coarse_r, g.dx, near_width)
        g_c, coarse_calls, corr_calls = _build_coarse_far_calls(
            lines_h, g, wing_abs, profile, coarse_r, nw,
            tile_coarse=min(tile, 512),
            tile_corr=_coarse_tile_corr(g, coarse_r, nw, wing_abs))

    R = int(coarse_r)

    @jax.jit
    def xs_fn(T, p_atm):
        def one(T_l, p_l):
            return compute_line_params(
                lines, iso, T_l, p_l, vmr_self=0.0,
                wing_abs=wing_abs, wing_hw=wing_hw, profile=profile)

        params = jax.vmap(one)(T, p_atm)
        n_states = T.shape[0]
        all_states = jnp.arange(n_states)
        sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)
        if use_coarse:
            out_c = jnp.zeros((n_states, g_c.n), dtype=jnp.float32)
            for cls_idx, plan, mode in coarse_calls:
                out_c = out_c + xsect_pallas(
                    plan, sub(params, all_states, cls_idx),
                    n_weideman=n_weideman, mode=mode, fused_layers=True,
                    fast_rcp=fast_rcp)
            out = _coarse_upsample(out_c, g.n, R)
            for cls_idx, plan, mode in corr_calls:
                out = out + xsect_pallas(
                    plan, sub(params, all_states, cls_idx),
                    n_weideman=n_weideman, mode=mode, fused_layers=True,
                    fast_rcp=fast_rcp)
        else:
            out = jnp.zeros((n_states, g.n), dtype=jnp.float32)
        for lay_idx, cls_idx, plan, mode in calls:
            out = out.at[lay_idx].add(
                xsect_pallas(plan, sub(params, lay_idx, cls_idx),
                             n_weideman=n_weideman, mode=mode,
                             fused_layers=True, fast_rcp=fast_rcp))
        return out

    xs_fn.work_report = _work_report(
        n_weideman,
        [(mode, plan, len(lay_idx)) for lay_idx, _, plan, mode in calls],
        coarse_calls, corr_calls, n_lay_full=int(T_c.size))
    return xs_fn


def ht_wing_bounds(resolved, lines_h, iso, T_states, p_atm_states,
                   wing_abs=0.0, wing_hw=50.0):
    """(nStates, nLines) hapi wing bounds from resolved HT columns.

    The same rule the traced :func:`~radtxfr_tpu.kernels.ht_driver.ht_params`
    applies — ``max(wing_abs, wing_hw * max(Gamma0(T,p), GammaD(T)))`` with
    the diluent-summed Gamma0 — evaluated host-side in numpy. Single source
    for the Pallas planner and the benchmark's window-eval accounting."""
    from ..core.constants import P_REF, T_REF

    gd_coeff = _gd_coeff(lines_h, jax.device_get(iso))
    T_c = np.asarray(T_states, dtype=np.float64).ravel()
    p_c = np.asarray(p_atm_states, dtype=np.float64).ravel()
    W = np.zeros((T_c.size, np.asarray(lines_h.nu0).size))
    for r, (T_s, p_s) in enumerate(zip(T_c, p_c)):
        g0 = np.zeros_like(W[0])
        for abun, g0db, ndb, *_ in resolved:
            g0 = g0 + abun * np.asarray(g0db) * (p_s / P_REF) \
                * (T_REF / T_s) ** np.asarray(ndb)
        gd = np.sqrt(T_s) * gd_coeff
        W[r] = np.maximum(wing_abs, wing_hw * np.maximum(g0, gd))
    return W


def make_ht_pallas_fn(lines, iso, grid, T_class, p_atm_class, diluent=None,
                      extras=None, wing_abs=0.0, wing_hw=50.0,
                      tile: int = 128, n_weideman: int = 16,
                      max_groups: int = 4, group_ratio: float = 4.0,
                      fast_rcp: bool = True, far_method: str = "auto",
                      coarse_r: int = 64, near_width: float = 4.0):
    """Build a jitted (T_states, p_atm_states) -> (nStates, nX)
    Hartmann-Tran cross-section function [cm^2/molec] on the Pallas engine.

    Completes the fast-path family: the full pcqsdhc region structure
    (complex eta, nuVC, Shift2 — the reference's ``PROFILE_HT`` /
    ``absorptionCoefficient_HT``, ``misc/hapi.py:10302-10650``) evaluated
    in real arithmetic inside the bucketed kernel
    (:func:`~radtxfr_tpu.kernels.pallas_xsect.xsect_ht_pallas`). HITRAN
    units, hapi window mask; HT columns resolve with hapi's fallbacks from
    the ``extras`` dict (e.g. a table fetched with ``pargroups=['ht']``).

    Per-line specialization: pcqsdhc degenerates exactly to the SD-Voigt
    block when eta = nuVC = Shift2 = 0, and to the shifted Voigt profile
    when additionally Gamma2 = 0 — which is what the resolved columns give
    for every line lacking HT-specific parameters (most of HITRAN; hapi
    then pays full pcqsdhc anyway). Such lines are routed host-side to the
    cheaper Pallas modes; only lines with live eta/nuVC/Shift2 columns run
    the ~40-temp HT kernel. Identical math, same window mask.

    ``tile=128`` (narrower than the Voigt builders' 512) is measured
    optimal for the HT kernels' high live-register pressure on v5e —
    1.5x (lattice) / 2.3x (layered) over 512 at ~3e-7 rel deviation
    (tools/tile_sweep_ht.py).
    """
    from ..kernels.ht_driver import ht_params, resolve_ht_columns
    from ..kernels.htp_real import ht_line_constants
    from ..kernels.lineparams import LineParams
    from ..kernels.pallas_xsect import (UniformGrid, plan_buckets_packed,
                                        xsect_ht_pallas, xsect_pallas)

    if diluent is None:
        diluent = {"air": 1.0}
    g = grid if isinstance(grid, UniformGrid) else UniformGrid.from_axis(np.asarray(grid))
    lines_h = lines.host_view()
    resolved = resolve_ht_columns(lines_h, extras, diluent)

    # host wing bounds per (state, line) from the resolved HT columns
    W = ht_wing_bounds(resolved, lines_h, iso, T_class, p_atm_class,
                       wing_abs=wing_abs, wing_hw=wing_hw)

    nu0 = np.asarray(lines_h.nu0, dtype=np.float64)

    # host routing masks from the resolved (concrete) columns
    L = nu0.size
    g2_any = np.zeros(L, dtype=bool)
    full_m = np.zeros(L, dtype=bool)
    for _abun, _g0db, _ndb, _d0, _dp, g2db, d2db, nuvc_db, _kap, eta_db in resolved:
        g2_any |= np.asarray(g2db) != 0.0
        full_m |= ((np.asarray(d2db) != 0.0) | (np.asarray(nuvc_db) != 0.0)
                   | (np.asarray(eta_db) != 0.0))

    cap_ht = max(8, ((1 << 16) // tile) // 8 * 8)   # pcqsdhc: ~40 live temps
    cap_sd = max(8, ((1 << 17) // tile) // 8 * 8)
    subsets = [("ht", np.nonzero(full_m)[0], cap_ht),
               ("sdvoigt", np.nonzero(~full_m & g2_any)[0], cap_sd),
               ("full", np.nonzero(~full_m & ~g2_any)[0], cap_sd)]

    # Coarse-far for the SD-Voigt/Voigt-routed subsets (exact pcqsdhc
    # degenerations) when the absolute wing is statically exact; the
    # live-HT subset keeps the classic full-window kernel. Same scheme
    # as make_xsect_pallas_fn, with explicit per-line routing subsets.
    use_coarse = False
    if far_method in ("auto", "coarse") and float(wing_abs) > 0.0:
        W_hw = ht_wing_bounds(resolved, lines_h, iso, T_class, p_atm_class,
                              wing_abs=0.0, wing_hw=wing_hw)
        wide = float(wing_abs) >= max(
            16.0 * coarse_r * g.dx,
            _coarse_far_min_wing(g, coarse_r, near_width))
        use_coarse = bool(W_hw.max() <= float(wing_abs)) and wide
    if far_method == "coarse" and not use_coarse:
        raise ValueError(
            "far_method='coarse' requires a wing_abs dominating every "
            "line's halfwidth wing over the class states while clearing "
            "the near-zone/edge-band plan-disjointness bound "
            f"({_coarse_far_min_wing(g, coarse_r, near_width):.3g} cm^-1 "
            f"here); got wing_abs={wing_abs!r}")
    g_c = coarse_calls = corr_calls = None
    coarse_modes = ()
    from ..atmos.profile import AtmosphericState

    T_cc = np.asarray(T_class, dtype=np.float64).ravel()
    p_cc = np.asarray(p_atm_class, dtype=np.float64).ravel()
    mol_ids_c = tuple(int(m) for m in np.unique(np.asarray(lines_h.mol_id)))
    states_c = [AtmosphericState(
        z0=jnp.zeros(T_cc.size), z1=jnp.ones(T_cc.size),
        pl=jnp.ones(T_cc.size), p=jnp.asarray(p_cc * PA_PER_ATM),
        T=jnp.asarray(T_cc), vmr=jnp.zeros((T_cc.size, len(mol_ids_c))),
        mol_ids=mol_ids_c)]
    iso_h_c = jax.device_get(iso)
    if use_coarse:
        cf_subsets = []
        for mode, idx, _cap in subsets[1:]:
            if idx.size:
                cf_subsets.append(
                    (idx, "sdvoigt_asym" if mode == "sdvoigt" else "asym",
                     "sdvoigt" if mode == "sdvoigt" else "voigt"))
        if cf_subsets:
            nw = _coarse_near_width(coarse_r, g.dx, near_width)
            g_c, coarse_calls, corr_calls = _build_coarse_far_calls(
                lines_h, g, wing_abs, "ht", coarse_r, nw,
                tile_coarse=min(tile, 512),
                tile_corr=_coarse_tile_corr(g, coarse_r, nw, wing_abs),
                subsets=cf_subsets)
            # the cheap subsets' wing passes are replaced; their
            # (full - asym) cores remain as narrow classic calls below
            coarse_modes = ("sdvoigt", "full")
        else:
            use_coarse = False

    calls = []
    for mode, idx, cap in subsets:
        if idx.size == 0:
            continue
        W_s = W[:, idx]
        if use_coarse and mode in coarse_modes:
            # classic core passes for the coarse-covered subsets: the
            # (Weideman - asym) / SD-Voigt core corrections on per-line
            # tight windows
            core_w = np.max([core_wing_per_line(lines_h, iso_h_c, st)
                             for st in states_c], axis=0)[idx]
            if mode == "sdvoigt":
                core_w = np.maximum(core_w, np.max(
                    [sdvoigt_core_bound(lines_h, iso_h_c, st)
                     for st in states_c], axis=0)[:, idx].max(axis=0))
            core_w = np.minimum(core_w, float(wing_abs))
            c_tile = _pow2_tile(int(np.ceil(2.0 * core_w.max() / g.dx)),
                                lo=256, hi=512)
            plan = plan_buckets_packed(nu0[idx], g, core_w, tile=c_tile,
                                       block=16)
            calls.append(("sdvoigt_core" if mode == "sdvoigt" else "core",
                          jnp.asarray(np.arange(W.shape[0])),
                          jnp.asarray(idx), plan))
            continue
        for lay_idx, _ in group_by_wing(W_s.max(axis=1), max_groups=max_groups,
                                        ratio=group_ratio):
            lay_idx = np.sort(lay_idx)
            w_line = W_s[lay_idx].max(axis=0)
            plan = plan_buckets_packed(nu0[idx], g, w_line, tile=tile,
                                       block="auto")
            if plan.block > cap:
                plan = plan_buckets_packed(nu0[idx], g, w_line, tile=tile,
                                           block=cap)
            calls.append((mode, jnp.asarray(lay_idx), jnp.asarray(idx), plan))

    nu0_j = jnp.asarray(nu0, dtype=jnp.float32)
    R = int(coarse_r)

    @jax.jit
    def ht_fn(T, p_atm):
        def one(T_l, p_l):
            return ht_params(resolved, lines, iso, T_l, p_l,
                             wing_abs=wing_abs, wing_hw=wing_hw,
                             complex_dtype=jnp.complex64)

        prm = jax.vmap(one)(T, p_atm)
        sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)
        n_states = T.shape[0]
        all_states = jnp.arange(n_states)

        def cheap_params(idx, lay_idx):
            return LineParams(
                nu0=nu0_j[idx], nu0_shifted=nu0_j[idx],
                strength=sub(prm["strength"], lay_idx, idx),
                gamma_d=sub(prm["gamma_d"], lay_idx, idx),
                gamma_0=sub(prm["gamma0"], lay_idx, idx),
                wing=sub(prm["wing"], lay_idx, idx),
                gamma_2=sub(prm["gamma2"], lay_idx, idx),
                shift0=sub(prm["shift0"], lay_idx, idx))

        if use_coarse:
            out_c = jnp.zeros((n_states, g_c.n), dtype=jnp.float32)
            for cls_idx, plan, mode in coarse_calls:
                out_c = out_c + xsect_pallas(
                    plan, cheap_params(cls_idx, all_states),
                    n_weideman=n_weideman, mode=mode, fused_layers=True,
                    fast_rcp=fast_rcp)
            out = _coarse_upsample(out_c, g.n, R)
            for cls_idx, plan, mode in corr_calls:
                out = out + xsect_pallas(
                    plan, cheap_params(cls_idx, all_states),
                    n_weideman=n_weideman, mode=mode, fused_layers=True,
                    fast_rcp=fast_rcp)
        else:
            out = jnp.zeros((n_states, g.n), dtype=jnp.float32)
        for mode, lay_idx, idx, plan in calls:
            if mode == "ht":
                consts = ht_line_constants(
                    prm["gamma_d"], prm["gamma0"], prm["gamma2"],
                    prm["shift0"], prm["shift2"], prm["nuvc"],
                    jnp.real(prm["eta"]), jnp.imag(prm["eta"]))
                out = out.at[lay_idx].add(xsect_ht_pallas(
                    plan, sub(prm["strength"], lay_idx, idx),
                    sub(prm["wing"], lay_idx, idx),
                    sub(consts, lay_idx, idx),
                    n_weideman=n_weideman, fast_rcp=fast_rcp))
            else:
                out = out.at[lay_idx].add(xsect_pallas(
                    plan, cheap_params(idx, lay_idx), mode=mode,
                    fused_layers=True,
                    n_weideman=n_weideman, fast_rcp=fast_rcp))
        return out

    ht_fn.work_report = _work_report(
        n_weideman,
        [(mode, plan, len(lay_idx)) for mode, lay_idx, _, plan in calls],
        coarse_calls, corr_calls, n_lay_full=int(T_cc.size))
    return ht_fn


def make_od_ht_pallas_fn(lines, iso, grid, atmos_class, extras=None,
                         wing_abs=0.0, wing_hw=50.0, tile: int = 128,
                         n_weideman: int = 16, max_groups: int = 8,
                         group_ratio: float = 4.0, fast_rcp: bool = True,
                         continuum: str = "none", continuum_factors=None,
                         differentiable: bool = False):
    """Build a jitted (T, p_pa, pl, vmr) -> (nL, nX) **Hartmann-Tran** OD
    function for a layered atmosphere on the Pallas engine (VERDICT r2 #5:
    the full-HT fast path at layered production scale, matching
    ``absorptionCoefficient_HT``, ``misc/hapi.py:10302-10650``, with the
    layer drivers' air/self diluent mix).

    Same structure as :func:`make_ht_pallas_fn` with atmosphere layers in
    the role of lattice states, plus the layered-OD specifics:

    * **diluent mix is vmr-dependent**: columns resolve host-side for both
      ``air`` and ``self`` (hapi fallbacks), and the traced abundances
      ``[1 - x_self, x_self]`` — the line's own-molecule vmr per layer —
      enter :func:`~radtxfr_tpu.kernels.ht_driver.ht_params` per layer;
    * **strengths carry the species column density** (OD units, like every
      layer driver);
    * **per-line routing**: lines whose resolved columns make pcqsdhc
      degenerate exactly (eta = nuVC = Shift2 = 0 -> SD-Voigt block;
      additionally Gamma2 = 0 -> shifted Voigt) run the cheaper kernels;
      only live-HT lines pay the ~40-temp HT kernel.

    ``atmos_class`` (state or list) sizes the static plans; wing bounds
    use the conservative air+self column sum.
    """
    from ..kernels.ht_driver import ht_params, resolve_ht_columns
    from ..kernels.htp_real import ht_line_constants
    from ..kernels.lineparams import LineParams
    from ..kernels.pallas_xsect import (UniformGrid, plan_buckets_packed,
                                        xsect_ht_pallas, xsect_pallas)

    g = grid if isinstance(grid, UniformGrid) else UniformGrid.from_axis(np.asarray(grid))
    lines_h, iso_h, states_h = _host_planning_views(lines, iso, atmos_class)
    cols = jnp.asarray(_line_species_cols(lines_h, states_h[0].mol_ids))
    # abundance placeholders 1.0: traced [1-x_self, x_self] supplied per call
    resolved = resolve_ht_columns(lines_h, extras, {"air": 1.0, "self": 1.0})

    # conservative (layer, line) wing bounds: abun-1 air+self sum >= any mix
    W = np.max([ht_wing_bounds(resolved, lines_h, iso_h,
                               np.asarray(s.T), np.asarray(s.p) / PA_PER_ATM,
                               wing_abs=wing_abs, wing_hw=wing_hw)
                for s in states_h], axis=0)
    nu0 = np.asarray(lines_h.nu0, dtype=np.float64)

    # host routing masks over BOTH diluents' resolved columns
    L = nu0.size
    g2_any = np.zeros(L, dtype=bool)
    full_m = np.zeros(L, dtype=bool)
    for _abun, _g0db, _ndb, _d0, _dp, g2db, d2db, nuvc_db, _kap, eta_db in resolved:
        g2_any |= np.asarray(g2db) != 0.0
        full_m |= ((np.asarray(d2db) != 0.0) | (np.asarray(nuvc_db) != 0.0)
                   | (np.asarray(eta_db) != 0.0))

    cap_ht = max(8, ((1 << 16) // tile) // 8 * 8)   # pcqsdhc: ~40 live temps
    cap_sd = max(8, ((1 << 17) // tile) // 8 * 8)
    if differentiable:
        # the jvp-traced tangent kernels roughly double the live
        # (block x tile) temps; VMEM-measured caps (21.4M OOM at the
        # primal cap on v5e's 16M scoped limit)
        cap_ht = max(8, cap_ht // 4)
        cap_sd = max(8, cap_sd // 2)
    subsets = [("ht", np.nonzero(full_m)[0], cap_ht),
               ("sdvoigt", np.nonzero(~full_m & g2_any)[0], cap_sd),
               ("full", np.nonzero(~full_m & ~g2_any)[0], cap_sd)]

    calls = []
    for mode, idx, cap in subsets:
        if idx.size == 0:
            continue
        W_s = W[:, idx]
        for lay_idx, _ in group_by_wing(W_s.max(axis=1), max_groups=max_groups,
                                        ratio=group_ratio):
            lay_idx = np.sort(lay_idx)
            w_line = W_s[lay_idx].max(axis=0)
            plan = plan_buckets_packed(nu0[idx], g, w_line, tile=tile,
                                       block="auto")
            if plan.block > cap:
                plan = plan_buckets_packed(nu0[idx], g, w_line, tile=tile,
                                           block=cap)
            calls.append((mode, jnp.asarray(lay_idx), jnp.asarray(idx), plan))

    cont = _make_continuum_term(g, states_h[0].mol_ids, continuum,
                                continuum_factors)
    nu0_j = jnp.asarray(nu0, dtype=jnp.float32)

    @jax.jit
    def od_fn(T, p_pa, pl, vmr):
        p_atm = p_pa / PA_PER_ATM

        def one(T_l, p_l, pl_l, vmr_l):
            x_self = vmr_l[cols]
            u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
            prm = ht_params(resolved, lines, iso, T_l, p_l,
                            wing_abs=wing_abs, wing_hw=wing_hw,
                            complex_dtype=jnp.complex64,
                            abun=[1.0 - x_self, x_self])
            prm["strength"] = prm["strength"] * u[cols]
            return prm

        prm = jax.vmap(one)(T, p_atm, pl, vmr)
        out = jnp.zeros((T.shape[0], g.n), dtype=jnp.float32)
        sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)
        for mode, lay_idx, idx, plan in calls:
            if mode == "ht":
                consts = ht_line_constants(
                    prm["gamma_d"], prm["gamma0"], prm["gamma2"],
                    prm["shift0"], prm["shift2"], prm["nuvc"],
                    jnp.real(prm["eta"]), jnp.imag(prm["eta"]))
                out = out.at[lay_idx].add(xsect_ht_pallas(
                    plan, sub(prm["strength"], lay_idx, idx),
                    sub(prm["wing"], lay_idx, idx),
                    sub(consts, lay_idx, idx),
                    n_weideman=n_weideman, fast_rcp=fast_rcp,
                    differentiable=differentiable))
            else:
                lp = LineParams(
                    nu0=nu0_j[idx], nu0_shifted=nu0_j[idx],
                    strength=sub(prm["strength"], lay_idx, idx),
                    gamma_d=sub(prm["gamma_d"], lay_idx, idx),
                    gamma_0=sub(prm["gamma0"], lay_idx, idx),
                    wing=sub(prm["wing"], lay_idx, idx),
                    gamma_2=sub(prm["gamma2"], lay_idx, idx),
                    shift0=sub(prm["shift0"], lay_idx, idx))
                out = out.at[lay_idx].add(xsect_pallas(
                    plan, lp, mode=mode, fused_layers=True,
                    n_weideman=n_weideman, fast_rcp=fast_rcp,
                    differentiable=differentiable))
        if cont is not None:
            out = out + cont(T, p_pa, pl, vmr)
        return out

    od_fn.work_report = _work_report(
        n_weideman,
        [(mode, plan, len(lay_idx)) for mode, lay_idx, _, plan in calls],
        None, None, n_lay_full=int(np.asarray(states_h[0].T).size))
    return od_fn


def _od_layers_pallas(lines, iso, grid, atmos, profile="voigt",
                      wing_abs=0.0, wing_hw=50.0, plan=None, **pallas_opts):
    from ..kernels.pallas_xsect import UniformGrid, plan_buckets, xsect_pallas

    if profile == "ht":
        if plan is not None:
            raise ValueError("prebuilt plan= supports Voigt only")
        fn = make_od_ht_pallas_fn(lines, iso, grid, atmos,
                                  wing_abs=wing_abs, wing_hw=wing_hw,
                                  **pallas_opts)
        return fn(atmos.T, atmos.p, atmos.pl, atmos.vmr)
    if profile not in ("voigt", "sdvoigt", "lorentz", "doppler"):
        raise NotImplementedError(
            "pallas engine implements 'voigt', 'sdvoigt', 'lorentz', "
            f"'doppler' and 'ht'; use engine='jnp' for {profile!r}")
    if plan is not None:
        if profile != "voigt":
            raise ValueError(
                "prebuilt plan= supports Voigt only; sdvoigt needs the "
                "per-profile call split of make_od_pallas_fn(profile=...)")
        # With a prebuilt plan only kernel-eval options apply; plan-building
        # options would be silently ignored, so reject them loudly.
        eval_opts = {k: pallas_opts.pop(k) for k in
                     ("n_weideman", "fast_rcp", "interpret")
                     if k in pallas_opts}
        if pallas_opts:
            raise ValueError(
                f"options {sorted(pallas_opts)} affect plan construction and "
                f"have no effect with a prebuilt plan=; build the plan with "
                f"them (make_od_plan/make_od_pallas_fn) instead")
        cols = jnp.asarray(_line_species_cols(lines, atmos.mol_ids))
        params = layer_line_params(lines, iso, atmos, cols,
                                   wing_abs=wing_abs, wing_hw=wing_hw)
        return xsect_pallas(plan, params, **eval_opts)
    fn = make_od_pallas_fn(lines, iso, grid, atmos, profile=profile,
                           wing_abs=wing_abs, wing_hw=wing_hw, **pallas_opts)
    return fn(atmos.T, atmos.p, atmos.pl, atmos.vmr)


def make_od_pallas_local_fn(lines, iso, grid, atmos_class, n_shards: int,
                            wing_abs=0.0, wing_hw=50.0, max_groups: int = 8,
                            tile: int = 512, n_weideman: int = 16,
                            two_pass: bool = True, far_tile: int | None = None,
                            far_block: int | None = None,
                            group_ratio: float = 1.6, fast_rcp: bool = True,
                            profile: str = "voigt",
                            continuum: str = "none", continuum_factors=None,
                            line_mixing: dict | None = None,
                            partition: str = "equal",
                            differentiable: bool = False):
    """SPMD building block: per-shard OD over a spectrum-sharded grid.

    All shards run the *same* program (one set of static bucket plans built
    on a padded global grid whose tiles never straddle shard boundaries);
    what differs per shard is data: its slice of the per-tile line-block
    ranges and its global grid offset. Returns::

        (local_fn, spec_data, padded_grid)

    * ``local_fn(T, p_pa, pl, vmr, local_spec, k_offset) -> (nLay, n_local)``
      — call inside ``shard_map``; ``local_spec`` is the shard's slice of
      ``spec_data`` (shard axis leading), ``k_offset`` the shard's first
      global grid index (``axis_index * n_local``).
    * ``spec_data`` — list over kernel calls of (starts, counts) arrays of
      shape (n_shards, local_tiles) to pass sharded over the spectrum axis.
    * ``padded_grid`` — the padded :class:`UniformGrid`; ``n_local =
      padded_grid.n // n_shards`` (trailing pad points carry wing spill,
      slice them off after gathering).

    ``partition`` (VERDICT r3 #3):

    * ``'equal'`` — contiguous equal-width spectral slices (the classic
      layout); per-shard work skews with the line-density profile
      (measured 88.8% balance efficiency on the production-shaped
      8-shard dryrun in round 3).
    * ``'weighted'`` — tiles are grouped into chunks (the largest call
      tile span) and chunks are assigned to shards by greedy
      longest-processing-time on the packed plans' op-weighted executed
      work (``plan.counts x block x tile x n_lay x ops_per_eval``), with
      equal chunk cardinality so every shard runs the same program
      shape. Each shard's points are then a non-contiguous permutation
      of the global grid: ``spec_data`` becomes ``{"calls": [(starts,
      counts, tile_offsets), ...], "point_idx": (n_shards, n_local)
      int32}``, the kernels take per-tile global offsets, the continuum
      evaluates at exact global indices, and ``local_fn.point_index``
      maps shard-local outputs back to global grid order
      (``out_global[:, point_index[s]] = out_shard_s``).
    """
    from ..kernels.pallas_xsect import UniformGrid, xsect_pallas

    g0 = grid if isinstance(grid, UniformGrid) else UniformGrid.from_axis(np.asarray(grid))
    # Pad so every call's tile divides the per-shard point count. The far
    # pass uses far_tile (default 2*tile for two-pass) and the core pass
    # <= max(512, tile), all powers of two — align to the largest.
    f_tile_eff = far_tile or (2 * tile if two_pass else tile)
    align = max(f_tile_eff, tile, 512) * n_shards
    n_pad = -(-g0.n // align) * align
    g = UniformGrid(x0=g0.x0, dx=g0.dx, n=n_pad)
    n_local = n_pad // n_shards

    if differentiable:
        # Same contract as make_od_pallas_fn(differentiable=True): the
        # analytic-JVP kernels implement the single-pass blends and the
        # Voigt/SD-Voigt modes only; the sharded starts/counts/k_offset
        # overrides flow straight into xsect_fused_*_diff, so spectrum
        # sharding (incl. the weighted permuted partition) composes with
        # forward-mode autodiff.
        if profile not in ("voigt", "sdvoigt") or line_mixing is not None:
            raise NotImplementedError(
                "differentiable sharded OD supports the Voigt and SD-Voigt "
                "profiles without line mixing")
        two_pass = False

    # Rosenkranz line mixing (same composition as make_od_pallas_fn):
    # mixing lines run the 'mix' kernel mode with the per-layer Y riding
    # the spare gamma_2 slot; zero-y lines keep the ordinary Voigt passes.
    mix_idx = None
    y_air = y_self = None
    n_T = 0.0
    if line_mixing is not None:
        y_air = np.asarray(line_mixing["y_air"], dtype=np.float64)
        y_self_arr = line_mixing.get("y_self")
        y_self = (None if y_self_arr is None
                  else jnp.asarray(np.asarray(y_self_arr)))
        n_T = float(line_mixing.get("n_T", 0.0))
        mix_idx = np.nonzero(y_air != 0.0)[0]
    y_air_j = None if y_air is None else jnp.asarray(y_air)

    lines_h, iso_h, states_h = _host_planning_views(lines, iso, atmos_class)
    cols = jnp.asarray(_line_species_cols(lines_h, states_h[0].mol_ids))
    calls = _build_od_calls(
        lines_h, iso_h, states_h, g, wing_abs=wing_abs, wing_hw=wing_hw,
        max_groups=max_groups, tile=tile,
        two_pass=two_pass, far_tile=far_tile, far_block=far_block,
        group_ratio=group_ratio, profile=profile, mix_idx=mix_idx)
    cont = _make_continuum_term(g, states_h[0].mol_ids, continuum,
                                continuum_factors, n_local=n_local)

    for _, _, plan, _ in calls:
        if n_local % plan.tile:
            raise AssertionError(
                f"plan tile {plan.tile} does not divide the per-shard point "
                f"count {n_local}; alignment bug")

    point_index = None
    if partition == "equal":
        spec_data = []
        for _, _, plan, _ in calls:
            nt_loc = n_local // plan.tile
            spec_data.append((
                jnp.asarray(plan.starts.reshape(n_shards, nt_loc)),
                jnp.asarray(plan.counts.reshape(n_shards, nt_loc)),
            ))
    elif partition == "weighted":
        assign = _weighted_chunk_assignment(calls, n_pad, n_shards,
                                            n_weideman)
        A = n_pad // (assign.shape[0] * assign.shape[1])
        call_spec = []
        for _, _, plan, _ in calls:
            t = plan.tile
            tpc = A // t
            nt_loc = n_local // t
            gt = (assign[:, :, None] * tpc
                  + np.arange(tpc)).reshape(n_shards, nt_loc)
            offs = (gt * t - np.arange(nt_loc) * t).astype(np.int32)
            call_spec.append((jnp.asarray(plan.starts[gt]),
                              jnp.asarray(plan.counts[gt]),
                              jnp.asarray(offs)))
        point_index = (assign[:, :, None] * A
                       + np.arange(A)).reshape(n_shards, n_local)
        spec_data = {"calls": call_spec,
                     "point_idx": jnp.asarray(point_index.astype(np.int32))}
    else:
        raise ValueError(f"unknown partition {partition!r}")

    def local_fn(T, p_pa, pl, vmr, local_spec, k_offset):
        p_atm = p_pa / PA_PER_ATM

        def one(T_l, p_l, pl_l, vmr_l):
            u = species_column(p_l * PA_PER_ATM, T_l, pl_l, vmr_l)
            return compute_line_params(
                lines, iso, T_l, p_l, vmr_self=vmr_l[cols],
                wing_abs=wing_abs, wing_hw=wing_hw, strength_scale=u[cols],
                profile=profile,
            )

        params = jax.vmap(one)(T, p_atm, pl, vmr)
        params_mix = None
        if y_air_j is not None:
            import dataclasses as _dc

            from ..kernels.linemixing import mixing_coefficient

            Y = jax.vmap(lambda T_l, p_l, vmr_l: mixing_coefficient(
                y_air_j, p_l, T_l, y_self=y_self,
                x_self=vmr_l[cols], n_T=n_T))(T, p_atm, vmr)
            params_mix = _dc.replace(params,
                                     gamma_2=Y.astype(params.gamma_2.dtype))
        if isinstance(local_spec, dict):
            call_spec = [(s, c, o.reshape(-1)) for s, c, o
                         in local_spec["calls"]]
            k_index = local_spec["point_idx"].reshape(-1)
        else:
            call_spec = [(s, c, k_offset) for s, c in local_spec]
            k_index = None
        out = jnp.zeros((T.shape[0], n_local), dtype=jnp.float32)
        sub = lambda a, li, ci: jax.tree.map(lambda x: x[li][:, ci], a)
        for (lay_idx, cls_idx, plan, mode), (starts, counts, offs) in zip(
                calls, call_spec):
            src = params_mix if mode == "mix" else params
            od_c = xsect_pallas(
                plan, sub(src, lay_idx, cls_idx), n_weideman=n_weideman,
                mode=mode, fused_layers=True, fast_rcp=fast_rcp,
                starts=starts.reshape(-1), counts=counts.reshape(-1),
                k_offset=offs,
                n_tiles=n_local // plan.tile, n_out=n_local,
                differentiable=differentiable,
            )
            out = out.at[lay_idx].add(od_c)
        if y_air_j is not None:
            # first-order Rosenkranz mixing can leave small negative
            # excursions next to a Q branch (a truncation artifact, not
            # physics: LTE absorption is nonnegative); clamp before the
            # continuum so exp(-od) downstream cannot blow up at steep
            # slant angles (round-5 full-res finding)
            out = jnp.maximum(out, 0.0)
        if cont is not None:
            if k_index is not None:
                out = out + cont(T, p_pa, pl, vmr, k_index=k_index)
            else:
                out = out + cont(T, p_pa, pl, vmr, k_offset=k_offset)
        return out

    local_fn.partition = partition
    local_fn.point_index = point_index
    return local_fn, spec_data, g


def _weighted_chunk_assignment(calls, n_pad, n_shards, n_weideman):
    """(n_shards, chunks_per_shard) chunk ids balancing op-weighted work.

    Chunk span = the largest call tile (every call tile divides it; all
    powers of two). Per-chunk work sums each call's
    ``counts x block x tile x n_lay x ops_per_eval(mode)`` over the
    chunk's tiles; assignment is greedy longest-processing-time under an
    equal-cardinality constraint (every shard gets exactly
    ``n_chunks / n_shards`` chunks so the SPMD program shape is uniform).
    """
    from ..kernels.pallas_xsect import _ops_per_eval

    A = max(plan.tile for _, _, plan, _ in calls)
    nc = n_pad // A
    if nc % n_shards:
        raise AssertionError("chunk count not divisible by shard count")
    work = np.zeros(nc, dtype=np.float64)
    for lay_idx, _, plan, mode in calls:
        t = plan.tile
        per_tile = (plan.counts.astype(np.float64) * plan.block * t
                    * len(lay_idx) * _ops_per_eval(n_weideman, mode))
        work += per_tile.reshape(nc, A // t).sum(axis=1)
    cap = nc // n_shards
    loads = np.zeros(n_shards)
    fill = np.zeros(n_shards, dtype=np.int64)
    assign = np.empty((n_shards, cap), dtype=np.int64)
    for c in np.argsort(-work, kind="stable"):
        open_s = np.nonzero(fill < cap)[0]
        s = open_s[np.argmin(loads[open_s])]
        assign[s, fill[s]] = c
        fill[s] += 1
        loads[s] += work[c]
    assign.sort(axis=1)
    return assign
