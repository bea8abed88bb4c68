"""Pallas TPU kernel: bucketed lines x wavenumbers line-shape accumulation.

This is the TPU-native replacement for the reference's two native hot paths:
the LBLRTM Fortran line-by-line engine (``radiative_transfer.py:494``) and
hapi's serial per-line Python loop with bisect windows
(``misc/hapi.py:11050-11138``). Design (SURVEY.md §2.3 P4):

* Lines are sorted by center and **bucketed to nu-tiles host-side**: tile i
  needs only line blocks whose centers lie within ``max_wing`` of the tile —
  the per-tile block ranges are scalar-prefetched so the Mosaic pipeline
  DMAs exactly the needed line blocks (replacing per-line ``bisect``).
* The kernel grid is (layers, nu-tiles, line-blocks); each step evaluates a
  dense (BLOCK, TILE) Voigt block on the VPU with the hapi wing-window mask
  applied branchlessly, accumulating into the tile's output block (revisited
  across the innermost grid dimension).
* **Grid-index arithmetic**: wavenumbers near 1000 cm^-1 in float32 lose
  ~6e-5 cm^-1 — fatal for dnu near line centers. Positions are therefore
  computed as (integer grid index - integer line index) - fraction, all
  exactly representable in float32/int32, so dnu carries ~1e-7 relative
  error instead of ~1e-2.

The kernel computes the same contract as
:func:`radtxfr_tpu.kernels.xsect.xsect_from_params` (the jnp engine), which
is its correctness oracle in tests.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import LN2, SQRT_LN2_DIV_SQRT_PI
from .faddeeva import weideman_coeffs, REGION_BOUND
from .lineparams import LineParams

__all__ = ["UniformGrid", "BucketPlan", "plan_buckets",
           "plan_buckets_packed", "xsect_pallas", "xsect_ht_pallas"]

_SQRT_LN2 = math.sqrt(math.log(2.0))
_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)
_INV_PI = 1.0 / math.pi


def _simple_profile(mode, dnu, gd, g0, strength, fast):
    """Per-line Lorentz/Doppler contribution scale on a (BLOCK, TILE) block
    (hapi's own profile forms incl. its truncated Doppler constants:
    ``misc/hapi.py:10142,10160``)."""
    if mode == "lorentz":
        return strength * g0 * (_INV_PI * _rcp(g0 * g0 + dnu * dnu, fast))
    inv_gd = _rcp(gd, fast)
    t = dnu * inv_gd
    return (strength * SQRT_LN2_DIV_SQRT_PI) * inv_gd * jnp.exp(-LN2 * t * t)


@dataclasses.dataclass(frozen=True)
class UniformGrid:
    """A uniform wavenumber grid nu_k = x0 + k*dx, k = 0..n-1 (static)."""

    x0: float
    dx: float
    n: int

    @staticmethod
    def from_axis(X) -> "UniformGrid":
        # Tolerance scales with the input dtype: a float32 axis at
        # nu ~ 1000 cm^-1 carries ~6e-5 cm^-1 of per-point rounding.
        eps = np.finfo(np.asarray(X).dtype).eps if np.asarray(X).dtype.kind == "f" else 1e-16
        X = np.asarray(X, dtype=np.float64)
        dx = float((X[-1] - X[0]) / (X.size - 1))
        step = np.diff(X)
        tol = max(1e-6 * abs(dx), 4.0 * eps * np.abs(X).max())
        if np.abs(step - dx).max() > tol:
            raise ValueError("grid is not uniform")
        return UniformGrid(x0=float(X[0]), dx=dx, n=int(X.size))

    def values(self, dtype=np.float64) -> np.ndarray:
        return (self.x0 + self.dx * np.arange(self.n)).astype(dtype)


@dataclasses.dataclass(frozen=True)
class BucketPlan:
    """Host-side static bucketing of sorted lines onto nu-tiles."""

    grid: UniformGrid
    tile: int            # nu points per tile
    block: int           # lines per block
    n_tiles: int
    n_blocks: int        # total line blocks (padded line count / block)
    max_blocks: int      # static bound on blocks any tile visits
    starts: np.ndarray   # (n_tiles,) int32 — first block index per tile
    counts: np.ndarray   # (n_tiles,) int32 — number of blocks per tile
    k_line: np.ndarray   # (n_blocks, 1, block) int32 — floor grid index per line
    frac0: np.ndarray    # (n_blocks, 1, block) f32 — fractional grid offset
    max_wing: float      # cm^-1 — wing bound the bucketing guarantees
    # Packed plans (plan_buckets_packed): per-(block, slot) line index into
    # the call's line list, -1 for padding slots. None for shared-block plans.
    gather: np.ndarray | None = None
    # Per-line wing bounds (cm^-1) when the packed plan was built with an
    # array max_wing; the kernel clamp then applies per line.
    wing_line: np.ndarray | None = None


def auto_block(nu0, grid: UniformGrid, max_wing: float, tile: int,
               lo: int = 8, hi: int = 256) -> int:
    """Pick a line-block size matched to the local line density.

    A fixed block wastes up to block/lines-per-tile of the compute on
    sparse line classes (the kernel evaluates whole blocks); sizing the
    block near the 75th-percentile per-tile line count keeps the padding
    slop small while leaving the tail to extra grid steps.
    """
    nu0 = np.asarray(nu0, dtype=np.float64)
    n_tiles = -(-grid.n // tile)
    edges = grid.x0 + grid.dx * tile * np.arange(n_tiles + 1)
    lo_i = np.searchsorted(nu0, edges[:-1] - max_wing, side="left")
    hi_i = np.searchsorted(nu0, edges[1:] + max_wing, side="right")
    counts = hi_i - lo_i
    counts = counts[counts > 0]
    if counts.size == 0:
        return lo
    q = float(np.quantile(counts, 0.75))
    b = 8 * int(np.ceil(q / 8.0))
    return int(np.clip(b, lo, hi))


def plan_buckets(
    nu0,
    grid: UniformGrid,
    max_wing: float,
    tile: int = 1024,
    block="auto",
) -> BucketPlan:
    """Bucket sorted line centers onto nu-tiles (host-side, static).

    ``max_wing`` must upper-bound every line's wing cutoff at runtime; the
    kernel clamps wings to it so bucketing and masking stay consistent.
    ``block='auto'`` sizes line blocks from the local line density.
    """
    nu0 = np.asarray(nu0, dtype=np.float64)
    if nu0.size == 0:
        raise ValueError("empty line list")
    if np.any(np.diff(nu0) < 0):
        raise ValueError("line centers must be sorted")
    if block == "auto":
        block = auto_block(nu0, grid, max_wing, tile)

    n_tiles = -(-grid.n // tile)
    n_lines_pad = -(-nu0.size // block) * block
    n_blocks = n_lines_pad // block

    # Grid-index decomposition of each line center (float64 -> int + frac).
    u = (nu0 - grid.x0) / grid.dx
    k_line = np.floor(u).astype(np.int64)
    frac0 = (u - k_line).astype(np.float32)
    k_line = k_line.astype(np.int32)

    # Tile i covers nu in [x0 + i*tile*dx, x0 + (i+1)*tile*dx); a line can
    # touch it if its center is within max_wing of that interval.
    edges = grid.x0 + grid.dx * tile * np.arange(n_tiles + 1)
    lo = np.searchsorted(nu0, edges[:-1] - max_wing, side="left")
    hi = np.searchsorted(nu0, edges[1:] + max_wing, side="right")
    b0 = (lo // block).astype(np.int32)
    b1 = np.ceil(hi / block).astype(np.int32)
    counts = np.maximum(b1 - b0, 0).astype(np.int32)
    max_blocks = int(counts.max()) if counts.size else 0
    max_blocks = max(max_blocks, 1)

    pad = n_lines_pad - nu0.size
    # Padded lines: park far outside any window (mask never selects them).
    k_pad = np.full(pad, np.int32(-(2**30)), dtype=np.int32)
    f_pad = np.zeros(pad, dtype=np.float32)
    return BucketPlan(
        grid=grid,
        tile=tile,
        block=block,
        n_tiles=n_tiles,
        n_blocks=n_blocks,
        max_blocks=max_blocks,
        starts=b0,
        counts=counts,
        k_line=np.concatenate([k_line, k_pad]).reshape(n_blocks, 1, block),
        frac0=np.concatenate([frac0, f_pad]).reshape(n_blocks, 1, block),
        max_wing=float(max_wing),
    )


def plan_buckets_packed(
    nu0,
    grid: UniformGrid,
    max_wing,
    tile: int = 1024,
    block="auto",
    place_center=None,
) -> BucketPlan:
    """Per-tile packed bucketing: each tile's line list is materialized
    exactly (lines duplicated across the tiles their wings touch) and packed
    contiguously into blocks.

    Versus :func:`plan_buckets` (shared blocks addressed by floor/ceil block
    ranges), packing removes the block-boundary slop — every visited block
    is full of in-range lines except the last per tile — roughly halving the
    padded work of narrow-window (core) passes and letting sparse calls use
    small blocks without extra grid steps. Costs a host-side gather index
    (``plan.gather``) applied to the line-parameter arrays at trace time.

    ``max_wing`` may be a scalar or a per-line array: with an array, each
    line lands only in the tiles its OWN wing bound touches (no class-max
    inflation), and the kernel clamps the runtime wing per line
    (``plan.wing_line``). hapi's per-line window rule is
    max(OmegaWing, 50 halfwidths) (``misc/hapi.py:11131``), which spans a
    wide range across a band — per-line placement keeps the evaluated work
    near the true window work.
    """
    nu0 = np.asarray(nu0, dtype=np.float64)
    if nu0.size == 0:
        raise ValueError("empty line list")
    if np.any(np.diff(nu0) < 0):
        raise ValueError("line centers must be sorted")

    w = np.asarray(max_wing, dtype=np.float64)
    per_line = w.ndim > 0
    w = np.broadcast_to(w, nu0.shape)
    # Placement interval centers default to the line centers; the
    # coarse-far correction passes place edge bands at nu0 +- wing while
    # the kernel still evaluates relative to the TRUE center (k_line /
    # frac0 always derive from nu0).
    pc = (nu0 if place_center is None
          else np.broadcast_to(np.asarray(place_center, dtype=np.float64),
                               nu0.shape))

    n_tiles = -(-grid.n // tile)
    span_pts = tile * grid.dx
    # Conservative tile span per line: widen by one grid step so float
    # rounding can only add a tile, never drop one the mask selects.
    lo_t = np.floor((pc - w - grid.dx - grid.x0) / span_pts).astype(np.int64)
    hi_t = np.floor((pc + w + grid.dx - grid.x0) / span_pts).astype(np.int64)
    # Lines whose window cannot touch the grid get no tiles at all —
    # clipping them into an edge tile would pile every out-of-band line
    # into tile 0 / tile n-1 and blow up that tile's block count.
    x_end = grid.x0 + grid.dx * (grid.n - 1)
    in_range = ((pc + w >= grid.x0 - grid.dx)
                & (pc - w <= x_end + grid.dx))
    lo_t = np.clip(lo_t, 0, n_tiles - 1)
    hi_t = np.clip(hi_t, 0, n_tiles - 1)

    span = np.where(in_range, hi_t - lo_t + 1, 0).astype(np.int64)
    tot = int(span.sum())
    line_ids = np.repeat(np.arange(nu0.size, dtype=np.int64), span)
    start = np.cumsum(span) - span
    offs = np.arange(tot, dtype=np.int64) - np.repeat(start, span)
    tiles = np.repeat(lo_t, span) + offs
    order = np.argsort(tiles, kind="stable")   # stable: keeps nu0 order
    tiles = tiles[order]
    line_ids = line_ids[order]
    cnt = np.bincount(tiles, minlength=n_tiles).astype(np.int64)

    if block == "auto":
        nz = cnt[cnt > 0]
        q = float(np.quantile(nz, 0.75)) if nz.size else 8.0
        block = int(np.clip(8 * int(np.ceil(q / 8.0)), 8, 256))

    bpt = -(-cnt // block)                      # blocks per tile (may be 0)
    starts = np.zeros(n_tiles, dtype=np.int32)
    starts[1:] = np.cumsum(bpt)[:-1].astype(np.int32)
    n_blocks = max(int(bpt.sum()), 1)

    # Scatter the packed entries into (n_blocks, block) slots: entry j of
    # tile i goes to flat slot starts[i]*block + j.
    gather = np.full(n_blocks * block, -1, dtype=np.int64)
    tile_first = np.cumsum(cnt) - cnt                   # first entry per tile
    within = np.arange(tot, dtype=np.int64) - tile_first[tiles]
    slots = starts.astype(np.int64)[tiles] * block + within
    gather[slots] = line_ids
    gather = gather.reshape(n_blocks, block).astype(np.int32)

    u = (nu0 - grid.x0) / grid.dx
    k_all = np.floor(u).astype(np.int64)
    f_all = (u - k_all).astype(np.float32)
    valid = gather >= 0
    safe = np.where(valid, gather, 0)
    k_line = np.where(valid, k_all[safe], -(2 ** 30)).astype(np.int32)
    frac0 = np.where(valid, f_all[safe], 0.0).astype(np.float32)

    counts = bpt.astype(np.int32)
    return BucketPlan(
        grid=grid,
        tile=tile,
        block=block,
        n_tiles=n_tiles,
        n_blocks=n_blocks,
        max_blocks=max(int(counts.max()) if counts.size else 0, 1),
        starts=starts,
        counts=counts,
        k_line=k_line.reshape(n_blocks, 1, block),
        frac0=frac0.reshape(n_blocks, 1, block),
        max_wing=float(w.max()),
        gather=gather,
        wing_line=(w.astype(np.float64) if per_line else None),
    )


def _pad_layered(a, n_blocks, block, fill):
    """(nLay, L) -> (nLay, n_blocks, 1, block) with padding value ``fill``."""
    n_lay, L = a.shape
    pad = n_blocks * block - L
    if pad:
        a = jnp.concatenate(
            [a, jnp.full((n_lay, pad), fill, dtype=a.dtype)], axis=1
        )
    return a.reshape(n_lay, n_blocks, 1, block)


def _pad_fused(a, n_blocks, block, fill):
    """(nLay, L) -> (n_blocks, nLay, block) for the layer-fused kernel."""
    n_lay, L = a.shape
    pad = n_blocks * block - L
    if pad:
        a = jnp.concatenate(
            [a, jnp.full((n_lay, pad), fill, dtype=a.dtype)], axis=1
        )
    return a.reshape(n_lay, n_blocks, block).transpose(1, 0, 2)


def _gather_slots(a, gather, fill):
    """(nLay, L) -> (nLay, n_blocks, block) via a packed plan's line-index
    gather; -1 slots take ``fill``."""
    n_lay, L = a.shape
    ext = jnp.concatenate(
        [a, jnp.full((n_lay, 1), fill, dtype=a.dtype)], axis=1)
    idx = jnp.where(gather >= 0, gather, L)
    return ext[:, idx]


def _gather_fused(a, gather, fill):
    """(nLay, L) -> (n_blocks, nLay, block) for packed plans."""
    return _gather_slots(a, gather, fill).transpose(1, 0, 2)


def _pad_fused_T(a, n_blocks, block, fill):
    """(nLay, L) -> (n_blocks, block, nLay): the lane-aligned layout.

    Layer-stationary param columns live on LANES so the fused kernel's
    unrolled layer loop reads ``ref[0, :, l:l+1]`` — a static lane pick —
    instead of the per-iteration lane->sublane relayout that dominates
    the core passes' measured ~107 ns fixed cost (docs/ROOFLINE.md #6)."""
    return _pad_fused(a, n_blocks, block, fill).transpose(0, 2, 1)


def _gather_fused_T(a, gather, fill):
    """(nLay, L) -> (n_blocks, block, nLay) for packed plans (lane-aligned)."""
    return _gather_slots(a, gather, fill).transpose(1, 2, 0)


def _gather_layered(a, gather, fill):
    """(nLay, L) -> (nLay, n_blocks, 1, block) for packed plans."""
    g = _gather_slots(a, gather, fill)
    n_lay, n_blocks, block = g.shape
    return g.reshape(n_lay, n_blocks, 1, block)


def _rcp(x, fast: bool = False):
    """Reciprocal; ``fast`` uses the VPU approximation instruction plus one
    Newton step (~4 ops, <1e-8 relative error vs a ~10-op rounded divide)."""
    if not fast:
        return 1.0 / x
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _asym_re_w(x, y, fast: bool = False, guard: float = 0.0):
    """Humlicek region-1 asymptotic Re w: (1/sqrt(pi)) Re[t/(0.5+t^2)],
    t = y - ix. ~12 flops — hum1_wei uses this wherever |x| + y >= 15.

    ``guard`` clamps the denominator magnitude. The form has a pole at
    0.5 + t^2 = 0 (|x| ~ 1/sqrt(2), y -> 0, i.e. DEEP inside the Weideman
    core region): values ~1/y there would flow through the two-pass
    accumulator and be cancelled by the core pass only after f32 rounding
    has eaten ~eps/y of every tile — measured 2.4e-3 of peak on
    Doppler-dominated stratospheric layers. dmag >= 0.25 bounds the pass
    contribution at O(1) while being inactive everywhere |x| + y >= 15
    (there dmag > 1e4), so the exact region is untouched; the core pass
    subtracts the SAME clamped value, keeping asym + core == full pointwise.
    """
    dr = 0.5 + y * y - x * x
    di = -2.0 * x * y
    dmag = dr * dr + di * di
    if guard:
        dmag = jnp.maximum(dmag, guard)
    return _INV_SQRT_PI * (y * dr - x * di) * _rcp(dmag, fast)


def _weideman_re_w(x, y, wei_a, wei_L, fast: bool = False):
    """Weideman rational-series Re w (the |x| + y < 15 region)."""
    nr, ni = wei_L - y, x
    er, ei = wei_L + y, -x
    emag = er * er + ei * ei
    inv_e = _rcp(emag, fast)
    zr = (nr * er + ni * ei) * inv_e
    zi = (ni * er - nr * ei) * inv_e
    pr = jnp.full_like(zr, wei_a[0])
    pi_ = jnp.zeros_like(zr)
    for c in wei_a[1:]:
        pr, pi_ = pr * zr - pi_ * zi + c, pr * zi + pi_ * zr
    sr = er * er - ei * ei
    si = 2.0 * er * ei
    smag = sr * sr + si * si
    return (2.0 * (pr * sr + pi_ * si) * _rcp(smag, fast)
            + _INV_SQRT_PI * er * inv_e)


def _cpf3_pair(x, y):
    """(Re, Im) of the 15-term asymptotic CPF (``cpf3``,
    ``misc/hapi.py:9645-9670``) in real arithmetic — the single
    implementation shared by the SD-Voigt block (real part) and the HT
    kernel (:mod:`.htp_real`, full pair).

    Domain guard |z|^2 >= 9: the series is compute-and-masked — the
    hapi selection rule only ever USES it at |z| >= 7 (szmx > 8 with
    |sz1 - sz2| <= 1 forces szmn >= 7) — but at small unselected |z| its
    15 terms reach ~(tt!!)(1/|z|^2)^15: 2.3e38 at |z| = 0.125, a hair
    under the f32 max on one platform and Inf on another (TPU rounding),
    and Inf intermediates turn zero tangents into NaN under jvp (the
    differentiable HT path; 0 x Inf). Clamping the magnitude keeps every
    unselected evaluation finite on every platform without touching any
    selected value."""
    m = x * x + y * y
    m = jnp.maximum(m, 9.0)
    ar = x / m
    ai = -y / m
    # zm2 = zm1^2
    m2r = ar * ar - ai * ai
    m2i = 2.0 * ar * ai
    sr = jnp.ones_like(x)
    si = jnp.zeros_like(x)
    tr_ = jnp.ones_like(x)
    ti_ = jnp.zeros_like(x)
    for tt in (0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5, 9.5, 10.5,
               11.5, 12.5, 13.5, 14.5):
        tr_, ti_ = (tr_ * m2r - ti_ * m2i) * tt, (tr_ * m2i + ti_ * m2r) * tt
        sr = sr + tr_
        si = si + ti_
    # w = i * zm1 * zsum / sqrt(pi)
    re = -(ar * si + ai * sr) * _INV_SQRT_PI
    im = (ar * sr - ai * si) * _INV_SQRT_PI
    return re, im


def _cpf3_re_w(x, y):
    """Real part of :func:`_cpf3_pair` (the unused imaginary-part ops are
    dead-code-eliminated by the compiler)."""
    return _cpf3_pair(x, y)[0]


def _re_w_select(x, y, wei_a, wei_L, fast: bool = False):
    """Re w via hum1_wei's region rule (Weideman inside |x|+y<15)."""
    return jnp.where(jnp.abs(x) + y < REGION_BOUND,
                     _weideman_re_w(x, y, wei_a, wei_L, fast),
                     _asym_re_w(x, y, fast))


def _asym_K_grads(x, y, fast: bool = False):
    """(K, dK/dx, dK/dy) of the Humlicek region-1 asymptotic form.

    w_a(z) = -iz / (sqrt(pi) (0.5 - z^2)), so w_a' =
    -i (0.5 + z^2) / (sqrt(pi) (0.5 - z^2)^2) — the derivative OF THE
    APPROXIMATION, not the exact-Faddeeva identity applied to approximate
    (K, L): the identity form K(1-2x^2+2y^2) + 4xyL - 2y/sqrt(pi) cancels
    ~4 orders of magnitude in the far wing, where it amplifies the
    approximation error into O(100%) tangent garbage (measured)."""
    dr = 0.5 + y * y - x * x          # Re (0.5 - z^2)
    di = -2.0 * x * y                 # Im (0.5 - z^2)
    m2 = dr * dr + di * di
    inv = _rcp(m2, fast)
    K = _INV_SQRT_PI * (y * dr - x * di) * inv
    nr = 0.5 + x * x - y * y          # Re (0.5 + z^2)
    ni = -di                          # Im (0.5 + z^2) = 2xy
    d2r = dr * dr - di * di
    d2i = 2.0 * dr * di
    inv2 = inv * inv                  # 1/|0.5 - z^2|^4
    mr = nr * d2r + ni * d2i          # Re[(0.5+z^2) conj((0.5-z^2)^2)]
    mi = ni * d2r - nr * d2i
    return K, _INV_SQRT_PI * mi * inv2, _INV_SQRT_PI * mr * inv2


def _weideman_K_grads(x, y, wei_a, wei_L, fast: bool = False):
    """(K, dK/dx, dK/dy) of the Weideman rational series (|x| + y < 15).

    w(z) = 2 P(Z)/e^2 + (1/sqrt(pi))/e with e = L - iz, Z = (L+iz)/(L-iz);
    w' = i [4 L P'(Z)/e^4 + 4 P(Z)/e^3 + (1/sqrt(pi))/e^2], P' by a second
    Horner accumulator. dK/dx = Re w' = -Im Q, dK/dy = -Im w' = -Re Q for
    Q = -i w'."""
    er, ei = wei_L + y, -x
    inv_e = _rcp(er * er + ei * ei, fast)
    ier, iei = er * inv_e, -ei * inv_e          # 1/e
    nr, ni = wei_L - y, x
    zr = (nr * er + ni * ei) * inv_e
    zi = (ni * er - nr * ei) * inv_e
    pr = jnp.full_like(zr, wei_a[0])
    pi_ = jnp.zeros_like(zr)
    qr = jnp.zeros_like(zr)
    qi = jnp.zeros_like(zr)
    for c in wei_a[1:]:
        qr, qi = qr * zr - qi * zi + pr, qr * zi + qi * zr + pi_
        pr, pi_ = pr * zr - pi_ * zi + c, pr * zi + pi_ * zr
    i2r, i2i = ier * ier - iei * iei, 2.0 * ier * iei        # e^-2
    i3r, i3i = i2r * ier - i2i * iei, i2r * iei + i2i * ier  # e^-3
    i4r, i4i = i2r * i2r - i2i * i2i, 2.0 * i2r * i2i        # e^-4
    K = 2.0 * (pr * i2r - pi_ * i2i) + _INV_SQRT_PI * ier
    c4 = 4.0 * wei_L
    Qr = (c4 * (qr * i4r - qi * i4i) + 4.0 * (pr * i3r - pi_ * i3i)
          + _INV_SQRT_PI * i2r)
    Qi = (c4 * (qr * i4i + qi * i4r) + 4.0 * (pr * i3i + pi_ * i3r)
          + _INV_SQRT_PI * i2i)
    return K, -Qi, -Qr


def _voigt_w_KL(x, y, wei_a, wei_L, fast: bool = False):
    """(Re w, Im w) with the hum1_wei region blend — the 'mix' mode needs
    the imaginary part for the Rosenkranz asymmetry term (K + Y L)."""
    # asymptotic branch
    dr = 0.5 + y * y - x * x
    di = -2.0 * x * y
    inv = _INV_SQRT_PI * _rcp(dr * dr + di * di, fast)
    Ka = (y * dr - x * di) * inv
    La = -(x * dr + y * di) * inv
    # Weideman branch
    er, ei = wei_L + y, -x
    inv_e = _rcp(er * er + ei * ei, fast)
    nr, ni = wei_L - y, x
    zr = (nr * er + ni * ei) * inv_e
    zi = (ni * er - nr * ei) * inv_e
    pr = jnp.full_like(zr, wei_a[0])
    pi_ = jnp.zeros_like(zr)
    for c in wei_a[1:]:
        pr, pi_ = pr * zr - pi_ * zi + c, pr * zi + pi_ * zr
    sr = er * er - ei * ei
    si = 2.0 * er * ei
    inv_s = _rcp(sr * sr + si * si, fast)
    Kw = 2.0 * (pr * sr + pi_ * si) * inv_s + _INV_SQRT_PI * er * inv_e
    Lw = 2.0 * (pi_ * sr - pr * si) * inv_s - _INV_SQRT_PI * ei * inv_e
    in_core = (jnp.abs(x) + y) < REGION_BOUND
    return jnp.where(in_core, Kw, Ka), jnp.where(in_core, Lw, La)


def _voigt_K_grads(x, y, wei_a, wei_L, fast: bool = False):
    """(K, dK/dx, dK/dy) with the hum1_wei region blend ('full' mode)."""
    in_core = (jnp.abs(x) + y) < REGION_BOUND
    Kw, Kxw, Kyw = _weideman_K_grads(x, y, wei_a, wei_L, fast)
    Ka, Kxa, Kya = _asym_K_grads(x, y, fast)
    return (jnp.where(in_core, Kw, Ka), jnp.where(in_core, Kxw, Kxa),
            jnp.where(in_core, Kyw, Kya))


def _sdvoigt_block(dnu, gd, g0, g2, s0, wei_a, wei_L, fast: bool = False,
                   variant: str = "full"):
    """SD-Voigt profile value on a (BLOCK, TILE) block, real arithmetic.

    Follows ``pcqsdhc`` with anuVC = eta = Shift2 = 0 (the SDVoigt driver's
    configuration, ``misc/hapi.py:10117-10129,10890``): c2t = Gamma2 is
    real, so Y and csqrtY are real and the PART4 terms share an imaginary
    part. PART2/PART3 cannot trigger for physical SDVoigt parameters
    (|X| ~ Gamma0/Gamma2 >> 3e-8 |Y| and |Y| >> 1e-15 |X|); the PART4
    CPF3-vs-CPF sub-selection is reproduced exactly. Callers should route
    Gamma2 == 0 lines to the Voigt path (c2t = 0 is hapi's PART1);
    runtime-vanishing Gamma2 the caller could not see is clamped to the
    Voigt limit below.

    ``variant`` supports the two-pass far-wing decomposition (analog of
    the Voigt asym/core split):

    * ``'full'`` — the exact pcqsdhc selection (single-pass);
    * ``'asym'`` — both CPF evaluations forced to the ~12-flop Humlicek
      region-1 form. Exact wherever min(|Z1|, |Z2|) >= 15 — then
      |x| + y >= |Z| puts both points in hum1_wei's asymptotic region and
      szmn > 8 kills the CPF3 sub-case (host planning bounds the region:
      |dnu| >= |s0| + g2 (2c^2 + 30c + 225), see
      ``products.od.sdvoigt_core_bound``);
    * ``'core'`` — (full - asym), evaluated only near line centers, so
      asym + core == full pointwise.
    """
    cte = _SQRT_LN2 / gd
    # Runtime Gamma2 can vanish even for sd_air != 0 lines (x_self = 1
    # pure-species layers: lineparams.py:158 has a (1 - x_self) factor)
    # and host routing cannot see that — while c2t = 0 is hapi's PART1,
    # whose 1/Gamma2 would NaN here. Clamp to 1e-4 Gamma0: pcqsdhc tends
    # to the Voigt limit continuously with O(Gamma2/Gamma0) relative
    # deviation, so clamped lines move by < ~1e-4 of their local value,
    # and the block's arithmetic stays in f32 range (c ~ 1e3 worst case).
    g2 = jnp.maximum(g2, 1e-4 * g0 + 1e-12)
    inv_g2 = 1.0 / g2
    c0tr = (g0 - 1.5 * g2) * inv_g2          # Re X (per line)
    xr = jnp.broadcast_to(c0tr, dnu.shape)
    xi = (s0 - dnu) * inv_g2                 # Im X per element
    c = 0.5 / (cte * g2)                     # csqrtY (real, per line)
    Y = c * c

    # sqrt(X + Y): complex sqrt of (xr + Y, xi)
    a = xr + Y
    r = jnp.sqrt(a * a + xi * xi)
    u = jnp.sqrt(jnp.maximum((r + a) * 0.5, 0.0))
    v = jnp.sign(xi) * jnp.sqrt(jnp.maximum((r - a) * 0.5, 0.0))

    # Z1 = sXY - c, Z2 = sXY + c; w at (x, y) = (-Im Z, Re Z)
    x12 = -v
    y1 = u - c
    y2 = u + c
    if variant == "asym":
        w1a = _asym_re_w(x12, y1, fast, guard=0.25)
        w2a = _asym_re_w(x12, y2, fast, guard=0.25)
        return cte * _INV_SQRT_PI * (w1a - w2a)
    sz1 = jnp.sqrt(v * v + y1 * y1)
    sz2 = jnp.sqrt(v * v + y2 * y2)
    szmx = jnp.maximum(sz1, sz2)
    szmn = jnp.minimum(sz1, sz2)
    use3 = (jnp.abs(sz1 - sz2) <= 1.0) & (szmx > 8.0) & (szmn <= 8.0)
    w1 = jnp.where(use3, _cpf3_re_w(x12, y1),
                   _re_w_select(x12, y1, wei_a, wei_L, fast))
    w2 = jnp.where(use3, _cpf3_re_w(x12, y2),
                   _re_w_select(x12, y2, wei_a, wei_L, fast))
    if variant == "core":
        # subtract the SAME guarded asym the 'asym' pass added
        w1 = w1 - _asym_re_w(x12, y1, fast, guard=0.25)
        w2 = w2 - _asym_re_w(x12, y2, fast, guard=0.25)
    # LS = (1/pi) * sqrt(pi) * cte * (w1 - w2)
    return cte * _INV_SQRT_PI * (w1 - w2)


def _voigt_wr(x, y, wei_a, wei_L, mode: str = "full", fast: bool = False):
    """Re w(x + iy) on a (BLOCK, TILE) block, branchless float32.

    ``mode`` supports the two-pass far-wing decomposition:

    * ``'full'`` — hum1_wei blend (Weideman inside |x|+y<15, asymptotic
      outside);
    * ``'asym'`` — asymptotic everywhere (the cheap far-wing pass; exact
      outside the core region, wrong-but-corrected inside it);
    * ``'core'`` — (Weideman - asymptotic) inside |x|+y<15, zero outside:
      the correction the core pass adds on top of an 'asym' pass, so
      asym + core == full pointwise.
    """
    if mode == "asym":
        return _asym_re_w(x, y, fast, guard=0.25)
    in_core = (jnp.abs(x) + y) < REGION_BOUND
    wei = _weideman_re_w(x, y, wei_a, wei_L, fast)
    if mode == "core":
        # subtract the SAME clamped asym the 'asym' pass added
        return jnp.where(in_core, wei - _asym_re_w(x, y, fast, guard=0.25), 0.0)
    return jnp.where(in_core, wei, _asym_re_w(x, y, fast))


def _make_kernel(tile: int, block: int, dx: float, n_weideman: int = 24,
                 mode: str = "full", fast: bool = False):
    dx = np.float32(dx)
    wei_L_f, wei_a_f = weideman_coeffs(n_weideman)
    wei_a = tuple(np.float32(c) for c in wei_a_f)
    wei_L = np.float32(wei_L_f)

    def kernel(starts_ref, counts_ref, k_ref, f0_ref, ds_ref, s_ref,
               gd_ref, g0_ref, wu_ref, out_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(j < counts_ref[i])
        def _accumulate():
            # (BLOCK, 1) line data against (1, TILE) grid indices.
            k_line = k_ref[0, 0, :].reshape(block, 1)
            frac0 = f0_ref[0, 0, :].reshape(block, 1)
            ds = ds_ref[0, 0, 0, :].reshape(block, 1)
            strength = s_ref[0, 0, 0, :].reshape(block, 1)
            gd = gd_ref[0, 0, 0, :].reshape(block, 1)
            g0 = g0_ref[0, 0, 0, :].reshape(block, 1)
            wingu = wu_ref[0, 0, 0, :].reshape(block, 1)

            k_grid = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + i * tile
            rel = (k_grid - k_line).astype(jnp.float32)   # exact: small ints
            # hapi bisect window on the UNSHIFTED center:
            # include iff nu0 - wing < g <= nu0 + wing
            # in grid units: frac0 - wingu < rel - 0 ... rel > frac0 - wingu
            u = rel - frac0
            mask = (u > -wingu) & (u <= wingu)
            if mode in ("lorentz", "doppler"):
                vals = _simple_profile(mode, (u - ds) * dx, gd, g0,
                                       strength, fast)
            else:
                # Per-line constants folded so the (BLOCK, TILE) work is
                # minimal: x = (u - ds) * (dx * cte), contribution =
                # scale * Re w.
                cte = _SQRT_LN2 / gd
                wr = _voigt_wr((u - ds) * (dx * cte), g0 * cte, wei_a, wei_L,
                               mode, fast)
                vals = strength * (_INV_SQRT_PI * cte) * wr
            contrib = jnp.where(mask, vals, 0.0)
            out_ref[...] += jnp.sum(contrib, axis=0).reshape(out_ref.shape)

    return kernel


def _make_fused_kernel(tile: int, block: int, n_lay: int, dx: float,
                       n_weideman: int, mode: str, fast: bool = False,
                       layout: str = "s"):
    """Layer-fused variant: one grid step evaluates ALL layers for a
    (line-block x nu-tile) pair via an in-kernel loop.

    Amortizes per-step pipeline overhead so narrow tiles become viable —
    essential for the 'core' pass, whose useful region is only a few tens of
    grid points around each line center.

    ``layout='s'`` (sublane, historical): per-layer params arrive as
    (1, n_lay, block) and each layer iteration of a ``fori_loop`` pays a
    lane->sublane relayout per param (the measured body-independent
    ~107 ns/iteration fixed cost, docs/ROOFLINE.md #6). ``layout='l'``
    (lane-aligned): params arrive transposed as (1, block, n_lay), the
    layer loop is unrolled at trace time, and each per-layer read is a
    STATIC lane pick ``ref[0, :, l:l+1]`` — no relayout; the layer-
    invariant correction-stencil machinery is hoisted out of the loop.
    Same op sequence either way; the compiler may contract FMAs
    differently across the two graph shapes (float-rounding level).
    """
    dx = np.float32(dx)
    wei_L_f, wei_a_f = weideman_coeffs(n_weideman)
    wei_a = tuple(np.float32(c) for c in wei_a_f)
    wei_L = np.float32(wei_L_f)
    corr = mode.startswith("corr:")
    if corr:
        _, _r_s, variant = mode.split(":")
        Ri = int(_r_s)
        S = tile // Ri
        full_pt = variant.endswith("full")

    def kernel(starts_ref, counts_ref, off_ref, k_ref, f0_ref, ds_ref, s_ref,
               gd_ref, g0_ref, g2_ref, s0_ref, wu_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(j < counts_ref[i])
        def _accumulate():
            k_line = k_ref[0, 0, :].reshape(block, 1)
            frac0 = f0_ref[0, 0, :].reshape(block, 1)
            # off_ref: global grid index of this device's first point (for
            # spectrum-sharded SPMD execution; 0 single-device)
            k_grid = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                      + i * tile + off_ref[i])
            rel = (k_grid - k_line).astype(jnp.float32)
            u = rel - frac0

            if corr:
                # Coarse-far correction pass: f(u) minus the 4-point
                # Lagrange-cubic interpolation of f through the
                # bracketing coarse-grid nodes (fine indices multiple
                # of R; node row 0 sits one coarse step LEFT of the
                # tile start so every fine point has a full stencil).
                # Composed with the coarse far pass this makes the
                # result EXACT (same guarded asym form) wherever this
                # pass is placed (near zones + window-edge bands) and
                # pure smooth-wing interpolation elsewhere — cubic,
                # O((R dx / d)^4), so dense line lists whose wing
                # errors sum coherently stay ~1e-5-of-peak accurate
                # (linear interp left a measured 2.7e-3-of-peak bias
                # on the 30k-line XS lattice). Node values are shared
                # by the R points of each segment: evaluated once on
                # a (block, tile/R + 3) array and broadcast, so the
                # pass costs ~1x (not 3x) a plain per-point pass over
                # its zone. Requires tile % R == 0 and R-aligned tile
                # starts (guaranteed: tiles start at multiples of
                # `tile`). Everything here is layer-INVARIANT and
                # hoisted out of the layer loop.
                k0 = i * tile + off_ref[i]
                s_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, S + 3), 1)
                k_nodes = k0 + (s_iota - 1) * Ri
                u_n = (k_nodes - k_line).astype(jnp.float32) - frac0
                # cubic-expansion matrix built from iotas (Pallas
                # forbids captured array constants): point i in
                # segment seg = i//R interpolates node rows
                # (seg, seg+1, seg+2, seg+3) — coarse nodes at
                # (seg-1, seg, seg+1, seg+2) — with the uniform
                # 4-point Lagrange weights at t = frac(i/R); the
                # (block, S+3) node values expand to (block, tile)
                # in one tiny MXU matmul (Mosaic cannot shape-cast a
                # lane-dim broadcast-reshape). MUST match the
                # builders' host-side upsample weights exactly.
                s_m = jax.lax.broadcasted_iota(
                    jnp.int32, (S + 3, tile), 0)
                i_m = jax.lax.broadcasted_iota(
                    jnp.int32, (S + 3, tile), 1)
                seg = i_m // Ri
                tt = (i_m - seg * Ri).astype(jnp.float32) / Ri
                wm1 = -tt * (tt - 1.0) * (tt - 2.0) * (1.0 / 6.0)
                w0 = (tt * tt - 1.0) * (tt - 2.0) * 0.5
                w1 = -tt * (tt + 1.0) * (tt - 2.0) * 0.5
                w2 = tt * (tt * tt - 1.0) * (1.0 / 6.0)
                W_lerp = (jnp.where(s_m == seg, wm1, 0.0)
                          + jnp.where(s_m == seg + 1, w0, 0.0)
                          + jnp.where(s_m == seg + 2, w1, 0.0)
                          + jnp.where(s_m == seg + 3, w2, 0.0))

            if layout == "l":
                get_l = lambda ref, l: ref[0, :, l:l + 1]
            else:
                get_l = lambda ref, l: ref[0, l, :].reshape(block, 1)

            def body(l, _):
                ds = get_l(ds_ref, l)
                strength = get_l(s_ref, l)
                gd = get_l(gd_ref, l)
                g0 = get_l(g0_ref, l)
                wingu = get_l(wu_ref, l)
                mask = (u > -wingu) & (u <= wingu)
                if corr:
                    # point-term function: near-zone passes ('...full')
                    # evaluate the exact hum1_wei/pcqsdhc blend, which
                    # subsumes the classic (full - asym) core pass — the
                    # node terms always use the guarded asym form the
                    # coarse pass evaluated, so coarse-interp + this
                    # correction == the classic two-pass result exactly.
                    if variant.startswith("sdvoigt"):
                        g2 = get_l(g2_ref, l)
                        s0 = get_l(s0_ref, l)

                        def fv(uu, v):
                            return strength * _sdvoigt_block(
                                (uu - ds) * dx, gd, g0, g2, s0,
                                wei_a, wei_L, fast, variant=v)

                        f_pt = lambda uu: fv(uu, "full" if full_pt
                                             else "asym")
                        f_nd = lambda uu: fv(uu, "asym")
                    else:
                        cte = _SQRT_LN2 / gd
                        A = strength * (_INV_SQRT_PI * cte)

                        def f_nd(uu):
                            return A * _asym_re_w((uu - ds) * (dx * cte),
                                                  g0 * cte, fast,
                                                  guard=0.25)

                        def f_pt(uu):
                            if not full_pt:
                                return f_nd(uu)
                            x = (uu - ds) * (dx * cte)
                            y = g0 * cte
                            in_core = (jnp.abs(x) + y) < REGION_BOUND
                            wei = _weideman_re_w(x, y, wei_a, wei_L, fast)
                            return A * jnp.where(
                                in_core, wei,
                                _asym_re_w(x, y, fast, guard=0.25))

                    msk = lambda uu: (uu > -wingu) & (uu <= wingu)
                    fm = lambda uu: jnp.where(msk(uu), f_pt(uu), 0.0)
                    v_n = jnp.where(msk(u_n), f_nd(u_n), 0.0)  # (block, S+3)
                    # HIGHEST precision is required: the default MXU
                    # precision truncates the f32 inputs to bf16, and
                    # near line centers the node values reach several
                    # times the line peak — the resulting ~4e-3 relative
                    # interp error does NOT cancel against the host-side
                    # f32 upsample (measured 1.3e-3-of-peak on TPU while
                    # CPU runs of the same code sat at 1e-7).
                    interp = jnp.dot(v_n, W_lerp,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
                    contrib = fm(u) - interp
                    out_ref[0, l, :] += jnp.sum(contrib, axis=0)
                    return 0
                if mode.startswith("sdvoigt"):
                    sd_variant = {"sdvoigt": "full", "sdvoigt_asym": "asym",
                                  "sdvoigt_core": "core"}[mode]
                    g2 = get_l(g2_ref, l)
                    s0 = get_l(s0_ref, l)
                    dnu = (rel - frac0 - ds) * dx
                    prof = _sdvoigt_block(dnu, gd, g0, g2, s0, wei_a, wei_L,
                                          fast, variant=sd_variant)
                    contrib = jnp.where(mask, strength * prof, 0.0)
                elif mode == "mix":
                    # first-order Rosenkranz: scale (K + Y L); the mixing
                    # coefficient Y rides the spare g2 slot
                    # (kernels/linemixing.py is the jnp contract)
                    y_mix = get_l(g2_ref, l)
                    cte = _SQRT_LN2 / gd
                    K, L = _voigt_w_KL((u - ds) * (dx * cte), g0 * cte,
                                       wei_a, wei_L, fast)
                    scale = strength * (_INV_SQRT_PI * cte)
                    contrib = jnp.where(mask, scale * (K + y_mix * L), 0.0)
                elif mode in ("lorentz", "doppler"):
                    vals = _simple_profile(mode, (u - ds) * dx, gd, g0,
                                           strength, fast)
                    contrib = jnp.where(mask, vals, 0.0)
                else:
                    cte = _SQRT_LN2 / gd
                    wr = _voigt_wr((u - ds) * (dx * cte), g0 * cte,
                                   wei_a, wei_L, mode, fast)
                    scale = strength * (_INV_SQRT_PI * cte)
                    contrib = jnp.where(mask, scale * wr, 0.0)
                out_ref[0, l, :] += jnp.sum(contrib, axis=0)
                return 0

            if layout == "l":
                # trace-time unroll: l is concrete, so every param read is
                # a static lane pick and the scheduler can overlap layers
                for l in range(n_lay):
                    body(l, 0)
            else:
                jax.lax.fori_loop(0, n_lay, body, 0)

    return kernel


#: layered-array order of the HT kernel's per-line inputs (after strength
#: and the wing): the ht_line_constants keys
_HT_CONST_KEYS = ("cte", "c0tr", "c0ti", "c2tr", "c2ti", "cyr", "cyi",
                  "d0r", "d0i", "e2r", "e2i")


def _make_fused_ht_kernel(tile: int, block: int, n_lay: int, dx: float,
                          n_weideman: int, fast: bool = False):
    """Layer-fused Hartmann-Tran kernel: the full real-arithmetic pcqsdhc
    (:func:`radtxfr_tpu.kernels.htp_real.pcqsdhc_real` — PART1-4 incl. the
    CPF3 sub-case and complex eta) over (line-block x nu-tile) pairs."""
    from .htp_real import pcqsdhc_real

    dx = np.float32(dx)
    wei_L_f, wei_a_f = weideman_coeffs(n_weideman)
    wei_a = tuple(np.float32(c) for c in wei_a_f)
    wei_L = np.float32(wei_L_f)

    def kernel(starts_ref, counts_ref, off_ref, k_ref, f0_ref, s_ref,
               wu_ref, *refs):
        const_refs = refs[:-1]
        out_ref = refs[-1]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(j < counts_ref[i])
        def _accumulate():
            k_line = k_ref[0, 0, :].reshape(block, 1)
            frac0 = f0_ref[0, 0, :].reshape(block, 1)
            k_grid = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                      + i * tile + off_ref[i])
            rel = (k_grid - k_line).astype(jnp.float32)
            u = rel - frac0

            def body(l, _):
                get = lambda ref: ref[0, l, :].reshape(block, 1)
                consts = {key: get(r)
                          for key, r in zip(_HT_CONST_KEYS, const_refs)}
                strength = get(s_ref)
                wingu = get(wu_ref)
                ls = pcqsdhc_real(u * dx, consts, wei_a, wei_L, fast)
                mask = (u > -wingu) & (u <= wingu)
                out_ref[0, l, :] += jnp.sum(
                    jnp.where(mask, strength * ls, 0.0), axis=0)
                return 0

            jax.lax.fori_loop(0, n_lay, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def _xsect_fused_ht_call(cfg, k_line, frac0, strength, wingu, consts,
                         starts, counts, offset, interpret=False):
    # consts: tuple of 11 (n_blocks, n_lay, block) arrays (_HT_CONST_KEYS)
    tile, block, nb, nt, mb, n_out, dx, n_wei, _mode, fast = cfg
    n_lay = strength.shape[1]
    kernel = _make_fused_ht_kernel(tile, block, n_lay, dx, n_wei, fast)

    def line_map(i, j, starts_ref, counts_ref, off_ref):
        return (jnp.minimum(starts_ref[i] + j, nb - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, mb),
        in_specs=[
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, n_lay, block), line_map, memory_space=pltpu.VMEM)
        ] * (2 + len(consts)),
        out_specs=pl.BlockSpec((1, n_lay, tile),
                               lambda i, j, s, c, o: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, n_lay, tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_lay * nt * mb * block * tile * (6 * (8 * n_wei) + 600),
            bytes_accessed=(nt * n_lay * tile * 4
                            + nt * mb * n_lay * block * 13 * 4),
            transcendentals=0,
        ),
    )(starts, counts, offset, k_line, frac0, strength, wingu, *consts)
    return out.transpose(1, 0, 2).reshape(n_lay, nt * tile)[:, :n_out]


def xsect_ht_pallas(plan: BucketPlan, strength, wing, consts: dict,
                    n_weideman: int = 24, fast_rcp: bool = False,
                    interpret: bool | None = None,
                    differentiable: bool = False):
    """Hartmann-Tran layered spectra with the Pallas kernel.

    ``differentiable=True`` routes through :func:`xsect_fused_ht_diff`
    (analytic JVP via a second fused tangent kernel; tangents flow
    through strength and the 11 HT constants, wing tangents dropped).

    ``strength``/``wing`` and every entry of ``consts``
    (:func:`~radtxfr_tpu.kernels.htp_real.ht_line_constants` output) are
    (n_layers, n_lines) arrays over the SAME sorted line list that built
    ``plan`` (a packed plan — ``plan_buckets_packed``). Returns
    (n_layers, grid.n) float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if plan.gather is None:
        raise ValueError("xsect_ht_pallas requires a packed plan "
                         "(plan_buckets_packed)")
    f32 = lambda a: jnp.atleast_2d(jnp.asarray(a, dtype=jnp.float32))
    gth = jnp.asarray(plan.gather)
    pad = lambda a, fill: _gather_fused(f32(a), gth, fill)
    wing_cap = (plan.max_wing if plan.wing_line is None
                else jnp.asarray(plan.wing_line, dtype=jnp.float32))
    wingu = jnp.minimum(f32(wing), wing_cap) / plan.grid.dx
    cfg = (plan.tile, plan.block, plan.n_blocks, plan.n_tiles,
           plan.max_blocks, plan.grid.n, plan.grid.dx, n_weideman, "ht",
           fast_rcp and not interpret)
    consts_padded = tuple(pad(consts[k], 1.0 if k == "cte" else 0.0)
                          for k in _HT_CONST_KEYS)
    args = (cfg, jnp.asarray(plan.k_line), jnp.asarray(plan.frac0),
            pad(strength, 0.0), pad(wingu, 0.0), consts_padded,
            jnp.asarray(plan.starts), jnp.asarray(plan.counts),
            jnp.zeros((plan.n_tiles,), dtype=jnp.int32))
    if differentiable:
        return xsect_fused_ht_diff(*args, interpret)
    return _xsect_fused_ht_call(*args, interpret=interpret)


def _make_fused_ht_jvp_kernel(tile: int, block: int, n_lay: int, dx: float,
                              n_weideman: int, fast: bool = False):
    """Tangent kernel for the Hartmann-Tran block: the directional
    derivative of ``strength * pcqsdhc_real(dnu, consts)`` w.r.t.
    (strength, consts) is obtained by tracing ``jax.jvp`` through the
    real-arithmetic profile INSIDE the kernel body — analytically exact
    for the implemented region blend (the derivative OF the
    approximation, the same policy as the Voigt/SD-Voigt JVP kernels),
    with no hand-derived gradient of the four-region structure to
    maintain. Wing-cutoff tangents are dropped (piecewise-constant
    window, as everywhere in the Jacobian story)."""
    from .htp_real import pcqsdhc_real

    dx = np.float32(dx)
    wei_L_f, wei_a_f = weideman_coeffs(n_weideman)
    wei_a = tuple(np.float32(c) for c in wei_a_f)
    wei_L = np.float32(wei_L_f)
    n_c = len(_HT_CONST_KEYS)

    def kernel(starts_ref, counts_ref, off_ref, k_ref, f0_ref, s_ref,
               wu_ref, *refs):
        const_refs = refs[:n_c]
        s_t_ref = refs[n_c]
        const_t_refs = refs[n_c + 1:2 * n_c + 1]
        tan_ref = refs[-1]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            tan_ref[...] = jnp.zeros_like(tan_ref)

        @pl.when(j < counts_ref[i])
        def _accumulate():
            k_line = k_ref[0, 0, :].reshape(block, 1)
            frac0 = f0_ref[0, 0, :].reshape(block, 1)
            k_grid = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                      + i * tile + off_ref[i])
            rel = (k_grid - k_line).astype(jnp.float32)
            u = rel - frac0

            def body(l, _):
                get = lambda ref: ref[0, l, :].reshape(block, 1)
                strength = get(s_ref)
                wingu = get(wu_ref)
                cv = tuple(get(r) for r in const_refs)
                ct = tuple(get(r) for r in const_t_refs)
                s_t = get(s_t_ref)

                def f(sc, consts_vals):
                    consts = dict(zip(_HT_CONST_KEYS, consts_vals))
                    return sc * pcqsdhc_real(u * dx, consts, wei_a, wei_L,
                                             fast)

                _, tan = jax.jvp(f, (strength, cv), (s_t, ct))
                mask = (u > -wingu) & (u <= wingu)
                # finiteness guard: pcqsdhc is compute-and-mask — its
                # UNSELECTED branches can reach f32 Inf at extreme
                # parameters (the 15-term CPF3 series peaks within ~1.5x
                # of the f32 max; Mosaic's rounding on TPU tips some such
                # points to Inf that CPU holds finite), and jvp turns
                # Inf intermediates into NaN tangents even for zero input
                # tangents (0 x Inf). Selected-region branches are
                # guarded and bounded, with bounded derivatives, so a
                # non-finite tangent here is always masked-branch
                # garbage — zero it. Correctness is pinned by the
                # CPU-exact comparison against f64 jacfwd
                # (tests/test_pallas_xsect.py::
                # test_ht_differentiable_jacobian_matches_fd).
                tan = jnp.where(jnp.isfinite(tan), tan, 0.0)
                tan_ref[0, l, :] += jnp.sum(
                    jnp.where(mask, tan, 0.0), axis=0)
                return 0

            jax.lax.fori_loop(0, n_lay, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def _xsect_fused_ht_jvp_call(cfg, k_line, frac0, strength, wingu, consts,
                             s_t, consts_t, starts, counts, offset,
                             interpret=False):
    tile, block, nb, nt, mb, n_out, dx, n_wei, _mode, fast = cfg
    n_lay = strength.shape[1]
    # fast=False: pl.reciprocal has no JVP rule, and the probe suite
    # measured approx-rcp + Newton at the same slot cost as a divide on
    # v5e anyway — the tangent kernel always uses exact division
    kernel = _make_fused_ht_jvp_kernel(tile, block, n_lay, dx, n_wei,
                                       fast=False)

    def line_map(i, j, starts_ref, counts_ref, off_ref):
        return (jnp.minimum(starts_ref[i] + j, nb - 1), 0, 0)

    n_data = 2 + 2 * len(consts)        # strength, consts, s_t, consts_t
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, mb),
        in_specs=[
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, n_lay, block), line_map, memory_space=pltpu.VMEM)
        ] * (1 + n_data),
        out_specs=pl.BlockSpec((1, n_lay, tile),
                               lambda i, j, s, c, o: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    tan = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, n_lay, tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_lay * nt * mb * block * tile * _ops_per_eval(n_wei, "ht"),
            bytes_accessed=(nt * n_lay * tile * 4
                            + nt * mb * n_lay * block * 25 * 4),
            transcendentals=0,
        ),
    )(starts, counts, offset, k_line, frac0, strength, wingu, *consts,
      s_t, *consts_t)
    return tan.transpose(1, 0, 2).reshape(n_lay, nt * tile)[:, :n_out]


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 9))
def xsect_fused_ht_diff(cfg, k_line, frac0, strength, wingu, consts,
                        starts, counts, offset, interpret=False):
    """Differentiable fused HT call: primal = the ordinary HT kernel; the
    JVP launches :func:`_make_fused_ht_jvp_kernel` as a second kernel
    (two launches per JVP, keeping the primal unbatched under jacfwd).
    Tangents flow through ``strength`` and all 11 per-line HT constants
    (:data:`_HT_CONST_KEYS` order); wing tangents are dropped."""
    return _xsect_fused_ht_call(cfg, k_line, frac0, strength, wingu,
                                consts, starts, counts, offset,
                                interpret=interpret)


@xsect_fused_ht_diff.defjvp
def _xsect_fused_ht_diff_jvp(cfg, interpret, primals, tangents):
    k_line, frac0, s, wingu, consts, starts, counts, offset = primals
    _, _, s_t, _, consts_t, _, _, _ = tangents
    f32z = lambda t, p: (jnp.zeros_like(p)
                         if isinstance(t, jax.custom_derivatives
                                       .SymbolicZero)
                         else t.astype(jnp.float32))
    out = xsect_fused_ht_diff(cfg, k_line, frac0, s, wingu, consts,
                              starts, counts, offset, interpret)
    tan = _xsect_fused_ht_jvp_call(
        cfg, k_line, frac0, s, wingu, consts,
        f32z(s_t, s), tuple(f32z(t, p) for t, p in zip(consts_t, consts)),
        starts, counts, offset, interpret=interpret)
    return out, tan


def _make_fused_jvp_kernel(tile: int, block: int, n_lay: int, dx: float,
                           n_weideman: int, fast: bool = False):
    """Layer-fused Voigt kernel emitting the directional derivative (the
    tangent) for mode 'full'; the JVP rule launches it alongside a separate
    primal kernel so the primal stays unbatched under ``jacfwd``.

    (dK/dx, dK/dy) come from the region-consistent analytic derivatives of
    each approximation (:func:`_voigt_K_grads` — NOT the exact-Faddeeva
    identity, whose far-wing cancellation amplifies approximation error;
    see :func:`_asym_K_grads`). The tangent of the per-line contribution
    c = s * A * K (A = cte/sqrt(pi), cte = sqrt(ln2)/gamma_d,
    x = (u - ds) dx cte, y = gamma_0 cte) w.r.t. (s, gamma_d, gamma_0, ds)
    then costs ~2x the primal, not a finite difference of two full passes.
    Wing-cutoff tangents are deliberately dropped (the window mask is
    piecewise-constant — same convention as the reference's finite
    differences and the jnp autodiff path, products/jacobian.py).
    """
    dx = np.float32(dx)
    wei_L_f, wei_a_f = weideman_coeffs(n_weideman)
    wei_a = tuple(np.float32(c) for c in wei_a_f)
    wei_L = np.float32(wei_L_f)

    def kernel(starts_ref, counts_ref, off_ref, k_ref, f0_ref,
               ds_ref, s_ref, gd_ref, g0_ref, wu_ref,
               dst_ref, st_ref, gdt_ref, g0t_ref,
               tan_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            tan_ref[...] = jnp.zeros_like(tan_ref)

        @pl.when(j < counts_ref[i])
        def _accumulate():
            k_line = k_ref[0, 0, :].reshape(block, 1)
            frac0 = f0_ref[0, 0, :].reshape(block, 1)
            k_grid = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                      + i * tile + off_ref[i])
            rel = (k_grid - k_line).astype(jnp.float32)
            u = rel - frac0

            def body(l, _):
                ds = ds_ref[0, l, :].reshape(block, 1)
                s = s_ref[0, l, :].reshape(block, 1)
                gd = gd_ref[0, l, :].reshape(block, 1)
                g0 = g0_ref[0, l, :].reshape(block, 1)
                wingu = wu_ref[0, l, :].reshape(block, 1)
                ds_t = dst_ref[0, l, :].reshape(block, 1)
                s_t = st_ref[0, l, :].reshape(block, 1)
                gd_t = gdt_ref[0, l, :].reshape(block, 1)
                g0_t = g0t_ref[0, l, :].reshape(block, 1)

                cte = _SQRT_LN2 / gd
                x = (u - ds) * (dx * cte)
                y = g0 * cte
                K, Kx, Ky = _voigt_K_grads(x, y, wei_a, wei_L, fast)
                A = _INV_SQRT_PI * cte
                sA = s * A
                tan = (s_t * A * K
                       - gd_t * (sA / gd) * (K + x * Kx + y * Ky)
                       + g0_t * (sA * cte) * Ky
                       - ds_t * (sA * (dx * cte)) * Kx)
                mask = (u > -wingu) & (u <= wingu)
                tan_ref[0, l, :] += jnp.sum(jnp.where(mask, tan, 0.0), axis=0)
                return 0

            jax.lax.fori_loop(0, n_lay, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def _xsect_fused_jvp_call(cfg, k_line, frac0, ds, strength, gd, g0, wingu,
                          ds_t, s_t, gd_t, g0_t, starts, counts, offset,
                          interpret=False):
    tile, block, nb, nt, mb, n_out, dx, n_wei, _mode, fast = cfg
    n_lay = strength.shape[1]
    kernel = _make_fused_jvp_kernel(tile, block, n_lay, dx, n_wei, fast)

    def line_map(i, j, starts_ref, counts_ref, off_ref):
        return (jnp.minimum(starts_ref[i] + j, nb - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, mb),
        in_specs=[
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, n_lay, block), line_map, memory_space=pltpu.VMEM)
        ] * 9,
        out_specs=pl.BlockSpec((1, n_lay, tile),
                               lambda i, j, s, c, o: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    tan = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, n_lay, tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_lay * nt * mb * block * tile * _flops_per_eval(n_wei, "full"),
            bytes_accessed=(nt * n_lay * tile * 4
                            + nt * mb * n_lay * block * 9 * 4),
            transcendentals=0,
        ),
    )(starts, counts, offset, k_line, frac0, ds, strength, gd, g0, wingu,
      ds_t, s_t, gd_t, g0_t)
    return tan.transpose(1, 0, 2).reshape(n_lay, nt * tile)[:, :n_out]


def _make_fused_sdvoigt_jvp_kernel(tile: int, block: int, n_lay: int,
                                   dx: float, n_weideman: int,
                                   fast: bool = False):
    """Layer-fused SD-Voigt tangent kernel (VERDICT r2 #7).

    Differentiates the pcqsdhc SD-Voigt block analytically through the
    complex-sqrt chain. With X = (Gamma0 - 1.5 Gamma2 + i (Shift0 - dnu))
    / Gamma2, c = GammaD / (2 sqrt(ln2) Gamma2), Y = c^2, S = sqrt(X + Y),
    Z1,2 = S -+ c, and the profile A (K(Z1) - K(Z2)) with
    A = cte/sqrt(pi), K(Z) = Re w(iZ):

        dX  = [dGamma0 - (1.5 + X) dGamma2 + i dShift0] / Gamma2
        dc  = c (dGammaD/GammaD - dGamma2/Gamma2)
        dS  = (dX + 2 c dc) / (2 S)
        dK(Z_k) = Kx * (-Im dZ_k) + Ky * Re dZ_k,   dZ_k = dS -+ dc

    with (Kx, Ky) the region-consistent derivatives of the hum1_wei
    approximation (:func:`_voigt_K_grads`; same rationale as the Voigt
    tangent kernel — the exact-Faddeeva identity amplifies approximation
    error in the far wing). Inside the primal's narrow CPF3 sub-band the
    tangent uses the Weideman/asym blend's slope instead of CPF3's — both
    approximate w to ~1e-6, so the slope mismatch is far below the f32
    kernel tolerance. The runtime Voigt-limit clamp (Gamma2 ->
    max(Gamma2, 1e-4 Gamma0)) propagates d(1e-4 Gamma0) in the clamped
    region. Wing-cutoff tangents are dropped (piecewise-constant window).
    """
    dx = np.float32(dx)
    wei_L_f, wei_a_f = weideman_coeffs(n_weideman)
    wei_a = tuple(np.float32(c) for c in wei_a_f)
    wei_L = np.float32(wei_L_f)

    def kernel(starts_ref, counts_ref, off_ref, k_ref, f0_ref,
               s_ref, gd_ref, g0_ref, g2_ref, s0_ref, wu_ref,
               st_ref, gdt_ref, g0t_ref, g2t_ref, s0t_ref,
               tan_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            tan_ref[...] = jnp.zeros_like(tan_ref)

        @pl.when(j < counts_ref[i])
        def _accumulate():
            k_line = k_ref[0, 0, :].reshape(block, 1)
            frac0 = f0_ref[0, 0, :].reshape(block, 1)
            k_grid = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                      + i * tile + off_ref[i])
            rel = (k_grid - k_line).astype(jnp.float32)
            u = rel - frac0

            def body(l, _):
                get = lambda ref: ref[0, l, :].reshape(block, 1)
                s, gd, g0 = get(s_ref), get(gd_ref), get(g0_ref)
                g2_raw, s0, wingu = get(g2_ref), get(s0_ref), get(wu_ref)
                s_t, gd_t, g0_t = get(st_ref), get(gdt_ref), get(g0t_ref)
                g2_t, s0_t = get(g2t_ref), get(s0t_ref)

                dnu = u * dx
                cte = _SQRT_LN2 / gd
                clamp = 1e-4 * g0 + 1e-12
                g2 = jnp.maximum(g2_raw, clamp)
                g2e_t = jnp.where(g2_raw >= clamp, g2_t, 1e-4 * g0_t)
                inv_g2 = 1.0 / g2
                xr = (g0 - 1.5 * g2) * inv_g2
                xi = (s0 - dnu) * inv_g2
                c = 0.5 / (cte * g2)
                Y = c * c

                # S = sqrt(X + Y) as a real pair (us, vs), as in the primal
                a = xr + Y
                r = jnp.sqrt(a * a + xi * xi)
                us = jnp.sqrt(jnp.maximum((r + a) * 0.5, 0.0))
                vs = jnp.sign(xi) * jnp.sqrt(jnp.maximum((r - a) * 0.5, 0.0))
                x12 = -vs
                y1 = us - c
                y2 = us + c
                K1, Kx1, Ky1 = _voigt_K_grads(x12, y1, wei_a, wei_L, fast)
                K2, Kx2, Ky2 = _voigt_K_grads(x12, y2, wei_a, wei_L, fast)

                # tangents of X, c, Y, S, Z
                dXr = inv_g2 * (g0_t - (1.5 + xr) * g2e_t)
                dXi = inv_g2 * (s0_t - xi * g2e_t)
                dc = c * (gd_t / gd - inv_g2 * g2e_t)
                num_r = dXr + 2.0 * c * dc
                num_i = dXi
                den = 2.0 * jnp.maximum(us * us + vs * vs, 1e-30)
                dSr = (num_r * us + num_i * vs) / den
                dSi = (num_i * us - num_r * vs) / den
                # point coords (x, y) = (-Im Z, Re Z):
                dK1 = Kx1 * (-dSi) + Ky1 * (dSr - dc)
                dK2 = Kx2 * (-dSi) + Ky2 * (dSr + dc)

                A = _INV_SQRT_PI * cte
                dK12 = K1 - K2
                tan = (s_t * A * dK12
                       - gd_t * (s * A / gd) * dK12
                       + s * A * (dK1 - dK2))
                mask = (u > -wingu) & (u <= wingu)
                tan_ref[0, l, :] += jnp.sum(jnp.where(mask, tan, 0.0), axis=0)
                return 0

            jax.lax.fori_loop(0, n_lay, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def _xsect_fused_sdvoigt_jvp_call(cfg, k_line, frac0, strength, gd, g0, g2,
                                  s0, wingu, s_t, gd_t, g0_t, g2_t, s0_t,
                                  starts, counts, offset, interpret=False):
    tile, block, nb, nt, mb, n_out, dx, n_wei, _mode, fast = cfg
    n_lay = strength.shape[1]
    kernel = _make_fused_sdvoigt_jvp_kernel(tile, block, n_lay, dx, n_wei,
                                            fast)

    def line_map(i, j, starts_ref, counts_ref, off_ref):
        return (jnp.minimum(starts_ref[i] + j, nb - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, mb),
        in_specs=[
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, n_lay, block), line_map, memory_space=pltpu.VMEM)
        ] * 11,
        out_specs=pl.BlockSpec((1, n_lay, tile),
                               lambda i, j, s, c, o: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    tan = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, n_lay, tile), jnp.float32),
        interpret=interpret,
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_lay * nt * mb * block * tile
            * _flops_per_eval(n_wei, "sdvoigt"),
            bytes_accessed=(nt * n_lay * tile * 4
                            + nt * mb * n_lay * block * 11 * 4),
            transcendentals=0,
        ),
    )(starts, counts, offset, k_line, frac0, strength, gd, g0, g2, s0,
      wingu, s_t, gd_t, g0_t, g2_t, s0_t)
    return tan.transpose(1, 0, 2).reshape(n_lay, nt * tile)[:, :n_out]


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 12))
def xsect_fused_sdvoigt_diff(cfg, k_line, frac0, strength, gd, g0, g2, s0,
                             wingu, starts, counts, offset, interpret=False):
    """Differentiable fused SD-Voigt call (single-pass mode 'sdvoigt'):
    primal via the ordinary kernel, tangent via
    :func:`_make_fused_sdvoigt_jvp_kernel` as a separate launch (keeps the
    primal unbatched under ``jacfwd``). Tangents flow through (strength,
    gamma_d, gamma_0, gamma_2, shift0); SD-Voigt's grid shift ``ds`` is
    identically zero (the shift lives inside the profile)."""
    ds = jnp.zeros_like(s0)
    return _xsect_fused_call(cfg, k_line, frac0, ds, strength, gd, g0, g2,
                             s0, wingu, starts, counts, offset,
                             interpret=interpret)


@xsect_fused_sdvoigt_diff.defjvp
def _xsect_fused_sdvoigt_diff_jvp(cfg, interpret, primals, tangents):
    k_line, frac0, s, gd, g0, g2, s0, wingu, starts, counts, offset = primals
    _, _, s_t, gd_t, g0_t, g2_t, s0_t, _, _, _, _ = tangents
    f32z = lambda t, p: (jnp.zeros_like(p)
                         if getattr(t, "dtype", None) == jax.dtypes.float0
                         else t)
    out = xsect_fused_sdvoigt_diff(cfg, k_line, frac0, s, gd, g0, g2, s0,
                                   wingu, starts, counts, offset, interpret)
    tan = _xsect_fused_sdvoigt_jvp_call(
        cfg, k_line, frac0, s, gd, g0, g2, s0, wingu,
        f32z(s_t, s), f32z(gd_t, gd), f32z(g0_t, g0), f32z(g2_t, g2),
        f32z(s0_t, s0), starts, counts, offset, interpret=interpret)
    return out, tan


def plan_executed_evals(plan: BucketPlan, n_lay: int) -> int:
    """Executed (line-slot x grid-point) evaluations for ONE kernel call.

    The fused kernels' grid is (n_tiles, max_blocks) but blocks beyond
    ``counts[i]`` are skipped by ``pl.when`` — the work the chip actually
    runs is sum(counts) blocks, each a full (n_lay, block, tile) dense
    evaluation *including* the padding slots of each tile's last block
    (packed plans) / boundary blocks (shared plans). This is the honest
    numerator for utilization accounting (bench.py::_roofline), unlike the
    padded ``n_tiles * max_blocks`` grid bound.
    """
    return int(n_lay) * int(np.sum(plan.counts)) * plan.block * plan.tile


def _ops_per_eval(n_wei: int, mode: str) -> int:
    """Hand-counted VPU lane-ops per (line-slot, grid-point) evaluation.

    Derivation conventions (full op-by-op tables: docs/ROOFLINE.md):

    * one elementwise lane op (mul/add/sub/neg/cmp/and/select/abs/max/min/
      sign/int-sub/convert) on the (block, tile) working set = 1;
      ``a*b+c`` counts 2 (the probe suite shows mul+add pairs sustain
      ~1.4e12 ops/s vs ~1.26e12 for single ops — no single-slot FMA);
    * sqrt = 3, divide = 4, fast reciprocal (approx + Newton) = 4,
      exp = 6 — calibrated against tools/vpu_peak_probe.py composites;
    * per-line (block, 1) algebra is EXCLUDED (amortized by tile >= 256);
      compiler CSE of repeated subexpressions is assumed where flagged in
      the tables. Both choices bias the count LOW, so utilization figures
      derived from it are conservative.

    Building blocks at n = n_wei (y per-line unless marked _E):
    PRE = 11 (index diff+cast, frac sub, 3-op window mask, scale mul,
    select, row accumulate, 2-op x); ASYM = 17 guarded / 16 plain
    (elementwise-y variant 19); WEI = 30 + 7n (elementwise-y 35 + 7n);
    CPF3_RE = 168 (re-only, DCE'd imag), CPF3_PAIR = 172;
    W_KL = 65 + 7n per-line-y / 72 + 7n elementwise-y.
    """
    n = int(n_wei)
    if mode == "asym":
        return 11 + 17
    if mode == "lorentz":
        return 11 + 7
    if mode == "doppler":
        return 11 + 9
    if mode == "mix":
        return 11 + (65 + 7 * n) + 2
    if mode == "full":
        return 11 + 3 + (30 + 7 * n) + 16 + 1
    if mode == "core":
        return 11 + 3 + (30 + 7 * n) + 17 + 2
    if mode == "sdvoigt_asym":
        return 11 + 2 + 19 + 3 + 2 * 19 + 2
    if mode in ("sdvoigt", "sdvoigt_core"):
        base = 57 + 2 * (227 + 7 * n)       # 735 at n=16
        return base + (2 * 20 if mode == "sdvoigt_core" else 0)
    if mode == "ht":
        return 1312 + 42 * n                # 6 W_KL + 2 CPF3 + bookkeeping
    if mode.startswith("corr:"):
        # point term + mask/subtract + amortized node terms and
        # cubic-weight construction: the (S+3, tile) Lagrange weight
        # matrix costs ~16 ops/entry built per (block x tile) body call,
        # ~16(S+3)/block ~ 12/point at the production corr shapes
        # (S ~ 8-11, block ~ 16); the (block, S+3) @ (S+3, tile)
        # upsample itself runs on the MXU — not counted against the VPU
        variant = mode.split(":")[2]
        overhead = 8 + 1 + 1 + 1 + 1 + 12
        if variant == "voigt":
            return overhead + 17
        if variant == "voigtfull":
            return overhead + 3 + (30 + 7 * n) + 16 + 1
        if variant == "sdvoigt":
            return overhead + 64 + 1
        return overhead + (57 - 11) + 2 * (227 + 7 * n)   # sdvoigtfull
    raise ValueError(f"unknown mode {mode!r}")


def _flops_per_eval(n_wei: int, mode: str) -> int:
    """Per-(line, nu-point) flop estimate for the XLA scheduler: the
    Weideman series is ~8 flops/term (complex Horner), the asymptotic form
    ~12, plus masking/scale overhead ~40. SD-Voigt evaluates two CPFs on
    top of a complex sqrt (~40); its full/core variants also carry the
    branchless 15-term CPF3 sub-case (~120 each)."""
    if mode == "asym":
        return 12 + 40
    if mode.startswith("corr:"):
        # point term + the shared per-segment node terms (~1/R amortized,
        # counted as one extra eval); 'full' point variants pay the blend
        variant = mode.split(":")[2]
        if variant.startswith("sdvoigt"):
            per = (2 * (8 * n_wei + 12 + 120) + 80 if variant.endswith("full")
                   else 2 * 12 + 80)
        else:
            per = (8 * n_wei + 52 if variant.endswith("full") else 12 + 40)
        return 2 * per + 10
    if mode == "sdvoigt_asym":
        return 2 * 12 + 40 + 40
    if mode.startswith("sdvoigt"):
        return 2 * (8 * n_wei + 12 + 120) + 40 + 40
    return 8 * n_wei + 40


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 11))
def xsect_fused_voigt_diff(cfg, k_line, frac0, ds, strength, gd, g0, wingu,
                           starts, counts, offset, interpret=False):
    """Differentiable fused Voigt call (mode 'full'): the primal is the
    ordinary kernel; the JVP launches the tangent kernel
    (:func:`_make_fused_jvp_kernel`) as a second, separate kernel — two
    launches per JVP, which keeps the primal unbatched under ``jacfwd`` —
    so Jacobians get the fast path instead of falling back to the jnp
    engine. Tangents flow through
    (ds, strength, gamma_d, gamma_0); wing-cutoff tangents are dropped
    (piecewise-constant window, as in the reference's finite differences)."""
    g2 = jnp.ones_like(strength)
    s0 = jnp.zeros_like(ds)
    return _xsect_fused_call(cfg, k_line, frac0, ds, strength, gd, g0, g2,
                             s0, wingu, starts, counts, offset,
                             interpret=interpret)


@xsect_fused_voigt_diff.defjvp
def _xsect_fused_voigt_diff_jvp(cfg, interpret, primals, tangents):
    k_line, frac0, ds, s, gd, g0, wingu, starts, counts, offset = primals
    _, _, ds_t, s_t, gd_t, g0_t, _, _, _, _ = tangents
    f32z = lambda t, p: (jnp.zeros_like(p)
                         if getattr(t, "dtype", None) == jax.dtypes.float0
                         else t)
    # primal via the plain kernel, tangent via the tangent-only kernel:
    # under jacfwd's vmap over tangent directions the primal stays
    # unbatched (a fused primal+tangent call would batch the primal output
    # and break jacfwd's out_axes=None contract)
    out = xsect_fused_voigt_diff(cfg, k_line, frac0, ds, s, gd, g0, wingu,
                                 starts, counts, offset, interpret)
    tan = _xsect_fused_jvp_call(
        cfg, k_line, frac0, ds, s, gd, g0, wingu,
        f32z(ds_t, ds), f32z(s_t, s), f32z(gd_t, gd), f32z(g0_t, g0),
        starts, counts, offset, interpret=interpret)
    return out, tan


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def _xsect_fused_call(cfg, k_line, frac0, ds, strength,
                      gd, g0, g2, s0, wingu, starts, counts, offset,
                      interpret=False):
    # cfg: (tile, block, n_blocks, n_tiles, max_blocks, n_out, dx,
    # n_weideman, mode, fast[, layout]); layered arrays are
    # (n_blocks, n_lay, block) for layout 's' (default when cfg has 10
    # fields) and (n_blocks, block, n_lay) for the lane-aligned 'l'.
    tile, block, nb, nt, mb, n_out, dx, n_wei, mode, fast = cfg[:10]
    layout = cfg[10] if len(cfg) > 10 else "s"
    n_lay = strength.shape[2] if layout == "l" else strength.shape[1]
    kernel = _make_fused_kernel(tile, block, n_lay, dx, n_wei, mode, fast,
                                layout=layout)

    def line_map(i, j, starts_ref, counts_ref, off_ref):
        return (jnp.minimum(starts_ref[i] + j, nb - 1), 0, 0)

    lay_block = ((1, block, n_lay) if layout == "l" else (1, n_lay, block))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, mb),
        in_specs=[
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(lay_block, line_map, memory_space=pltpu.VMEM)
        ] * 7,
        out_specs=pl.BlockSpec(
            (1, n_lay, tile), lambda i, j, s, c, o: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, n_lay, tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_lay * nt * mb * block * tile * _flops_per_eval(n_wei, mode),
            bytes_accessed=(nt * n_lay * tile * 4
                            + nt * mb * n_lay * block * 7 * 4),
            transcendentals=0,
        ),
    )(starts, counts, offset, k_line, frac0, ds, strength, gd, g0, g2, s0,
      wingu)
    return out.transpose(1, 0, 2).reshape(n_lay, nt * tile)[:, :n_out]


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def _xsect_pallas_call(cfg, k_line, frac0, ds, strength,
                       gd, g0, wingu, starts, counts, interpret=False):
    # cfg: hashable static tuple (tile, block, n_blocks, n_tiles, max_blocks,
    # n_out, dx, n_weideman, mode, fast)
    tile, block, nb, nt, mb, n_out, dx, n_wei, mode, fast = cfg
    n_lay = strength.shape[0]
    kernel = _make_kernel(tile, block, dx, n_wei, mode, fast)

    # Mosaic block-shape rule: the last two dims of every block must be
    # (8k, 128m) or equal to the array's; singleton axes are inserted so the
    # trailing (1, block)/(1, tile) blocks match their arrays exactly.
    def line_map(l, i, j, starts_ref, counts_ref):
        return (jnp.minimum(starts_ref[i] + j, nb - 1), 0, 0)

    def line_map_lay(l, i, j, starts_ref, counts_ref):
        return (l, jnp.minimum(starts_ref[i] + j, nb - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_lay, nt, mb),
        in_specs=[
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), line_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block), line_map_lay, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block), line_map_lay, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block), line_map_lay, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block), line_map_lay, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block), line_map_lay, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, tile), lambda l, i, j, s, c: (l, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_lay, nt, 1, tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_lay * nt * mb * block * tile * _flops_per_eval(n_wei, mode),
            bytes_accessed=n_lay * nt * tile * 4 + n_lay * nt * mb * block * 5 * 4,
            transcendentals=0,
        ),
    )(starts, counts, k_line, frac0, ds, strength, gd, g0, wingu)
    return out.reshape(n_lay, nt * tile)[:, :n_out]


def xsect_pallas(plan: BucketPlan, params: LineParams, interpret: bool | None = None,
                 n_weideman: int = 24, mode: str = "full",
                 fused_layers: bool = False, starts=None, counts=None,
                 k_offset=None, n_tiles: int | None = None,
                 n_out: int | None = None, k_line=None, frac0=None,
                 fast_rcp: bool = False, differentiable: bool = False,
                 param_layout: str = "auto"):
    """Evaluate layered spectra with the Pallas kernel.

    Parameters
    ----------
    plan : :class:`BucketPlan` built from the same (sorted) line list that
        produced ``params``.
    params : :class:`LineParams` with **layer-batched** arrays of shape
        (n_layers, n_lines) (vmap :func:`compute_line_params` over layers;
        a single layer may pass (n_lines,) arrays).
    interpret : force interpreter mode (defaults to True off-TPU so tests
        run on the CPU backend).

    Returns
    -------
    (n_layers, grid.n) float32 spectra (squeezed to (grid.n,) for 1-D input).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    single = params.strength.ndim == 1
    f32 = lambda a: jnp.atleast_2d(jnp.asarray(a, dtype=jnp.float32))
    strength = f32(params.strength)
    gd = f32(params.gamma_d)
    g0 = f32(params.gamma_0)
    dx = plan.grid.dx
    # Pressure shift in grid units from the shift0 field directly:
    # (nu0_shifted - nu0) in float32 loses the shift to cancellation at
    # nu ~ 1000 cm^-1. SDVoigt centers the profile on nu0 and applies the
    # shift inside the HT profile, so its ds is exactly zero.
    sd_mode = (mode.startswith("sdvoigt")
               or (mode.startswith("corr:")
                   and mode.split(":")[2].startswith("sdvoigt")))
    if sd_mode:
        ds = f32(jnp.zeros_like(params.shift0))
    else:
        ds = f32(params.shift0 / dx)
    if mode.startswith("corr:"):
        # correction passes: placement is intentionally narrower than the
        # hapi window (near zones / edge bands); the mask must stay the
        # TRUE window, so the plan's wing clamp does not apply
        wingu = f32(params.wing / dx)
    else:
        wing_cap = (plan.max_wing if plan.wing_line is None
                    else jnp.asarray(plan.wing_line, dtype=jnp.float32))
        wingu = f32(jnp.minimum(params.wing, wing_cap) / dx)

    nb, block = plan.n_blocks, plan.block
    # starts/counts/k_line/frac0/k_offset/n_tiles overrides support
    # spectrum- and line-sharded SPMD execution: each device passes its local
    # tile ranges, (optionally) its local line positions, and grid offset.
    starts = jnp.asarray(plan.starts) if starts is None else starts
    counts = jnp.asarray(plan.counts) if counts is None else counts
    k_line = jnp.asarray(plan.k_line) if k_line is None else k_line.reshape(plan.k_line.shape)
    frac0 = jnp.asarray(plan.frac0) if frac0 is None else frac0.reshape(plan.frac0.shape)
    nt = plan.n_tiles if n_tiles is None else n_tiles
    n_out = (plan.grid.n if n_out is None else n_out)
    # param_layout (fused, non-differentiable calls only): 's' = historical
    # (n_blocks, n_lay, block) sublane packing with an in-kernel fori_loop;
    # 'l' = lane-aligned (n_blocks, block, n_lay) packing with a trace-time
    # unrolled layer loop whose per-layer reads are static lane picks (no
    # lane->sublane relayout per iteration — the measured fixed cost of the
    # core passes, docs/ROOFLINE.md #6). Same op sequence either way
    # (equal to float-rounding level; FMA contraction may differ).
    #
    # 'auto' (chip-measured policy, round 5): lane layout for SMALL blocks
    # only. Its VMEM slab per param is block x r128(n_lay) vs the sublane
    # layout's r8(n_lay) x r128(block), so at block=16 it is 2.5x smaller
    # AND kills the per-layer relayouts (core passes 18.6 -> 12.4 ms on
    # the north-star), while at block=200 the n_lay->128 lane padding
    # makes param streaming ~2.5x heavier and the at-the-roof far pass
    # regressed 30.9 -> 39.9 ms. block <= 128 captured every measured win
    # (64/88/16) and excluded the loss. Under interpret there is no
    # relayout to save, so 's' always. RADTXFR_FUSED_LAYOUT overrides.
    if param_layout == "auto":
        env_layout = os.environ.get("RADTXFR_FUSED_LAYOUT")
        if env_layout:
            param_layout = env_layout
        elif interpret:
            param_layout = "s"
        else:
            n_lay_in = strength.shape[0]
            param_layout = ("l" if (plan.block <= 128 and n_lay_in <= 128)
                            else "s")
    use_lane = (param_layout == "l" and fused_layers and not differentiable)
    cfg = (plan.tile, plan.block, plan.n_blocks, nt,
           plan.max_blocks, n_out, plan.grid.dx, n_weideman, mode,
           fast_rcp and not interpret) + (("l",) if use_lane else ())
    gth = None if plan.gather is None else jnp.asarray(plan.gather)
    if fused_layers:
        if use_lane:
            if gth is None:
                pad = lambda a, fill: _pad_fused_T(a, nb, block, fill)
            else:
                pad = lambda a, fill: _gather_fused_T(a, gth, fill)
        elif gth is None:
            pad = lambda a, fill: _pad_fused(a, nb, block, fill)
        else:
            pad = lambda a, fill: _gather_fused(a, gth, fill)
        # per-TILE global offsets (weighted/permuted spectrum sharding
        # assigns tiles to shards non-contiguously); a scalar broadcasts
        # to the contiguous-shard case
        if k_offset is None:
            k_offset = jnp.zeros((nt,), dtype=jnp.int32)
        else:
            k_offset = jnp.asarray(k_offset, dtype=jnp.int32)
            k_offset = (jnp.full((nt,), k_offset.reshape(()), dtype=jnp.int32)
                        if k_offset.ndim == 0 or k_offset.size == 1
                        else k_offset.reshape(nt))
        if differentiable:
            if mode == "sdvoigt":
                out = xsect_fused_sdvoigt_diff(
                    cfg, k_line, frac0,
                    pad(strength, 0.0), pad(gd, 1.0), pad(g0, 1.0),
                    pad(f32(params.gamma_2), 1.0),
                    pad(f32(params.shift0), 0.0), pad(wingu, 0.0),
                    starts, counts, k_offset, interpret)
            elif mode != "full":
                raise ValueError(
                    "differentiable=True supports the single-pass 'full' "
                    "Voigt and 'sdvoigt' modes only (build plans with "
                    "two_pass=False)")
            else:
                out = xsect_fused_voigt_diff(
                    cfg, k_line, frac0,
                    pad(ds, 0.0), pad(strength, 0.0), pad(gd, 1.0),
                    pad(g0, 1.0), pad(wingu, 0.0),
                    starts, counts, k_offset, interpret)
        else:
            g2 = f32(params.gamma_2)
            s0 = f32(params.shift0)
            out = _xsect_fused_call(
                cfg,
                k_line,
                frac0,
                pad(ds, 0.0),
                pad(strength, 0.0),
                pad(gd, 1.0),
                pad(g0, 1.0),
                pad(g2, 1.0),
                pad(s0, 0.0),
                pad(wingu, 0.0),
                starts, counts, k_offset,
                interpret=interpret,
            )
    else:
        if k_offset is not None:
            raise ValueError("k_offset requires fused_layers=True")
        if differentiable:
            raise ValueError("differentiable=True requires fused_layers=True")
        if gth is None:
            pad = lambda a, fill: _pad_layered(a, nb, block, fill)
        else:
            pad = lambda a, fill: _gather_layered(a, gth, fill)
        out = _xsect_pallas_call(
            cfg,
            k_line,
            frac0,
            pad(ds, 0.0),
            pad(strength, 0.0),
            pad(gd, 1.0),
            pad(g0, 1.0),
            pad(wingu, 0.0),
            starts, counts,
            interpret=interpret,
        )
    return out[0] if single else out
