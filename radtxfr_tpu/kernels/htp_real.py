"""pCqSDHC (Hartmann-Tran) profile in pure real arithmetic.

The Pallas TPU kernel language has no complex dtypes, so the HT fast path
needs the full ``pcqsdhc`` region structure (``misc/hapi.py:9850-10023``;
:mod:`radtxfr_tpu.kernels.htp` is the complex jnp reference) expressed as
real pairs. Everything here is plain branchless jnp — it runs identically
inside a Pallas kernel body and under jit on any backend, which is how it
is tested: float64 CPU comparison against :func:`htp.pcqsdhc` over the
full region structure (PART1 with its |Z1| > 4e3 asymptotic branch,
PART2, PART3 with its small-|sqrt X| branch, PART4 with the CPF3
sub-selection), including complex-valued eta.

Parameterization: the caller precomputes the per-line complex constants
(c0t, c2t, csqrtY, the denominator constants D0 = anuvc - eta (c0 - 1.5 c2)
and E2 = eta c2) once per (layer, line) — see :func:`ht_line_constants` —
so the per-(line x nu) hot math carries no redundant per-line algebra.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .faddeeva import REGION_BOUND

#  python-float constants: np.float64 scalars are not weak-typed and would
#  promote the kernel's float32 math to f64 under jax_enable_x64
_RPI = float(np.sqrt(np.pi))
_INV_SQRT_PI = 1.0 / _RPI
_SQRT_LN2 = float(np.sqrt(np.log(2.0)))


# ---------------------------------------------------------------------------
# real-pair complex helpers (branchless, kernel-safe)
# ---------------------------------------------------------------------------

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cinv(ar, ai, guard=None):
    # dtype-aware zero guard: a 1e-300 literal underflows to 0.0 in
    # float32, which would make the guard a no-op on the kernel path
    m = ar * ar + ai * ai
    g = jnp.finfo(jnp.result_type(m)).tiny if guard is None else guard
    m = jnp.maximum(m, g)
    return ar / m, -ai / m


def _cdiv(ar, ai, br, bi, guard=None):
    ir, ii = _cinv(br, bi, guard)
    return _cmul(ar, ai, ir, ii)


def _csqrt(ar, ai):
    """Principal complex sqrt as real pairs (Re >= 0 branch).

    The zero floors are the dtype's smallest NORMAL, not 0.0: sqrt has an
    infinite derivative at 0, so a 0.0 floor makes jvp produce 0/0 = NaN
    tangents wherever an argument lands exactly on it (X nearly real ->
    r - ar == 0 in f32 — hit by the differentiable HT kernel even for
    zero input tangents). With a tiny-normal floor the max() zeroes the
    tangent instead; the value moves by sqrt(tiny) ~ 1e-19 — nothing."""
    g = jnp.finfo(jnp.result_type(ar)).tiny
    r = jnp.sqrt(jnp.maximum(ar * ar + ai * ai, g))
    u = jnp.sqrt(jnp.maximum(0.5 * (r + ar), g))
    v_mag = jnp.sqrt(jnp.maximum(0.5 * (r - ar), g))
    # sign convention: sqrt maps to Re >= 0; Im carries the sign of ai.
    # ai == 0, ar < 0 -> +i sqrt(|ar|) (numpy branch) — sign(0) = 0 would
    # zero it, so use >= 0 selection instead of sign().
    v = jnp.where(ai >= 0.0, v_mag, -v_mag)
    return u, v


def _wofz_pair(x, y, wei_a, wei_L, fast: bool = False):
    """(Re w, Im w) with hum1_wei's region blend — local import to avoid a
    cycle with pallas_xsect (which owns the VPU-tuned implementation)."""
    from .pallas_xsect import _voigt_w_KL

    return _voigt_w_KL(x, y, wei_a, wei_L, fast)


def _cpf3_pair(x, y):
    """(Re, Im) of the 15-term asymptotic CPF — shared implementation in
    :mod:`.pallas_xsect` (local import, same pattern as
    :func:`_wofz_pair`)."""
    from .pallas_xsect import _cpf3_pair as impl

    return impl(x, y)


def _w_of_pair(zr, zi, wei_a, wei_L, fast: bool = False):
    """hapi CPF convention: w evaluated at (x, y) = (-Im Z, Re Z)."""
    return _wofz_pair(-zi, zr, wei_a, wei_L, fast)


def _cpf_select_pair(zr, zi, use3, wei_a, wei_L, fast: bool = False):
    """w(Z) with the PART4 CPF3-vs-CPF sub-selection (x, y) = (-Im, Re)."""
    x, y = -zi, zr
    Kw, Lw = _wofz_pair(x, y, wei_a, wei_L, fast)
    K3, L3 = _cpf3_pair(x, y)
    return jnp.where(use3, K3, Kw), jnp.where(use3, L3, Lw)


# ---------------------------------------------------------------------------
# per-line constants (complex algebra done once per layer x line)
# ---------------------------------------------------------------------------

def ht_line_constants(gamma_d, gamma0, gamma2, shift0, shift2, anuvc,
                      eta_r, eta_i):
    """Precompute the per-line real-pair constants pcqsdhc needs.

    Returns a dict of arrays shaped like the inputs:
    ``cte`` = sqrt(ln2)/gamma_d, ``c0t/c2t/csqrtY`` (real, imag),
    ``d0`` = anuvc - eta (c0 - 1.5 c2) and ``e2`` = eta c2 (real, imag).
    Matches ``htp.pcqsdhc``'s preamble (eta may be complex — the HT
    driver's correlation parameter, ``misc/hapi.py:10640-10642``).
    """
    cte = _SQRT_LN2 / gamma_d
    c0r, c0i = gamma0, shift0
    c2r, c2i = gamma2, shift2
    # c0t = (1 - eta)(c0 - 1.5 c2) + anuvc ; c2t = (1 - eta) c2
    omr, omi = 1.0 - eta_r, -eta_i
    b0r, b0i = c0r - 1.5 * c2r, c0i - 1.5 * c2i
    c0tr, c0ti = _cmul(omr, omi, b0r, b0i)
    c0tr = c0tr + anuvc
    c2tr, c2ti = _cmul(omr, omi, c2r, c2i)
    # csqrtY = (gamma2 - i shift2) / (2 cte (1 - eta_safe)(gamma2^2 + shift2^2))
    g2s2 = c2r * c2r + c2i * c2i
    g2s2_safe = jnp.where(g2s2 == 0.0, 1.0, g2s2)
    eta_is_one = (eta_r == 1.0) & (eta_i == 0.0)
    om_r = jnp.where(eta_is_one, 1.0, omr)
    om_i = jnp.where(eta_is_one, 0.0, omi)
    den_r = 2.0 * cte * g2s2_safe * om_r
    den_i = 2.0 * cte * g2s2_safe * om_i
    cyr, cyi = _cdiv(c2r, -c2i, den_r, den_i)
    # d0 = anuvc - eta (c0 - 1.5 c2) ; e2 = eta c2
    e_b0r, e_b0i = _cmul(eta_r, eta_i, b0r, b0i)
    d0r, d0i = anuvc - e_b0r, -e_b0i
    e2r, e2i = _cmul(eta_r, eta_i, c2r, c2i)
    return dict(cte=cte, c0tr=c0tr, c0ti=c0ti, c2tr=c2tr, c2ti=c2ti,
                cyr=cyr, cyi=cyi, d0r=d0r, d0i=d0i, e2r=e2r, e2i=e2i)


# ---------------------------------------------------------------------------
# the profile
# ---------------------------------------------------------------------------

def pcqsdhc_real(dnu, k, wei_a, wei_L, fast: bool = False):
    """Re LS of pcqsdhc at ``dnu = sg - sg0`` from precomputed constants
    ``k`` (:func:`ht_line_constants`; every entry broadcastable against
    ``dnu``). Kernel-safe: real arithmetic, compute-and-mask only."""
    cte = k["cte"]
    c0tr, c0ti = k["c0tr"], k["c0ti"]
    c2tr, c2ti = k["c2tr"], k["c2ti"]
    cyr, cyi = k["cyr"], k["cyi"]

    # iz = i (sg0 - sg) = i * (-dnu)
    izr = jnp.zeros_like(dnu) + 0.0 * c0tr
    izi = -dnu + 0.0 * c0tr
    t0r, t0i = izr + c0tr, izi + c0ti          # i(sg0-sg) + c0t

    part1 = (c2tr * c2tr + c2ti * c2ti) == 0.0

    # ---------------- PART1 ------------------------------------------------
    z1ar, z1ai = t0r * cte, t0i * cte
    w1r, w1i = _w_of_pair(z1ar, z1ai, wei_a, wei_L, fast)
    A1r, A1i = _RPI * cte * w1r, _RPI * cte * w1i
    # B small: sqrt(pi) cte ((1 - Z1^2) w1 + Z1/sqrt(pi))
    z2_r, z2_i = _cmul(z1ar, z1ai, z1ar, z1ai)
    omz_r, omz_i = 1.0 - z2_r, -z2_i
    bw_r, bw_i = _cmul(omz_r, omz_i, w1r, w1i)
    B1s_r = _RPI * cte * (bw_r + z1ar * _INV_SQRT_PI)
    B1s_i = _RPI * cte * (bw_i + z1ai * _INV_SQRT_PI)
    # B big: cte (sqrt(pi) w1 + 1/(2 Z1) - 3/(4 Z1^3))
    i1r, i1i = _cinv(z1ar, z1ai)
    i3r, i3i = _cmul(i1r, i1i, *_cmul(i1r, i1i, i1r, i1i))
    B1b_r = cte * (_RPI * w1r + 0.5 * i1r - 0.75 * i3r)
    B1b_i = cte * (_RPI * w1i + 0.5 * i1i - 0.75 * i3i)
    big1 = jnp.sqrt(z1ar * z1ar + z1ai * z1ai) > 4.0e3
    B1r = jnp.where(big1, B1b_r, B1s_r)
    B1i = jnp.where(big1, B1b_i, B1s_i)

    # ---------------- PART2/3/4 shared -------------------------------------
    c2t_sr = jnp.where(part1, 1.0, c2tr)
    c2t_si = jnp.where(part1, 0.0, c2ti)
    ic2r, ic2i = _cinv(c2t_sr, c2t_si)
    Xr, Xi = _cmul(t0r, t0i, ic2r, ic2i)
    # Y = (1/(2 cte c2t))^2
    y0r, y0i = _cinv(2.0 * cte * c2t_sr, 2.0 * cte * c2t_si)
    Yr, Yi = _cmul(y0r, y0i, y0r, y0i)
    absX = jnp.sqrt(Xr * Xr + Xi * Xi)
    absY = jnp.sqrt(Yr * Yr + Yi * Yi)
    part2 = ~part1 & (absX <= 3.0e-8 * absY)
    part3 = ~part1 & ~part2 & (absY <= 1.0e-15 * absX)

    sxyr, sxyi = _csqrt(Xr + Yr, Xi + Yi)

    cy_sr = jnp.where((cyr * cyr + cyi * cyi) == 0.0, 1.0, cyr)
    cy_si = jnp.where((cyr * cyr + cyi * cyi) == 0.0, 0.0, cyi)
    icy_r, icy_i = _cinv(cy_sr, cy_si)

    # ---------------- PART4 ------------------------------------------------
    Z1r, Z1i = sxyr - cy_sr, sxyi - cy_si
    Z2r, Z2i = Z1r + 2.0 * cy_sr, Z1i + 2.0 * cy_si
    SZ1 = jnp.sqrt(Z1r * Z1r + Z1i * Z1i)
    SZ2 = jnp.sqrt(Z2r * Z2r + Z2i * Z2i)
    use3 = ((jnp.abs(SZ1 - SZ2) <= 1.0) & (jnp.maximum(SZ1, SZ2) > 8.0)
            & (jnp.minimum(SZ1, SZ2) <= 8.0))
    w14r, w14i = _cpf_select_pair(Z1r, Z1i, use3, wei_a, wei_L, fast)
    w24r, w24i = _cpf_select_pair(Z2r, Z2i, use3, wei_a, wei_L, fast)
    A4r = _RPI * cte * (w14r - w24r)
    A4i = _RPI * cte * (w14i - w24i)
    # B4 = (-1 + sqrt(pi)/(2 csqrtY) ((1-Z1^2)w1 - (1-Z2^2)w2)) / c2t
    z1sq_r, z1sq_i = _cmul(Z1r, Z1i, Z1r, Z1i)
    z2sq_r, z2sq_i = _cmul(Z2r, Z2i, Z2r, Z2i)
    t1r, t1i = _cmul(1.0 - z1sq_r, -z1sq_i, w14r, w14i)
    t2r, t2i = _cmul(1.0 - z2sq_r, -z2sq_i, w24r, w24i)
    hr, hi = _cmul(0.5 * _RPI * icy_r, 0.5 * _RPI * icy_i,
                   t1r - t2r, t1i - t2i)
    B4r, B4i = _cmul(hr - 1.0, hi, ic2r, ic2i)

    # ---------------- PART2 ------------------------------------------------
    Z2br, Z2bi = sxyr + cy_sr, sxyi + cy_si
    w12r, w12i = _w_of_pair(z1ar, z1ai, wei_a, wei_L, fast)
    w22r, w22i = _w_of_pair(Z2br, Z2bi, wei_a, wei_L, fast)
    A2r = _RPI * cte * (w12r - w22r)
    A2i = _RPI * cte * (w12i - w22i)
    z1bsq_r, z1bsq_i = _cmul(z1ar, z1ai, z1ar, z1ai)
    z2bsq_r, z2bsq_i = _cmul(Z2br, Z2bi, Z2br, Z2bi)
    u1r, u1i = _cmul(1.0 - z1bsq_r, -z1bsq_i, w12r, w12i)
    u2r, u2i = _cmul(1.0 - z2bsq_r, -z2bsq_i, w22r, w22i)
    h2r, h2i = _cmul(0.5 * _RPI * icy_r, 0.5 * _RPI * icy_i,
                     u1r - u2r, u1i - u2i)
    B2r, B2i = _cmul(h2r - 1.0, h2i, ic2r, ic2i)

    # ---------------- PART3 ------------------------------------------------
    wxyr, wxyi = _w_of_pair(sxyr, sxyi, wei_a, wei_L, fast)
    sXr, sXi = _csqrt(Xr, Xi)
    wxr, wxi = _w_of_pair(sXr, sXi, wei_a, wei_L, fast)
    sxwx_r, sxwx_i = _cmul(sXr, sXi, wxr, wxi)
    g_r, g_i = _INV_SQRT_PI - sxwx_r, -sxwx_i         # 1/sqrt(pi) - sX wX
    A3s_r, A3s_i = _cmul(2.0 * _RPI * g_r, 2.0 * _RPI * g_i, ic2r, ic2i)
    # coeff = 1 - X - 2Y
    cr, ci = 1.0 - Xr - 2.0 * Yr, -Xi - 2.0 * Yi
    cg_r, cg_i = _cmul(cr, ci, g_r, g_i)
    sw_r, sw_i = _cmul(sxyr, sxyi, wxyr, wxyi)
    B3s_r, B3s_i = _cmul(-1.0 + 2.0 * _RPI * cg_r + 2.0 * _RPI * sw_r,
                         2.0 * _RPI * cg_i + 2.0 * _RPI * sw_i, ic2r, ic2i)
    iXr, iXi = _cinv(Xr, Xi)
    iX2r, iX2i = _cmul(iXr, iXi, iXr, iXi)
    hx_r, hx_i = iXr - 1.5 * iX2r, iXi - 1.5 * iX2i   # 1/X - 1.5/X^2
    A3b_r, A3b_i = _cmul(hx_r, hx_i, ic2r, ic2i)
    chx_r, chx_i = _cmul(cr, ci, hx_r, hx_i)
    B3b_r, B3b_i = _cmul(-1.0 + chx_r + 2.0 * _RPI * sw_r,
                         chx_i + 2.0 * _RPI * sw_i, ic2r, ic2i)
    small3 = jnp.sqrt(sXr * sXr + sXi * sXi) <= 4.0e3
    A3r = jnp.where(small3, A3s_r, A3b_r)
    A3i = jnp.where(small3, A3s_i, A3b_i)
    B3r = jnp.where(small3, B3s_r, B3b_r)
    B3i = jnp.where(small3, B3s_i, B3b_i)

    # ---------------- blend + final LS -------------------------------------
    sel = lambda a1, a2, a3, a4: jnp.where(
        part1, a1, jnp.where(part2, a2, jnp.where(part3, a3, a4)))
    Ar = sel(A1r, A2r, A3r, A4r)
    Ai = sel(A1i, A2i, A3i, A4i)
    Br = sel(B1r, B2r, B3r, B4r)
    Bi = sel(B1i, B2i, B3i, B4i)

    # LS = (1/pi) A / (1 - d0 A + e2 B)
    dAr, dAi = _cmul(k["d0r"], k["d0i"], Ar, Ai)
    eBr, eBi = _cmul(k["e2r"], k["e2i"], Br, Bi)
    den_r = 1.0 - dAr + eBr
    den_i = -dAi + eBi
    ls_r, _ = _cdiv(Ar, Ai, den_r, den_i)
    return ls_r / np.pi
