"""TIPS-2011 total internal partition sums, vectorized for TPU.

The reference interpolates per-isotopologue Q(T) tables with a scalar
3/4-point Lagrange routine called once per line inside the hot loop
(``misc/hapi.py:5311` ``AtoB``, ``:9568`` ``BD_TIPS_2011_PYTHON``). Here the
143 isotopologue tables live as one (n_iso, 119) device array and the same
Lagrange rule is evaluated branchlessly with gathers, vectorized over any
batch of (iso, T) pairs.

The temperature nodes are uniform (60 K + 25 K * k, k = 0..118,
``misc/hapi.py:5401-5413``), which lets the node-bracketing search become
arithmetic instead of a scan.

Q reference: Laraia et al., Icarus 215 (2011) 391-400 (TIPS-2011).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "tips2011.npz")

T_NODE0 = 60.0
T_NODE_STEP = 25.0
N_NODES = 119

#: Valid temperature range enforced by the reference (misc/hapi.py:9571)
T_MIN = 70.0
T_MAX = 3000.0


@functools.lru_cache(maxsize=1)
def load_tips_tables():
    """Return (keys_mol, keys_iso, gsi, q_table) as NumPy arrays.

    ``q_table`` has shape (n_iso, 119) ordered like (keys_mol, keys_iso).
    """
    with np.load(_DATA) as f:
        return f["mol"].copy(), f["iso"].copy(), f["gsi"].copy(), f["q"].copy()


@functools.lru_cache(maxsize=1)
def iso_row_index() -> dict[tuple[int, int], int]:
    """Map (HITRAN molecule number, local iso number) -> row in the Q table."""
    mol, iso, _, _ = load_tips_tables()
    return {(int(m), int(i)): r for r, (m, i) in enumerate(zip(mol, iso))}


def partition_sum(q_table, iso_row, T):
    """Q(T) via the reference's 3/4-point Lagrange rule, vectorized.

    Parameters
    ----------
    q_table : (n_iso, 119) array of partition sums at the TIPS nodes.
    iso_row : int array — row indices into ``q_table`` (broadcastable with T).
    T : array — temperatures [K]; must lie in [70, 3000] (not checked
        under jit; out-of-range values extrapolate from the edge stencils).

    Matches ``AtoB`` (``misc/hapi.py:5311``): interior points use 4-point
    Lagrange on nodes (i-2, i-1, i, i+1) where i is the first node >= T;
    T <= 85 K uses the 3-point stencil on nodes (0, 1, 2); T at the top node
    uses the 3-point stencil on the last three nodes.
    """
    T = jnp.asarray(T)
    iso_row = jnp.asarray(iso_row)

    # First node index with node >= T (the reference's linear scan).
    i = jnp.ceil((T - T_NODE0) / T_NODE_STEP).astype(jnp.int32)
    i = jnp.clip(i, 1, N_NODES - 1)

    lo3 = i < 2              # reference: I < 3   -> 3-pt stencil at the bottom
    hi3 = i == N_NODES - 1   # reference: I == npt -> 3-pt stencil at the top

    # 4-point stencil base j such that nodes are (j, j+1, j+2, j+3) = (i-2 .. i+1)
    j4 = i - 2
    # 3-point stencils: bottom uses nodes (0,1,2); top uses (npt-3 .. npt-1).
    j3 = jnp.where(lo3, 0, N_NODES - 3)

    use3 = lo3 | hi3
    base = jnp.where(use3, j3, j4)

    node = lambda k: T_NODE0 + T_NODE_STEP * (base + k).astype(T.dtype)
    a0, a1, a2, a3 = node(0), node(1), node(2), node(3)

    # Gather the stencil values (iso_row and base broadcast together).
    b0 = q_table[iso_row, base + 0]
    b1 = q_table[iso_row, base + 1]
    b2 = q_table[iso_row, base + 2]
    b3 = q_table[iso_row, jnp.minimum(base + 3, N_NODES - 1)]

    # 4-point Lagrange weights (uniform nodes; denominators are exact).
    w0_4 = (T - a1) * (T - a2) * (T - a3) / ((a0 - a1) * (a0 - a2) * (a0 - a3))
    w1_4 = (T - a0) * (T - a2) * (T - a3) / ((a1 - a0) * (a1 - a2) * (a1 - a3))
    w2_4 = (T - a0) * (T - a1) * (T - a3) / ((a2 - a0) * (a2 - a1) * (a2 - a3))
    w3_4 = (T - a0) * (T - a1) * (T - a2) / ((a3 - a0) * (a3 - a1) * (a3 - a2))

    # 3-point Lagrange weights on nodes (a0, a1, a2).
    w0_3 = (T - a1) * (T - a2) / ((a0 - a1) * (a0 - a2))
    w1_3 = (T - a0) * (T - a2) / ((a1 - a0) * (a1 - a2))
    w2_3 = (T - a0) * (T - a1) / ((a2 - a0) * (a2 - a1))

    q4 = w0_4 * b0 + w1_4 * b1 + w2_4 * b2 + w3_4 * b3
    q3 = w0_3 * b0 + w1_3 * b1 + w2_3 * b2
    return jnp.where(use3, q3, q4)


def partition_sum_ratio(q_table, iso_row, T, t_ref=296.0):
    """Q(T_ref)/Q(T) — the factor entering HITRAN intensity scaling."""
    T = jnp.asarray(T)
    q_t = partition_sum(q_table, iso_row, T)
    q_ref = partition_sum(q_table, iso_row, jnp.asarray(t_ref, dtype=T.dtype))
    return q_ref / q_t
