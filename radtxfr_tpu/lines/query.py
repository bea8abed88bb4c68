"""Condition-expression queries over a :class:`LineStore`.

Functional equivalent of hapi's Lisp-ish tuple condition DSL and SQL-ish
verbs (``select``/``filter``/``sort`` — ``misc/hapi.py:1780-2815``), applied
to packed column arrays instead of per-row Python objects. The same
expression trees work:

    select(store, ("and", ("between", "nu", 690, 1410),
                          ("==", "molec_id", 1)))

Supported operations mirror the reference's core set: and/or/not,
comparison (== != < > <= >=), between, in, range arithmetic (+ - * /),
abs, and column references by name (strings) with literals as numbers.
"""

from __future__ import annotations

import numpy as np
import jax

from .store import LineStore

__all__ = ["evaluate", "select", "sort"]

#: LineStore column aliases matching hapi parameter names
_ALIASES = {
    "nu": "nu0",
    "sw": "sw",
    "elower": "elower",
    "gamma_air": "gamma_air",
    "gamma_self": "gamma_self",
    "n_air": "n_air",
    "delta_air": "delta_air",
    "molec_id": "mol_id",
    "sd_air": "sd_air",
}


def _col(store: LineStore, name: str) -> np.ndarray:
    if name in _ALIASES:
        return np.asarray(getattr(store, _ALIASES[name]))
    if hasattr(store, name):
        return np.asarray(getattr(store, name))
    raise KeyError(f"unknown column {name!r}")


def evaluate(store: LineStore, expr):
    """Evaluate a condition/arithmetic expression -> NumPy array (per line)."""
    if isinstance(expr, str):
        return _col(store, expr)
    if isinstance(expr, (int, float, np.number)):
        return expr
    if not isinstance(expr, (tuple, list)) or not expr:
        raise ValueError(f"bad expression: {expr!r}")
    op, *args = expr
    op = str(op).lower()
    ev = lambda e: evaluate(store, e)
    if op in ("and", "&", "&&"):
        out = ev(args[0])
        for a in args[1:]:
            out = out & ev(a)
        return out
    if op in ("or", "|", "||"):
        out = ev(args[0])
        for a in args[1:]:
            out = out | ev(a)
        return out
    if op in ("not", "!"):
        return ~ev(args[0])
    if op == "between":
        x = ev(args[0])
        return (x >= ev(args[1])) & (x <= ev(args[2]))
    if op == "in":
        return np.isin(ev(args[0]), np.asarray(args[1]))
    binops = {
        "==": np.equal, "!=": np.not_equal, "<": np.less, ">": np.greater,
        "<=": np.less_equal, ">=": np.greater_equal,
        "+": np.add, "-": np.subtract, "*": np.multiply, "/": np.divide,
    }
    if op in binops:
        return binops[op](ev(args[0]), ev(args[1]))
    if op == "abs":
        return np.abs(ev(args[0]))
    raise ValueError(f"unknown operation {op!r}")


def select(store: LineStore, conditions) -> LineStore:
    """Rows matching a boolean condition expression (hapi ``select``)."""
    mask = np.asarray(evaluate(store, conditions), dtype=bool)
    return jax.tree.map(lambda a: a[np.nonzero(mask)[0]], store)


def sort(store: LineStore, by: str = "nu", descending: bool = False) -> LineStore:
    """Rows reordered by a column (hapi ``sort``)."""
    key = _col(store, by)
    order = np.argsort(key, kind="stable")
    if descending:
        order = order[::-1]
    return jax.tree.map(lambda a: a[order], store)
