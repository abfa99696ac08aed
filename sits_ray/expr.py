"""Safe expression DSL — the analog of sits' apply/reduce expression
capture (``sits_apply`` band math like ``NDVI = (B08-B04)/(B08+B04)``,
``R/sits_apply.R:148-151``; ``sits_reduce`` ``t_*`` reducers,
``R/sits_reduce.R:96-203``; expression env injection
``R/api_apply.R:220-235`` / ``R/api_reduce.R:195-237``).

A restricted Python-syntax expression is parsed with ``ast`` and evaluated
over numpy column arrays; only arithmetic, comparisons, column names and
the registered function tables are allowed:

* ``w_*`` rolling kernels (``w_mean(x, 5)`` — :mod:`sits_ray.kernels.rolling`);
* ``t_*`` temporal reducers (``t_mean(x)`` — :mod:`sits_ray.kernels.reduce`);
* numpy elementwise helpers (``abs``, ``sqrt``, ``log``, ``exp``, ``clip``,
  ``where``, ``minimum``, ``maximum``).

Used by :func:`apply_expr` (per-row band math over a Dataset) and
:func:`reduce_expr` (per-series reduction over the nested form).
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa

from sits_ray.kernels.reduce import TEMPORAL_REDUCERS
from sits_ray.kernels.rolling import ROLLING_KERNELS

_NUMPY_FUNCS = {
    "abs": np.abs,
    "sqrt": np.sqrt,
    "log": np.log,
    "exp": np.exp,
    "clip": np.clip,
    "where": np.where,
    "minimum": np.minimum,
    "maximum": np.maximum,
}

_ALLOWED_FUNCS = {**_NUMPY_FUNCS, **ROLLING_KERNELS, **TEMPORAL_REDUCERS}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Pow: np.power,
    ast.Mod: np.mod,
    ast.FloorDiv: np.floor_divide,
}
_CMPOPS = {
    ast.Gt: np.greater,
    ast.GtE: np.greater_equal,
    ast.Lt: np.less,
    ast.LtE: np.less_equal,
    ast.Eq: np.equal,
    ast.NotEq: np.not_equal,
}


class ExprError(ValueError):
    pass


def compile_expr(expression: str):
    """Parse once; returns ``eval_fn(columns: dict[str, np.ndarray])``."""
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as e:
        raise ExprError(f"bad expression: {e}") from e

    def ev(node, env):
        if isinstance(node, ast.Expression):
            return ev(node.body, env)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float)):
                return node.value
            raise ExprError(f"constant {node.value!r} not allowed")
        if isinstance(node, ast.Name):
            if node.id in env:
                return env[node.id]
            raise ExprError(f"unknown column {node.id!r}")
        if isinstance(node, ast.BinOp):
            op = _BINOPS.get(type(node.op))
            if op is None:
                raise ExprError(f"operator {type(node.op).__name__} not allowed")
            return op(ev(node.left, env), ev(node.right, env))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return np.negative(ev(node.operand, env))
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            op = _CMPOPS.get(type(node.ops[0]))
            if op is None:
                raise ExprError("comparison not allowed")
            return op(ev(node.left, env), ev(node.comparators[0], env))
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _ALLOWED_FUNCS:
                raise ExprError(f"function not allowed: {ast.dump(node.func)}")
            fn = _ALLOWED_FUNCS[node.func.id]
            args = [ev(a, env) for a in node.args]
            kwargs = {k.arg: ev(k.value, env) for k in node.keywords}
            return fn(*args, **kwargs)
        raise ExprError(f"syntax not allowed: {type(node).__name__}")

    return lambda env: ev(tree, env)


def apply_expr(ds, exprs: dict[str, str]):
    """``sits_apply`` analog: append computed columns to a Dataset.

    ``exprs`` maps new column name -> expression over existing columns;
    evaluated vectorized per Arrow batch."""
    compiled = {name: compile_expr(e) for name, e in exprs.items()}

    def fn(t: pa.Table) -> pa.Table:
        env = {c: t[c].to_numpy(zero_copy_only=False) for c in t.column_names}
        for name, f in compiled.items():
            res = np.asarray(f(env))
            t = t.append_column(name, pa.array(res))
            env[name] = res
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def reduce_expr(ds, key: str, value: str, exprs: dict[str, str], order_col: str | None = None):
    """``sits_reduce`` analog: per-group reduction of a value column with
    ``t_*`` expressions; each expression must reduce the series to one
    scalar (e.g. ``t_mean(x)``, ``t_max(x) - t_min(x)``). The series is
    exposed as ``x`` (shape 1 x n, time-ordered when ``order_col`` given)."""
    compiled = {name: compile_expr(e) for name, e in exprs.items()}

    def per_group(g: pa.Table) -> pa.Table:
        v = g[value].to_numpy(zero_copy_only=False).astype(np.float64)
        if order_col is not None:
            v = v[np.argsort(g[order_col].to_numpy(), kind="stable")]
        env = {"x": v[None, :]}
        cols = {key: pa.array([g[key][0].as_py()], g[key].type)}
        for name, f in compiled.items():
            out = np.asarray(f(env), dtype=np.float64).reshape(-1)
            if out.size != 1:
                raise ExprError(f"{name!r} did not reduce to a scalar")
            cols[name] = pa.array([float(out[0])])
        return pa.table(cols)

    return ds.groupby(key).map_groups(per_group, batch_format="pyarrow")
