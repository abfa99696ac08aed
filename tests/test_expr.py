import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.expr import ExprError, apply_expr, compile_expr, reduce_expr


def test_compile_arithmetic():
    f = compile_expr("(b08 - b04) / (b08 + b04)")
    env = {"b08": np.array([0.8, 0.6]), "b04": np.array([0.2, 0.2])}
    np.testing.assert_allclose(f(env), [0.6 / 1.0, 0.4 / 0.8])


def test_compile_rejects_unsafe():
    for bad in [
        "__import__('os')",
        "open('/etc/passwd')",
        "x.__class__",
        "[1,2]",
        "'abc'",
        "lambda: 1",
    ]:
        with pytest.raises(ExprError):
            compile_expr(bad)({"x": np.ones(3)})


def test_unknown_column():
    with pytest.raises(ExprError):
        compile_expr("nope + 1")({"x": np.ones(2)})


def test_rolling_and_reduce_functions():
    f = compile_expr("w_mean(x, 3)")
    x = np.arange(5, dtype=np.float64)[None, :]
    got = f({"x": x})
    assert got.shape == (1, 5)
    f2 = compile_expr("t_max(x) - t_min(x)")
    assert f2({"x": x}) == 4.0


def test_apply_expr_dataset(ray_session):
    df = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [2.0, 2.0, 2.0]})
    out = apply_expr(rd.from_pandas(df), {"c": "a * b + 1", "d": "c - a"}).to_pandas()
    np.testing.assert_allclose(out["c"], [3, 5, 7])
    np.testing.assert_allclose(out["d"], [2, 3, 4])


def test_reduce_expr_dataset(ray_session):
    df = pd.DataFrame(
        {"k": ["a"] * 3 + ["b"] * 2, "t": [2, 1, 3, 1, 2], "v": [1.0, 2.0, 3.0, 5.0, 7.0]}
    )
    out = (
        reduce_expr(
            rd.from_pandas(df), key="k", value="v",
            exprs={"amp": "t_max(x) - t_min(x)", "mu": "t_mean(x)"},
            order_col="t",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["amp"], [2.0, 2.0])
    np.testing.assert_allclose(out["mu"], [2.0, 6.0])
