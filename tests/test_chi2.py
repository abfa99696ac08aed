"""Chi-square independence (stages/drift.chi2_independence): textbook
cross-check on a hand contingency table, independence -> chi2 == 0."""

import numpy as np
import pandas as pd


def _mk(types, hours):
    import ray.data as rd

    ts = pd.to_datetime(np.asarray(hours, np.int64) * 3600_000_000,
                        unit="us")
    return rd.from_pandas(pd.DataFrame({"event_type": types, "ts": ts}))


def test_independent_table_zero_chi2(ray_session):
    from sits_ray.stages.drift import chi2_independence

    # perfectly independent 2x2: each (type, hour) cell count 2
    types = ["a"] * 4 + ["b"] * 4
    hours = [0, 0, 1, 1, 0, 0, 1, 1]
    out = chi2_independence(_mk(types, hours))
    assert int(out.n_cells.iloc[0]) == 4
    assert int(out.dof.iloc[0]) == 1
    assert abs(float(out.chi2.iloc[0])) < 1e-9


def test_textbook_chi2(ray_session):
    from sits_ray.stages.drift import chi2_independence

    # 2x2 table [[3, 1], [1, 3]]: T=8, rows 4/4, cols 4/4
    # E = 2 everywhere; chi2 = 4 * (1)^2/2 = 2.0
    types = ["a"] * 4 + ["b"] * 4
    hours = [0, 0, 0, 1, 0, 1, 1, 1]
    out = chi2_independence(_mk(types, hours))
    assert abs(float(out.chi2.iloc[0]) - 2.0) < 1e-9
    # cramers_v = sqrt(2 / (8 * 1)) = 0.5
    assert abs(float(out.cramers_v.iloc[0]) - 0.5) < 1e-12
    assert int(out.n_rows.iloc[0]) == 2
    assert int(out.n_cols.iloc[0]) == 2
