"""Cohen's kappa query building blocks: kappa arithmetic on a hand
confusion table via the same po/pe trees the query pins."""

import numpy as np
import pandas as pd


def test_kappa_identity_on_hand_table():
    # confusion [[20, 5], [10, 15]]: N=50, agree=35
    # row marg [25, 25]; col marg [30, 20]; pe_num = 25*30+25*20 = 1250
    po = 35.0 / 50.0
    pe = 1250.0 / 2500.0
    kappa = (po - pe) / (1.0 - pe)
    assert abs(kappa - 0.4) < 1e-15


def test_kappa_query_runs_and_is_consistent(ray_session):
    from sits_ray.queries import QUERIES

    out = QUERIES["kappa_seeded_scorers"]("/root/testdata/sf0.001")
    r = out.iloc[0]
    assert int(r.n_rows) > 0
    assert 0 <= int(r.n_agree) <= int(r.n_rows)
    po, pe, kappa = float(r.po), float(r.pe), float(r.kappa)
    assert po == int(r.n_agree) / int(r.n_rows)
    assert -1.0 <= kappa <= 1.0
    assert kappa == (po - pe) / (1.0 - pe)
