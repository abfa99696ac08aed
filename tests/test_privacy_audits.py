"""l-diversity and t-closeness audits (stages/curation): hand-built
classes, EMD vs a brute-force cumulative reference, zero-distance case."""

import numpy as np
import pandas as pd


def _mk(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["lang", "source", "n_chars"])
    df["n_chars"] = df["n_chars"].astype(np.int64)
    return rd.from_pandas(df)


def test_l_diversity_hand(ray_session):
    from sits_ray.stages.curation import l_diversity

    # class (en, 0): sources {a, b} -> l=2, n=3
    # class (de, 0): source {a}     -> l=1, n=2
    ds = _mk([
        ("en", "a", 10), ("en", "a", 20), ("en", "b", 30),
        ("de", "a", 40), ("de", "a", 50),
    ])
    out = l_diversity(ds, l_values=(2, 3))
    r2 = out[out.l == 2].iloc[0]
    assert (int(r2.n_classes), int(r2.n_risky_classes),
            int(r2.n_risky_records)) == (2, 1, 2)
    assert float(r2.risk_frac) == 2.0 / 5.0
    r3 = out[out.l == 3].iloc[0]
    # at l=3 both classes are risky (l values 2 and 1)
    assert (int(r3.n_risky_classes), int(r3.n_risky_records)) == (2, 5)


def test_t_closeness_identical_distribution_zero(ray_session):
    from sits_ray.stages.curation import t_closeness

    # both classes have the same length distribution as the corpus
    ds = _mk([
        ("en", "a", 50), ("en", "a", 150),
        ("en", "b", 50), ("en", "b", 150),
    ])
    out = t_closeness(ds)
    assert (out.emd == 0.0).all()
    assert out.n_recs.tolist() == [2, 2]


def test_t_closeness_brute_force(ray_session):
    from sits_ray.stages.curation import t_closeness

    # skewed class: all short docs in (en, a), all long in (en, b)
    rows = ([("en", "a", 10)] * 3 + [("en", "a", 110)] * 1
            + [("en", "b", 110)] * 4 + [("de", "a", 10)] * 2)
    ds = _mk(rows)
    out = t_closeness(ds)

    # brute force: buckets [0, 1], m=2, T=10, global cum = [5, 10]
    # class (en,a): n=4, cum=[3,4]; D=|3*10-5*4|=10; emd=10/(4*10*1)=0.25
    ea = out[(out.lang == "en") & (out.source == "a")].iloc[0]
    assert float(ea.emd) == 10.0 / 40.0
    # class (en,b): n=4, cum=[0,4]; D=|0-20|=20; emd=20/40=0.5
    eb = out[(out.lang == "en") & (out.source == "b")].iloc[0]
    assert float(eb.emd) == 0.5
    # class (de,a): n=2, cum=[2,2]; D=|2*10-5*2|=10; emd=10/20=0.5
    da = out[(out.lang == "de") & (out.source == "a")].iloc[0]
    assert float(da.emd) == 0.5
    # ordering: emd desc then (lang, source) asc
    assert out[["lang", "source"]].values.tolist() == [
        ["de", "a"], ["en", "b"], ["en", "a"]]
