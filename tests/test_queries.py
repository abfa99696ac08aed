"""Driver-gate replica: every queries() entry vs its DuckDB oracle at
sf0.001 (the driver runs sf0.01 — same code path)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
    return c


def _names():
    from sits_ray.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(ray_session, con, name):
    from tools.check_correctness import compare, to_pandas
    from sits_ray.queries import ORACLE_SQL, QUERIES

    got = to_pandas(QUERIES[name](SF))
    assert len(got) >= 0
    if name not in ORACLE_SQL:
        assert len(got) > 0  # rows-only contract: non-degenerate output
        if name == "compress_roundtrip":
            assert got["roundtrip_ok"].all()
        return
    exp = con.execute(ORACLE_SQL[name]).fetchdf()
    issues = compare(got, exp, name)
    assert not issues, issues
