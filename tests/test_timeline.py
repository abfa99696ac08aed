import datetime as dt

import numpy as np
import pytest

from sits_ray import timeline as tl


def test_period_us():
    assert tl.period_us("1m") == 60_000_000
    assert tl.period_us("1h") == 3_600_000_000
    assert tl.period_us("1d") == 86_400_000_000
    assert tl.period_us("30s") == 30_000_000
    with pytest.raises(ValueError):
        tl.period_us("P16D")


def test_valid_timeline_max_of_mins_min_of_maxes():
    # rule from reference R/api_gdalcubes.R:318-367
    mins = [dt.date(2020, 1, 5), dt.date(2020, 1, 20)]
    maxs = [dt.date(2020, 4, 1), dt.date(2020, 3, 15)]
    got = tl.valid_timeline(mins, maxs, "P16D")
    assert got[0] == dt.date(2020, 1, 20)
    assert all((b - a).days == 16 for a, b in zip(got, got[1:]))
    assert got[-1] <= dt.date(2020, 3, 15)
    # month snap
    got_m = tl.valid_timeline(mins, maxs, "P1M")
    assert got_m[0] == dt.date(2020, 1, 1)
    assert got_m == [dt.date(2020, 1, 1), dt.date(2020, 2, 1), dt.date(2020, 3, 1)]
    # year snap
    got_y = tl.valid_timeline(mins, maxs, "P1Y")
    assert got_y == [dt.date(2020, 1, 1)]
    with pytest.raises(ValueError):
        tl.valid_timeline([dt.date(2021, 1, 1)], [dt.date(2020, 1, 1)], "P1M")


def test_bucketize_membership():
    grid = np.array([0, 60, 120], dtype=np.int64) * 1_000_000
    ts = np.array([0, 59_999_999, 60_000_000, 125_000_000, -1], dtype=np.int64)
    idx = tl.bucketize(ts, grid)
    # timeline[i] <= ts < timeline[i+1]; before-grid -> -1; past end -> last
    assert list(idx) == [0, 0, 1, 2, -1]


def test_floor_bucket_matches_date_trunc():
    import duckdb

    ts = np.array(
        [1_748_736_000_000_000, 1_748_736_059_999_999, 1_748_736_060_000_001],
        dtype=np.int64,
    )
    got = tl.floor_bucket(ts, "1m")
    con = duckdb.connect()
    for t, g in zip(ts, got):
        (exp,) = con.execute(
            "select date_trunc('minute', to_timestamp(?::double / 1e6)::timestamp)",
            [int(t)],
        ).fetchone()
        assert exp == dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=int(g))


def test_period_windows():
    w = tl.period_windows(dt.date(2020, 1, 1), dt.date(2020, 3, 1), "P1M", "P1M")
    assert w[0] == (dt.date(2020, 1, 1), dt.date(2020, 2, 1))
    assert len(w) == 3
