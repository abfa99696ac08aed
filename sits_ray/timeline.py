"""Timeline / bucketing utilities (pure Python + numpy, no Ray).

Replicates the reference's regular-timeline semantics:

* the valid-timeline rule — start = max over partitions of min date, end =
  min over partitions of max date, snap to month/year for ``M``/``Y``
  periods, then step by the period while <= end
  (reference ``R/api_gdalcubes.R:318-367``);
* interval membership ``timeline[i] <= ts < timeline[i+1]`` with an extra
  end bucket appended (reference ``R/api_gdalcubes.R:21-47``);
* ISO-8601-ish period parsing ``P<n><D|M|Y>``
  (reference ``R/api_period.R:39-52``), generalized to the retention-tier
  periods ``<n><s|m|h|d>`` used by the transcript domain;
* sliding period windows (reference ``R/api_period.R:57-86``).

All timestamps are int64 microseconds since the Unix epoch (Arrow
``timestamp[us]``). Tier buckets are epoch-aligned (``floor(ts/width)``),
which for second/minute/hour/day widths is identical to SQL
``date_trunc`` — the property the DuckDB oracle relies on.
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

import numpy as np

US = 1_000_000
_UNIT_US = {
    "s": US,
    "m": 60 * US,
    "h": 3600 * US,
    "d": 86400 * US,
}

_TIER_RE = re.compile(r"^(\d+)([smhd])$")
_ISO_RE = re.compile(r"^P(\d+)([DMY])$")


def period_us(period: str) -> int:
    """Width in microseconds of a fixed-width tier period like ``1m``/``1h``/``1d``."""
    m = _TIER_RE.match(period)
    if not m:
        raise ValueError(f"not a fixed-width period: {period!r}")
    return int(m.group(1)) * _UNIT_US[m.group(2)]


@dataclass(frozen=True)
class IsoPeriod:
    """Calendar period ``P<n><D|M|Y>`` (reference ``R/api_period.R:39-52``)."""

    n: int
    unit: str  # D | M | Y

    @classmethod
    def parse(cls, period: str) -> "IsoPeriod":
        m = _ISO_RE.match(period)
        if not m:
            raise ValueError(f"not an ISO period: {period!r}")
        return cls(int(m.group(1)), m.group(2))

    def add(self, d: _dt.date) -> _dt.date:
        if self.unit == "D":
            return d + _dt.timedelta(days=self.n)
        if self.unit == "M":
            total = d.year * 12 + (d.month - 1) + self.n
            y, mo = divmod(total, 12)
            day = min(d.day, _days_in_month(y, mo + 1))
            return _dt.date(y, mo + 1, day)
        total_y = d.year + self.n
        day = min(d.day, _days_in_month(total_y, d.month))
        return _dt.date(total_y, d.month, day)


def _days_in_month(y: int, m: int) -> int:
    if m == 12:
        return 31
    return (_dt.date(y, m + 1, 1) - _dt.timedelta(days=1)).day


def valid_timeline(
    min_dates: list[_dt.date], max_dates: list[_dt.date], period: str
) -> list[_dt.date]:
    """The sits valid-timeline rule (``R/api_gdalcubes.R:318-367``).

    start = max of per-partition minimum dates; end = min of per-partition
    maximum dates; snapped to month/year start for M/Y periods; stepped by
    the period while <= end.
    """
    p = IsoPeriod.parse(period)
    start = max(min_dates)
    end = min(max_dates)
    if start > end:
        raise ValueError("partition timelines do not intersect")
    if p.unit == "M":
        start = _dt.date(start.year, start.month, 1)
    elif p.unit == "Y":
        start = _dt.date(start.year, 1, 1)
    tl = [start]
    d = start
    while True:
        d = p.add(d)
        if d > end:
            break
        tl.append(d)
    return tl


def tier_grid(start_us: int, end_us: int, period: str) -> np.ndarray:
    """Epoch-aligned bucket-start grid covering ``[start_us, end_us]`` inclusive."""
    w = period_us(period)
    lo = (start_us // w) * w
    hi = (end_us // w) * w
    return np.arange(lo, hi + w, w, dtype=np.int64)


def floor_bucket(ts_us: np.ndarray, period: str) -> np.ndarray:
    """Epoch-aligned bucket start per timestamp (== SQL ``date_trunc`` for s/m/h/d)."""
    w = period_us(period)
    ts = np.asarray(ts_us, dtype=np.int64)
    return (ts // w) * w


def bucketize(ts_us: np.ndarray, grid_us: np.ndarray) -> np.ndarray:
    """Interval index per timestamp under ``grid[i] <= ts < grid[i+1]``.

    An extra end bucket is implied (reference ``R/api_gdalcubes.R:23-37``
    appends one break past the end); timestamps before the grid get -1.
    """
    idx = np.searchsorted(grid_us, np.asarray(ts_us, dtype=np.int64), side="right") - 1
    return idx.astype(np.int64)


def period_windows(
    start: _dt.date, end: _dt.date, period: str, step: str
) -> list[tuple[_dt.date, _dt.date]]:
    """Sliding windows [w_start, w_end) of width ``period`` every ``step``
    (reference ``R/api_period.R:57-86``)."""
    p = IsoPeriod.parse(period)
    s = IsoPeriod.parse(step)
    out = []
    w0 = start
    while w0 <= end:
        w1 = p.add(w0)
        out.append((w0, w1))
        w0 = s.add(w0)
        if w1 > end:
            break
    return out


def timeline_during(
    timeline: list[_dt.date],
    start: _dt.date | None = None,
    end: _dt.date | None = None,
) -> list[_dt.date]:
    """Subset a timeline to [start, end] (reference ``R/api_timeline.R:231-250``)."""
    lo = start or timeline[0]
    hi = end or timeline[-1]
    return [d for d in timeline if lo <= d <= hi]


def timeline_match(
    timeline: list[_dt.date], ref_dates: list[_dt.date]
) -> list[int]:
    """Match reference dates to the closest timeline entries ACROSS YEARS
    (the reference's ``.timeline_match`` / multi-year matching,
    ``R/api_timeline.R:116-170``): each reference date's month/day is
    projected into every year the timeline spans, and the nearest timeline
    index is taken. Returns one timeline index per reference date
    (deduplicated, sorted)."""
    tl = np.array([d.toordinal() for d in timeline], dtype=np.int64)
    years = sorted({d.year for d in timeline})
    out: set[int] = set()
    for rd in ref_dates:
        for y in years:
            day = min(rd.day, _days_in_month(y, rd.month))
            cand = _dt.date(y, rd.month, day).toordinal()
            i = int(np.argmin(np.abs(tl - cand)))
            out.add(i)
    return sorted(out)


def timeline_valid_date(
    timeline: list[_dt.date], start: _dt.date, end: _dt.date
) -> bool:
    """True when [start, end] overlaps the timeline's span (the reference's
    timeline validity check, ``R/api_timeline.R:197-229``)."""
    return start <= timeline[-1] and end >= timeline[0]
