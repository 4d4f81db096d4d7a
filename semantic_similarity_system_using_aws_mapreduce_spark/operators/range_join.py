"""Range / interval join — points matched to time intervals without an
equi-key (SURVEY.md §2.4 engine-added capability; the batch analog of a
stream-to-table temporal join).

Spark's optimizer turns a pure range predicate (``s <= t AND t < e``)
into BroadcastNestedLoopJoin — O(|points| x |intervals|) work and a
broadcast requirement on one side.  This operator restores an
equi-join plan by time binning:

  * every point gets one bin id: ``floor(epoch / bin_seconds)``;
  * every interval is exploded to the bins it overlaps
    (``sequence(floor(s/w), floor(e/w))`` — ``k = ceil(len/w) + 1``
    rows, a small constant when ``bin_seconds`` ~ interval length);
  * hash equi-join on the bin id, then the exact range filter.

A (point, interval) pair can meet in at most one bin — the point's own
— so no dedup pass is needed.  At 100 TB both sides shuffle by bin
(time-local, naturally balanced when traffic is; hot bins split by
AQE); nothing is broadcast and nothing is quadratic.  Pick
``bin_seconds`` near the typical interval length: much smaller
multiplies the interval explode, much larger puts unrelated points in
each bin and pushes work into the residual filter.

Interval semantics are half-open ``[start, end)`` so adjacent windows
never double-match a boundary point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_time < end`` (no equi-key), via bin bucketing.

    Returns points columns + intervals columns (names must not
    collide).  ``how='right'`` keeps empty intervals (NULL point
    columns), the shape aggregation-per-window queries want.
    """
    if how not in ("inner", "right"):
        raise ValueError(f"how must be inner|right, got {how!r}")
    if how == "right":
        # the right path reads intervals three times (bin explode, the
        # matched projection, the anti-join re-attach); persist so the
        # intervals subplan — possibly a full derivation — runs once
        from pyspark import StorageLevel

        intervals = intervals.persist(StorageLevel.MEMORY_AND_DISK)
    w = F.lit(int(bin_seconds))

    def to_bin(df: DataFrame, c: str) -> Column:
        col = F.col(c)
        # TIMESTAMP_NTZ has no direct numeric cast; reinterpret as
        # TIMESTAMP first.  Both sides go through the same session-TZ
        # mapping, so bin assignment stays consistent (callers pin UTC).
        if dict(df.dtypes)[c] == "timestamp_ntz":
            col = col.cast("timestamp")
        return F.floor(col.cast("double") / w)

    pb = points.withColumn("_bin", to_bin(points, point_time))
    ib = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(to_bin(intervals, start_col), to_bin(intervals, end_col))),
    )
    in_range = (F.col(point_time) >= F.col(start_col)) & (
        F.col(point_time) < F.col(end_col)
    )
    joined = ib.join(pb, ["_bin"], "inner").filter(in_range).drop("_bin")
    if how == "inner":
        return joined
    # right: re-attach intervals that matched no point (their exploded
    # bins all missed) with NULL point columns.
    matched = joined
    empty = intervals.join(
        matched.select(*intervals.columns).distinct(),
        intervals.columns,
        "left_anti",
    )
    for c in points.columns:
        empty = empty.withColumn(c, F.lit(None).cast(dict(points.dtypes)[c]))
    return matched.unionByName(empty.select(*matched.columns))
