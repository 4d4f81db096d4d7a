"""Bin-bucketed interval join: must agree exactly with the naive
range-predicate join on every bin width, and its physical plan must be
a hash/sort-merge equi-join, not BroadcastNestedLoopJoin."""

import os

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.range_join import interval_join


def _ts(m):
    return datetime.datetime(2024, 3, 1, 0, m)


def _fixture(spark):
    points = spark.createDataFrame(
        [(i, _ts(i), float(i)) for i in range(0, 60, 3)], ["pid", "t", "v"]
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts(0), _ts(10)),    # [0, 10): pids 0,3,6,9
            (2, _ts(9), _ts(9)),     # empty interval
            (3, _ts(10), _ts(12)),   # boundary: pid 9 excluded (half-open)
            (4, _ts(30), _ts(59)),   # long interval, many bins
            (5, _ts(58), _ts(59)),   # matches nothing (57 < 58, 60 absent)
        ],
        ["iv", "s", "e"],
    )
    return points, intervals


def _naive(points, intervals):
    return intervals.join(
        points, (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")), "inner"
    )


def test_interval_join_equals_naive_across_bin_widths(spark):
    points, intervals = _fixture(spark)
    want = sorted(
        (r.iv, r.pid) for r in _naive(points, intervals).collect()
    )
    assert len(want) > 0
    for bin_seconds in (60, 300, 3600, 86400):
        got = sorted(
            (r.iv, r.pid)
            for r in interval_join(
                points, intervals, "t", "s", "e", bin_seconds
            ).collect()
        )
        assert got == want, f"bin_seconds={bin_seconds}"


def test_interval_join_right_keeps_empty_intervals(spark):
    points, intervals = _fixture(spark)
    out = interval_join(points, intervals, "t", "s", "e", 300, how="right")
    rows = out.collect()
    by_iv = {}
    for r in rows:
        by_iv.setdefault(r.iv, []).append(r.pid)
    assert by_iv[2] == [None]  # empty interval survives with NULL point
    assert by_iv[5] == [None]
    assert sorted(by_iv[1]) == [0, 3, 6, 9]
    # half-open end: the t == e point is excluded
    assert 12 not in by_iv.get(3, [])


@settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ", "5")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(st.integers(0, 5000), min_size=1, max_size=40),
    ivs=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 1200)),
        min_size=1,
        max_size=15,
    ),
    bin_seconds=st.sampled_from([7, 60, 997, 4096]),
)
def test_interval_join_differential(spark, pts, ivs, bin_seconds):
    """Numeric-time differential: bin-bucketed result == naive range
    join for arbitrary points, intervals (possibly empty or
    overlapping), and bin widths."""
    points = spark.createDataFrame(
        [(i, float(t)) for i, t in enumerate(pts)], ["pid", "t"]
    )
    intervals = spark.createDataFrame(
        [(j, float(s), float(s + ln)) for j, (s, ln) in enumerate(ivs)],
        ["iv", "s", "e"],
    )
    want = sorted(
        (r.iv, r.pid)
        for r in intervals.join(
            points, (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
        ).collect()
    )
    got = sorted(
        (r.iv, r.pid)
        for r in interval_join(points, intervals, "t", "s", "e", bin_seconds).collect()
    )
    assert got == want


def test_interval_join_plan_is_equi_join(spark):
    points, intervals = _fixture(spark)
    plan = (
        interval_join(points, intervals, "t", "s", "e", 300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
