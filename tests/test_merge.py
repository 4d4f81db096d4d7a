"""MERGE/upsert and SCD2 emulation."""

import datetime

from semantic_similarity_system_using_aws_mapreduce_spark.operators.merge import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    source = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], ["id", "name", "v"]
    )
    got = {r.id: (r.name, r.v) for r in merge_upsert(target, source, ["id"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2(spark):
    d = datetime.date
    target = spark.createDataFrame(
        [(1, "alice", d(2024, 1, 1), True, None), (2, "bob", d(2024, 1, 1), True, None)],
        "id long, name string, effective date, is_current boolean, valid_to date",
    )
    source = spark.createDataFrame(
        [(1, "alicia", d(2024, 6, 1))], "id long, name string, effective date"
    )
    out = scd2_apply(target, source, ["id"], "effective")
    rows = sorted(
        ((r.id, r.name, r.is_current, r.valid_to) for r in out.collect())
    )
    assert rows == [
        (1, "alice", False, d(2024, 6, 1)),   # closed out
        (1, "alicia", True, None),            # new current version
        (2, "bob", True, None),               # untouched
    ]
