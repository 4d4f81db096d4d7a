"""MERGE/upsert and SCD2 emulation."""

import datetime

import pytest

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


def test_merge_upsert_rejects_duplicate_source_keys(spark):
    """MERGE multiple-matches rule: two source rows for one key is an
    error (which update wins would be nondeterministic)."""
    target = spark.createDataFrame([(1, "a", 10.0)], ["id", "name", "v"])
    source = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (2, "b", 20.0)], ["id", "name", "v"]
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_upsert(target, source, ["id"])
    # opt-out for key-unique-by-construction sources still works
    ok = merge_upsert(
        target, spark.createDataFrame([(2, "b", 20.0)], ["id", "name", "v"]),
        ["id"], validate=False,
    )
    assert ok.count() == 2


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


def test_scd2_multi_version_batch(spark):
    """A batch carrying several versions of one key chains validity
    ranges: target current row closes at the EARLIEST incoming
    effective, intermediate versions close at the next version's
    effective, and only the final version is current."""
    d = datetime.date
    target = spark.createDataFrame(
        [(1, "alice", d(2024, 1, 1), True, None)],
        "id long, name string, effective date, is_current boolean, valid_to date",
    )
    source = spark.createDataFrame(
        [
            (1, "alicia", d(2024, 3, 1)),
            (1, "alyssa", d(2024, 6, 1)),
            (1, "al", d(2024, 9, 1)),
        ],
        "id long, name string, effective date",
    )
    out = scd2_apply(target, source, ["id"], "effective")
    rows = sorted((r.name, r.effective, r.is_current, r.valid_to) for r in out.collect())
    assert rows == [
        ("al", d(2024, 9, 1), True, None),
        ("alice", d(2024, 1, 1), False, d(2024, 3, 1)),
        ("alicia", d(2024, 3, 1), False, d(2024, 6, 1)),
        ("alyssa", d(2024, 6, 1), False, d(2024, 9, 1)),
    ]
    # exactly one current row per key, history contiguous
    assert sum(r[2] for r in rows) == 1
