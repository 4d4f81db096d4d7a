"""Crash-safety contract of sources/atomic.py: every interruption
point of the temp-and-swap protocol leaves a state that `recover` /
`read_parquet_recovering` heals deterministically — roll FORWARD when
the temp write had committed, roll BACK otherwise, and never a lost
table (the failure mode of an in-place parquet overwrite)."""

import os
import shutil

from semantic_similarity_system_using_aws_mapreduce_spark.sources.atomic import (
    atomic_replace,
    read_parquet_recovering,
    recover,
)


def _write(spark, path, values):
    spark.createDataFrame([(v,) for v in values], "v long").write.mode(
        "overwrite"
    ).parquet(path)


def _vals(spark, path):
    return sorted(r.v for r in spark.read.parquet(path).collect())


def test_atomic_replace_may_read_its_own_target(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, [1, 2, 3])
    df = spark.read.parquet(path).filter("v > 1")
    atomic_replace(df, path)  # no localCheckpoint needed: no lineage cycle
    assert _vals(spark, path) == [2, 3]
    assert not os.path.isdir(path + ".__tmp__")
    assert not os.path.isdir(path + ".__bak__")


def test_crash_before_swap_keeps_old_table(spark, tmp_path):
    # crash after the temp write but before any rename: the live table
    # is untouched; the stale temp is discarded on the next read
    path = str(tmp_path / "t")
    _write(spark, path, [1])
    _write(spark, path + ".__tmp__", [9])
    assert _vals(spark, path) == [1]
    recover(path)
    assert not os.path.isdir(path + ".__tmp__")
    assert _vals(spark, path) == [1]


def test_crash_between_renames_rolls_forward(spark, tmp_path):
    # crash after `path -> bak` with a COMMITTED temp: the new content
    # is complete (rename only follows a returned write), so recovery
    # finishes the swap
    path = str(tmp_path / "t")
    _write(spark, path, [1])
    _write(spark, path + ".__tmp__", [9])
    os.rename(path, path + ".__bak__")
    got = read_parquet_recovering(spark, path)
    assert sorted(r.v for r in got.collect()) == [9]
    assert not os.path.isdir(path + ".__bak__")


def test_crash_between_renames_without_committed_tmp_rolls_back(spark, tmp_path):
    # same window but the temp lacks _SUCCESS (its write never
    # committed): restore the backup — old data, never a lost table
    path = str(tmp_path / "t")
    _write(spark, path, [1])
    _write(spark, path + ".__tmp__", [9])
    os.remove(os.path.join(path + ".__tmp__", "_SUCCESS"))
    os.rename(path, path + ".__bak__")
    got = read_parquet_recovering(spark, path)
    assert sorted(r.v for r in got.collect()) == [1]
    assert not os.path.isdir(path + ".__tmp__")


def test_crash_before_backup_cleanup_drops_backup(spark, tmp_path):
    # crash after the swap completed but before deleting the backup
    path = str(tmp_path / "t")
    _write(spark, path, [9])
    _write(spark, path + ".__bak__", [1])
    assert sorted(r.v for r in read_parquet_recovering(spark, path).collect()) == [9]
    assert not os.path.isdir(path + ".__bak__")


def test_partitioned_replace_preserves_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "v long, p long")
    df.write.partitionBy("p").parquet(path)
    kept = spark.read.parquet(path).filter("v = 2")
    atomic_replace(kept, path, partition_by=["p"])
    assert os.path.isdir(os.path.join(path, "p=20"))
    assert not os.path.isdir(os.path.join(path, "p=10"))
    assert [tuple(r) for r in spark.read.parquet(path).select("v", "p").collect()] == [
        (2, 20)
    ]


def test_missing_table_reads_none(spark, tmp_path):
    assert read_parquet_recovering(spark, str(tmp_path / "nope")) is None


def test_recover_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, [1])
    for _ in range(3):
        recover(path)
    assert _vals(spark, path) == [1]
    shutil.rmtree(path)
    for _ in range(3):
        recover(path)
    assert not os.path.isdir(path)


def test_random_crash_injection_never_loses_the_table(spark, tmp_path):
    """Property drill: interrupt atomic_replace at every os.rename
    call site (from a clean state it performs exactly two: path->bak
    and tmp->path), plus the no-crash case.  After each interruption,
    read_parquet_recovering must return either the complete old or
    the complete new content — never a torn mix, never an error,
    never a lost table — and a retried replace must converge on the
    new content."""
    import os as _os

    from semantic_similarity_system_using_aws_mapreduce_spark.sources import atomic

    path = str(tmp_path / "crashy")

    class Boom(RuntimeError):
        pass

    for fail_at in [1, 2, None]:
        # reset to a known old state
        import shutil

        for d in (path, path + ".__tmp__", path + ".__bak__"):
            shutil.rmtree(d, ignore_errors=True)
        _write(spark, path, [1, 2])

        calls = {"n": 0}
        real_rename = _os.rename

        def flaky_rename(a, b, fail_at=fail_at, calls=calls):
            calls["n"] += 1
            if fail_at is not None and calls["n"] >= fail_at:
                raise Boom()
            return real_rename(a, b)

        new_df = spark.createDataFrame([(9,), (8,)], "v long")
        _os.rename = flaky_rename
        try:
            atomic.atomic_replace(new_df, path)
            crashed = False
        except Boom:
            crashed = True
        finally:
            _os.rename = real_rename

        # the injection must actually have fired for the crash cases —
        # otherwise a refactor that removes a rename would silently
        # turn this into a no-injection pass
        assert crashed == (fail_at is not None), fail_at
        got = atomic.read_parquet_recovering(spark, path)
        assert got is not None, f"table lost (fail_at={fail_at})"
        vals = sorted(r.v for r in got.collect())
        assert vals in ([1, 2], [8, 9]), (fail_at, vals)
        # a retry always converges to the new content
        atomic.atomic_replace(spark.createDataFrame([(9,), (8,)], "v long"), path)
        assert sorted(r.v for r in spark.read.parquet(path).collect()) == [8, 9]
        if fail_at is None:
            assert vals == [8, 9]
