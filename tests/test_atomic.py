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


def test_manifest_mode_replace_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_df = spark.createDataFrame([(1,), (2,)], "v long")
    atomic_replace(_write_df, path, mode="manifest")
    got = read_parquet_recovering(spark, path, mode="manifest")
    assert sorted(r.v for r in got.collect()) == [1, 2]
    # data lives in a versioned dir, never at the bare path
    assert not os.path.isdir(path)
    assert os.path.isfile(path + ".__manifest__")
    # replace may read its own target — no lineage cycle
    atomic_replace(got.filter("v > 1"), path, mode="manifest")
    got2 = read_parquet_recovering(spark, path, mode="manifest")
    assert sorted(r.v for r in got2.collect()) == [2]
    # superseded version GC'd: exactly one version dir remains
    vdirs = [d for d in os.listdir(tmp_path) if ".__v" in d]
    assert len(vdirs) == 1, vdirs


def test_manifest_mode_migrates_a_rename_mode_table(spark, tmp_path):
    """Flipping the mode must keep legacy tables readable, and the
    first manifest replace supersedes the legacy directory."""
    path = str(tmp_path / "t")
    _write(spark, path, [1, 2, 3])  # legacy rename-mode layout
    got = read_parquet_recovering(spark, path, mode="manifest")
    assert sorted(r.v for r in got.collect()) == [1, 2, 3]
    atomic_replace(got.filter("v > 1"), path, mode="manifest")
    assert not os.path.isdir(path)  # legacy dir GC'd after the swap
    got2 = read_parquet_recovering(spark, path, mode="manifest")
    assert sorted(r.v for r in got2.collect()) == [2, 3]


def test_manifest_mode_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "v long, p long")
    atomic_replace(df, path, partition_by=["p"], mode="manifest")
    kept = read_parquet_recovering(spark, path, mode="manifest").filter("v = 2")
    atomic_replace(kept, path, partition_by=["p"], mode="manifest")
    live = read_parquet_recovering(spark, path, mode="manifest")
    assert [tuple(r) for r in live.select("v", "p").collect()] == [(2, 20)]
    vdir = [d for d in os.listdir(tmp_path) if ".__v" in d]
    assert len(vdir) == 1
    assert os.path.isdir(os.path.join(tmp_path, vdir[0], "p=20"))


def test_manifest_mode_missing_and_empty(spark, tmp_path):
    assert read_parquet_recovering(spark, str(tmp_path / "no"), mode="manifest") is None
    # zero-row write: depending on the Spark version the version dir
    # holds either no data files (-> None, the UNABLE_TO_INFER_SCHEMA
    # guard) or one schema-bearing empty part file (-> empty DF); both
    # are sound — what must never happen is an exception
    path = str(tmp_path / "t")
    empty = spark.createDataFrame([], "v long")
    atomic_replace(empty, path, mode="manifest")
    got = read_parquet_recovering(spark, path, mode="manifest")
    assert got is None or got.count() == 0


def test_manifest_mode_env_var_selects_protocol(spark, tmp_path, monkeypatch):
    """Call sites that pass no mode= must follow the env var — the
    streaming tables switch protocol without code changes."""
    monkeypatch.setenv("SPARK_GRAFT_ATOMIC_MODE", "manifest")
    path = str(tmp_path / "t")
    atomic_replace(spark.createDataFrame([(7,)], "v long"), path)
    assert os.path.isfile(path + ".__manifest__")
    assert not os.path.isdir(path)
    got = read_parquet_recovering(spark, path)
    assert [r.v for r in got.collect()] == [7]


def test_manifest_crash_injection_never_loses_the_table(spark, tmp_path):
    """Mirror of the rename-mode drill: interrupt the manifest protocol
    at (a) the version-directory parquet write, (b) the manifest
    pointer swap, plus the no-crash case.  After every interruption
    the read must return the complete old content or the complete new
    content — never torn, never lost — and a retry converges."""
    import os as _os

    from semantic_similarity_system_using_aws_mapreduce_spark.sources import atomic

    path = str(tmp_path / "crashy")

    class Boom(RuntimeError):
        pass

    for fail_at in ("write", "swap", None):
        shutil.rmtree(str(tmp_path), ignore_errors=True)
        os.makedirs(tmp_path, exist_ok=True)
        atomic.atomic_replace(
            spark.createDataFrame([(1,), (2,)], "v long"), path, mode="manifest"
        )

        fired = {"n": 0}
        real_replace = _os.replace

        def flaky_swap(a, b, fail_at=fail_at, fired=fired):
            if fail_at == "swap":
                fired["n"] += 1
                raise Boom()
            return real_replace(a, b)

        new_df = spark.createDataFrame([(9,), (8,)], "v long")
        if fail_at == "write":
            # simulate a crash mid parquet job: a torn version dir
            # (no _SUCCESS) with a HIGHER number than the live one,
            # exactly what an interrupted write leaves behind
            live = max(
                int(d.split(".__v")[1].rstrip("_")) for d in os.listdir(tmp_path)
                if ".__v" in d
            )
            torn = f"{path}.__v{live + 1}__"
            os.makedirs(torn)
            with open(os.path.join(torn, "part-0.parquet"), "wb") as f:
                f.write(b"torn garbage")
            crashed = True
        else:
            _os.replace = flaky_swap
            try:
                atomic.atomic_replace(new_df, path, mode="manifest")
                crashed = False
            except Boom:
                crashed = True
            finally:
                _os.replace = real_replace
            if fail_at == "swap":
                assert fired["n"] > 0  # the injection must actually fire

        assert crashed == (fail_at is not None), fail_at
        got = atomic.read_parquet_recovering(spark, path, mode="manifest")
        assert got is not None, f"table lost (fail_at={fail_at})"
        vals = sorted(r.v for r in got.collect())
        expected_old = fail_at is not None
        assert vals == ([1, 2] if expected_old else [8, 9]), (fail_at, vals)
        # a retry always converges on the new content and GCs garbage
        atomic.atomic_replace(
            spark.createDataFrame([(9,), (8,)], "v long"), path, mode="manifest"
        )
        got = atomic.read_parquet_recovering(spark, path, mode="manifest")
        assert sorted(r.v for r in got.collect()) == [8, 9]
        vdirs = [d for d in os.listdir(tmp_path) if ".__v" in d]
        assert len(vdirs) == 1, (fail_at, vdirs)


def test_manifest_recover_gcs_unreferenced_versions(spark, tmp_path):
    from semantic_similarity_system_using_aws_mapreduce_spark.sources.atomic import recover as _recover

    path = str(tmp_path / "t")
    atomic_replace(spark.createDataFrame([(1,)], "v long"), path, mode="manifest")
    # orphan attempt + stale manifest tmp
    os.makedirs(path + ".__v99__")
    with open(path + ".__manifest__.tmp", "w") as f:
        f.write("{}")
    _recover(path, mode="manifest")
    assert not os.path.isdir(path + ".__v99__")
    assert not os.path.exists(path + ".__manifest__.tmp")
    got = read_parquet_recovering(spark, path, mode="manifest")
    assert [r.v for r in got.collect()] == [1]


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


def test_manifest_recover_heals_legacy_midswap(spark, tmp_path):
    """A rename-mode table interrupted mid-swap, then the deployment
    flips to manifest mode: recover and resolve_table_dir must heal
    the legacy state (roll the committed temp forward) instead of
    shadowing it with an empty v0."""
    from semantic_similarity_system_using_aws_mapreduce_spark.sources.atomic import (
        recover as _recover,
        resolve_table_dir,
    )

    path = str(tmp_path / "t")
    # mid-swap legacy state: path renamed away, committed __tmp__
    _write(spark, path + ".__tmp__", [7, 8])
    got = read_parquet_recovering(spark, path, mode="manifest")
    assert sorted(r.v for r in got.collect()) == [7, 8]

    # same via recover + resolve (the partition-append path)
    shutil.rmtree(path)
    _write(spark, path + ".__tmp__", [5])
    _recover(path, mode="manifest")
    d = resolve_table_dir(path, mode="manifest")
    assert d == path  # healed legacy layout, no empty v0 shadow
    assert _vals(spark, path) == [5]
