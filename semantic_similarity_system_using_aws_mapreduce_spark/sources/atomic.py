"""Crash-safe replacement of a parquet directory.

``df.write.mode("overwrite")`` onto the path a table lives at is NOT
atomic: the committer deletes the old files before the new job
commits, so a crash mid-rewrite loses the table (and if the plan reads
the same path it is also a lineage cycle, historically papered over
here with a non-durable ``localCheckpoint``).  Both the streaming
sketch table and right-to-be-forgotten deletion rewrite tables they
just read — VERDICT r4 / ADVICE flagged the torn window.

``atomic_replace`` closes it with the classic temp-and-swap protocol
on a filesystem with atomic directory rename (local FS, HDFS):

    1. write the new content to ``<path>.__tmp__``  (old table intact,
       and the writing plan may freely READ ``<path>`` — no cycle, no
       checkpoint needed);
    2. rename ``<path>``     -> ``<path>.__bak__``;
    3. rename ``<path>.__tmp__`` -> ``<path>``;
    4. delete the backup.

Every crash point leaves a recoverable state, and ``recover`` rolls it
forward or back deterministically:

    * crash in/before (1): old table still at ``path``; a stale
      ``__tmp__`` (no ``_SUCCESS``) is discarded;
    * crash between (2) and (3): ``path`` missing, ``__tmp__`` is a
      COMPLETE committed write (rename only happens after the write
      returned) — roll FORWARD by finishing the swap;
    * crash between (3) and (4): new table live; drop the backup.

Object stores without atomic rename need a real table format
(Delta/Iceberg) or a manifest-pointer indirection instead; the call
sites are the same either way.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_TMP, _BAK = ".__tmp__", ".__bak__"


def _committed(d: str) -> bool:
    return os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS"))


def recover(path: str) -> None:
    """Roll an interrupted :func:`atomic_replace` forward (committed
    temp exists) or back (it does not), leaving ``path`` consistent.
    Idempotent; a no-op on a clean state."""
    tmp, bak = path + _TMP, path + _BAK
    if os.path.isdir(path):
        # swap never started (stale tmp) or never finished cleanup (bak)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(bak, ignore_errors=True)
        return
    if _committed(tmp):
        os.rename(tmp, path)  # roll forward: finish the swap
        shutil.rmtree(bak, ignore_errors=True)
    elif os.path.isdir(bak):
        shutil.rmtree(tmp, ignore_errors=True)
        os.rename(bak, path)  # roll back: restore the old table


def atomic_replace(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Replace the parquet directory at ``path`` with ``df``'s rows.
    ``df`` MAY read from ``path`` — the write lands in a temp directory
    first, so there is no lineage cycle and no window in which a crash
    leaves neither the old nor the new table.  ``partition_by``
    preserves a Hive-partitioned layout across the rewrite (a table
    whose other writers use ``partitionBy`` must not be rewritten
    flat — mixing root-level files with partition dirs breaks
    partition discovery)."""
    recover(path)
    tmp, bak = path + _TMP, path + _BAK
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if os.path.isdir(path):
        os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak, ignore_errors=True)


def _has_data_files(path: str) -> bool:
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def read_parquet_recovering(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a table maintained by :func:`atomic_replace`, first healing
    any interrupted swap.  Returns None if the table does not exist OR
    holds no data files — a writer that committed zero rows (e.g. a
    micro-batch where every document failed the quality gate) leaves a
    directory with only a _SUCCESS marker, and spark.read.parquet on
    it raises UNABLE_TO_INFER_SCHEMA; treating it as absent keeps
    empty-so-far tables indistinguishable from never-written ones
    instead of wedging every subsequent read."""
    recover(path)
    if not os.path.isdir(path) or not _has_data_files(path):
        return None
    return spark.read.parquet(path)
