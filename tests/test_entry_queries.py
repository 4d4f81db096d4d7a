"""Local mirror of the driver's DuckDB-oracle correctness gate: run
every declared query on Spark AND its oracle SQL on DuckDB at sf0.01,
compare row count, column names, and the order-insensitive multiset of
row values."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Test the FULL suite (including local-only queries the driver-facing
# registry omits to stay under the driver's 50-row cap).
from semantic_similarity_system_using_aws_mapreduce_spark.workload import ALL_ORACLES as ORACLES
from semantic_similarity_system_using_aws_mapreduce_spark.workload import ALL_QUERIES as QUERIES


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark_results(spark):
    """All Spark-side query results, computed CONCURRENTLY (guide
    §2.6: actions are only sequential because the driver calls them
    sequentially — a thread pool lets the scheduler overlap the 116
    small sf0.01 jobs, which cut this module's wall-clock ~4x without
    touching a single assertion).  Each per-query test still compares
    its own query's (columns, rows) against its own DuckDB oracle;
    a query that raises stores its exception and the owning test
    re-raises it, so failure attribution stays per-query."""
    from concurrent.futures import ThreadPoolExecutor

    def run(name):
        try:
            sdf = QUERIES[name](spark, SF_DIR)
            return name, (sdf.columns, [tuple(r) for r in sdf.collect()]), None
        except Exception as exc:  # noqa: BLE001 — re-raised in the test
            return name, None, exc

    with ThreadPoolExecutor(max_workers=8) as pool:
        out = {}
        for name, res, exc in pool.map(run, sorted(QUERIES)):
            out[name] = (res, exc)
    return out


def _norm_cell(v):
    # (null_flag, value) keeps rows sortable when a column mixes NULLs
    # with values (e.g. lag() first rows)
    if v is None:
        return (1, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (0, "NaN")
        if math.isinf(v):
            return (0, "Inf" if v > 0 else "-Inf")
        # rounding already applied query-side; normalize -0.0 and fp dust
        return (0, round(v, 6) + 0.0)
    if isinstance(v, datetime.datetime):
        return (0, v.replace(tzinfo=None).isoformat())
    return (0, v)


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, data


def test_every_query_has_oracle():
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark_results, duck, name):
    res, exc = spark_results[name]
    if exc is not None:
        raise exc
    scols, srows = res

    ddf = duck.execute(ORACLES[name])
    dcols = [d[0] for d in ddf.description]
    drows = [tuple(r) for r in ddf.fetchall()]

    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs oracle {len(drows)}"
    # a 0-row result that "matches" a 0-row oracle verifies nothing
    assert len(srows) > 0, f"{name}: vacuous (0 rows) at sf0.01"
    s_cols, s_data = _normalize(scols, srows)
    d_cols, d_data = _normalize(dcols, drows)
    assert s_cols == d_cols, f"{name}: columns {s_cols} vs {d_cols}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_data, d_data)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_never_hugeint(duck, name):
    """Structural guard for the oracle-typing bug class that cost green
    driver rows in rounds 1 and 3: DuckDB silently widens SUM over
    BIGINT/INTEGER (plain, windowed, or via CASE) to HUGEINT, which the
    driver's type-sensitive value hash rejects against Spark's bigint
    even when every value is equal.  Sweep every oracle's result type
    signature (relation types, no execution) and fail on any HUGEINT /
    INT128 — including inside STRUCT/LIST — so the next uncast sum()
    fails at commit time instead of in CORRECTNESS_r{N}.json."""
    types = duck.sql(ORACLES[name]).types
    offenders = [
        str(t) for t in types
        if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
    ]
    assert not offenders, (
        f"{name}: oracle emits HUGEINT column(s) {offenders}; "
        "CAST the aggregate to BIGINT (driver hash is type-sensitive)"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["s1", "s2"] + [
        "dist_manhattan", "dist_euclidean", "sim_cosine",
        "sim_jaccard", "sim_dice", "sim_js",
    ]
