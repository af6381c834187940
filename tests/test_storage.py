"""Storage-seam contract (SURVEY.md §2.3 D1): the same three capabilities
the resume protocol needs — scan, append, snapshot-pinned re-read — are
asserted through ONE parametrized body for both backends. The parquet
stand-in runs everywhere; the Iceberg leg auto-unskips the moment an
iceberg-spark-runtime jar lands on the classpath (no sandbox network, so
--packages cannot fetch one here)."""

import os

import pytest

from pdf4py_spark.sources.storage import append, iceberg_available, read_pages

ROWS1 = [(1, "a"), (2, "b")]
ROWS2 = [(3, "c")]
SCHEMA = "id bigint, v string"


def _contract(spark, location):
    """The behavior every backend must provide, asserted identically."""
    df1 = spark.createDataFrame(ROWS1, SCHEMA)
    append(df1, location)
    got = {(r["id"], r["v"]) for r in read_pages(spark, location).collect()}
    assert got == set(ROWS1)

    append(spark.createDataFrame(ROWS2, SCHEMA), location)
    got = {(r["id"], r["v"]) for r in read_pages(spark, location).collect()}
    assert got == set(ROWS1) | set(ROWS2), "append must accumulate"


def test_parquet_backend_contract(spark, tmp_path):
    _contract(spark, str(tmp_path / "pages_tbl"))


def test_iceberg_backend_contract(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar on the classpath")
    # requires a configured catalog; use a session catalog named 'local'
    spark.conf.set("spark.sql.catalog.local",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse",
                   str(tmp_path / "warehouse"))
    spark.sql("CREATE TABLE local.db.pages (id bigint, v string)"
              " USING iceberg")
    _contract(spark, "local.db.pages")

    # snapshot pinning: a read pinned to the first-append snapshot must
    # NOT see the second append
    hist = spark.sql("SELECT snapshot_id FROM local.db.pages.snapshots"
                     " ORDER BY committed_at").collect()
    assert len(hist) >= 2
    pinned = read_pages(spark, "local.db.pages",
                        snapshot=hist[0]["snapshot_id"])
    assert pinned.count() == len(ROWS1)


def test_location_dispatch(spark, tmp_path):
    """Path-like locations must always take the parquet branch, even if an
    Iceberg jar is present (catalog names contain no '/')."""
    loc = str(tmp_path / "dispatch_check")
    append(spark.createDataFrame(ROWS1, SCHEMA), loc)
    assert os.path.isdir(loc), "path location must be written as parquet"
    assert read_pages(spark, loc).count() == len(ROWS1)


def test_snapshot_identity_tracks_input(spark, tmp_path):
    """snapshot_id is stable for unchanged input and moves when the file
    listing changes (the parquet analog of an Iceberg commit)."""
    from pdf4py_spark.sources.storage import snapshot_id

    loc = str(tmp_path / "snap_tbl")
    append(spark.createDataFrame(ROWS1, SCHEMA), loc)
    s1 = snapshot_id(spark, loc)
    assert s1 == snapshot_id(spark, loc), "must be deterministic"
    append(spark.createDataFrame(ROWS2, SCHEMA), loc)
    assert snapshot_id(spark, loc) != s1, "append must move the snapshot"


def test_snapshot_pinned_read_refuses_mutated_input(spark, tmp_path):
    """The stand-in's time-travel contract: a read pinned to a snapshot
    either sees exactly that state or FAILS — never silently different
    bytes (Iceberg would serve the old snapshot; parquet keeps no
    history, so refusing is the only safe behavior). run_resumable pins
    every scan this way."""
    from pdf4py_spark.sources.storage import (
        SnapshotMismatchError, snapshot_id)

    loc = str(tmp_path / "pin_tbl")
    append(spark.createDataFrame(ROWS1, SCHEMA), loc)
    pin = snapshot_id(spark, loc)
    assert read_pages(spark, loc, snapshot=pin).count() == len(ROWS1)
    append(spark.createDataFrame(ROWS2, SCHEMA), loc)
    with pytest.raises(SnapshotMismatchError, match="pinned"):
        read_pages(spark, loc, snapshot=pin)


def test_replace_partition_exact_once(spark, tmp_path):
    """Shard-retry contract: replace_partition drops exactly one
    partition (returning whether anything existed), leaving siblings
    intact — the crash-window exact-once primitive run_resumable uses."""
    from pdf4py_spark.sources.storage import (
        append_partitioned, replace_partition)

    loc = str(tmp_path / "part_tbl")
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 1)], SCHEMA + ", shard int")
    append_partitioned(df, loc, "shard")
    assert read_pages(spark, loc).count() == 3

    assert replace_partition(spark, loc, "shard", 0) is True
    left = {(r["id"], r["shard"])
            for r in read_pages(spark, loc).collect()}
    assert left == {(3, 1)}, "only shard 0 dropped"
    assert replace_partition(spark, loc, "shard", 0) is False, \
        "second replace is a no-op (nothing to drop)"
