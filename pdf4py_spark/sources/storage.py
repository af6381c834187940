"""Storage seam: parquet today, Iceberg when the runtime jar is present.

The engine's resume protocol needs four capabilities from the table
layer; both backends provide them, and `plans.pipeline.run_resumable`
calls ONLY through this module (r2 verdict: the sinks used to write
parquet paths directly, leaving the Iceberg contract untested end to
end):

  capability             Iceberg                      parquet stand-in
  ---------------------  ---------------------------  --------------------------
  snapshot identity      current snapshot_id from     sha256 fingerprint of the
                         the .snapshots metadata      input file listing+sizes
                         table
  snapshot-pinned reads  read option snapshot-id      pinned fingerprint is
                         (time travel)                REVALIDATED: a mutated
                                                      input fails loudly instead
                                                      of silently reading
                                                      different bytes
  atomic appends         table commit                 parquet job commit
                         (writeTo().append())         (_temporary rename)
  partition replace      overwrite by partition       rmtree + listing refresh
                         filter                       (exact-once shard retry)

No Iceberg runtime jar ships in this sandbox (PySpark 4.1 needs
iceberg-spark-runtime >= 1.10 on the classpath; the sandbox has no
network, so --packages cannot fetch one), so `iceberg_available` gates
the branch; the parquet path implements the same contract and is what
the tests exercise. `tests/test_storage.py` asserts the whole contract
through one parametrized body — the Iceberg leg auto-unskips the moment
a jar lands on the classpath.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotMismatchError(RuntimeError):
    """A snapshot-pinned read found the table at a different snapshot.

    Iceberg would time-travel to the pinned snapshot; the parquet
    stand-in keeps no history, so the only safe behavior is to refuse —
    resuming a job against silently-changed input is exactly the failure
    mode snapshot pinning exists to prevent."""


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _is_table_name(location: str) -> bool:
    return "/" not in location


def snapshot_id(spark: SparkSession, location: str) -> int:
    """Current snapshot identity of the table.

    Iceberg: the newest snapshot_id from the metadata table. Parquet:
    a stable sha256 fingerprint of the file listing + sizes (stable
    across driver processes — builtin hash() is PYTHONHASHSEED-random,
    which is exactly wrong for a resume manifest)."""
    if _is_table_name(location) and iceberg_available(spark):
        row = spark.sql(
            "SELECT snapshot_id FROM %s.snapshots "
            "ORDER BY committed_at DESC LIMIT 1" % location).collect()
        return row[0]["snapshot_id"] if row else 0
    try:
        names = sorted(
            (f, os.path.getsize(os.path.join(location, f)))
            for f in os.listdir(location))
    except OSError:
        names = [(location, 0)]
    digest = hashlib.sha256(repr(names).encode()).digest()
    return int.from_bytes(digest[:8], "big") & 0x7FFFFFFFFFFFFFFF


def read_pages(spark: SparkSession, location: str,
               snapshot: int = None) -> DataFrame:
    """Scan the pages table. `location` is either a path (parquet) or a
    catalog table name (Iceberg). With `snapshot`, Iceberg time-travels;
    the parquet stand-in revalidates the fingerprint and raises
    SnapshotMismatchError if the files changed underneath the pin."""
    if _is_table_name(location) and iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot is not None:
            reader = reader.option("snapshot-id", str(snapshot))
        return reader.load(location)
    if snapshot is not None:
        current = snapshot_id(spark, location)
        if current != snapshot:
            raise SnapshotMismatchError(
                "input at %s is at snapshot %d but the read is pinned to "
                "%d — the files changed; clear the output manifest to "
                "reprocess" % (location, current, snapshot))
    return spark.read.parquet(location)


def append(df: DataFrame, location: str) -> None:
    if _is_table_name(location) and iceberg_available(df.sparkSession):
        df.writeTo(location).append()
        return
    df.write.mode("append").parquet(location)


def append_partitioned(df: DataFrame, location: str,
                       partition_col: str) -> None:
    """Atomic append of one partition's rows. Iceberg tables carry their
    partition spec in metadata; the parquet stand-in materializes it as a
    hive-style directory column."""
    if _is_table_name(location) and iceberg_available(df.sparkSession):
        df.writeTo(location).append()
        return
    df.write.mode("append").partitionBy(partition_col).parquet(location)


def replace_partition(spark: SparkSession, location: str,
                      partition_col: str, value) -> bool:
    """Drop one partition so a retry can rewrite it exact-once. Returns
    True if anything was dropped (i.e. this is a retry of a crashed
    write). Iceberg: a metadata-only DELETE by partition predicate.
    Parquet: rmtree the hive directory + drop the session's cached file
    listing (or later reads resolve deleted part files)."""
    if _is_table_name(location) and iceberg_available(spark):
        if not spark.catalog.tableExists(location):
            return False
        n = spark.sql("SELECT count(*) AS n FROM %s WHERE %s = %r"
                      % (location, partition_col, value)).collect()[0]["n"]
        if n:
            spark.sql("DELETE FROM %s WHERE %s = %r"
                      % (location, partition_col, value))
        return bool(n)
    part_dir = os.path.join(location, "%s=%s" % (partition_col, value))
    if os.path.isdir(part_dir):
        shutil.rmtree(part_dir)
        spark.catalog.refreshByPath(location)
        return True
    return False
