"""Storage seam: parquet today, Iceberg when the runtime jar is present.

The engine's resume protocol needs three capabilities from the table
layer; both backends provide them:

  capability             Iceberg                      parquet stand-in
  ---------------------  ---------------------------  --------------------------
  snapshot-pinned reads  read option snapshot-id      _snapshot_id() fingerprint
                                                      of the input file listing
  atomic appends         table commit                 parquet job commit
                                                      (_temporary rename)
  processed manifest     metadata table / tag         _manifest/shard-*.json
                                                      (atomic os.replace)

No Iceberg runtime jar ships in this sandbox (PySpark 4.1 needs
iceberg-spark-runtime >= 1.10 on the classpath), so `iceberg_available`
gates the branch; the parquet path implements the same contract and is
what the tests exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, location: str,
               snapshot_id: int = None) -> DataFrame:
    """Scan the pages table. `location` is either a path (parquet) or a
    catalog table name (Iceberg)."""
    if "/" not in location and iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(location)
    return spark.read.parquet(location)


def append(df: DataFrame, location: str) -> None:
    if "/" not in location and iceberg_available(df.sparkSession):
        df.writeTo(location).append()
        return
    df.write.mode("append").parquet(location)
