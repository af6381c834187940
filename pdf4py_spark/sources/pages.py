"""Builders for the north-rule `pages` input table (parquet stand-in for
the Iceberg table of Common-Crawl-style web pages)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, StringType, StructField, StructType,
    TimestampType,
)

from .corpus import PASSWORDS, corpus_rows

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

PASSWORDS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("password", StringType(), False),
    StructField("password_is_bytes", BooleanType(), False),
])


def corpus_pages_df(spark: SparkSession) -> DataFrame:
    """The 30-row byte-identity corpus as a pages DataFrame."""
    return spark.createDataFrame(corpus_rows(), PAGES_SCHEMA)


def passwords_df(spark: SparkSession) -> DataFrame:
    """Tiny credentials dimension (broadcast side of the kernel join)."""
    rows = []
    for url, pw in PASSWORDS.items():
        if isinstance(pw, bytes):
            rows.append((url, pw.decode("utf-8"), True))
        else:
            rows.append((url, pw, False))
    return spark.createDataFrame(rows, PASSWORDS_SCHEMA)


def amplified_passwords_df(spark: SparkSession, copies: int) -> DataFrame:
    """Credentials dimension matching amplified_pages_df's url scheme."""
    rows = []
    for url, pw in PASSWORDS.items():
        name = url.rsplit("/", 1)[-1]
        text = pw.decode("utf-8") if isinstance(pw, bytes) else pw
        is_bytes = isinstance(pw, bytes)
        for i in range(copies):
            rows.append(("crawl://scale/dup-%06d-%s" % (i, name),
                         text, is_bytes))
    return spark.createDataFrame(rows, PASSWORDS_SCHEMA)


def amplified_pages_df(spark: SparkSession, copies: int,
                       include_adversarial: bool = False) -> DataFrame:
    """Deterministic corpus amplifier for throughput runs: each parseable
    document re-emitted ``copies`` times under distinct urls
    (crawl://scale/dup-NNNNNN-<name>), timestamps shifted by the copy
    index. Payload bytes are identical per copy, so results stay
    verifiable against the same oracle."""
    base = corpus_pages_df(spark)
    if not include_adversarial:
        base = base.where(~F.col("url").startswith("crawl://adversarial/"))
    copies_df = spark.range(copies).select(F.col("id").alias("copy"))
    return (base.crossJoin(F.broadcast(copies_df))
            .select(
                F.concat(F.lit("crawl://scale/dup-"),
                         F.format_string("%06d", "copy"),
                         F.lit("-"),
                         F.element_at(F.split("url", "/"), -1)).alias("url"),
                (F.col("warc_ts") + F.make_interval(secs=F.col("copy")))
                .alias("warc_ts"),
                "html", "text", "lang"))


def write_pages_parquet(spark: SparkSession, path: str,
                        copies: int = 1) -> int:
    df = (corpus_pages_df(spark) if copies <= 1
          else amplified_pages_df(spark, copies))
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()
