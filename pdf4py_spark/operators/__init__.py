"""Dataset-plane analytics operators for training-data pipelines.

Each module exposes ``QUERIES: dict[name, QuerySpec]``; a QuerySpec pairs a
Spark DataFrame builder ``fn(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL (run by DuckDB over the same parquet) or ``None`` for
non-SQL-expressible operators (the driver then records a rows-only check).

Design rules (100 TB discipline):
* built-in expressions only in hot paths — no Python UDFs anywhere here
* every aggregate/computed column aliased identically in Spark and SQL
* floats rounded (or computed in DECIMAL) so both engines hash identically
* ROUND discipline: never round a double BELOW the value's intrinsic
  decimal scale. Spark's round() rounds the shortest decimal repr
  HALF_UP while DuckDB rounds the binary double, so tie values
  (…xx50 at the cut) diverge (1.005 -> 1.01 vs 1.00). Rounding AT the
  intrinsic scale (e.g. a DECIMAL(18,4) sum at 4, a microsecond ratio
  at 6) makes the round the identity on both engines. Quotients of
  small integers (ratios with denominator <= ~100) are safe at scale 4
  because a 5-decimal tie needs a 2^a*5^b denominator > 100.
* joins that can broadcast are broadcast; self-joins are bounded by LSH
  bands / bucket keys, never naive cross products
"""

from __future__ import annotations

from collections import namedtuple

QuerySpec = namedtuple("QuerySpec", ["fn", "sql"])


def table(spark, sf_dir: str, name: str):
    return spark.read.parquet("%s/%s.parquet" % (sf_dir, name))


def all_queries():
    from . import (
        corpusstats, dedup, extraction_queries, multimodal, relational,
        similarity, streaming_queries, textstats, webtext,
    )

    merged = {}
    for mod in (dedup, similarity, textstats, relational,
                extraction_queries, multimodal, streaming_queries,
                webtext, corpusstats):
        overlap = set(merged) & set(mod.QUERIES)
        if overlap:
            raise ValueError("duplicate query names: %r" % overlap)
        merged.update(mod.QUERIES)
    return merged
