"""Dataset-plane analytics operators for training-data pipelines.

Each module exposes ``QUERIES: dict[name, QuerySpec]``; a QuerySpec pairs a
Spark DataFrame builder ``fn(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL (run by DuckDB over the same parquet) or ``None`` for
non-SQL-expressible operators (the driver then records a rows-only check).

Design rules (100 TB discipline):
* built-in expressions only in hot paths — no Python UDFs anywhere here
* every aggregate/computed column aliased identically in Spark and SQL
* floats rounded (or computed in DECIMAL) so both engines hash identically
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
        dedup, extraction_queries, multimodal, relational, similarity,
        streaming_queries, textstats, webtext,
    )

    merged = {}
    for mod in (dedup, similarity, textstats, relational,
                extraction_queries, multimodal, streaming_queries,
                webtext):
        overlap = set(merged) & set(mod.QUERIES)
        if overlap:
            raise ValueError("duplicate query names: %r" % overlap)
        merged.update(mod.QUERIES)
    return merged
