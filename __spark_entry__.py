"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the full extraction pipeline (Catalyst dispatch ->
               size-salted repartition -> Arrow kernel) over an HTML-wrapped
               view of the documents table at sf0.001.
queries()    — one entry per implemented operator (SURVEY.md §2): the
               extraction family (kernel-driven, including the byte-identity
               md5 gates over the reference-corpus fixture in raw AND
               font/encoding-aware unicode modes — with embedded-font
               Identity-H CID decode, predefined CJK CMap registries,
               and symbolic-TrueType routing — plus fonts /
               Info-metadata / outlink / XMP-packet / Dublin-Core-field
               / outline censuses across both parser stacks), dedup (exact /
               MinHash-LSH / clusters / true connected components / SimHash
               / n-gram Jaccard / embedding cosine / sub-document unit),
               similarity search (brute-force, computed-IVF, sign-LSH),
               text analysis (quality / repetition gates / lang-id +
               confusion matrix / token rollup / fingerprint / BM25 /
               exact quantiles / PMI collocations / trained merge-table
               BPE), webtext (canonicalization, PSL registrable domains,
               blocklist filtering, rollups, HTML outlink extraction +
               crawl-frontier feed, content-addressed splits),
               relational + windowed / sliding / as-of / sessionized /
               SCD2-interval queries (incl. Q2-style argmin, Q8-style
               market share, keep-latest CDC compaction), THREE Structured
               Streaming legs (production-shape windowed aggregation, the
               custom stateful applyInPandasWithState sessionizer, and
               bounded-state streaming dedup), and multimodal (metadata,
               frame sampling, REAL wav and REAL png decodes).
oracle_sql() — the DuckDB-equivalent ANSI SQL per query; every gated
               query carries an exact oracle (none are rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from pdf4py_spark.operators import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship extraction over /root/testdata/sf0.001."""
    from pdf4py_spark.operators.extraction_queries import (
        extract_html_roundtrip,
    )
    return extract_html_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in all_queries().items()
            if spec.sql is not None}
