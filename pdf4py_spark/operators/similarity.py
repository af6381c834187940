"""Similarity search over the ``embeddings`` table (array<float> column).

* ann_cosine_topk — brute-force cosine top-k, the exactness baseline.
  JVM-side throughout: zip_with/aggregate higher-order functions keep the
  dot product in codegen'd expressions (no Python).
* ann_bucketed_topk — the scale path: an IVF-style coarse quantizer
  restricts each probe to one bucket (here the stored ``label`` plays the
  centroid-assignment role; with real data the bucket id comes from a
  k-means assignment step). Turns the n*m cross join into
  sum-over-buckets(n_b * m_b).

Cross-engine determinism: cosine computed in double, rounded to 4
decimals; ranking ties broken by neighbor id (verified bit-identical
against DuckDB's list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import QuerySpec, table

_COS = (
    "round(aggregate(zip_with(cast(qe as array<double>),"
    " cast(ne as array<double>), (x, y) -> x * y), 0D, (a, x) -> a + x)"
    " / (sqrt(aggregate(cast(qe as array<double>), 0D, (a, x) -> a + x * x))"
    " * sqrt(aggregate(cast(ne as array<double>), 0D, (a, x) -> a + x * x)))"
    ", 4)"
)


def _ranked(pairs):
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def ann_cosine_topk(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS qe")
    corpus = emb.selectExpr("vec_id AS neighbor_id", "embedding AS ne")
    pairs = (queries.crossJoin(corpus)
             .where("query_id <> neighbor_id")
             .selectExpr("query_id", "neighbor_id", _COS + " AS cosine"))
    return _ranked(pairs)


ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id % 50 = 0
),
pairs AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(qe::DOUBLE[], e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(qe::DOUBLE[], qe::DOUBLE[])) *
                sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))), 4) AS cosine
  FROM q, embeddings e WHERE query_id <> e.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


def ann_bucketed_topk(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "label AS qlabel", "embedding AS qe")
    corpus = emb.selectExpr(
        "vec_id AS neighbor_id", "label AS nlabel", "embedding AS ne")
    pairs = (queries.join(corpus, F.col("qlabel") == F.col("nlabel"))
             .where("query_id <> neighbor_id")
             .selectExpr("query_id", "neighbor_id", _COS + " AS cosine"))
    return _ranked(pairs)


ANN_BUCKETED_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel, embedding AS qe
  FROM embeddings WHERE vec_id % 50 = 0
),
pairs AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(qe::DOUBLE[], e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(qe::DOUBLE[], qe::DOUBLE[])) *
                sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))), 4) AS cosine
  FROM q JOIN embeddings e ON q.qlabel = e.label
  WHERE query_id <> e.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


def embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (all pairs over the label
    blocking key, cosine >= 0.8) — the embedding leg of the dedup suite."""
    emb = table(spark, sf_dir, "embeddings")
    a = emb.selectExpr("vec_id AS id_a", "label AS la", "embedding AS qe")
    b = emb.selectExpr("vec_id AS id_b", "label AS lb", "embedding AS ne")
    return (a.join(b, (F.col("la") == F.col("lb"))
                   & (F.col("id_a") < F.col("id_b")))
            .selectExpr("id_a", "id_b", _COS + " AS cosine")
            .where("cosine >= 0.8"))


EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             4) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
            (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
            4) >= 0.8
"""


QUERIES = {
    "ann_cosine_topk": QuerySpec(ann_cosine_topk, ANN_TOPK_SQL),
    "ann_bucketed_topk": QuerySpec(ann_bucketed_topk, ANN_BUCKETED_SQL),
    "embedding_neardup": QuerySpec(embedding_neardup, EMBEDDING_NEARDUP_SQL),
}
