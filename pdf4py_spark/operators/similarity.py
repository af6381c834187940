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


N_PLANES = 6

# deterministic pseudo-random hyperplane component in [-8.5, 7.5): the
# first hex digit of md5('<plane>#<dim>') shifted to be zero-mean-ish.
# Integer-derived, so both engines agree bit-exactly on every component.
_PLANE_COMPONENT = (
    "position(substring(md5(concat(cast(p as string), '#',"
    " cast(d as string))), 1, 1) IN '0123456789abcdef') - 8.5")


def ann_lsh_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN: each vector gets an N_PLANES-bit bucket
    (sign of dot(vec, plane)); probes search only their own bucket, then
    exact cosine ranks the candidates. The classic sublinear scale path:
    bucket population ~ n / 2^planes, so the join cost is
    sum_b(q_b * n_b), never q*n."""
    emb = table(spark, sf_dir, "embeddings")
    comps = (emb
             .withColumn("p", F.explode(
                 F.expr("sequence(0, %d)" % (N_PLANES - 1))))
             .withColumn("dv", F.explode(F.expr(
                 "transform(cast(embedding as array<double>),"
                 " (x, i) -> struct(i as d, x as v))")))
             .select("vec_id", "p", F.col("dv.d").alias("d"),
                     F.col("dv.v").alias("v")))
    dots = (comps
            .withColumn("contrib", F.col("v") * F.expr(_PLANE_COMPONENT))
            .groupBy("vec_id", "p").agg(F.sum("contrib").alias("dot")))
    sigs = (dots.groupBy("vec_id").agg(
        F.sum(F.when(F.col("dot") > 0,
                     F.expr("cast(pow(2, p) as bigint)")).otherwise(0))
        .alias("bucket")))
    keyed = emb.join(sigs, "vec_id")
    queries = keyed.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS qe", "bucket")
    corpus = keyed.selectExpr(
        "vec_id AS neighbor_id", "embedding AS ne", "bucket")
    pairs = (queries.join(corpus, "bucket")
             .where("query_id <> neighbor_id")
             .selectExpr("query_id", "neighbor_id", _COS + " AS cosine"))
    return _ranked(pairs)


ANN_LSH_SQL = """
WITH comps AS (
  SELECT vec_id, planes.p AS p, dims.d AS d,
         embedding[dims.d + 1]::DOUBLE AS v
  FROM embeddings
  CROSS JOIN range(0, {nplanes}) AS planes(p)
  CROSS JOIN range(0, 64) AS dims(d)
),
dots AS (
  SELECT vec_id, p,
         SUM(v * (position(substring(md5(CAST(p AS VARCHAR) || '#' ||
                   CAST(d AS VARCHAR)), 1, 1) IN '0123456789abcdef')
                  - 8.5)) AS dot
  FROM comps GROUP BY vec_id, p
),
sigs AS (
  SELECT vec_id,
         SUM(CASE WHEN dot > 0 THEN CAST(pow(2, p) AS BIGINT)
                  ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id
),
keyed AS (
  SELECT e.vec_id, e.embedding, s.bucket
  FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               4) AS cosine
  FROM keyed q JOIN keyed c ON q.bucket = c.bucket
  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
""".format(nplanes=N_PLANES)


QUERIES = {
    "ann_cosine_topk": QuerySpec(ann_cosine_topk, ANN_TOPK_SQL),
    "ann_bucketed_topk": QuerySpec(ann_bucketed_topk, ANN_BUCKETED_SQL),
    "ann_lsh_topk": QuerySpec(ann_lsh_topk, ANN_LSH_SQL),
    "embedding_neardup": QuerySpec(embedding_neardup, EMBEDDING_NEARDUP_SQL),
}
