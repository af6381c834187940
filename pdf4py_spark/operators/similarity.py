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

EMB_DIM = 64


def _dot_unrolled(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Unrolled left-associated elementwise product sum over two pre-cast
    array<double> columns: ``a[0]*b[0] + a[1]*b[1] + ...``.

    Bit-identical to the ``aggregate(zip_with(...), 0D, +)`` fold it
    replaces — same multiply order, same left-to-right add order, and the
    fold's leading ``0D + x0`` is an exact identity for every double —
    but whole-stage-codegen instead of interpreted: Spark's higher-order
    functions are CodegenFallback, so the fold paid an interpreted-eval
    closure per element per PAIR (r6 measurement: the brute-force query
    spent ~95% of its time there). Verified value-identical over the full
    sf1.0 pair set (8M pairs, 0 diffs) and oracle-green at the gate SFs."""
    return " + ".join("%s[%d] * %s[%d]" % (a, i, b, i) for i in range(dim))


def _dot_cast(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Unrolled dot product over two float-array columns with per-element
    casts (``cast(a)[i]`` == ``cast(a[i])`` for float->double, which is
    exact); same fold-equivalence argument as _dot_unrolled.

    Method-size budget (JVM 64 KB generated-method limit): ONE 64-term
    unrolled dot per codegen method compiles; three (dot + both norms =
    192 terms) in one Project does not when a pushed filter duplicates
    the expression — which is why every call site factors the norms onto
    the join sides and the pair stage computes only the dot."""
    return " + ".join(
        "cast(%s[%d] as double) * cast(%s[%d] as double)" % (a, i, b, i)
        for i in range(dim))


def _norm_fold(a: str) -> str:
    """The factored per-vector norm as _COS's original
    ``sqrt(aggregate(...))`` fold (value-identical to the unrolled
    self-dot). Row-bound expressions deliberately KEEP the fold: its
    interpreted eval costs ~microseconds per ROW (not per pair), while
    an unrolled 64-term source at every norm site roughly doubled the
    generated-code Janino compile time that dominates these queries'
    cold runs — the suite pays each query's codegen exactly once."""
    return ("sqrt(aggregate(cast(%s as array<double>), 0D,"
            " (a, x) -> a + x * x))" % a)


def _ranked(pairs):
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def ann_cosine_topk(spark, sf_dir):
    # r6: norms factored out of the per-pair expression (computed once per
    # VECTOR, not once per pair — sqrt(agg(qe)) / sqrt(agg(ne)) are
    # pair-invariant subexpressions the optimizer does not hoist through
    # a join) and the remaining per-pair dot product unrolled into
    # codegen (see _dot_unrolled). The emitted expression tree per pair —
    # round(dot / (qn * nn), 4) — is value-identical to _COS.
    emb = table(spark, sf_dir, "embeddings")
    queries = (emb.where("vec_id % 50 = 0")
               .selectExpr("vec_id AS query_id",
                           "cast(embedding as array<double>) AS qd")
               .selectExpr("query_id", "qd",
                           _norm_fold("qd") + " AS qn"))
    # broadcast the QUERY side and stream the corpus (the r5 plan
    # broadcast the corpus and streamed the 1/50 query slice, leaving the
    # O(n*m) pair stage at the query scan's parallelism: 2 tasks on 32
    # cores at sf1.0); the corpus side is round-robin-spread first because
    # the embeddings table is a single small parquet file = 1-2 scan
    # splits, and the pair stage's cost is per-PAIR, not per-byte
    # (scale-adaptive width: 2x defaultParallelism, never hard-coded)
    n_parts = spark.sparkContext.defaultParallelism * 2
    corpus = (emb.repartition(n_parts)
              .selectExpr("vec_id AS neighbor_id",
                          "cast(embedding as array<double>) AS nd")
              .selectExpr("neighbor_id", "nd",
                          _norm_fold("nd") + " AS nn"))
    pairs = (F.broadcast(queries).crossJoin(corpus)
             .where("query_id <> neighbor_id")
             .selectExpr("query_id", "neighbor_id",
                         "round((%s) / (qn * nn), 4) AS cosine"
                         % _dot_unrolled("qd", "nd")))
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


#: IVF coarse-quantizer parameters: K deterministic seed centroids
#: (Forgy init: the K lowest-vec_id vectors), assignment by max rounded
#: cosine with centroid-id tie-break; queries probe the NPROBE nearest
#: centroid cells (classic multi-probe IVF recall lever)
N_CENTROIDS = 8
NPROBE = 2


def _ivf_assign(emb, centroids, n_probe: int):
    """(vec_id, cid) for each vector's n_probe nearest centroids — a
    COMPUTED quantizer assignment (r2 verdict: the stored label column
    was a stand-in). K is tiny, so the n x K scoring join is broadcast;
    the rounded cosine + cid tie-break keeps both engines bit-aligned.
    r6: scoring unrolled into codegen with per-side factored norms
    (value-identical to the _COS fold it replaces, see _dot_unrolled)."""
    from . import widen_narrow_scan

    cent = (centroids
            .selectExpr("cid", "cast(ce as array<double>) AS cd")
            .selectExpr("cid", "cd",
                        _norm_fold("cd") + " AS cn"))
    scored = (widen_narrow_scan(emb)
              .selectExpr("vec_id",
                          "cast(embedding as array<double>) AS qd")
              .selectExpr("vec_id", "qd",
                          _norm_fold("qd") + " AS qn")
              .join(F.broadcast(cent), F.lit(True))
              .selectExpr("vec_id", "cid",
                          "round((%s) / (qn * cn), 4) AS ccos"
                          % _dot_unrolled("qd", "cd")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    return (scored.withColumn("crank", F.row_number().over(w))
            .where(F.col("crank") <= n_probe)
            .select("vec_id", "cid"))


def ann_bucketed_topk(spark, sf_dir):
    """IVF-style ANN: corpus vectors live in their nearest centroid's
    cell; each query probes its NPROBE nearest cells and exact cosine
    reranks inside them. Turns the n*m cross join into
    sum-over-probed-cells(n_cell * m) — the scale path when sign-LSH's
    bucket granularity is too coarse. Recall vs brute force is measured
    in BENCH/ANN_RECALL.md."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = (emb.where(F.col("vec_id") < N_CENTROIDS)
                 .selectExpr("vec_id AS cid", "embedding AS ce"))
    corpus_cells = _ivf_assign(emb, centroids, 1)
    query_cells = (_ivf_assign(emb.where("vec_id % 50 = 0"),
                               centroids, NPROBE)
                   .withColumnRenamed("vec_id", "query_id"))
    qv = emb.selectExpr("vec_id AS query_id", "embedding AS qe",
                        _norm_fold("embedding") + " AS qn")
    nv = emb.selectExpr("vec_id AS neighbor_id", "embedding AS ne",
                        _norm_fold("embedding") + " AS nn")
    # no .distinct() needed (r6): corpus_cells carries crank=1 rows only
    # (exactly ONE cell per corpus vector, ties broken deterministically)
    # and query_cells probes n_probe DISTINCT cells, so a (query_id,
    # neighbor_id) pair can match on at most one cid — the candidate set
    # is duplicate-free by construction and the oracle's SELECT DISTINCT
    # is an identity over it; dropping the operator removes a full
    # shuffle+aggregate of the candidate relation.
    cand = (query_cells.join(corpus_cells, "cid")
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
            .where("query_id <> neighbor_id"))
    # SHUFFLE_HASH on the per-vector sides (r6): the rerank attaches ~n
    # rows of vectors to |cand| candidate rows; a shuffled-hash build of
    # the small side skips sort-merge's sort of the candidate relation
    # twice, and stays scale-safe (the build side is a per-partition
    # slice of the vector relation, guide §3.1)
    pairs = (cand.join(qv.hint("SHUFFLE_HASH"), "query_id")
             .join(nv.hint("SHUFFLE_HASH"), "neighbor_id")
             .selectExpr("query_id", "neighbor_id",
                         "round((%s) / (qn * nn), 4) AS cosine"
                         % _dot_cast("qe", "ne")))
    return _ranked(pairs)


_IVF_ASSIGN_SQL = """
  centroids AS (
    SELECT vec_id AS cid, embedding AS ce FROM embeddings
    WHERE vec_id < {k}
  ),
  scored AS (
    SELECT e.vec_id, c.cid,
           ROUND(list_dot_product(e.embedding::DOUBLE[], c.ce::DOUBLE[]) /
                 (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]))),
                 4) AS ccos
    FROM embeddings e CROSS JOIN centroids c
  ),
  assigned AS (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid ASC) AS crank
    FROM scored
  )""".format(k=N_CENTROIDS)


ANN_BUCKETED_SQL = """
WITH {assign},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM assigned q JOIN assigned c
    ON q.cid = c.cid AND c.crank = 1
  WHERE q.vec_id %% 50 = 0 AND q.crank <= {np}
    AND q.vec_id <> c.vec_id
),
pairs AS (
  SELECT query_id, neighbor_id,
         ROUND(list_dot_product(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(n.embedding::DOUBLE[],
                                      n.embedding::DOUBLE[]))), 4) AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = query_id
  JOIN embeddings n ON n.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
""".format(assign=_IVF_ASSIGN_SQL, np=NPROBE).replace("%%", "%")


#: random-hyperplane LSH parameters: N_BANDS_LSH independent hash tables
#: (OR-construction for recall), each bucketing on N_PLANES sign bits
N_PLANES = 6
N_BANDS_LSH = 3


def _plane(t: int, p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (band t, plane p): component
    d is the first hex digit of md5('t#p#d') shifted to [-7.5, +7.5].
    Emitted as LITERAL vectors into both engines' plans, so the signature
    is a per-row projection — no explode, no shuffle, no per-row hashing."""
    import hashlib
    return [int(hashlib.md5(("%d#%d#%d" % (t, p, d)).encode())
                .hexdigest()[0], 16) + 1 - 8.5 for d in range(EMB_DIM)]


def _bucket_expr_spark(t: int, n_planes: int = N_PLANES) -> str:
    """bigint bucket id for band t: sign bits of n_planes literal-plane
    dot products, each computed by a zip_with/aggregate fold.

    Deliberately NOT unrolled (r6): all bands' buckets evaluate inside
    one Generate/Project method, and 18 unrolled 64-term dots blew the
    JVM 64 KB method limit — whole-stage codegen then falls back to
    interpreted for the WHOLE operator, a strict loss. The fold is
    row-bound (n rows, not n^2 pairs), so its interpreted cost is
    negligible; only the pair-bound cosines are unrolled."""
    bits = []
    for p in range(n_planes):
        lit = "array(%s)" % ", ".join(
            repr(x) + "D" for x in _plane(t, p))
        dot = ("aggregate(zip_with(cast(embedding as array<double>), %s,"
               " (x, y) -> x * y), 0D, (a, x) -> a + x)" % lit)
        bits.append("cast(%s > 0 as bigint) * %d" % (dot, 1 << p))
    return " + ".join(bits)


def _bucket_expr_duck(t: int, n_planes: int = N_PLANES) -> str:
    bits = []
    for p in range(n_planes):
        lit = "[%s]" % ", ".join(repr(x) for x in _plane(t, p))
        dot = "list_dot_product(embedding::DOUBLE[], %s)" % lit
        bits.append("CASE WHEN %s > 0 THEN %d ELSE 0 END" % (dot, 1 << p))
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


#: near-dup blocking: 6 OR'd bands of 3 sign bits each — at cosine 0.8 the
#: per-plane agreement is ~0.795, so a pair survives >= 1 band with
#: p = 1 - (1 - 0.795^3)^6 ~ 0.985; each (label, band, bucket) block is
#: label-population / 2^3, bounded by construction
ND_PLANES = 3
ND_BANDS = 6
_ND_BAND_OFFSET = 100  # decorrelate from the ANN plane family


def embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: candidates must share a
    (label, band, bucket) sign-LSH block — label alone is unbounded in a
    real corpus (one hot label => quadratic pairs); the sign-bucket second
    key bounds every block at label_count / 2^ND_PLANES per band.

    The synthetic corpus has no natural cosine>=0.8 pairs (max within-label
    cosine ~0.47), which made the r2 gate vacuously green on 0=0 rows
    (ADVICE r2). Like dedup_exact's injected duplicates, every 50th vector
    is re-emitted under vec_id+1000000 perturbed by +0.1 element-wise —
    pure float arithmetic, bit-identical across engines — planting pairs
    whose cosines straddle the threshold (~0.67..0.86), so the gate now
    exercises blocking, verification, AND the threshold filter."""
    emb = (table(spark, sf_dir, "embeddings")
           .select("vec_id", "label", "embedding"))
    planted = emb.where("vec_id % 50 = 0").selectExpr(
        "vec_id + 1000000 AS vec_id", "label",
        "cast(transform(cast(embedding as array<double>), x -> x + 0.1)"
        " as array<float>) AS embedding")
    return _neardup_pairs(emb.unionAll(planted))


def _neardup_pairs(emb):
    keyed = emb.select(
        "vec_id", "label", "embedding",
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("band"),
                F.expr(_bucket_expr_spark(_ND_BAND_OFFSET + t, ND_PLANES))
                .alias("bucket"))
            for t in range(ND_BANDS)])).alias("bb")
    ).select("vec_id", "label", "embedding", "bb.band", "bb.bucket")
    a = keyed.selectExpr("vec_id AS id_a", "label AS la",
                         "embedding AS qe", "band", "bucket")
    b = keyed.selectExpr("vec_id AS id_b", "label AS lb",
                         "embedding AS ne", "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .where((F.col("la") == F.col("lb"))
                   & (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b", "qe", "ne")
            .dropDuplicates(["id_a", "id_b"]))
    # stays on the interpreted _COS fold (r6): the threshold filter on the
    # computed cosine is substituted into the pushed-down predicate, so an
    # unrolled expression appears TWICE in one codegen method and blows
    # the 64 KB limit (whole-operator interpreted fallback — worse than
    # the fold). Candidates here are block-bounded and tiny; per-pair cost
    # is not this query's shape.
    return (cand.selectExpr("id_a", "id_b", _COS + " AS cosine")
            .where("cosine >= 0.8"))


def _nd_bands_duck():
    return "\n    UNION ALL\n    ".join(
        "SELECT vec_id, label, embedding, %d AS band, %s AS bucket"
        " FROM emb_aug"
        % (t, _bucket_expr_duck(_ND_BAND_OFFSET + t, ND_PLANES))
        for t in range(ND_BANDS))


EMBEDDING_NEARDUP_SQL = """
WITH emb_aug AS (
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, label,
         list_transform(embedding::DOUBLE[], x -> x + 0.1)::FLOAT[]
           AS embedding
  FROM embeddings WHERE vec_id % 50 = 0
),
keyed AS (
    {bands}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keyed a JOIN keyed b
    ON a.band = b.band AND a.bucket = b.bucket
   AND a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             4) AS cosine
FROM cand
JOIN emb_aug a ON a.vec_id = id_a
JOIN emb_aug b ON b.vec_id = id_b
WHERE ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
            (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
            4) >= 0.8
""".format(bands=_nd_bands_duck())


def ann_lsh_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN with OR-construction: N_BANDS_LSH
    independent tables, each assigning an N_PLANES-bit sign bucket; probes
    search the union of their buckets, exact cosine reranks.

    Scale shape: the signature stage is a pure per-row projection
    (literal plane vectors folded with zip_with/aggregate — n rows in, n
    rows out, no explode/shuffle); candidate generation is a hash join on
    (band, bucket) with population ~ n/2^N_PLANES per bucket per band."""
    from . import widen_narrow_scan

    # r6: the scan is widened before the 18 per-row bucket folds (they
    # previously ran on the 1-2-split scan, twice — once per join
    # branch) and the per-vector norm is factored out before the explode
    # (see _dot_cast's method-size note). Vectors stay CARRIED through
    # the candidate dedup: an ids-only dedup + re-attach join variant
    # was A/B'd warm-equal at sf1.0 (1.7 s both) but compiles more
    # generated classes, and the suite pays each query's codegen cold.
    base = (widen_narrow_scan(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
        .selectExpr("vec_id", "embedding",
                    _norm_fold("embedding") + " AS nrm"))
    keyed = base.select(
        "vec_id", "embedding", "nrm",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("band"),
                     F.expr(_bucket_expr_spark(t)).alias("bucket"))
            for t in range(N_BANDS_LSH)])).alias("bb")
    ).select("vec_id", "embedding", "nrm", "bb.band", "bb.bucket")
    queries = keyed.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS qe", "nrm AS qn",
        "band", "bucket")
    corpus = keyed.selectExpr(
        "vec_id AS neighbor_id", "embedding AS ne", "nrm AS nn",
        "band", "bucket")
    cand = (queries.join(corpus, ["band", "bucket"])
            .where("query_id <> neighbor_id")
            .select("query_id", "neighbor_id", "qe", "ne", "qn", "nn")
            .dropDuplicates(["query_id", "neighbor_id"]))
    pairs = cand.selectExpr("query_id", "neighbor_id",
                            "round((%s) / (qn * nn), 4) AS cosine"
                            % _dot_cast("qe", "ne"))
    return _ranked(pairs)


def _lsh_bands_duck():
    return "\n    UNION ALL\n    ".join(
        "SELECT vec_id, embedding, %d AS band, %s AS bucket FROM embeddings"
        % (t, _bucket_expr_duck(t)) for t in range(N_BANDS_LSH))


ANN_LSH_SQL = """
WITH keyed AS (
    {bands}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM keyed q JOIN keyed c ON q.band = c.band AND q.bucket = c.bucket
  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
),
pairs AS (
  SELECT query_id, neighbor_id,
         ROUND(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               4) AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = query_id
  JOIN embeddings c ON c.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
""".format(bands=_lsh_bands_duck())


QUERIES = {
    "ann_cosine_topk": QuerySpec(ann_cosine_topk, ANN_TOPK_SQL),
    "ann_bucketed_topk": QuerySpec(ann_bucketed_topk, ANN_BUCKETED_SQL),
    "ann_lsh_topk": QuerySpec(ann_lsh_topk, ANN_LSH_SQL),
    "embedding_neardup": QuerySpec(embedding_neardup, EMBEDDING_NEARDUP_SQL),
}
