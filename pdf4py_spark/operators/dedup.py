"""Deduplication operators over the ``documents`` table.

Four families, all fully relational (JVM-side, shuffle-bounded):

* exact        — hash-groupBy on content digest
* minhash_lsh  — shingle -> minhash signature -> banded buckets ->
                 candidate pairs -> exact-Jaccard verification
* simhash      — 16-bit bitwise-majority fingerprint from token digests
* ngram_jaccard— word-trigram Jaccard inside natural blocking keys

Cross-engine determinism: md5 is the shared hash; all ratios rounded.
At 100 TB the LSH path is the scale story: candidate generation cost is
(band-bucket sizes choose 2), never n^2, and every stage is a hash
shuffle on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import QuerySpec, table

N_SEEDS = 8
N_BANDS = 2  # 2 bands x 4 rows: candidates must agree on 4 minhashes
ROWS_PER_BAND = N_SEEDS // N_BANDS


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


# --- exact dedup -----------------------------------------------------------

def dedup_exact(spark, sf_dir):
    """Exact dedup over a corpus with injected duplicates (each doc
    re-emitted once under doc_id+1000000): one hash aggregate."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dupes = docs.select((F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
                        "text")
    both = docs.unionAll(dupes)
    return (both.groupBy(F.md5("text").alias("text_hash"))
            .agg(F.min("doc_id").alias("canonical_id"),
                 F.count("*").alias("n_copies")))


DEDUP_EXACT_SQL = """
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
)
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM unioned GROUP BY md5(text)
"""


# --- minhash + LSH ----------------------------------------------------------

def _minhash_signature(docs):
    """(doc_id, seed, mh): min over distinct tokens of md5(token#seed)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
    seeded = toks.withColumn(
        "seed", F.explode(F.expr("sequence(0, %d)" % (N_SEEDS - 1))))
    return (seeded.groupBy("doc_id", "seed")
            .agg(F.min(F.md5(F.concat_ws("#", "w", F.col("seed")
                                         .cast("string")))).alias("mh")))


def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    Pipeline: distinct tokens -> 8 minhashes -> 2 band keys (4 rows each)
    -> bucket self-join (a.doc_id < b.doc_id) -> distinct candidates ->
    token-join Jaccard -> keep >= 0.5.
    """
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    mh = _minhash_signature(docs)
    sig = mh.groupBy("doc_id").agg(*[
        F.min(F.when(F.col("seed") == s, F.col("mh"))).alias("mh%d" % s)
        for s in range(N_SEEDS)])
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[F.col("mh%d" % (b * ROWS_PER_BAND + r))
                                   for r in range(ROWS_PER_BAND)])
                .alias("key"))
            for b in range(N_BANDS)])).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    cand = (bands.alias("a").join(
        bands.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct())
    toksets = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
    sizes = toksets.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (cand
             .join(toksets.alias("ta"), F.col("ta.doc_id") == F.col("id_a"))
             .join(toksets.alias("tb"),
                   (F.col("tb.doc_id") == F.col("id_b"))
                   & (F.col("ta.w") == F.col("tb.w")))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("n_common")))
    return (inter
            .join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("id_a"))
            .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("id_b"))
            .select(
                "id_a", "id_b",
                F.round(F.col("n_common") /
                        (F.col("sa.n") + F.col("sb.n") - F.col("n_common")),
                        4).alias("jaccard"))
            .where(F.col("jaccard") >= 0.5))


def _minhash_sig_sql():
    mins = ",\n       ".join(
        "MIN(CASE WHEN seed = {s} THEN mh END) AS mh{s}".format(s=s)
        for s in range(N_SEEDS))
    return """
  tok AS (
    SELECT DISTINCT doc_id, w FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    )
  ),
  seeded AS (
    SELECT doc_id, w, unnest(generate_series(0, {top})) AS seed FROM tok
  ),
  mh AS (
    SELECT doc_id, seed, MIN(md5(w || '#' || CAST(seed AS VARCHAR))) AS mh
    FROM seeded GROUP BY doc_id, seed
  ),
  sig AS (
    SELECT doc_id, {mins} FROM mh GROUP BY doc_id
  )""".format(top=N_SEEDS - 1, mins=mins)


DEDUP_MINHASH_SQL = """
WITH {sig},
  bands AS (
    SELECT doc_id, 0 AS band, mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3 AS key FROM sig
    UNION ALL
    SELECT doc_id, 1 AS band, mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7 AS key FROM sig
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  ),
  sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
  inter AS (
    SELECT id_a, id_b, COUNT(*) AS n_common
    FROM cand
    JOIN tok ta ON ta.doc_id = id_a
    JOIN tok tb ON tb.doc_id = id_b AND ta.w = tb.w
    GROUP BY id_a, id_b
  )
SELECT id_a, id_b,
       ROUND(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(n_common / (sa.n + sb.n - n_common), 4) >= 0.5
""".format(sig=_minhash_sig_sql())


# --- simhash ------------------------------------------------------------------

def dedup_simhash(spark, sf_dir):
    """16-bit SimHash from the first 4 hex digits of each distinct token's
    md5: per bit, majority vote of +-1 contributions."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
    bits = (toks
            .withColumn("h", F.md5("w"))
            .withColumn("j", F.explode(F.expr("sequence(0, 3)")))
            .withColumn("d", F.expr(
                "position(substring(h, j + 1, 1) IN '0123456789abcdef') - 1"))
            .withColumn("k", F.explode(F.expr("sequence(0, 3)")))
            .withColumn("bitpos", F.col("j") * 4 + F.col("k"))
            .withColumn("contrib",
                        F.expr("(shiftright(d, 3 - k) & 1) * 2 - 1")))
    votes = bits.groupBy("doc_id", "bitpos").agg(
        F.sum("contrib").alias("s"))
    return (votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0,
                     F.expr("cast(pow(2, bitpos) as bigint)"))
              .otherwise(F.lit(0))).alias("simhash16"))
        .select("doc_id", "simhash16"))


DEDUP_SIMHASH_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  )
),
expanded AS (
  SELECT doc_id, md5(w) AS h,
         unnest(generate_series(0, 3)) AS j
  FROM tok
),
digits AS (
  SELECT doc_id, j, position(substring(h, j + 1, 1) IN '0123456789abcdef') - 1 AS d,
         unnest(generate_series(0, 3)) AS k
  FROM expanded
),
bits AS (
  SELECT doc_id, j * 4 + k AS bitpos,
         ((d >> (3 - k)) & 1) * 2 - 1 AS contrib
  FROM digits
),
votes AS (
  SELECT doc_id, bitpos, SUM(contrib) AS s FROM bits GROUP BY doc_id, bitpos
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(pow(2, bitpos) AS BIGINT)
                     ELSE 0 END) AS BIGINT)
         AS simhash16
FROM votes GROUP BY doc_id
"""


# --- n-gram jaccard --------------------------------------------------------------

def dedup_ngram_jaccard(spark, sf_dir):
    """Word-trigram Jaccard for document pairs inside natural blocking
    keys (same source), the classic blocked pairwise near-dup check."""
    docs = _docs(spark, sf_dir).where("size(split(text, ' ')) >= 3")
    tri = (docs.withColumn("toks", F.split("text", " "))
           .select(
               "doc_id", "source",
               F.explode(F.array_distinct(F.expr(
                   "transform(sequence(1, size(toks) - 2),"
                   " i -> concat_ws(' ', element_at(toks, i),"
                   " element_at(toks, i + 1),"
                   " element_at(toks, i + 2)))"))).alias("g")))
    sizes = tri.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (tri.alias("a").join(
        tri.alias("b"),
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"),
                 F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_common")))
    return (inter
            .join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("id_a"))
            .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("id_b"))
            .select("id_a", "id_b", "n_common",
                    F.round(F.col("n_common") /
                            (F.col("sa.n") + F.col("sb.n")
                             - F.col("n_common")), 4).alias("jaccard")))


DEDUP_NGRAM_SQL = """
WITH tri_raw AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           generate_series(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS g
  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents WHERE len(string_split(text, ' ')) >= 3)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri_raw GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM tri_raw a JOIN tri_raw b
    ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_common,
       ROUND(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
"""


QUERIES = {
    "dedup_exact": QuerySpec(dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_simhash": QuerySpec(dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, DEDUP_NGRAM_SQL),
}
