"""Corpus-assembly operators: the step between a cleaned corpus and a
training run — sequence packing accounting, source mixture weighting,
and PII scrubbing.

Scale shapes:
* sequence_pack — ONE window shuffle partitioned by source (shards pack
  independently, so parallelism = shard count; no global ordering, which
  would serialize at any real scale)
* source_mixture — one hash aggregate to source cardinality (tiny), then
  window algebra over that aggregated relation (rows = #sources)
* pii_scrub — pure per-row regexp codegen, zero shuffles

Cross-engine determinism: counts are exact int64; the mixture ratios are
SINGLE IEEE operations on identical operands in both engines (no
rounding, per the ROUND discipline in operators/__init__), and the
scrubbed text is pinned by md5.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import QuerySpec, table

#: training context length for the concat-and-chunk packing accounting
CTX_LEN = 256


def sequence_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing accounting (the GPT-style
    pretraining layout): within each source shard, documents are laid
    end to end in doc_id order and cut into CTX_LEN-token sequences.
    Emits, per document, its token count, the tokens laid before it,
    and the first/last sequence index it lands in (a document may span
    sequences). Packing is PER SOURCE on purpose: a global order would
    funnel the corpus through one partition; per-shard packing is what
    distributed loaders do."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " "))
        .cast("bigint").alias("n_tokens"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    out = docs.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return out.select(
        "doc_id", "source", "n_tokens", "cum_before",
        F.floor(F.col("cum_before") / CTX_LEN).alias("seq_first"),
        F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / CTX_LEN)
        .alias("seq_last"))


SEQUENCE_PACK_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  -- CAST: SUM(BIGINT) OVER is HUGEINT in DuckDB, which the pandas
  -- fetch path renders as float64 (fetch-stability rule)
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tokens, cum_before,
       CAST(FLOOR(cum_before / {ctx}) AS BIGINT) AS seq_first,
       CAST(FLOOR((cum_before + n_tokens - 1) / {ctx}) AS BIGINT)
         AS seq_last
FROM c
""".format(ctx="%d.0" % CTX_LEN)


def source_mixture(spark, sf_dir):
    """Mixture weighting for multi-source training (the DoReMi-style
    accounting layer): per source, document/token counts, the actual
    token share, a deterministic target weight (proportional to the
    source index + 1, normalized), and the sampling factor
    (target/actual) a weighted loader would apply. One aggregate to
    source cardinality; the window algebra runs over that tiny
    aggregated relation. Ratios are single IEEE divisions of exact
    int64 operands — no rounding, bit-identical cross-engine."""
    docs = table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " "))
        .cast("bigint").alias("n_tokens"))
    agg = (docs.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens")))
    # total over ANY source naming: no trailing digits -> index 0
    # (Spark casts '' to NULL, DuckDB CAST('') throws — NULLIF+COALESCE
    # makes both engines agree; review round 5)
    agg = agg.withColumn(
        "target_raw",
        F.coalesce(F.nullif(F.regexp_extract("source", r"(\d+)$", 1),
                            F.lit("")).cast("bigint"),
                   F.lit(0)) + 1)
    w = Window.partitionBy()
    return (agg
            .withColumn("total_tokens", F.sum("n_tokens").over(w))
            .withColumn("total_target", F.sum("target_raw").over(w))
            .select(
                "source", "n_docs", "n_tokens",
                (F.col("n_tokens") / F.col("total_tokens"))
                .alias("token_share"),
                (F.col("target_raw") / F.col("total_target"))
                .alias("target_weight"),
                ((F.col("target_raw") * F.col("total_tokens"))
                 / (F.col("total_target") * F.col("n_tokens")))
                .alias("sampling_factor")))


SOURCE_MIXTURE_SQL = """
WITH agg AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(COALESCE(NULLIF(regexp_extract(source, '(\\d+)$', 1), ''),
                       '0') AS BIGINT) + 1
           AS target_raw
  FROM documents GROUP BY source
),
tot AS (
  SELECT source, n_docs, n_tokens, target_raw,
         SUM(n_tokens) OVER () AS total_tokens,
         SUM(target_raw) OVER () AS total_target
  FROM agg
)
SELECT source, n_docs, n_tokens,
       n_tokens / CAST(total_tokens AS DOUBLE) AS token_share,
       target_raw / CAST(total_target AS DOUBLE) AS target_weight,
       (target_raw * total_tokens)
         / CAST(total_target * n_tokens AS DOUBLE) AS sampling_factor
FROM tot
"""


# --- PII scrubbing -----------------------------------------------------------------

#: deterministic PII injection (the documents table is synthetic and
#: clean, so the operator's input plants known PII the same way the
#: webtext module synthesizes urls — both engines build the identical
#: string); the SCRUB rules below are the real operator
_PII_TEXT = (
    "concat(text,"
    " case when doc_id % 3 = 0 then"
    "   concat(' contact user', cast(doc_id as string),"
    "          '@example.com now') else '' end,"
    " case when doc_id % 5 = 0 then"
    "   concat(' from 10.0.', cast(doc_id % 256 as string), '.7') "
    "   else '' end,"
    " case when doc_id % 7 = 0 then"
    "   concat(' call +1555', cast(1000000 + doc_id % 1000000"
    "          as string)) else '' end)"
)

#: scrub patterns (applied in order; plain regex — no lookarounds, so
#: Java (Spark) and RE2 (DuckDB) semantics agree)
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE = "\\+[0-9]{7,15}"


def pii_scrub(spark, sf_dir):
    """PII redaction accounting: emails, IPv4 literals, and +intl phone
    numbers replaced by typed placeholder tokens; emits per-doc match
    counts and the md5 of the scrubbed text (the cross-engine pin that
    the replacement — not just the count — is identical). Pure per-row
    regexp codegen: zero shuffles at any scale."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_TEXT).alias("t"))
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", PII_EMAIL, "<EMAIL>"),
            PII_IP, "<IP>"),
        PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count("t", F.lit(PII_EMAIL)).cast("bigint")
        .alias("n_emails"),
        F.regexp_count("t", F.lit(PII_IP)).cast("bigint").alias("n_ips"),
        F.regexp_count("t", F.lit(PII_PHONE)).cast("bigint")
        .alias("n_phones"),
        F.md5(F.encode(scrub, "utf-8")).alias("scrubbed_md5"))


_PII_TEXT_SQL = """
  text
  || CASE WHEN doc_id % 3 = 0 THEN
       ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
     ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN
       ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
     ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN
       ' call +1555' || CAST(1000000 + doc_id % 1000000 AS VARCHAR)
     ELSE '' END
"""

PII_SCRUB_SQL = """
WITH t AS (
  SELECT doc_id, {pii_text} AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{ip}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{phone}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '{email}', '<EMAIL>', 'g'),
           '{ip}', '<IP>', 'g'),
           '{phone}', '<PHONE>', 'g')) AS scrubbed_md5
FROM t
""".format(pii_text=_PII_TEXT_SQL,
           # DuckDB string literals keep backslashes as-is (no escape
           # processing), so the patterns are inserted verbatim
           email=PII_EMAIL, ip=PII_IP, phone=PII_PHONE)


QUERIES = {
    "sequence_pack": QuerySpec(sequence_pack, SEQUENCE_PACK_SQL),
    "source_mixture": QuerySpec(source_mixture, SOURCE_MIXTURE_SQL),
    "pii_scrub": QuerySpec(pii_scrub, PII_SCRUB_SQL),
}
