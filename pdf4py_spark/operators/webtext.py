"""Web-corpus operators: URL canonicalization and domain rollups — the
crawl-side half of a Common-Crawl-style pipeline (the extraction kernel
is the content-side half).

The documents table has no realistic URLs, so a deterministic MESSY url
is synthesized per doc (mixed-case scheme/host, default and non-default
ports, unsorted query params, fragments) by a pure expression mirrored
in the oracle. The NORMALIZATION itself is generic string algebra over
that url column only — it never peeks at doc_id — so the gate exercises
the actual canonicalization rules:

* scheme and host lowercased
* default ports stripped (:80 on http, :443 on https), others kept
* fragment dropped
* query parameters sorted bytewise
* empty path canonicalized to '/'

Registrable-domain extraction runs the real Public Suffix List
algorithm (operators.psl — longest-match with wildcard and exception
rules, over a vendored snapshot subset of the rule set; the full ~9k
rule list drops into PSL_RULES unchanged). The synthetic host suffixes
include co.uk / com.au / github.io so the gate exercises multi-label
public suffixes, and both engines evaluate rule predicates generated
from the same rule table.

Everything here is whole-stage-codegen Catalyst (regexp/string/array
expressions, one hash aggregate for the rollup): no kernel, no UDF, no
shuffle beyond the rollup's own groupBy — the PSL compiles to IN-set
predicates, the expression analog of a broadcast dim join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import QuerySpec, table
from .psl import registrable_domain, registrable_domain_sql

#: deterministic messy-url synthesis (Spark side; oracle mirrors in SQL)
_RAW_URL = (
    "concat("
    " element_at(array('HTTPS', 'http', 'Http'),"
    "            cast(doc_id % 3 as int) + 1),"
    " '://WWW.Site', cast(doc_id % 97 as string),"
    " element_at(array('.Example.COM', '.Test.ORG', '.Mirror.NET',"
    "                  '.Archive.ORG', '.Corpus.IO', '.Crawl.DEV',"
    "                  '.Pages.COM', '.Shop.CO.UK', '.Press.COM.AU',"
    "                  '.App.GitHub.IO'),"
    "            cast(doc_id % 10 as int) + 1),"
    " element_at(array(':80', ':443', ':8080', ''),"
    "            cast(doc_id % 4 as int) + 1),"
    " '/Docs/', cast(doc_id as string),"
    " element_at(array('?z=26&a=1&m=13', '?a=1'),"
    "            cast(doc_id % 2 as int) + 1),"
    " element_at(array('#Section-2', '', '', '', ''),"
    "            cast(doc_id % 5 as int) + 1))"
)


def _with_canonical(df):
    """Generic canonicalization of a ``url`` string column."""
    scheme = F.lower(F.regexp_extract(
        "url", r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(
        "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(auth, r":[0-9]+$", "")
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    path = F.regexp_extract(
        "url", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # strip the fragment FIRST so a '?' inside the fragment can never be
    # mistaken for a query separator (review finding: '/x#f?b=1' must
    # canonicalize to '/x', not '/x?b=1')
    pre_frag = F.regexp_replace("url", r"#.*$", "")
    query = F.regexp_extract(pre_frag, r"\?([^#]*)", 1)
    qnorm = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"),
                 F.array_join(F.array_sort(F.split(query, "&")), "&")))
    return (df
            .withColumn("canonical_url", F.concat(
                scheme, F.lit("://"), host,
                F.when(keep_port, F.concat(F.lit(":"), port))
                .otherwise(F.lit("")),
                path, qnorm))
            .withColumn("host", host)
            .withColumn("path", path)
            .withColumn("domain", registrable_domain(host)))


def url_canonicalize(spark, sf_dir):
    """Canonical URL per document; the dedup key a crawl pipeline groups
    snapshots by. Pure projection — zero shuffles."""
    docs = table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", F.expr(_RAW_URL).alias("url"))
    return _with_canonical(urls).select(
        "doc_id", "url", "canonical_url", "host", "domain")


_RAW_URL_SQL = """
  (['HTTPS', 'http', 'Http'][CAST(doc_id % 3 AS INT) + 1])
  || '://WWW.Site' || CAST(doc_id % 97 AS VARCHAR)
  || (['.Example.COM', '.Test.ORG', '.Mirror.NET', '.Archive.ORG',
       '.Corpus.IO', '.Crawl.DEV', '.Pages.COM', '.Shop.CO.UK',
       '.Press.COM.AU', '.App.GitHub.IO']
        [CAST(doc_id % 10 AS INT) + 1])
  || ([':80', ':443', ':8080', ''][CAST(doc_id % 4 AS INT) + 1])
  || '/Docs/' || CAST(doc_id AS VARCHAR)
  || (['?z=26&a=1&m=13', '?a=1'][CAST(doc_id % 2 AS INT) + 1])
  || (['#Section-2', '', '', '', ''][CAST(doc_id % 5 AS INT) + 1])
"""

#: shared canonicalization CTE chain (raw -> parts -> norm -> canon);
#: both URL_CANON_SQL and URL_FILTER_SQL are built on it so a rule
#: change lands in ONE place (review finding: the chain was duplicated)
_CANON_CTES = """
WITH raw AS (
  SELECT doc_id, {raw_url} AS url FROM documents
),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
         regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
         regexp_extract(regexp_replace(url, '#.*$', ''),
               '\\?([^#]*)', 1) AS query0
  FROM raw
),
norm AS (
  SELECT doc_id, url, scheme,
         regexp_replace(auth, ':[0-9]+$', '') AS host,
         regexp_extract(auth, ':([0-9]+)$', 1) AS port,
         CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
         CASE WHEN query0 = '' THEN ''
              ELSE '?' || array_to_string(
                     list_sort(string_split(query0, '&')), '&') END AS q
  FROM parts
),
canon AS (
  SELECT doc_id, url,
         scheme || '://' || host ||
         CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                    OR (scheme = 'https' AND port = '443'))
              THEN ':' || port ELSE '' END || path || q AS canonical_url,
         host, path,
         {domain} AS domain
  FROM (SELECT *, string_split(host, '.') AS labs FROM norm)
)
"""

URL_CANON_SQL = (_CANON_CTES + """
SELECT doc_id, url, canonical_url, host, domain FROM canon
""").format(raw_url=_RAW_URL_SQL, domain=registrable_domain_sql("labs"))


def domain_rollup(spark, sf_dir):
    """Crawl accounting per registrable domain: page and distinct-host
    counts plus text volume. ONE hash aggregate (map-side combinable;
    count distinct expands to the standard two-phase plan) — the shape
    that survives a 10^12-page crawl because domain cardinality is
    millions, not trillions."""
    docs = table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", "text",
                       F.expr(_RAW_URL).alias("url"))
    return (_with_canonical(urls)
            .groupBy("domain")
            .agg(F.count("*").alias("n_pages"),
                 F.countDistinct("host").alias("n_hosts"),
                 F.sum(F.octet_length("text").cast("bigint"))
                 .cast("bigint").alias("text_bytes")))


DOMAIN_ROLLUP_SQL = """
WITH raw AS (
  SELECT doc_id, text, {raw_url} AS url FROM documents
),
hosts AS (
  SELECT doc_id, text,
         regexp_replace(lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
             ':[0-9]+$', '') AS host
  FROM raw
)
SELECT {domain} AS domain,
       COUNT(*) AS n_pages,
       COUNT(DISTINCT host) AS n_hosts,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS text_bytes
FROM (SELECT *, string_split(host, '.') AS labs FROM hosts) GROUP BY 1
""".format(raw_url=_RAW_URL_SQL,
           domain=registrable_domain_sql("labs"))


#: crawl blocklist dim (deterministic fixture; production loads a real
#: policy table): registrable domain + path prefix ('' blocks the whole
#: domain). Chosen to hit the synthetic corpus: mirror.net entirely,
#: plus one path slice of crawl.dev.
BLOCKLIST = (
    ("mirror.net", ""),
    ("crawl.dev", "/Docs/1"),
    ("spam.example", ""),          # exercises a no-match rule
)


def url_filter_blocklist(spark, sf_dir):
    """Crawl-policy filtering: canonicalized URLs against a broadcast
    (registrable_domain, path_prefix) blocklist — the fetch-policy /
    takedown filter every crawl pipeline runs before extraction. The
    blocklist is a tiny dim: broadcast hash join on the PSL registrable
    domain, then a starts_with prefix test — no shuffle of the corpus
    side beyond the scan, works unchanged at 10^12 rows because the
    policy table stays broadcastable."""
    docs = table(spark, sf_dir, "documents")
    urls = _with_canonical(
        docs.select("doc_id", F.expr(_RAW_URL).alias("url")))
    rules = spark.createDataFrame(
        list(BLOCKLIST), "domain string, path_prefix string")
    hits = (urls
            .join(F.broadcast(rules), "domain", "left")
            .withColumn("hit", F.col("path_prefix").isNotNull()
                        & F.col("path").startswith(F.col("path_prefix")))
            .groupBy("doc_id", "canonical_url", "domain")
            .agg(F.max(F.col("hit").cast("int")).alias("blocked_i")))
    return hits.select(
        "doc_id", "canonical_url", "domain",
        (F.col("blocked_i") == 1).alias("blocked"))


def _blocklist_values_sql():
    rows = ", ".join("('%s', '%s')" % (d, p) for d, p in BLOCKLIST)
    return "(VALUES %s) AS bl(domain, path_prefix)" % rows


URL_FILTER_SQL = (_CANON_CTES + """
SELECT doc_id, canonical_url, canon.domain AS domain,
       MAX(CASE WHEN bl.path_prefix IS NOT NULL
                 AND starts_with(path, bl.path_prefix)
            THEN 1 ELSE 0 END) = 1 AS blocked
FROM canon LEFT JOIN {bl} ON canon.domain = bl.domain
GROUP BY doc_id, canonical_url, canon.domain
""").format(raw_url=_RAW_URL_SQL, domain=registrable_domain_sql("labs"),
            bl=_blocklist_values_sql())


def corpus_split(spark, sf_dir):
    """Deterministic train/val/test assignment + sample flag — the
    reproducibility staple: bucket = first 16 bits of md5(doc_id) mod
    1000, split 80/10/10, plus a 10% sample flag from the same bucket.
    Content-addressed (hash of the id, not row position), so assignment
    is stable under repartitioning, re-runs, and corpus growth — the
    property rand()/monotonically_increasing_id cannot give. Pure
    projection: zero shuffles at any scale."""
    docs = table(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                 1, 4), 16, 10)
              .cast("int") % 1000)
    return docs.select(
        "doc_id", "source",
        bucket.alias("bucket"),
        F.when(bucket < 800, "train").when(bucket < 900, "val")
        .otherwise("test").alias("split"),
        (bucket < 100).alias("in_10pct_sample"))


CORPUS_SPLIT_SQL = """
WITH b AS (
  SELECT doc_id, source,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS INTEGER) % 1000 AS bucket
  FROM documents
)
SELECT doc_id, source, bucket,
       CASE WHEN bucket < 800 THEN 'train'
            WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
       bucket < 100 AS in_10pct_sample
FROM b
"""


QUERIES = {
    "url_canonicalize": QuerySpec(url_canonicalize, URL_CANON_SQL),
    "url_filter_blocklist": QuerySpec(url_filter_blocklist,
                                      URL_FILTER_SQL),
    "domain_rollup": QuerySpec(domain_rollup, DOMAIN_ROLLUP_SQL),
    "corpus_split": QuerySpec(corpus_split, CORPUS_SPLIT_SQL),
}
