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
    from . import widen_narrow_scan

    docs = table(spark, sf_dir, "documents")
    urls = _with_canonical(
        widen_narrow_scan(docs.select("doc_id"))
        .select("doc_id", F.expr(_RAW_URL).alias("url")))
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


# --- HTML outlink extraction + crawl frontier (round 5) ----------------------------
#
# The HTML twin of the PDF outlink census (K50): anchor hrefs regex-
# extracted from the payload, relative links resolved against the page's
# own (lowercased) scheme+host, non-web schemes (mailto:, javascript:)
# dropped, target hosts reduced to PSL registrable domains. The frontier
# rollup is what a crawler feeds its scheduler: distinct external target
# domains with link/source counts. Whole plan is codegen + one explode +
# (for the frontier) one hash aggregate — no UDF, no kernel.

#: deterministic anchor-bearing HTML per document (oracle mirrors in SQL):
#: one absolute messy-case link, a conditional relative link, a mailto
#: (must be dropped), and a conditional second absolute to a co.uk host
_HTML_WRAP = (
    "concat("
    " '<html><body><p>', text, '</p>',"
    " '<a href=\"https://Partner', cast(doc_id % 7 as string),"
    " '.Example.COM/p/', cast(doc_id as string),"
    " '\">partner site ', cast(doc_id % 4 as string), '</a>',"
    " case when doc_id % 3 = 0 then"
    "   concat('<a href=\"/local/', cast(doc_id % 13 as string),"
    "          '\">see also</a>') else '' end,"
    " '<a href=\"mailto:user@example.com\">mail us</a>',"
    " case when doc_id % 2 = 0 then"
    "   concat('<a href=\"HTTP://News', cast(doc_id % 5 as string),"
    "          '.Shop.CO.UK/q\">breaking news</a>') else '' end,"
    " '</body></html>')"
)

_HREF_RE = r'<a href="([^"]+)"'


def outlinks_from(docs, extra_cols=()):
    """The outlink explode/resolve stage over any DataFrame carrying
    (doc_id, text) — BATCH OR STREAMING (every expression here is
    stateless, so the same plan drops into a readStream unchanged; the
    streaming leg operators.streaming_queries.frontier_stream does
    exactly that). ``extra_cols`` are carried through untouched (the
    streaming leg threads its event-time column)."""
    extra = list(extra_cols)
    raw = docs.select("doc_id", "text", *extra,
                      F.expr(_RAW_URL).alias("url"))
    pscheme = F.lower(F.regexp_extract(
        "url", r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    phost = F.regexp_replace(
        F.lower(F.regexp_extract(
            "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        r":[0-9]+$", "")
    pages = raw.select(
        "doc_id", *extra, pscheme.alias("pscheme"),
        phost.alias("phost"), F.expr(_HTML_WRAP).alias("html"))
    links = pages.select(
        "doc_id", *extra, "pscheme", "phost",
        F.explode(F.regexp_extract_all(
            "html", F.lit(_HREF_RE), 1)).alias("raw_link"))
    lscheme = F.lower(F.regexp_extract(
        "raw_link", r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    is_abs = lscheme.isin("http", "https")
    is_rel = F.col("raw_link").startswith("/")
    lhost = F.lower(F.regexp_extract(
        "raw_link", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    # port stripped SYMMETRICALLY with phost (review round 5: a ported
    # self-link must compare internal, and ':8080' must never reach the
    # PSL label split); resolved_url keeps the authority verbatim
    lhost_np = F.regexp_replace(lhost, r":[0-9]+$", "")
    rest = F.regexp_extract(
        "raw_link", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    target_host = F.when(is_abs, lhost_np).when(is_rel, F.col("phost"))
    resolved = (F.when(is_abs, F.concat(lscheme, F.lit("://"),
                                        lhost, rest))
                .when(is_rel, F.concat(F.col("pscheme"), F.lit("://"),
                                       F.col("phost"), F.col("raw_link"))))
    return (links
            .withColumn("target_host", target_host)
            .where(F.col("target_host").isNotNull())
            .select("doc_id", *extra, "raw_link",
                    resolved.alias("resolved_url"), "target_host",
                    registrable_domain(F.col("phost"))
                    .alias("src_domain"),
                    registrable_domain(F.col("target_host"))
                    .alias("target_domain"),
                    (F.col("target_host") == F.col("phost"))
                    .alias("is_internal")))


def _outlink_rows(spark, sf_dir):
    from . import widen_narrow_scan
    return outlinks_from(widen_narrow_scan(
        table(spark, sf_dir, "documents").select("doc_id", "text")))


def html_outlinks(spark, sf_dir):
    """Per-page outlink table: href extraction, relative-link
    resolution, scheme filtering, PSL target domain. Pure codegen +
    one explode — zero shuffles."""
    return _outlink_rows(spark, sf_dir).drop("src_domain")


def outlink_frontier(spark, sf_dir):
    """Crawl-frontier feed: EXTERNAL registrable target domains with
    link and distinct-source counts. One hash aggregate over the
    outlink explode; domain cardinality (millions) bounds the shuffle
    at any corpus scale."""
    return (_outlink_rows(spark, sf_dir)
            .where(~F.col("is_internal"))
            .groupBy("target_domain")
            .agg(F.count("*").alias("n_links"),
                 F.countDistinct("doc_id").alias("n_src_pages")))


_HTML_WRAP_SQL = """
  '<html><body><p>' || text || '</p>'
  || '<a href="https://Partner' || CAST(doc_id % 7 AS VARCHAR)
  || '.Example.COM/p/' || CAST(doc_id AS VARCHAR)
  || '">partner site ' || CAST(doc_id % 4 AS VARCHAR) || '</a>'
  || CASE WHEN doc_id % 3 = 0 THEN
       '<a href="/local/' || CAST(doc_id % 13 AS VARCHAR)
       || '">see also</a>'
     ELSE '' END
  || '<a href="mailto:user@example.com">mail us</a>'
  || CASE WHEN doc_id % 2 = 0 THEN
       '<a href="HTTP://News' || CAST(doc_id % 5 AS VARCHAR)
       || '.Shop.CO.UK/q">breaking news</a>'
     ELSE '' END
  || '</body></html>'
"""

_OUTLINK_CTES = """
WITH raw AS (
  SELECT doc_id, text, {raw_url} AS url FROM documents
),
page AS (
  SELECT doc_id, text,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS pscheme,
         regexp_replace(lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
             ':[0-9]+$', '') AS phost
  FROM raw
),
links AS (
  SELECT doc_id, pscheme, phost,
         unnest(regexp_extract_all({html_wrap},
                                   '<a href="([^"]+)"', 1)) AS raw_link
  FROM page
),
typed AS (
  SELECT doc_id, pscheme, phost, raw_link,
         lower(regexp_extract(raw_link,
               '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) AS lscheme,
         lower(regexp_extract(raw_link,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS lhost,
         regexp_extract(raw_link,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
  FROM links
),
resolved AS (
  SELECT doc_id, raw_link,
         CASE WHEN lscheme IN ('http', 'https')
              THEN lscheme || '://' || lhost || rest
              WHEN starts_with(raw_link, '/')
              THEN pscheme || '://' || phost || raw_link END
           AS resolved_url,
         -- port stripped symmetrically with phost (see the Spark twin)
         CASE WHEN lscheme IN ('http', 'https')
              THEN regexp_replace(lhost, ':[0-9]+$', '')
              WHEN starts_with(raw_link, '/') THEN phost END
           AS target_host,
         phost
  FROM typed
),
outlinks AS (
  SELECT doc_id, raw_link, resolved_url, target_host, phost,
         {domain} AS target_domain,
         target_host = phost AS is_internal
  FROM (SELECT *, string_split(target_host, '.') AS labs
        FROM resolved WHERE target_host IS NOT NULL)
)
"""

HTML_OUTLINKS_SQL = (_OUTLINK_CTES + """
SELECT doc_id, raw_link, resolved_url, target_host, target_domain,
       is_internal
FROM outlinks
""").format(raw_url=_RAW_URL_SQL, html_wrap=_HTML_WRAP_SQL,
            domain=registrable_domain_sql("labs"))

OUTLINK_FRONTIER_SQL = (_OUTLINK_CTES + """
SELECT target_domain, COUNT(*) AS n_links,
       COUNT(DISTINCT doc_id) AS n_src_pages
FROM outlinks WHERE NOT is_internal
GROUP BY target_domain
""").format(raw_url=_RAW_URL_SQL, html_wrap=_HTML_WRAP_SQL,
            domain=registrable_domain_sql("labs"))


# --- anchor-text rollup (round 5) --------------------------------------------------
#
# The OTHER crawl signal anchors carry: what linking pages CALL the
# target (anchor text feeds ranking features and query-independent
# document descriptions). Full <a> tags are exploded first, then href
# and text are extracted per tag — alignment-free by construction
# (zipping two separate extract-all lists would silently mispair when
# one regex matches a tag the other doesn't).

_ATAG_RE = r'<a href="[^"]+">[^<]*</a>'
_ATAG_HREF = r'<a href="([^"]+)">'
_ATAG_TEXT = r'>([^<]*)</a>'


def anchor_text_rollup(spark, sf_dir):
    """(target_domain, anchor_text) -> link count over EXTERNAL web
    links: tag explode -> per-tag href/text extracts -> resolution via
    the same scheme rules as the outlink stage -> one hash aggregate.
    Codegen + one explode + one shuffle at domain x phrase cardinality."""
    from . import widen_narrow_scan

    docs = widen_narrow_scan(
        table(spark, sf_dir, "documents").select("doc_id", "text"))
    raw = docs.select("doc_id", "text", F.expr(_RAW_URL).alias("url"))
    phost = F.regexp_replace(
        F.lower(F.regexp_extract(
            "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        r":[0-9]+$", "")
    tags = (raw.select("doc_id", phost.alias("phost"),
                       F.expr(_HTML_WRAP).alias("html"))
            .select("doc_id", "phost",
                    F.explode(F.regexp_extract_all(
                        "html", F.lit(_ATAG_RE), 0)).alias("tag")))
    href = F.regexp_extract("tag", _ATAG_HREF, 1)
    atext = F.regexp_extract("tag", _ATAG_TEXT, 1)
    lscheme = F.lower(F.regexp_extract(
        href, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    lhost = F.regexp_replace(          # port stripped like phost
        F.lower(F.regexp_extract(
            href, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        r":[0-9]+$", "")
    rows = (tags.select(
        "doc_id", atext.alias("anchor_text"),
        F.when(lscheme.isin("http", "https"), lhost).alias("thost"),
        "phost")
        .where(F.col("thost").isNotNull()
               & (F.col("thost") != F.col("phost"))))
    return (rows
            .select(registrable_domain(F.col("thost"))
                    .alias("target_domain"), "anchor_text")
            .groupBy("target_domain", "anchor_text")
            .agg(F.count("*").alias("n_links")))


ANCHOR_TEXT_SQL = """
WITH raw AS (
  SELECT doc_id, text, {raw_url} AS url FROM documents
),
page AS (
  SELECT doc_id,
         regexp_replace(lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
             ':[0-9]+$', '') AS phost,
         {html_wrap} AS html
  FROM raw
),
tags AS (
  SELECT doc_id, phost,
         unnest(regexp_extract_all(html,
             '<a href="[^"]+">[^<]*</a>', 0)) AS tag
  FROM page
),
pairs AS (
  SELECT doc_id, phost,
         regexp_extract(tag, '<a href="([^"]+)">', 1) AS href,
         regexp_extract(tag, '>([^<]*)</a>', 1) AS anchor_text
  FROM tags
),
ext AS (
  SELECT anchor_text,
         regexp_replace(lower(regexp_extract(href,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
             ':[0-9]+$', '') AS thost
  FROM pairs
  WHERE lower(regexp_extract(href,
            '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) IN ('http', 'https')
    AND regexp_replace(lower(regexp_extract(href,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
            ':[0-9]+$', '') <> phost
)
SELECT {domain} AS target_domain, anchor_text, COUNT(*) AS n_links
FROM (SELECT *, string_split(thost, '.') AS labs FROM ext)
GROUP BY 1, 2
""".format(raw_url=_RAW_URL_SQL, html_wrap=_HTML_WRAP_SQL,
           domain=registrable_domain_sql("labs"))


# --- robots.txt longest-match gate (round 5) ---------------------------------------

#: deterministic per-domain robots policies (production loads parsed
#: robots.txt; the OPERATOR is the RFC 9309 matcher): rule = (domain,
#: 'allow'|'deny', path prefix). Most-specific (longest prefix) match
#: wins; tie -> allow; no match -> allow.
ROBOTS_RULES = (
    ("mirror.net", "deny", "/"),
    ("mirror.net", "allow", "/Docs/1"),     # carve-out under a deny-all
    ("crawl.dev", "deny", "/Docs/2"),
    ("shop.co.uk", "deny", "/"),
    ("shop.co.uk", "allow", "/Docs"),       # longer allow wins
    ("example.com", "deny", "/private"),    # never matches: stays allowed
)


def robots_gate(spark, sf_dir):
    """RFC 9309 path matching per URL: broadcast the per-domain rule
    dim, keep prefix matches, pick the longest (allow wins length
    ties), default allow. The winner is selected with ONE max-of-struct
    aggregate — (prefix length, is_allow) compares lexicographically —
    so the plan is a broadcast join + a single hash aggregate; no
    window, no skew surface beyond the rollup itself."""
    urls = _with_canonical(
        table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_RAW_URL).alias("url")))
    rules = spark.createDataFrame(
        list(ROBOTS_RULES), "domain string, verdict string, prefix string")
    matched = (urls
               .join(F.broadcast(rules), "domain", "left")
               .withColumn("hit", F.col("prefix").isNotNull()
                           & F.col("path").startswith(F.col("prefix"))))
    best = (matched.groupBy("doc_id", "canonical_url", "domain")
            .agg(F.max(F.when(F.col("hit"), F.struct(
                F.length("prefix").alias("l"),
                (F.col("verdict") == "allow").alias("a"))))
                .alias("m")))
    return best.select(
        "doc_id", "canonical_url", "domain",
        F.coalesce(F.col("m.a"), F.lit(True)).alias("allowed"),
        F.coalesce(F.col("m.l"), F.lit(0)).cast("int")
        .alias("matched_len"))


def _robots_values_sql():
    rows = ", ".join("('%s', '%s', '%s')" % r for r in ROBOTS_RULES)
    return "(VALUES %s) AS rb(domain, verdict, prefix)" % rows


ROBOTS_GATE_SQL = (_CANON_CTES + """
, matched AS (
  SELECT c.doc_id, c.canonical_url, c.domain, c.path,
         rb.verdict, rb.prefix,
         rb.prefix IS NOT NULL AND starts_with(c.path, rb.prefix) AS hit
  FROM canon c LEFT JOIN {rb} ON c.domain = rb.domain
),
best AS (
  SELECT doc_id, canonical_url, domain,
         MAX(CASE WHEN hit THEN
               struct_pack(l := length(prefix), a := verdict = 'allow')
             END) AS m
  FROM matched GROUP BY doc_id, canonical_url, domain
)
SELECT doc_id, canonical_url, domain,
       COALESCE((m).a, TRUE) AS allowed,
       CAST(COALESCE((m).l, 0) AS INT) AS matched_len
FROM best
""").format(raw_url=_RAW_URL_SQL, domain=registrable_domain_sql("labs"),
            rb=_robots_values_sql())


# --- fixed-point domain PageRank (round 5) -----------------------------------------
#
# Crawl-prioritization authority over the registrable-domain link graph
# derived from the outlink stage. INTEGER fixed-point on purpose: float
# PageRank sums contributions in shuffle order, so two engines (or two
# runs) disagree in the last ulps and a value-hash gate cannot pass.
# With ranks scaled by PR_SCALE and every per-edge contribution an
# integer floor-division, each iteration is exact 64-bit arithmetic —
# SUM over integers is order-independent — and five iterations are
# bit-identical everywhere. Dangling-domain rank leaks (standard
# simplification; declared). Scale shape: the edge relation is
# domain-to-domain (cardinality ~millions at web scale, not trillions),
# persisted once; each iteration is one join + one hash aggregate on it
# — the same alternating shape as dedup_minhash_cc, with a fixed
# iteration count instead of a fixpoint test.

PR_SCALE = 1_000_000_000
PR_ITERS = 5
#: damping 0.85 as the integer pair (85, 100)
_PR_D_NUM, _PR_D_DEN = 85, 100


def domain_pagerank(spark, sf_dir):
    from . import persist_tracked

    links = _outlink_rows(spark, sf_dir).where(~F.col("is_internal"))
    edges = (links.groupBy(F.col("src_domain").alias("src"),
                           F.col("target_domain").alias("dst"))
             .agg(F.count("*").alias("w")))
    wtot = edges.groupBy("src").agg(F.sum("w").alias("wtot"))
    edges = persist_tracked(edges.join(wtot, "src"))
    nodes = persist_tracked(
        edges.select(F.col("src").alias("domain"))
        .union(edges.select(F.col("dst").alias("domain")))
        .distinct())
    base = PR_SCALE * (_PR_D_DEN - _PR_D_NUM) // _PR_D_DEN
    ranks = nodes.select(
        "domain", F.lit(PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(PR_ITERS):
        contrib = (edges.join(ranks, edges["src"] == ranks["domain"])
                   .select(F.col("dst").alias("domain"),
                           F.expr("rank * w div wtot").alias("c"))
                   .groupBy("domain")
                   .agg(F.sum("c").alias("in_sum")))
        ranks = (nodes.join(contrib, "domain", "left")
                 .select("domain", (F.lit(base) + F.expr(
                     "%d * coalesce(in_sum, 0L) div %d"
                     % (_PR_D_NUM, _PR_D_DEN))).cast("bigint")
                     .alias("rank")))
    return ranks.select("domain", F.col("rank").alias("rank_scaled"))


def _pagerank_sql():
    base = PR_SCALE * (_PR_D_DEN - _PR_D_NUM) // _PR_D_DEN
    ctes = [
        """edges0 AS (
  SELECT {src} AS src, target_domain AS dst, COUNT(*) AS w
  FROM (SELECT *, string_split(phost, '.') AS plabs
        FROM outlinks WHERE NOT is_internal)
  GROUP BY 1, 2
)""".format(src=registrable_domain_sql("plabs")),
        """edges_w AS (
  SELECT e.src, e.dst, CAST(e.w AS BIGINT) AS w,
         CAST(t.wtot AS BIGINT) AS wtot
  FROM edges0 e JOIN (SELECT src, SUM(w) AS wtot FROM edges0
                      GROUP BY src) t USING (src)
)""",
        """nodes AS (
  SELECT DISTINCT src AS domain FROM edges_w
  UNION SELECT DISTINCT dst FROM edges_w
)""",
        "r0 AS (SELECT domain, CAST(%d AS BIGINT) AS rank FROM nodes)"
        % PR_SCALE,
    ]
    for k in range(1, PR_ITERS + 1):
        ctes.append("""r{k} AS (
  SELECT n.domain,
         CAST({base} + ({num} * COALESCE(s.in_sum, 0)) // {den}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS domain,
           SUM((r.rank * e.w) // e.wtot) AS in_sum
    FROM edges_w e JOIN r{km1} r ON e.src = r.domain
    GROUP BY e.dst) s USING (domain)
)""".format(k=k, km1=k - 1, base=base, num=_PR_D_NUM, den=_PR_D_DEN))
    return (_OUTLINK_CTES.format(
        raw_url=_RAW_URL_SQL, html_wrap=_HTML_WRAP_SQL,
        domain=registrable_domain_sql("labs"))
        + ", " + ",\n".join(ctes)
        + "\nSELECT domain, rank AS rank_scaled FROM r%d\n" % PR_ITERS)


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
    "html_outlinks": QuerySpec(html_outlinks, HTML_OUTLINKS_SQL),
    "outlink_frontier": QuerySpec(outlink_frontier, OUTLINK_FRONTIER_SQL),
    "domain_pagerank": QuerySpec(domain_pagerank, _pagerank_sql()),
    "anchor_text_rollup": QuerySpec(anchor_text_rollup, ANCHOR_TEXT_SQL),
    "robots_gate": QuerySpec(robots_gate, ROBOTS_GATE_SQL),
    "corpus_split": QuerySpec(corpus_split, CORPUS_SPLIT_SQL),
}
