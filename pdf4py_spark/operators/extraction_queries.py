"""Flagship extraction queries: the kernel pipeline exercised end-to-end
under the driver's DuckDB correctness gate.

Two input shapes:
* the ``documents`` test table, wrapped into HTML payloads by a pure
  Catalyst expression (so the SQL oracle can state the expected text
  exactly: boilerplate strip must return the original text), and
* the committed 30-row ``pages`` fixture (reference corpus), whose oracle
  parquet was produced from the reference implementation — the md5 check
  here IS the byte-identity invariant running inside the correctness gate.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import QuerySpec, table
from ..plans.pipeline import extract_pages

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
FIXTURE_PAGES = os.path.join(_ROOT, "tests", "fixtures", "pages.parquet")
FIXTURE_ORACLE = os.path.join(_ROOT, "tests", "fixtures", "oracle.parquet")

# boilerplate wrapper: nav/script/style/footer must be stripped, the <p>
# block must survive verbatim
_WRAP = (
    "concat('<html><head><title>t</title><script>var x = 1;</script>"
    "<style>p { color: blue }</style></head><body>"
    "<nav><ul><li>Home</li></ul></nav><header><h1>masthead</h1></header>"
    "<article><p>', text, '</p></article>"
    "<footer>(c) corpus</footer></body></html>')"
)


def _docs_as_pages(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.expr(_WRAP), "utf-8").alias("html"),
        "text", "lang")


def extract_html_roundtrip(spark, sf_dir):
    """documents.text -> HTML boilerplate wrap (Catalyst) -> Arrow kernel
    boilerplate strip -> must round-trip to the original text."""
    pages = _docs_as_pages(spark, sf_dir)
    result = extract_pages(pages, num_partitions=8)
    return result.select("url", "extracted_utf8", "status")


EXTRACT_HTML_SQL = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       text AS extracted_utf8,
       'ok' AS status
FROM documents
"""


def extract_stats_by_lang(spark, sf_dir):
    """Extraction byte accounting per language: kernel output joined back
    to the input dimension, aggregated JVM-side."""
    pages = _docs_as_pages(spark, sf_dir)
    result = extract_pages(pages, num_partitions=8)
    langs = pages.select("url", "lang")
    # project the narrow columns BEFORE the join so the extracted binary
    # payload never rides the join/aggregate shuffle
    slim = result.select("url", "bytes_out", "parse_ok")
    return (slim.join(langs, "url")
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("bytes_out")).alias("bytes_out_sum"),
                 F.sum(F.col("parse_ok").cast("bigint")).alias("n_ok")))


EXTRACT_STATS_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS bytes_out_sum,
       COUNT(*) AS n_ok
FROM documents GROUP BY lang
"""


def _fixture_extraction(spark):
    from ..sources.pages import passwords_df
    pages = spark.read.parquet(FIXTURE_PAGES)
    return extract_pages(pages, num_partitions=4,
                         passwords=passwords_df(spark))


def extract_pdf_census(spark, sf_dir):
    """PDF structural census over the reference corpus fixture: object and
    page counts per url must equal the reference-derived oracle."""
    result = _fixture_extraction(spark)
    return (result.where("parse_ok and doc_kind = 'pdf'")
            .select("url", "n_objects", "n_pages"))


PDF_CENSUS_SQL = """
SELECT url, CAST(n_objects AS INT) AS n_objects,
       CAST(n_pages AS INT) AS n_pages
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_pdf_text_md5(spark, sf_dir):
    """THE byte-identity invariant as a gated query: md5 of the extracted
    bytes per url versus the oracle parquet."""
    result = _fixture_extraction(spark)
    return (result.where("parse_ok and doc_kind = 'pdf'")
            .select("url", F.md5("extracted").alias("text_md5")))


PDF_TEXT_MD5_SQL = """
SELECT url, extracted_md5 AS text_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_pdf_unicode_md5(spark, sf_dir):
    """Font/encoding-aware extraction gate: md5 of the UTF-8 unicode text
    (ToUnicode CMaps + base encodings + Differences, kernel.fonts) per url
    versus the oracle built by running the SAME decode algorithm over the
    REFERENCE parser (tools/make_oracle.py) — two independent parsing
    stacks, one decode contract."""
    from ..sources.pages import passwords_df
    pages = spark.read.parquet(FIXTURE_PAGES)
    result = extract_pages(pages, num_partitions=4,
                           passwords=passwords_df(spark),
                           text_mode="unicode")
    return (result.where("parse_ok and doc_kind = 'pdf'")
            .select("url", F.md5("extracted").alias("unicode_md5")))


PDF_UNICODE_MD5_SQL = """
SELECT url, unicode_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def _fixture_pdf_rows(pdf):
    """Shared per-batch iteration for the fixture-PDF census kernels:
    yields (url, data, password) for each %PDF- payload, applying the
    str-vs-bytes password rule once (review finding: this preamble was
    copy-pasted into every census generator, so a password-handling
    change could silently diverge between gates)."""
    for url, payload, password, pw_bytes in zip(
            pdf["url"], pdf["html"], pdf["password"],
            pdf["password_is_bytes"]):
        data = bytes(payload)
        if not data.startswith(b"%PDF-"):
            continue
        pw = password if isinstance(password, str) else None
        if pw is not None and pw_bytes:
            pw = pw.encode("utf-8")
        yield url, data, pw


def _fixture_pages_with_passwords(spark):
    """The one census-input preamble (review finding: it was copied
    into every census query): fixture pages + broadcast password dim,
    slim projection, stable 4-way repartition."""
    from ..sources.pages import passwords_df

    return (spark.read.parquet(FIXTURE_PAGES)
            .join(F.broadcast(passwords_df(spark)), "url", "left")
            .select("url", "html", "password", "password_is_bytes")
            .repartition(4, "url"))


def _census_batches(row_fn, cols):
    """mapInPandas generator factory for the census kernels: run
    ``row_fn(data, password) -> tuple`` per fixture PDF, skipping rows
    whose parse fails — the try/except shell existed once per census
    before (review finding)."""
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {c: [] for c in ("url",) + cols}
            for url, data, pw in _fixture_pdf_rows(pdf):
                try:
                    vals = row_fn(data, pw)
                except Exception:  # noqa: BLE001 - parse failure: no row
                    continue
                out["url"].append(url)
                for c, v in zip(cols, vals):
                    out[c].append(v)
            yield pd.DataFrame(out)
    return gen


def _fonts_row(data, pw):
    from ..kernel.parser import DocumentParser
    from ..kernel.textextract import fonts_census
    return fonts_census(DocumentParser(data, password=pw))


def _metadata_row(data, pw):
    from ..kernel.parser import DocumentParser
    from ..kernel.textextract import doc_metadata
    return (doc_metadata(DocumentParser(data, password=pw)),)


def _links_row(data, pw):
    from ..kernel.parser import DocumentParser
    from ..kernel.textextract import doc_links
    return doc_links(DocumentParser(data, password=pw))


def _xmp_row(data, pw):
    from ..kernel.parser import DocumentParser
    from ..kernel.textextract import doc_xmp
    return doc_xmp(DocumentParser(data, password=pw))


def _outline_row(data, pw):
    from ..kernel.parser import DocumentParser
    from ..kernel.textextract import doc_outline
    return doc_outline(DocumentParser(data, password=pw))


def _xmp_fields_row(data, pw):
    from ..kernel.parser import DocumentParser
    from ..kernel.textextract import doc_xmp_fields
    return doc_xmp_fields(DocumentParser(data, password=pw))


def extract_pdf_fonts(spark, sf_dir):
    """Font-resource census parity gate: distinct canonical font lines
    (resource name | Subtype | BaseFont | encoding kind | ToUnicode
    presence) per document, walked by OUR parser, must hash-match the
    same census walked by the REFERENCE parser (tools/make_oracle.py) —
    both formatted by the one shared kernel.fonts.font_census_line, so
    the gate compares resource-tree traversal across two parser stacks.

    Compared on the reference-parseable set: our kernel additionally
    opens the AESV3/R6-encrypted fixtures (0020/0021) that the reference
    cannot parse at all (that capability is pinned by the crypto tests),
    so those two docs have no reference census to compare against."""
    pages = _fixture_pages_with_passwords(spark)
    census = pages.mapInPandas(
        _census_batches(_fonts_row, ("n_fonts", "census")),
        schema="url string, n_fonts int, census string")
    ref_ok = (spark.read.parquet(FIXTURE_ORACLE)
              .where("parse_ok").select("url"))
    return (census.join(F.broadcast(ref_ok), "url")
            .select("url", "n_fonts", F.md5("census").alias("fonts_md5")))


PDF_FONTS_SQL = """
SELECT url, CAST(n_fonts AS INT) AS n_fonts, fonts_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_pdf_metadata(spark, sf_dir):
    """Document-information metadata gate (K49): the canonical Info-dict
    + annotation-census line (Title/Author/Subject/Creator/Producer/
    CreationDate/ModDate + n_annots — text strings decoded per §7.9.2.2
    incl. string DECRYPTION on the encrypted fixtures) resolved by OUR
    parser must hash-match the same line resolved by the REFERENCE
    parser, both formatted by the shared kernel.docmeta.metadata_line.
    Compared on the reference-parseable set, like the fonts gate."""
    pages = _fixture_pages_with_passwords(spark)
    meta = pages.mapInPandas(
        _census_batches(_metadata_row, ("meta",)),
        schema="url string, meta string")
    ref_ok = (spark.read.parquet(FIXTURE_ORACLE)
              .where("parse_ok").select("url"))
    return (meta.join(F.broadcast(ref_ok), "url")
            .select("url", F.md5("meta").alias("meta_md5")))


PDF_METADATA_SQL = """
SELECT url, meta_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_pdf_links(spark, sf_dir):
    """Outlink census gate (K50): URI targets of Link annotations — the
    outlink source a crawl pipeline feeds its frontier/link graph from —
    resolved by OUR parser must match the REFERENCE parser's walk, both
    formatted through the shared kernel.docmeta.links_line (sorted
    distinct URIs; total occurrence count carried separately)."""
    pages = _fixture_pages_with_passwords(spark)
    links = pages.mapInPandas(
        _census_batches(_links_row, ("n_links", "links")),
        schema="url string, n_links int, links string")
    ref_ok = (spark.read.parquet(FIXTURE_ORACLE)
              .where("parse_ok").select("url"))
    return (links.join(F.broadcast(ref_ok), "url")
            .select("url", "n_links", F.md5("links").alias("links_md5")))


PDF_LINKS_SQL = """
SELECT url, CAST(n_links AS INT) AS n_links, links_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_pdf_xmp(spark, sf_dir):
    """XMP packet gate (K51): the catalog /Metadata stream payload's
    (length, md5) through OUR parser's full filter/decrypt chain must
    byte-match the REFERENCE parser's resolution. Raw-bytes pinning by
    design — no XML parsing on executors (entity-expansion surface),
    and byte identity is the stronger cross-stack check anyway."""
    pages = _fixture_pages_with_passwords(spark)
    xmp = pages.mapInPandas(
        _census_batches(_xmp_row, ("xmp_bytes", "xmp_md5")),
        schema="url string, xmp_bytes int, xmp_md5 string")
    ref_ok = (spark.read.parquet(FIXTURE_ORACLE)
              .where("parse_ok").select("url"))
    return xmp.join(F.broadcast(ref_ok), "url") \
        .select("url", "xmp_bytes", "xmp_md5")


PDF_XMP_SQL = """
SELECT url, CAST(xmp_bytes AS INT) AS xmp_bytes, xmp_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_pdf_outline(spark, sf_dir):
    """Bookmark census gate (K52): the /Outlines tree walked First/Next
    in document order with decoded titles — OUR parser's walk must
    byte-match the REFERENCE parser's (same shared title-decode rule,
    same bounds; cyclic/hostile trees terminate with partial output)."""
    pages = _fixture_pages_with_passwords(spark)
    ol = pages.mapInPandas(
        _census_batches(_outline_row, ("n_bookmarks", "outline")),
        schema="url string, n_bookmarks int, outline string")
    ref_ok = (spark.read.parquet(FIXTURE_ORACLE)
              .where("parse_ok").select("url"))
    return (ol.join(F.broadcast(ref_ok), "url")
            .select("url", "n_bookmarks",
                    F.md5("outline").alias("outline_md5")))


PDF_OUTLINE_SQL = """
SELECT url, CAST(n_bookmarks AS INT) AS n_bookmarks, outline_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_pdf_xmp_fields(spark, sf_dir):
    """Dublin Core field gate (K55): dc:title/dc:creator/dc:description
    values scanned from the K51 packet — regex-level and bounded, never
    an XML parser (entity decode is arithmetic with a cap) — through
    OUR parser must match the REFERENCE parser's packet, both
    formatted by the shared kernel.docmeta.xmp_fields_line."""
    pages = _fixture_pages_with_passwords(spark)
    xf = pages.mapInPandas(
        _census_batches(_xmp_fields_row, ("n_xmp_fields", "fields")),
        schema="url string, n_xmp_fields int, fields string")
    ref_ok = (spark.read.parquet(FIXTURE_ORACLE)
              .where("parse_ok").select("url"))
    return (xf.join(F.broadcast(ref_ok), "url")
            .select("url", "n_xmp_fields",
                    F.md5("fields").alias("xmp_fields_md5")))


PDF_XMP_FIELDS_SQL = """
SELECT url, CAST(n_xmp_fields AS INT) AS n_xmp_fields, xmp_fields_md5
FROM read_parquet('{oracle}')
WHERE parse_ok
""".format(oracle=FIXTURE_ORACLE)


def extract_quarantine_counts(spark, sf_dir):
    """Totality contract: every corpus row lands in exactly one status."""
    result = _fixture_extraction(spark)
    return (result.groupBy("doc_kind", "status")
            .agg(F.count("*").alias("n_docs")))


QUARANTINE_SQL = """
WITH expected AS (
  SELECT p.url,
         CASE WHEN substring(CAST(p.html AS VARCHAR), 1, 5) = '%PDF-'
              THEN 'pdf' ELSE 'html' END AS doc_kind,
         CASE WHEN o.url IS NULL THEN 'ok'  -- html fixtures: no oracle row
              WHEN o.parse_ok THEN 'ok'
              WHEN p.url = 'crawl://encrypted/0016.pdf'
                THEN 'wrong_password'
              ELSE 'error' END AS status
  FROM read_parquet('{pages}') p
  LEFT JOIN read_parquet('{oracle}') o USING (url)
)
SELECT doc_kind, status, COUNT(*) AS n_docs
FROM expected GROUP BY doc_kind, status
""".format(pages=FIXTURE_PAGES, oracle=FIXTURE_ORACLE)


# wrapper whose promo/menu fragments survive tag-based stripping but are
# short enough that density selection always drops them (every document
# text is >= 48 chars, so the 25% threshold is >= 12 > len('Menu'))
_WRAP_NOISY = (
    "concat('<html><body><div>Promo</div><div>Menu</div>"
    "<article><p>', text, '</p></article>"
    "<div>More</div><div>Links</div></body></html>')"
)


def _main_strip_batches(batches):
    import pandas as pd
    from pdf4py_spark.kernel.htmlextract import extract_html_main

    for pdf in batches:
        out = {"url": [], "extracted_utf8": []}
        for url, payload in zip(pdf["url"], pdf["html"]):
            out["url"].append(url)
            out["extracted_utf8"].append(
                extract_html_main(payload).decode("utf-8"))
        yield pd.DataFrame(out)


def extract_html_main_roundtrip(spark, sf_dir):
    """Text-density main-content selection: short navigational fragments
    that survive tag stripping are dropped by the density stage, so the
    noisy wrapper still round-trips to exactly the original text."""
    docs = table(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.encode(F.expr(_WRAP_NOISY), "utf-8").alias("html"))
    return pages.repartition(8).mapInPandas(
        _main_strip_batches, schema="url string, extracted_utf8 string")


EXTRACT_HTML_MAIN_SQL = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       text AS extracted_utf8
FROM documents
"""


QUERIES = {
    "extract_html_roundtrip": QuerySpec(extract_html_roundtrip,
                                        EXTRACT_HTML_SQL),
    "extract_html_main_roundtrip": QuerySpec(extract_html_main_roundtrip,
                                             EXTRACT_HTML_MAIN_SQL),
    "extract_stats_by_lang": QuerySpec(extract_stats_by_lang,
                                       EXTRACT_STATS_SQL),
    "extract_pdf_census": QuerySpec(extract_pdf_census, PDF_CENSUS_SQL),
    "extract_pdf_text_md5": QuerySpec(extract_pdf_text_md5,
                                      PDF_TEXT_MD5_SQL),
    "extract_pdf_unicode_md5": QuerySpec(extract_pdf_unicode_md5,
                                         PDF_UNICODE_MD5_SQL),
    "extract_pdf_fonts": QuerySpec(extract_pdf_fonts, PDF_FONTS_SQL),
    "extract_pdf_metadata": QuerySpec(extract_pdf_metadata,
                                      PDF_METADATA_SQL),
    "extract_pdf_links": QuerySpec(extract_pdf_links, PDF_LINKS_SQL),
    "extract_pdf_xmp": QuerySpec(extract_pdf_xmp, PDF_XMP_SQL),
    "extract_pdf_outline": QuerySpec(extract_pdf_outline,
                                     PDF_OUTLINE_SQL),
    "extract_pdf_xmp_fields": QuerySpec(extract_pdf_xmp_fields,
                                        PDF_XMP_FIELDS_SQL),
    "extract_quarantine_counts": QuerySpec(extract_quarantine_counts,
                                           QUARANTINE_SQL),
}
