"""Materialize the committed parquet fixtures used by the extraction
queries in __spark_entry__ (so the driver's DuckDB oracle can read the
same tables by absolute path):

    tests/fixtures/pages.parquet    the fixture pages corpus
    tests/fixtures/oracle.parquet   url, extracted, parse_ok, n_objects,
                                    n_pages (from tests/golden/)

Usage: python tools/make_fixtures.py   (after tools/make_oracle.py)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf4py_spark.sources.corpus import corpus_rows  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(ROOT, "tests", "fixtures")
GOLDEN_DIR = os.path.join(ROOT, "tests", "golden")


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rows = corpus_rows()
    pages = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "lang": pa.array([r[4] for r in rows], pa.string()),
    })
    pq.write_table(pages, os.path.join(FIXTURE_DIR, "pages.parquet"))

    with open(os.path.join(GOLDEN_DIR, "manifest.json")) as fh:
        manifest = json.load(fh)
    urls, extracted, md5s, ok, n_objects, n_pages = [], [], [], [], [], []
    uni_md5s, n_fonts, fonts_md5s, meta_md5s = [], [], [], []
    n_links, links_md5s, xmp_bytes, xmp_md5s = [], [], [], []
    n_bookmarks, outline_md5s = [], []
    n_xmp_fields, xmp_fields_md5s = [], []
    for url, entry in sorted(manifest.items()):
        urls.append(url)
        ok.append(entry["parse_ok"])
        if entry["parse_ok"]:
            with open(os.path.join(GOLDEN_DIR, entry["bin"]), "rb") as fh:
                data = fh.read()
            extracted.append(data)
            md5s.append(hashlib.md5(data).hexdigest())
            with open(os.path.join(GOLDEN_DIR, entry["unicode_bin"]),
                      "rb") as fh:
                uni = fh.read()
            uni_md5s.append(hashlib.md5(uni).hexdigest())
            n_objects.append(entry["n_objects"])
            n_pages.append(entry["n_pages"])
            n_fonts.append(entry["n_fonts"])
            fonts_md5s.append(entry["fonts_md5"])
            meta_md5s.append(entry["meta_md5"])
            n_links.append(entry["n_links"])
            links_md5s.append(entry["links_md5"])
            xmp_bytes.append(entry["xmp_bytes"])
            xmp_md5s.append(entry["xmp_md5"])
            n_bookmarks.append(entry["n_bookmarks"])
            outline_md5s.append(entry["outline_md5"])
            n_xmp_fields.append(entry["n_xmp_fields"])
            xmp_fields_md5s.append(entry["xmp_fields_md5"])
        else:
            extracted.append(None)
            md5s.append(None)
            uni_md5s.append(None)
            n_objects.append(None)
            n_pages.append(None)
            n_fonts.append(None)
            fonts_md5s.append(None)
            meta_md5s.append(None)
            n_links.append(None)
            links_md5s.append(None)
            xmp_bytes.append(None)
            xmp_md5s.append(None)
            n_bookmarks.append(None)
            outline_md5s.append(None)
            n_xmp_fields.append(None)
            xmp_fields_md5s.append(None)
    oracle = pa.table({
        "url": pa.array(urls, pa.string()),
        "extracted": pa.array(extracted, pa.binary()),
        "extracted_md5": pa.array(md5s, pa.string()),
        "unicode_md5": pa.array(uni_md5s, pa.string()),
        "parse_ok": pa.array(ok, pa.bool_()),
        "n_objects": pa.array(n_objects, pa.int32()),
        "n_pages": pa.array(n_pages, pa.int32()),
        "n_fonts": pa.array(n_fonts, pa.int32()),
        "fonts_md5": pa.array(fonts_md5s, pa.string()),
        "meta_md5": pa.array(meta_md5s, pa.string()),
        "n_links": pa.array(n_links, pa.int32()),
        "links_md5": pa.array(links_md5s, pa.string()),
        "xmp_bytes": pa.array(xmp_bytes, pa.int32()),
        "xmp_md5": pa.array(xmp_md5s, pa.string()),
        "n_bookmarks": pa.array(n_bookmarks, pa.int32()),
        "outline_md5": pa.array(outline_md5s, pa.string()),
        "n_xmp_fields": pa.array(n_xmp_fields, pa.int32()),
        "xmp_fields_md5": pa.array(xmp_fields_md5s, pa.string()),
    })
    pq.write_table(oracle, os.path.join(FIXTURE_DIR, "oracle.parquet"))
    print("wrote %d pages rows, %d oracle rows -> %s"
          % (len(rows), len(urls), FIXTURE_DIR))


if __name__ == "__main__":
    main()
