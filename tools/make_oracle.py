"""Generate the byte-identity oracle from the reference implementation.

Runs pdf4py (imported from the read-only reference checkout) single-process
over the corpus, executing the SAME extraction algorithm the engine's
kernel implements (page-tree walk -> decoded Contents joined with b"\n"
-> content-mode scan -> Tj/TJ/'/\" string-operand concatenation, partial-
tolerant per stream). Writes:

    tests/golden/<name>.bin      extracted bytes per parse_ok document
    tests/golden/manifest.json   url -> {parse_ok, n_objects, n_pages,
                                         sha256, version}

Usage: python tools/make_oracle.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.environ.get("PDF4PY_REFERENCE_ROOT", "/root/reference"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.setrecursionlimit(20000)

from pdf4py.parser import Parser, SequentialParser  # noqa: E402
from pdf4py.types import (  # noqa: E402
    PDFHexString, PDFLiteralString, PDFOperator, PDFReference, PDFStream,
)

from pdf4py_spark.kernel.textextract import excise_inline_images  # noqa: E402
from pdf4py_spark.sources.corpus import corpus_rows, password_for  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

SHOW_OPS = ("Tj", "'", '"')


def _unhex(digits: bytes) -> bytes:
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _string_bytes(obj):
    if isinstance(obj, PDFLiteralString):
        return obj.value
    if isinstance(obj, PDFHexString):
        return _unhex(bytes(obj.value))
    return None


def text_from_content(content: bytes) -> bytes:
    # identical inline-image excision as the engine kernel (shared code)
    scanner = SequentialParser(excise_inline_images(content),
                               content_stream_mode=True)
    pieces, pending = [], []
    while True:
        try:
            obj = scanner.parse_object()
        except StopIteration:
            break
        except Exception:
            break  # same partial-tolerance rule as the engine kernel
        if isinstance(obj, PDFOperator):
            name = obj.value
            if name in SHOW_OPS:
                for operand in reversed(pending):
                    val = _string_bytes(operand)
                    if val is not None:
                        pieces.append(val)
                        break
            elif name == "TJ":
                for operand in reversed(pending):
                    if isinstance(operand, list):
                        for element in operand:
                            val = _string_bytes(element)
                            if val is not None:
                                pieces.append(val)
                        break
            pending = []
        else:
            pending.append(obj)
    return b"".join(pieces)


def page_dicts(parser):
    catalog = parser.parse_reference(parser.trailer["Root"])
    pages = []

    def walk(node_ref):
        node = (parser.parse_reference(node_ref)
                if isinstance(node_ref, PDFReference) else node_ref)
        if isinstance(node, dict) and node.get("Type") == "Pages":
            for kid in node["Kids"]:
                walk(kid)
        else:
            pages.append(node)

    walk(catalog["Pages"])
    return pages


def content_streams(parser, contents):
    if isinstance(contents, PDFReference):
        contents = parser.parse_reference(contents)
    if isinstance(contents, PDFStream):
        return [contents.stream()]
    if isinstance(contents, list):
        out = []
        for piece in contents:
            if isinstance(piece, PDFReference):
                piece = parser.parse_reference(piece)
            if isinstance(piece, PDFStream):
                out.append(piece.stream())
        return out
    return []


def oracle_extract(payload: bytes, password):
    parser = Parser(payload, password)
    pages = page_dicts(parser)
    page_texts = []
    for page in pages:
        contents = page.get("Contents") if isinstance(page, dict) else None
        if contents is None:
            page_texts.append(b"")
            continue
        decoded = [bytes(s) for s in content_streams(parser, contents)]
        page_texts.append(text_from_content(b"\n".join(decoded)))
    n_objects = len(list(parser.xreftable))
    return b"\n".join(page_texts), n_objects, len(pages), parser.version


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    manifest = {}
    for url, _ts, payload, _text, _lang in corpus_rows():
        if not url.startswith(("crawl://pdfs/", "crawl://encrypted/",
                               "crawl://adversarial/")):
            continue
        entry = {"parse_ok": False}
        try:
            extracted, n_objects, n_pages, version = oracle_extract(
                payload, password_for(url))
            name = url.rsplit("/", 1)[-1].replace(".", "_") + ".bin"
            with open(os.path.join(GOLDEN_DIR, name), "wb") as fh:
                fh.write(extracted)
            entry = {
                "parse_ok": True,
                "bin": name,
                "sha256": hashlib.sha256(extracted).hexdigest(),
                "n_objects": n_objects,
                "n_pages": n_pages,
                "version": version,
            }
        except Exception as exc:  # reference could not parse it
            entry["error"] = "%s: %s" % (type(exc).__name__, str(exc)[:120])
        manifest[url] = entry
        print(url, "ok" if entry["parse_ok"] else "FAIL",
              entry.get("n_objects", ""), entry.get("error", ""))
    with open(os.path.join(GOLDEN_DIR, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print("wrote", os.path.join(GOLDEN_DIR, "manifest.json"))


if __name__ == "__main__":
    main()
