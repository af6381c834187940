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


# --- unicode mode (font/encoding-aware), mirrored over the reference parser -------
#
# The decode algorithm (CMap parsing, encoding tables, Differences) is the
# SHARED module pdf4py_spark.kernel.fonts; only object access differs:
# here it is pdf4py (the reference), in the engine it is our kernel.

from pdf4py_spark.kernel.fonts import (  # noqa: E402
    build_font_decoder, latin1_decoder,
)

SHOW_OR_TJ = SHOW_OPS + ("TJ",)


def _rr(parser, obj):
    n = 0
    while isinstance(obj, PDFReference) and n < 16:
        obj = parser.parse_reference(obj)
        n += 1
    return obj


def _rr_safe(parser, obj):
    """Failure-tolerant chained resolve for the K49-K52 census walks —
    None on a dangling/broken ref, matching the kernel's `_rc` exactly
    (review finding: the oracle raised where the kernel skipped)."""
    try:
        return _rr(parser, obj)
    except Exception:
        return None


def _composite_spec_ref(parser, font, spec):
    """Mirror of kernel.textextract._composite_spec over the reference
    parser's objects (Identity flag, FontFile2, CIDToGIDMap stream)."""
    enc = _rr(parser, font.get("Encoding"))
    spec["identity"] = enc in ("Identity-H", "Identity-V")
    spec["cmap_name"] = enc if isinstance(enc, str) else None
    desc = _rr(parser, font.get("DescendantFonts"))
    if not (isinstance(desc, list) and desc):
        return
    d0 = _rr(parser, desc[0])
    if not isinstance(d0, dict):
        return
    c2g = _rr(parser, d0.get("CIDToGIDMap"))
    if isinstance(c2g, PDFStream):
        try:
            spec["cid_to_gid"] = bytes(c2g.stream())
        except Exception:
            pass
    fd = _rr(parser, d0.get("FontDescriptor"))
    if isinstance(fd, dict):
        for key in ("FontFile2", "FontFile3"):
            ff = _rr(parser, fd.get(key))
            if isinstance(ff, PDFStream):
                try:
                    spec["fontfile"] = bytes(ff.stream())
                    break
                except Exception:
                    pass


def _simple_spec_ref(parser, font, spec):
    """Mirror of kernel.textextract._simple_spec over the reference
    parser (symbolic flag + FontFile2 for simple TrueType fonts; bare-
    CFF /Type1C FontFile3 for the K57 built-in-encoding route)."""
    subtype = font.get("Subtype")
    if subtype not in ("TrueType", "Type1", "MMType1"):
        return
    fd = _rr(parser, font.get("FontDescriptor"))
    if not isinstance(fd, dict):
        return
    if subtype == "TrueType":
        flags = fd.get("Flags")
        spec["symbolic"] = bool(isinstance(flags, int) and flags & 4)
        if not spec["symbolic"]:
            return
        ff = _rr(parser, fd.get("FontFile2"))
        if isinstance(ff, PDFStream):
            try:
                spec["fontfile"] = bytes(ff.stream())
            except Exception:
                pass
        return
    ff = _rr(parser, fd.get("FontFile3"))
    if isinstance(ff, PDFStream) \
            and ff.dictionary.get("Subtype") == "Type1C":
        try:
            spec["cff"] = bytes(ff.stream())
        except Exception:
            pass


def _font_decoders_ref(parser, resources):
    resources = _rr(parser, resources)
    if not isinstance(resources, dict):
        return {}
    fonts = _rr(parser, resources.get("Font"))
    if not isinstance(fonts, dict):
        return {}
    out = {}
    for name, fref in fonts.items():
        font = _rr(parser, fref)
        if not isinstance(font, dict):
            continue
        spec = {"type0": font.get("Subtype") == "Type0",
                "encoding": None, "differences": None, "tounicode": None,
                "basefont": _rr(parser, font.get("BaseFont"))}
        tu = _rr(parser, font.get("ToUnicode"))
        if isinstance(tu, PDFStream):
            try:
                spec["tounicode"] = bytes(tu.stream())
            except Exception:
                pass
        if spec["type0"]:
            _composite_spec_ref(parser, font, spec)
        else:
            _simple_spec_ref(parser, font, spec)
        enc = _rr(parser, font.get("Encoding"))
        if isinstance(enc, str):
            spec["encoding"] = enc
        elif isinstance(enc, dict):
            base = enc.get("BaseEncoding")
            if isinstance(base, str):
                spec["encoding"] = base
            diffs = _rr(parser, enc.get("Differences"))
            if isinstance(diffs, list):
                spec["differences"] = diffs
        out[name] = build_font_decoder(spec)
    return out


def unicode_from_content(content: bytes, decoders: dict) -> str:
    """Mirror of kernel.textextract.unicode_from_content_bytes over the
    reference scanner: Tf selects the decoder, q/Q save/restore it."""
    scanner = SequentialParser(excise_inline_images(content),
                               content_stream_mode=True)
    pieces, pending = [], []
    current = None
    gs_stack = []
    while True:
        try:
            obj = scanner.parse_object()
        except StopIteration:
            break
        except Exception:
            break
        if not isinstance(obj, PDFOperator):
            pending.append(obj)
            continue
        name = obj.value
        if name == "Tf":
            for operand in pending:
                if isinstance(operand, str):
                    current = decoders.get(operand)
                    break
        elif name == "q":
            gs_stack.append(current)
        elif name == "Q":
            current = gs_stack.pop() if gs_stack else None
        elif name in SHOW_OR_TJ:
            decode = current if current is not None else latin1_decoder
            if name == "TJ":
                for operand in reversed(pending):
                    if isinstance(operand, list):
                        for element in operand:
                            raw = _string_bytes(element)
                            if raw is not None:
                                pieces.append(decode(raw))
                        break
            else:
                for operand in reversed(pending):
                    raw = _string_bytes(operand)
                    if raw is not None:
                        pieces.append(decode(raw))
                        break
        pending = []
    return "".join(pieces)


def _pages_with_resources_ref(parser):
    catalog = parser.parse_reference(parser.trailer["Root"])
    out = []

    def walk(node_ref, inherited):
        node = (parser.parse_reference(node_ref)
                if isinstance(node_ref, PDFReference) else node_ref)
        res = inherited
        if isinstance(node, dict) and node.get("Resources") is not None:
            res = node.get("Resources")
        if isinstance(node, dict) and node.get("Type") == "Pages":
            for kid in node["Kids"]:
                walk(kid, res)
        else:
            out.append((node, res))

    walk(catalog["Pages"], None)
    return out


def oracle_doc_metadata(payload: bytes, password) -> str:
    """Info-dictionary + annotation census through the REFERENCE parser,
    formatted by the SHARED kernel.docmeta.metadata_line (K49 gate)."""
    from pdf4py_spark.kernel.docmeta import METADATA_KEYS, metadata_line

    parser = Parser(payload, password)
    info = _rr_safe(parser, parser.trailer.get("Info"))
    raw = {}
    if isinstance(info, dict):
        for key in METADATA_KEYS:
            b = _string_bytes(_rr_safe(parser, info.get(key)))
            if b is not None:
                raw[key] = bytes(b)
    n_annots = 0
    for page, _resources in _pages_with_resources_ref(parser):
        annots = _rr_safe(parser, page.get("Annots")
                     if isinstance(page, dict) else None)
        if isinstance(annots, list):
            n_annots += len(annots)
    return metadata_line(raw, n_annots)


def oracle_fonts_census(payload: bytes, password):
    """(n_fonts, census_text) through the REFERENCE parser, formatted by
    the SHARED kernel.fonts.font_census_line (the kernel twin is
    pdf4py_spark.kernel.textextract.fonts_census)."""
    from pdf4py_spark.kernel.fonts import font_census_line

    parser = Parser(payload, password)
    lines = set()
    for _page, resources in _pages_with_resources_ref(parser):
        resources = _rr(parser, resources)
        if not isinstance(resources, dict):
            continue
        fonts = _rr(parser, resources.get("Font"))
        if not isinstance(fonts, dict):
            continue
        for name, fref in fonts.items():
            font = _rr(parser, fref)
            if not isinstance(font, dict):
                continue
            enc = _rr(parser, font.get("Encoding"))
            tu = _rr(parser, font.get("ToUnicode"))
            lines.add(font_census_line(
                name, font, enc, isinstance(tu, PDFStream)))
    return len(lines), "\n".join(sorted(lines))


def oracle_extract_unicode(payload: bytes, password) -> bytes:
    parser = Parser(payload, password)
    page_texts = []
    for page, resources in _pages_with_resources_ref(parser):
        contents = page.get("Contents") if isinstance(page, dict) else None
        if contents is None:
            page_texts.append("")
            continue
        decoders = _font_decoders_ref(parser, resources)
        decoded = [bytes(s) for s in content_streams(parser, contents)]
        page_texts.append(unicode_from_content(b"\n".join(decoded), decoders))
    return "\n".join(page_texts).encode("utf-8")


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    manifest = {}
    for url, _ts, payload, _text, _lang in corpus_rows():
        if not url.startswith(("crawl://pdfs/", "crawl://encrypted/",
                               "crawl://synth/", "crawl://adversarial/")):
            continue
        entry = {"parse_ok": False}
        try:
            extracted, n_objects, n_pages, version = oracle_extract(
                payload, password_for(url))
            name = url.rsplit("/", 1)[-1].replace(".", "_") + ".bin"
            with open(os.path.join(GOLDEN_DIR, name), "wb") as fh:
                fh.write(extracted)
            uni = oracle_extract_unicode(payload, password_for(url))
            uname = "uni_" + name
            with open(os.path.join(GOLDEN_DIR, uname), "wb") as fh:
                fh.write(uni)
            n_fonts, census = oracle_fonts_census(
                payload, password_for(url))
            meta_line = oracle_doc_metadata(payload, password_for(url))
            n_links, links_line_s = oracle_doc_links(
                payload, password_for(url))
            xmp_bytes, xmp_md5 = oracle_doc_xmp(
                payload, password_for(url))
            n_bm, outline_line = oracle_doc_outline(
                payload, password_for(url))
            n_xmpf, xmpf_line = oracle_doc_xmp_fields(
                payload, password_for(url))
            entry = {
                "parse_ok": True,
                "bin": name,
                "sha256": hashlib.sha256(extracted).hexdigest(),
                "unicode_bin": uname,
                "unicode_sha256": hashlib.sha256(uni).hexdigest(),
                "n_fonts": n_fonts,
                "fonts_md5": hashlib.md5(
                    census.encode("utf-8")).hexdigest(),
                "meta_md5": hashlib.md5(
                    meta_line.encode("utf-8")).hexdigest(),
                "n_links": n_links,
                "links_md5": hashlib.md5(
                    links_line_s.encode("utf-8")).hexdigest(),
                "xmp_bytes": xmp_bytes,
                "xmp_md5": xmp_md5,
                "n_bookmarks": n_bm,
                "outline_md5": hashlib.md5(
                    outline_line.encode("utf-8")).hexdigest(),
                "n_xmp_fields": n_xmpf,
                "xmp_fields_md5": hashlib.md5(
                    xmpf_line.encode("utf-8")).hexdigest(),
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





def oracle_doc_links(payload: bytes, password):
    """Outlink census through the REFERENCE parser (K50 gate), shared
    formatter kernel.docmeta.links_line."""
    from pdf4py_spark.kernel.docmeta import decode_text_string, links_line

    parser = Parser(payload, password)
    uris = []
    for page, _resources in _pages_with_resources_ref(parser):
        annots = _rr_safe(parser, page.get("Annots")
                     if isinstance(page, dict) else None)
        if not isinstance(annots, list):
            continue
        for aref in annots:
            annot = _rr_safe(parser, aref)
            if not isinstance(annot, dict) \
                    or annot.get("Subtype") != "Link":
                continue
            action = _rr_safe(parser, annot.get("A"))
            if not isinstance(action, dict) or action.get("S") != "URI":
                continue
            raw = _string_bytes(_rr_safe(parser, action.get("URI")))
            if raw is not None:
                uris.append(decode_text_string(bytes(raw)))
    return len(uris), links_line(uris)





def oracle_doc_xmp(payload: bytes, password):
    """Catalog /Metadata packet through the REFERENCE parser (K51)."""
    parser = Parser(payload, password)
    catalog = _rr(parser, parser.trailer["Root"])
    meta = _rr_safe(parser, catalog.get("Metadata")
                    if isinstance(catalog, dict) else None)
    if not isinstance(meta, PDFStream):
        return 0, ""
    try:
        data = bytes(meta.stream())
    except Exception:
        return 0, ""
    return len(data), hashlib.md5(data).hexdigest()


def oracle_doc_xmp_fields(payload: bytes, password):
    """Dublin Core field census through the REFERENCE parser (K53) —
    same bounded regex scan + shared formatter as the kernel's
    doc_xmp_fields."""
    from pdf4py_spark.kernel.docmeta import xmp_fields, xmp_fields_line

    parser = Parser(payload, password)
    catalog = _rr(parser, parser.trailer["Root"])
    meta = _rr_safe(parser, catalog.get("Metadata")
                    if isinstance(catalog, dict) else None)
    if not isinstance(meta, PDFStream):
        return 0, ""
    try:
        data = bytes(meta.stream())
    except Exception:
        return 0, ""
    fields = xmp_fields(data)
    return len(fields), xmp_fields_line(fields)





def oracle_doc_outline(payload: bytes, password):
    """Outline census through the REFERENCE parser (K52) — same walk
    order, bounds, and title decode as kernel.textextract.doc_outline."""
    from pdf4py_spark.kernel.docmeta import decode_text_string
    from pdf4py_spark.kernel.textextract import (
        MAX_OUTLINE_DEPTH, MAX_OUTLINE_NODES,
    )

    parser = Parser(payload, password)
    catalog = _rr(parser, parser.trailer["Root"])
    root = _rr_safe(parser, catalog.get("Outlines")
                    if isinstance(catalog, dict) else None)
    if not isinstance(root, dict):
        return 0, ""
    lines = []
    seen = set()
    stack = [(root.get("First"), 0)]
    while stack and len(lines) < MAX_OUTLINE_NODES:
        node_ref, depth = stack.pop()
        if node_ref is None or depth > MAX_OUTLINE_DEPTH:
            continue
        key = ((node_ref.object_number, node_ref.generation_number)
               if isinstance(node_ref, PDFReference) else id(node_ref))
        if key in seen:
            continue
        seen.add(key)
        node = _rr_safe(parser, node_ref)
        if not isinstance(node, dict):
            continue
        raw = _string_bytes(_rr_safe(parser, node.get("Title")))
        title = decode_text_string(bytes(raw)) if raw is not None else ""
        lines.append("%d|%s" % (
            depth, title.replace("\\", "\\\\").replace("\n", "\\n")
            .replace("\r", "\\r")))
        stack.append((node.get("Next"), depth))
        stack.append((node.get("First"), depth + 1))
    return len(lines), "\n".join(lines)


if __name__ == "__main__":
    main()
