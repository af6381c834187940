"""Per-document extraction entry point used by the Spark kernel.

``extract_document(payload, password)`` is total: it never raises. Every
failure mode becomes a quarantine record (status != 'ok'), because one bad
document must not fail a task at 10^12-row scale (deliberate inversion of
the reference's raise-with-context behavior, _lexer.py:205-227).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .htmlextract import extract_html_text
from .model import BadPasswordError, PackedEntry, UnsupportedFeatureError
from .parser import DocumentParser
from .textextract import extract_pdf_text, extract_pdf_text_unicode

PDF_MAGIC = b"%PDF-"

# deep object graphs are bounded by ObjectScanner.MAX_NESTING (a
# quarantinable StructureError), so no global recursion-limit mutation is
# needed — adversarial nesting can never reach the CPython C stack


@dataclass
class ExtractionResult:
    doc_kind: str
    status: str
    extracted: bytes | None = None
    error: str | None = None
    n_objects: int = 0
    n_xref_sections: int = 0
    n_compressed_objects: int = 0
    filters: list = field(default_factory=list)
    decrypt_hit: bool = False
    parse_ok: bool = False
    n_pages: int = 0
    version: str | None = None
    bytes_in: int = 0
    bytes_out: int = 0
    wall_ms: float = 0.0


def sniff_kind(payload: bytes) -> str:
    """Dispatch predicate; MUST stay in lockstep with the Catalyst
    expression in pdf4py_spark.functions.dispatch_kind."""
    return "pdf" if payload[:5] == PDF_MAGIC else "html"


#: bytes captured on each side of a failure offset in quarantine rows
ERROR_CONTEXT_BYTES = 100


def _error_context(payload: bytes, exc: Exception) -> str:
    """+-100-byte window around the failure offset, when the kernel error
    carries one (parity with the reference's enriched messages,
    /root/reference/pdf4py/_lexer.py:165-227) — at 10^12-doc scale a
    quarantine row must be debuggable without refetching the document."""
    pos = getattr(exc, "pos", None)
    if pos is None or not payload:
        return ""
    start = max(pos - ERROR_CONTEXT_BYTES, 0)
    window = bytes(payload[start:pos + ERROR_CONTEXT_BYTES])
    return " | position %d, context[%d:]: %r" % (pos, start, window)


def extract_document(payload, password=None,
                     text_mode: str = "raw") -> ExtractionResult:
    started = time.perf_counter()
    if isinstance(payload, memoryview):
        payload = bytes(payload)
    kind = sniff_kind(payload) if payload else "html"
    res = ExtractionResult(doc_kind=kind, status="ok",
                           bytes_in=len(payload) if payload else 0)
    try:
        if not payload:
            res.status = "error"
            res.error = "empty payload"
        elif kind == "pdf":
            _extract_pdf(payload, password, res, text_mode)
        else:
            res.extracted = extract_html_text(payload)
            res.parse_ok = True
    except BadPasswordError as exc:
        res.status = "wrong_password"
        res.error = str(exc) or "wrong password"
    except UnsupportedFeatureError as exc:
        res.status = "unsupported"
        res.error = str(exc)
    except RecursionError:
        res.status = "error"
        res.error = "object graph too deep"
    except Exception as exc:  # noqa: BLE001 - totality is the contract
        res.status = "error"
        res.error = ("%s: %s" % (type(exc).__name__, exc)
                     + _error_context(payload, exc))
    if res.extracted is not None:
        res.bytes_out = len(res.extracted)
    if res.status != "ok":
        res.parse_ok = False
        res.extracted = None
        res.bytes_out = 0
    res.wall_ms = (time.perf_counter() - started) * 1000.0
    return res


def _extract_pdf(payload: bytes, password, res: ExtractionResult,
                 text_mode: str = "raw"):
    doc = DocumentParser(payload, password=password)
    res.version = doc.version
    res.decrypt_hit = doc.security is not None
    res.n_xref_sections = doc.n_xref_sections
    entries = list(doc.xref.entries()) if doc.xref is not None else []
    res.n_objects = len(entries)
    res.n_compressed_objects = sum(
        1 for e in entries if isinstance(e, PackedEntry))
    pages = doc.page_dicts()
    res.n_pages = len(pages)
    if text_mode == "unicode":
        res.extracted = extract_pdf_text_unicode(doc)
    else:
        res.extracted = extract_pdf_text(doc, pages)
    res.filters = sorted(doc.filters_seen)
    res.parse_ok = True
