"""Document-information metadata (PDF 1.7 §14.3.3 Info dictionary) and
annotation census — the document-level metadata table a corpus pipeline
keeps next to the text.

Shared-formatter pattern (same contract as fonts.font_census_line):
each parser stack resolves its OWN objects into {key: raw bytes} and
formats through this one module, so the gated compare spans resource
traversal + string decryption on two independent stacks, not string
formatting.

Text-string decoding per §7.9.2.2: UTF-16BE with BOM, else 1-byte
PDFDocEncoding — approximated as latin-1, which matches PDFDocEncoding
for the ASCII range and keeps the map total (declared simplification;
the handful of PDFDoc punctuation code points in 0x18-0x1F/0x80-0x9F
would need a 32-entry override table)."""

from __future__ import annotations

#: Info keys carried into the canonical line, fixed order
METADATA_KEYS = ("Title", "Author", "Subject", "Creator", "Producer",
                 "CreationDate", "ModDate")


def decode_text_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def metadata_line(info_raw: dict, n_annots: int) -> str:
    """Canonical one-line form: 7 Info values (empty when absent) + the
    document's annotation count, pipe-joined with pipes/newlines in
    values escaped so the line stays parseable."""
    vals = []
    for key in METADATA_KEYS:
        raw = info_raw.get(key)
        s = decode_text_string(raw) if isinstance(raw, bytes) else ""
        vals.append(s.replace("\\", "\\\\").replace("|", "\\x7c")
                    .replace("\n", "\\n").replace("\r", "\\r"))
    vals.append(str(n_annots))
    return "|".join(vals)


def links_line(uris) -> str:
    """Canonical outlink census: sorted distinct URI strings, one per
    line (occurrence counts are carried separately by the callers)."""
    return "\n".join(sorted(set(uris)))
