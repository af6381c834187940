"""HTML main-content extraction (boilerplate strip).

New capability required by the north rule (the reference parses only PDFs);
deterministic rules only, so the same function defines both the engine
behavior and the golden fixtures:

* the subtrees of non-content containers (script/style/head/nav/...) are
  dropped entirely, as are comments, processing instructions, and
  declarations
* text is accumulated into blocks; block-level tags flush the current
  block; whitespace runs inside a block collapse to a single space
* character/entity references are decoded (stdlib convert_charrefs)
* the result is the non-empty blocks joined with '\n', encoded UTF-8

The input payload must decode as UTF-8 (strict); anything else is not
text-bearing HTML for our purposes and the caller quarantines the row.
"""

from __future__ import annotations

from html.parser import HTMLParser

DROP_SUBTREES = frozenset((
    "script", "style", "noscript", "template", "svg", "head", "nav",
    "header", "footer", "aside", "form", "iframe", "button", "select",
    "option", "label", "object", "embed", "applet",
))

BLOCK_TAGS = frozenset((
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "dt", "dd",
    "td", "th", "tr", "table", "thead", "tbody", "ul", "ol", "dl",
    "blockquote", "pre", "article", "section", "main", "figure",
    "figcaption", "br", "hr", "address", "caption", "summary", "details",
    "body", "html",
))


class _ContentCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._current: list[str] = []
        self._drop_depth = 0

    def _flush(self):
        if self._current:
            text = " ".join("".join(self._current).split())
            if text:
                self.blocks.append(text)
            self._current = []

    def handle_starttag(self, tag, attrs):
        if tag in DROP_SUBTREES:
            self._drop_depth += 1
            self._flush()
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in DROP_SUBTREES:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            self._flush()
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in BLOCK_TAGS or tag in DROP_SUBTREES:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth == 0:
            self._current.append(data)

    def close(self):
        super().close()
        self._flush()


def extract_html_text(payload: bytes) -> bytes:
    """Strip boilerplate and return main-content text bytes (UTF-8).

    Raises UnicodeDecodeError for non-UTF-8 payloads — the caller turns
    that into a quarantine row.
    """
    text = payload.decode("utf-8")
    collector = _ContentCollector()
    collector.feed(text)
    collector.close()
    return "\n".join(collector.blocks).encode("utf-8")


#: a block survives density selection when it is at least this fraction
#: of the longest block's length (deterministic text-density heuristic)
DENSITY_RATIO = 0.25


def extract_html_main(payload: bytes) -> bytes:
    """Main-content selection: boilerplate-strip, then keep only the
    text-dense blocks (>= DENSITY_RATIO of the longest block). Drops the
    short navigational/promo fragments that survive tag-based stripping
    (the second stage of classic boilerplate removal)."""
    text = payload.decode("utf-8")
    collector = _ContentCollector()
    collector.feed(text)
    collector.close()
    blocks = collector.blocks
    if not blocks:
        return b""
    threshold = max(len(b) for b in blocks) * DENSITY_RATIO
    dense = [b for b in blocks if len(b) >= threshold]
    return "\n".join(dense).encode("utf-8")
