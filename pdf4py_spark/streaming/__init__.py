"""Structured Streaming adapter for the extraction kernel.

The kernel is stateless per document, so the batch plan drops into a
stream unchanged: readStream over the pages table directory ->
foreachBatch(extract + append). Watermarks/stateful operators are not
needed for extraction itself; the events-table session/window analytics
live in operators.relational and run identically under a stream via the
same foreachBatch shape.
"""

from .stream import extraction_stream, run_stream_once  # noqa: F401
