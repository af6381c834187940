"""Extraction plan assembly (DataFrame-first; the only Python is the
Arrow-batched kernel)."""

from .pipeline import (  # noqa: F401
    EXTRACT_SCHEMA, extract_pages, extracted_view, lineage_view,
    metrics_rollup, metrics_view, run_resumable,
)
