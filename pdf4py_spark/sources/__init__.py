"""Corpus/fixture builders and storage (parquet + manifest) for the engine."""
