"""Multimodal column handling: opaque ``binary`` payloads + typed metadata,
with decode / frame-sample as Arrow-batched kernels.

The image/audio codec libraries are not in this container, so the decode
step is STUBBED: ``decode_media`` raises NotImplementedError for real
codecs and a deterministic fake decoder stands in for tests/benchmarks.
The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signature — is real and tested; swapping the stub for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import functions as F

from . import QuerySpec, table

MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4", "text/plain")

FRAME_SCHEMA = ("doc_id bigint, media_type string, frame_idx int, "
                "frame_bytes int, frame_md5 string")


def decode_media(payload: bytes, media_type: str):
    """Real-codec seam. In production this dispatches to PIL / soundfile /
    pyav; in this container only the deterministic fake path exists."""
    if media_type == "text/plain":
        return payload
    raise NotImplementedError(
        "codec for %s not available in this environment" % media_type)


def fake_frames(payload: bytes, media_type: str, n_frames: int = 4):
    """Deterministic stand-in for frame sampling / feature extraction:
    fixed-count contiguous byte slices of the payload."""
    if not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step:(i + 1) * step] for i in range(n_frames)
            if payload[i * step:(i + 1) * step]]


def media_table(spark, sf_dir):
    """Synthesize a media table from documents: binary payload + typed
    metadata columns (the pages-table pattern applied to media)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"))
        .alias("media_type"))


def _frame_sample_batches(batches):
    for pdf in batches:
        out = {k: [] for k in
               ("doc_id", "media_type", "frame_idx", "frame_bytes",
                "frame_md5")}
        for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]):
            for idx, frame in enumerate(fake_frames(payload, mtype)):
                out["doc_id"].append(doc_id)
                out["media_type"].append(mtype)
                out["frame_idx"].append(idx)
                out["frame_bytes"].append(len(frame))
                # digest of the LOWERCASE HEX of the frame bytes (not the
                # raw bytes): this duckdb build has no md5(BLOB), and hex
                # makes the fake sampler exactly SQL-expressible, so the
                # driver gets a full value-hash gate instead of rows-only
                out["frame_md5"].append(
                    hashlib.md5(frame.hex().encode()).hexdigest())
        yield pd.DataFrame(out)


def media_metadata(spark, sf_dir):
    """Typed metadata over opaque binary payloads — pure Catalyst."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id", "media_type",
        F.octet_length("payload").cast("bigint").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"))


MEDIA_METADATA_SQL = """
SELECT doc_id,
       ['image/png', 'audio/wav', 'video/mp4', 'text/plain']
         [CAST(doc_id % 4 AS INT) + 1] AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def media_frame_sample(spark, sf_dir):
    """Arrow-batched frame sampling over the media table (the mapInPandas
    plumbing for real decoders). The deterministic byte-slice fake is
    SQL-expressible, so it carries an exact DuckDB oracle."""
    media = media_table(spark, sf_dir).repartition(8, "doc_id")
    return media.mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA)


MEDIA_FRAME_SQL = """
WITH sized AS (
  SELECT doc_id,
         ['image/png', 'audio/wav', 'video/mp4', 'text/plain']
           [CAST(doc_id % 4 AS INT) + 1] AS media_type,
         lower(hex(encode(text))) AS hx,
         GREATEST(octet_length(encode(text)) // 4, 1) AS step
  FROM documents WHERE octet_length(encode(text)) > 0
),
frames AS (
  SELECT doc_id, media_type, i AS frame_idx,
         substring(hx, i * step * 2 + 1, step * 2) AS fh
  FROM sized, (SELECT unnest(generate_series(0, 3)) AS i) g
)
SELECT doc_id, media_type, CAST(frame_idx AS INT) AS frame_idx,
       CAST(length(fh) // 2 AS INT) AS frame_bytes,
       md5(fh) AS frame_md5
FROM frames WHERE length(fh) > 0
"""


QUERIES = {
    "media_metadata": QuerySpec(media_metadata, MEDIA_METADATA_SQL),
    "media_frame_sample": QuerySpec(media_frame_sample, MEDIA_FRAME_SQL),
}
