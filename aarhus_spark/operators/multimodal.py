"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata.
The Spark-side plumbing (schemas, Arrow batch shapes, partition-safe
mapInPandas) is REAL and tested; the actual media decode is stubbed
behind ``NotImplementedError`` / a deterministic fake because no
image/audio library ships in this container (task contract).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, byte_len long, sha256 string, kind string"
)

FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes binary"
)


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Extract typed metadata from an opaque binary column via
    mapInPandas (Arrow batches of bytes → pandas .map over the batch —
    per-batch Python, never per-row pickling). sha256/length have exact
    SQL twins, which is what makes this plumbing oracle-checkable."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payload = pdf[payload_col]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": payload.map(lambda b: len(b) if b is not None else 0),
                "sha256": payload.map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None),
                "kind": pdf["kind"] if "kind" in pdf else "binary",
            })

    cols = df.select("doc_id", payload_col,
                     *([c for c in ("kind",) if c in df.columns]))
    return cols.mapInPandas(meta, schema=MEDIA_META_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """STUB: real impl would be PIL/opencv decode inside the batch
    loop. No imaging library ships in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; plug PIL/cv2 in here — the Spark plumbing "
        "(media_metadata / sample_frames) is already batch-shaped for it")


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  payload_col: str = "payload") -> DataFrame:
    """Deterministic fake 'frame sampling': slices the payload every
    ``every_n_bytes`` — stands in for video frame extraction with the
    exact partitioning/batching/schema a real decoder would use."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                if b is None:
                    continue
                for i, s in enumerate(range(0, len(b), every_n_bytes)):
                    rows.append((int(doc_id), i, bytes(b[s:s + every_n_bytes])))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df.select("doc_id", payload_col).mapInPandas(frames, schema=FRAME_SAMPLE_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for tests/harness: treat documents.text bytes as an
    opaque payload with metadata — same shape a WARC/image table has."""
    return df.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("kind"),
    )
