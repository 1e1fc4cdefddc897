"""Multimodal binary-column plumbing (stubs for decode, real Spark
schema/batching)."""

import hashlib

import pytest

from aarhus_spark.operators.multimodal import (
    decode_image,
    documents_as_media,
    media_metadata,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return documents_as_media(docs)


def test_media_metadata(spark, media, sf_dir):
    got = {r["doc_id"]: (r["byte_len"], r["sha256"], r["kind"])
           for r in media_metadata(media).collect()}
    want = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()}
    assert len(got) == len(want)
    for d, text in want.items():
        b = text.encode()
        assert got[d] == (len(b), hashlib.sha256(b).hexdigest(), "text/plain")


def test_sample_frames_shape(media):
    frames = sample_frames(media, every_n_bytes=100)
    rows = frames.collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, fs in by_doc.items():
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs == list(range(len(fs)))           # dense frame ids
        assert all(len(f["frame_bytes"]) <= 100 for f in fs)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
