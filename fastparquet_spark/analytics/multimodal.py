"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not in this container, so the decode
step is a clearly-marked deterministic STUB — but the Spark-side
plumbing is real and tested: binary columns, metadata extraction with
built-in expressions, and an Arrow-batched ``mapInPandas`` feature
extractor with a fixed output schema (the shape a real decoder plugs
into).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from fastparquet_spark.analytics.relational import load


def mm_binary_meta(spark, sf_dir):
    """Binary-column metadata: payload = utf8 bytes of text (stand-in for
    an image blob); extract size/prefix metadata with JVM expressions."""
    docs = load(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.ascii(F.substring("text", 1, 1)).alias("first_byte"),
        F.substring(F.md5(payload), 1, 8).alias("blob_key"))


_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("status", StringType()),
])


def _decode_stub(payload: bytes) -> dict:
    """STUB for the real decoder (PIL/ffmpeg absent in this container).
    Deterministic fake: 'frame count' = payload length // 1024 + 1.
    A real deployment replaces only this function; the Spark plumbing
    (schema, batching, partitioning) is unchanged."""
    return {"n_frames": len(payload) // 1024 + 1, "status": "stub-decoded"}


_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_key", StringType()),
])


def mm_frame_sample(spark, sf_dir, every: int = 4):
    """Frame sampling over opaque video-ish payloads: ONE input row
    fans out to one row per sampled frame (``frame_idx`` stepping by
    ``every``) — the 1->N mapInPandas explode shape a real ffmpeg
    sampler plugs into.  The decode is the same deterministic stub as
    mm_decode_features (n_frames = len // 1024 + 1); the frame key is a
    content-addressed md5 so the oracle can reproduce it exactly."""
    import hashlib

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    every_ = every

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, keys = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // 1024 + 1
                h = hashlib.md5(payload).hexdigest()
                for fi in range(0, n_frames, every_):
                    ids.append(doc_id)
                    idxs.append(fi)
                    keys.append(f"{h[:8]}:{fi}")
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_key": keys})

    return docs.mapInPandas(sample, _FRAME_SCHEMA)


def mm_decode_features(spark, sf_dir):
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the multimodal hot-path shape (batch in, batch out,
    no per-row Python API overhead beyond the decode call itself)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            decoded = [_decode_stub(p) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.str.len().astype("int64"),
                "n_frames": [d["n_frames"] for d in decoded],
                "status": [d["status"] for d in decoded],
            })

    return docs.mapInPandas(extract, _FEATURE_SCHEMA)
