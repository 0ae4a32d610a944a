"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted inside Arrow batches (mapInPandas).

The image/audio decode libraries are not present in this container, so
the decode step is a clearly-marked deterministic stub: real Spark-side
plumbing (schema, batching, partitioning, UDF signature), fake pixels.
``decode_real`` raises NotImplementedError until Pillow/librosa are
importable — swap `_fake_decode` for it on a cluster with the libs.

The stub's determinism (md5-derived dimensions) doubles as a DuckDB
oracle, so even this Python path is hash-verified by the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"\x00\x00\x00": "video/mp4",
}


def sniff_media_type(payload: bytes) -> str:
    for magic, mtype in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return mtype
    return "application/octet-stream"


def decode_real(payload: bytes):  # pragma: no cover - cluster-only path
    """Real decode path; requires imaging/audio libs absent here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decode requires Pillow/librosa; not available in this "
            "container — the pipeline uses the deterministic stub"
        ) from e
    raise NotImplementedError("wire Image.open(io.BytesIO(payload)) here")


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for pixel decode: dimensions and an
    8-dim 'feature' derived from md5(payload). Mirrorable in SQL."""
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[0:2], 16)
    height = 64 + int(h[2:4], 16)
    n_frames = int(h[4], 16)
    feature = [round(int(h[i * 2 : i * 2 + 2], 16) / 255.0, 4) for i in range(8)]
    return width, height, n_frames, feature


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch media decode: (doc_id, payload binary) → metadata +
    feature vector. Batch shape mirrors the extraction UDF so the same
    partitioning/batch-size tuning applies to image corpora."""
    for pdf in batches:
        out = {k.name: [] for k in MEDIA_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            w, h, fr, feat = _fake_decode(raw)
            out["doc_id"].append(int(doc_id))
            out["media_type"].append(sniff_media_type(raw))
            out["n_bytes"].append(len(raw))
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(fr)
            out["feature"].append(feat)
        yield pd.DataFrame(out)


def media_decode_plan(payloads: DataFrame, num_partitions: int | None = None) -> DataFrame:
    spark = payloads.sparkSession
    n = num_partitions or (2 * spark.sparkContext.defaultParallelism)
    return payloads.select("doc_id", "payload").repartition(
        n, F.col("doc_id")
    ).mapInPandas(decode_batch, MEDIA_SCHEMA)


def q_media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: documents.text bytes stand in for media blobs
    (driver testdata carries no image bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return media_decode_plan(payloads).select(
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames"
    )


ORACLE_MEDIA_DECODE_STUB = """
SELECT doc_id,
       'application/octet-stream' AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(64 + CAST('0x' || substr(md5(text), 1, 2) AS INT) AS INT) AS width,
       CAST(64 + CAST('0x' || substr(md5(text), 3, 2) AS INT) AS INT) AS height,
       CAST(CAST('0x' || substr(md5(text), 5, 1) AS INT) AS INT) AS n_frames
FROM documents
"""


QUERIES = {"media_decode_stub": q_media_decode_stub}
ORACLES = {"media_decode_stub": ORACLE_MEDIA_DECODE_STUB}
