"""Multimodal (image/audio/video) column handling — training-data
pipeline surface.

Media travel as opaque ``binary`` payload columns plus typed metadata,
and decode / feature-extraction runs as Arrow-batched ``mapInPandas``
(the one place Python UDFs are justified: per-item binary decoding that
no built-in expression covers). The container has no image/audio codecs,
so the decode step is a clearly-marked deterministic STUB (STUB_DECODE):
every derived feature is pure md5 arithmetic on the payload. The Spark
plumbing — schema, Arrow batch shape, partition independence — is real
and tested, and precisely because the stub is hash-arithmetic the whole
pandas-UDF path is still oracle-checkable against DuckDB.

Swapping in a real decoder later = replacing ``_stub_decode_one`` with
PIL/ffmpeg calls behind the same signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata

STUB_DECODE = True  # no codec libraries in this environment

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "duration_s double, brightness double"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table from the documents table: payload is the
    utf-8 text bytes (an opaque blob as far as the pipeline is concerned),
    media_type assigned round-robin by doc_id."""
    docs = read_testdata(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _stub_decode_one(payload: bytes) -> dict:
    """STUB decode: deterministic pseudo-metadata from the payload's md5.

    A real implementation would decode the codec here (PIL.Image.open /
    soundfile / pyav); raise NotImplementedError if that is required.
    """
    h = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "width": 16 + int(h[0:4], 16) % 1024,
        "height": 16 + int(h[4:8], 16) % 1024,
        "duration_s": round((int(h[8:12], 16) % 36000) / 100.0, 6),
        "brightness": round(int(h[12:16], 16) / 65535.0, 6),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas streams record batches through the worker — constant
    memory per batch, no per-row Python overhead, and the output schema
    is declared up front so the plan stays well-typed."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_stub_decode_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() surface: synthesize -> Arrow decode -> features."""
    return extract_features(synthesize_media(spark, sf_dir))


# The stub decode is md5 arithmetic, so even the pandas-UDF path has an
# exact DuckDB oracle (md5 of the text == md5 of its utf-8 payload).
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
         AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       (16 + ('0x' || substr(md5(text), 1, 4))::INT % 1024)::INT AS width,
       (16 + ('0x' || substr(md5(text), 5, 4))::INT % 1024)::INT AS height,
       round((('0x' || substr(md5(text), 9, 4))::INT % 36000) / 100.0, 6)
         AS duration_s,
       round(('0x' || substr(md5(text), 13, 4))::INT / 65535.0, 6) AS brightness
FROM documents
"""


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Per-video frame sampling: fan one payload row out to n_frames
    pseudo-frames (frame_idx, frame_hash). Pure expression fan-out via
    explode — the distributed shape of real frame extraction (one row per
    sampled frame), with the actual pixel decode stubbed as md5."""
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.md5(F.concat(F.base64("payload"), i.cast("string"))).alias("frame_hash"),
        ),
    )
    return (
        media.where(F.col("media_type") == "video")
        .select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_idx").alias("frame_idx"),
                F.col("f.frame_hash").alias("frame_hash"))
    )


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image/frame resize plumbing: Arrow-batched ``mapInPandas`` mapping
    payload -> resized payload + updated dimension metadata. The pixel
    resample itself is stubbed (md5 re-hash standing in for the new
    pixel buffer — STUB_DECODE); schema, batch shape, and partition
    independence are the real contract. Swap the body for PIL
    ``Image.resize`` when codecs are available."""
    out_schema = (
        "doc_id long, media_type string, payload binary, "
        "width int, height int"
    )

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: hashlib.md5(
                    b + f":{target_w}x{target_h}".encode()
                ).digest()
            )
            yield pdf.assign(
                payload=resized, width=target_w, height=target_h
            )[["doc_id", "media_type", "payload", "width", "height"]]

    return media.where(F.col("media_type") == "image").mapInPandas(
        resize, out_schema
    )
