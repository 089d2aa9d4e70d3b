"""Multimodal column plumbing (SURVEY.md M5): image/audio/video as
opaque ``binary`` columns + typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The container ships no image/audio codecs, so the *decode kernels* are
deterministic fakes / ``NotImplementedError`` stubs behind
``_HAS_CODECS`` — but the Spark-side plumbing (schemas, batch
iteration, partition-parallel UDF execution, metadata pushdown) is real
and tested. Swapping the kernel body for PIL/torchaudio is a one-line
change that does not touch the plan shape.

Scale notes: ``mapInPandas`` streams Arrow record batches through the
Python worker — memory stays bounded by batch size, rows never
materialize on the driver; partition count controls parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # real codecs are not in this environment; gate behind import-try
    import PIL.Image  # type: ignore # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, sample_rate int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes bigint, checksum string, feat_mean double"


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stands in for spark.read.format('binaryFile')).

    Partition count scales with rows (~16 rows per partition, as a real
    binaryFile scan would pack by bytes) instead of inheriting the
    default parallelism — 32 near-empty partitions each paying Python
    worker + Arrow setup dominated the runtime for tiny tables."""
    base = spark.range(0, n, 1, max(1, min(n // 16, 64))).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)), "utf-8").alias("payload"),
        (F.col("id") % 640 + 16).cast("int").alias("width"),
        (F.col("id") % 480 + 16).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )
    return base


def decode_image(payload: bytes) -> bytes:
    """Stub decode kernel — replace with PIL when codecs are available."""
    if not _HAS_CODECS:
        raise NotImplementedError("image codecs not available in this environment")
    raise NotImplementedError("wire PIL.Image.open here")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The fake 'feature' (mean byte value) exercises the real data path:
    binary column -> pandas batch -> numeric feature column.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "feat_mean": payloads.map(
                        lambda b: float(sum(bytes(b))) / max(len(bytes(b)), 1)
                    ),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


N_MEDIA = 64


def media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: feature extraction over the synthetic media table
    (``sf`` unused — media is generated, standing in for binaryFile).

    The DuckDB oracle recomputes the kernel in SQL, so the ``mapInPandas``
    Arrow path is *value*-checked end-to-end, not just smoke-run."""
    return extract_features(synthetic_media(spark, N_MEDIA))


# payload is ASCII, so chars == bytes; ascii() gives the byte value.
_MEDIA_SQL = f"""
SELECT id AS media_id,
  (['image','audio','video'])[CAST(id % 3 AS INT) + 1] AS kind,
  'payload-' || sha256(CAST(id AS VARCHAR)) AS payload
FROM range({N_MEDIA}) t(id)
"""

MEDIA_FEATURES_SQL = f"""
WITH media AS ({_MEDIA_SQL})
SELECT media_id, kind,
  CAST(LENGTH(payload) AS BIGINT) AS n_bytes,
  md5(payload) AS checksum,
  CAST(list_sum(list_transform(generate_series(1, LENGTH(payload)),
       i -> ascii(substr(payload, i, 1)))) AS DOUBLE) / LENGTH(payload) AS feat_mean
FROM media
"""


def media_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: the video frame-sampling plan."""
    return frame_sample_plan(synthetic_media(spark, N_MEDIA))


MEDIA_FRAME_SAMPLE_SQL = f"""
WITH media AS ({_MEDIA_SQL})
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
  CAST(frame_idx * LENGTH(payload) AS INT) AS byte_offset
FROM media, UNNEST(generate_series(0, 90, 10)) AS t(frame_idx)
WHERE kind = 'video'
"""


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    descriptors (frame index + byte offsets) without decoding — the
    shape a real frame sampler would fill in."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(90), F.lit(every_n))).alias("frame_idx"),
        F.length("payload").alias("_payload_len"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * F.col("_payload_len")).alias("byte_offset"),
    )


from multi_attribute_join_search_with_mapreduce_spark.registry import QuerySpec  # noqa: E402

MULTIMODAL_QUERIES: dict[str, QuerySpec] = {
    "media_features": QuerySpec(media_features, MEDIA_FEATURES_SQL),
    "media_frame_sample": QuerySpec(media_frame_sample, MEDIA_FRAME_SAMPLE_SQL),
}
