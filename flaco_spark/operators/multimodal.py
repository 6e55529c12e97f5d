"""Multimodal (image/audio/video) column plumbing.

Design: media lives in ordinary DataFrames as an opaque ``binary``
payload column plus a typed metadata struct — the same "columnar
table, binary cells" model the reference applies to BYTEA
(``/root/reference/src/lib.rs:202-207``), extended with the Spark-side
machinery a 100 TB media pipeline needs:

- schema contract (``MEDIA_SCHEMA`` fields on every media table),
- Arrow-batched Python decode via ``mapInPandas`` (the only sane way
  to run codec libraries per-row at scale),
- partition-size control before the decode stage (decode is CPU-bound;
  repartition so each task holds a bounded number of payloads).

The actual codecs (PIL / torchaudio / ffmpeg) are NOT present in this
environment, so ``decode_image`` raises ``NotImplementedError`` unless
a library is importable, and the default pipeline uses a clearly
marked deterministic fake extractor — the Spark plumbing (schemas,
batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flaco_spark.inventory import register
from flaco_spark.tables import table

# Schema contract for media feature extraction output.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata shim: derive an opaque binary payload + metadata struct
    from a text column (stands in for real image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.length(payload).alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.md5(payload).alias("checksum"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def decode_image(payload: bytes) -> "object":
    """Real decoder — requires an imaging library not present here."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires PIL; use extract_features(fake=True) "
            "for the deterministic stub pipeline"
        ) from exc


def _fake_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE feature extractor (decode stub).

    Mirrors the shape of a real decode: consumes Arrow record batches
    of (doc_id, payload), emits one feature row per payload.  'width'/
    'height'/'n_frames' are derived from the payload bytes so results
    are stable across runs and partitionings.
    """
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        digests = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
        byte_len = payloads.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": byte_len,
                "digest": digests,
                "width": (byte_len % 640 + 1).astype("int32"),
                "height": (byte_len % 480 + 1).astype("int32"),
                "n_frames": (byte_len % 24 + 1).astype("int32"),
            }
        )


def extract_features(
    media_df: DataFrame, fake: bool = True, payload_partition_rows: int = 10_000
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` ships payloads to Python in Arrow batches; the
    repartition bounds payload bytes per task so decode parallelism
    (and memory) is controlled independently of upstream partitioning.
    """
    if not fake:  # pragma: no cover - real codecs absent in this env
        raise NotImplementedError("real decoders not available; pass fake=True")
    n = max(1, media_df.sparkSession.sparkContext.defaultParallelism)
    src = media_df.select("doc_id", "payload").repartition(n)
    return src.mapInPandas(_fake_feature_batches, schema=FEATURE_SCHEMA)


@register(
    "m01_multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
       md5(text) AS digest,
       CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(CAST(text AS BLOB)) % 480 + 1 AS INT) AS height,
       CAST(octet_length(CAST(text AS BLOB)) % 24 + 1 AS INT) AS n_frames
FROM documents
""",
    tags=("multimodal", "udf", "documents"),
    doc="Binary-column media pipeline: payload + metadata struct, then "
    "Arrow-batched mapInPandas feature extraction (deterministic "
    "decode stub; real codecs gated behind NotImplementedError).",
)
def m01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary_payload(table(spark, sf_dir, "documents"))
    return extract_features(d, fake=True)
