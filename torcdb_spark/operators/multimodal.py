"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; transforms run as Arrow-batched Pandas UDFs over
``mapInPandas`` so payload bytes never round-trip through Python row
objects. The decode kernels themselves are STUBBED (image/audio libraries
are not in this container, marked NotImplementedError / deterministic
fakes) — the Spark-side plumbing (schema, batch iteration, partitioning,
UDF signatures) is real and tested.

At 100 TB: payloads dominate; the operators keep them in Arrow buffers,
never collect them, and the repartition key is the id — size partitions
with spark.sql.files.maxPartitionBytes so a batch of payloads fits in
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: wrap the documents fixture as a media table (text bytes as
    the opaque payload) so the multimodal plumbing is exercised by real
    fixture data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def decode_image(payload: bytes) -> "object":
    """Image decode kernel — STUB: no imaging library in this container.
    A deployment installs pillow/opencv and replaces this body."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; extract_features uses deterministic byte statistics "
        "instead"
    )


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow batches).

    The feature kernel is a deterministic fake (byte histogram moments) so
    the full distributed path — batch iteration, binary columns through
    Arrow, schema of the result — is real and testable without media libs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes, means, feats = [], [], []
            for p in payloads:
                if p is None:
                    n_bytes.append(0)
                    means.append(0.0)
                    feats.append([0.0] * feature_dim)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                n_bytes.append(int(arr.size))
                means.append(float(arr.mean()) if arr.size else 0.0)
                # deterministic fake embedding: bucketed byte histogram
                hist = np.histogram(arr, bins=feature_dim, range=(0, 256))[0]
                total = hist.sum() or 1
                feats.append((hist / total).astype("float32").tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes,
                    "byte_mean": means,
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explodes a frame index per payload
    (decode stubbed — indexes are derived from metadata, the real kernel
    would seek the container format)."""
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("n_frames"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return media.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        F.col("mime"),
    )
