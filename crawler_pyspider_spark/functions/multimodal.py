"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

A 100 TB training-data pipeline carries media alongside text.  The
Spark-side contract is:

- payload stays an opaque ``binary`` column (never decoded into the
  JVM row — only length/offset arithmetic happens JVM-side);
- typed metadata travels as ordinary columns (``kind``, sizes, codec
  hints) so partition pruning and filters work without touching bytes;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — one narrow pass, no shuffle, batch size
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
  partition of large blobs never materializes at once.

The actual codecs (PIL / libav) are not in this container, so
``decode_image`` is a clearly-marked stub behind an import-try; the
Spark plumbing (schemas, UDF signatures, batch iteration, determinism)
is real and tested.  ``media_features`` uses a deterministic md5-derived
fake featurizer so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video | text
        StructField("data", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(data: bytes):
    """Decode an image payload to pixels.

    STUB: real decoding needs PIL/turbojpeg, which this container does
    not ship.  The Spark-side plumbing that would call this
    (``media_features`` / ``mapInPandas``) is real; swap this function
    body for ``Image.open(io.BytesIO(data))`` in production.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; container ships none — "
            "use fake_features() for deterministic tests"
        )
    raise NotImplementedError("production decode path intentionally unwired in sandbox")


def fake_features(data: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in featurizer: feature j = md5-derived value
    in [0, 1) from the payload's hex plus the feature index.  Matches
    the SQL oracle ``md5int(hex(data) || '|' || j) % 1000 / 1000``."""
    hx = data.hex().upper()
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{hx}|{j}".encode()).hexdigest()
        out.append((int(h[:15], 16) % 1000) / 1000.0)
    return out


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_features(media: DataFrame, dim: int = 4) -> DataFrame:
    """Feature extraction over the media table via ``mapInPandas``.

    One Arrow batch in, one out; only (media_id, data) are read thanks
    to column pruning through mapInPandas' required-schema projection.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["data"].map(len).astype("int64"),
                    "features": pdf["data"].map(lambda b: fake_features(b, dim)),
                }
            )

    return media.select("media_id", "data").mapInPandas(extract, FEATURES_SCHEMA)


def frame_offsets(media: DataFrame, k: int = 4) -> DataFrame:
    """Deterministic frame-sample byte offsets — pure JVM column math
    (the video-frame-sampling planner step; the decode of each sampled
    frame would be another mapInPandas stage)."""
    n = F.length(F.col("data"))
    idx = F.sequence(F.lit(0), F.lit(k - 1))
    return media.select(
        "media_id",
        n.alias("n_bytes"),
        F.transform(idx, lambda j: (n * j / k).cast("long")).alias("offsets"),
    )


def docs_as_media(spark, sf_dir: str) -> DataFrame:
    """Adapter: the documents table as a media table (payload = utf-8
    bytes of the text) — the sandbox stand-in for real image bytes."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        F.create_map(F.lit("src"), F.lit("documents")).alias("meta"),
    )
