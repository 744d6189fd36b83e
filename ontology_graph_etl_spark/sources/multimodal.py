"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY.md north-star extensions).

The Spark-side contract is real and tested: schema, partition-preserving
``mapInPandas`` with Arrow batches, deterministic batch shapes. The
actual codec work (image decode, audio resample, frame sampling) is
stubbed — the container has no media libraries — behind clearly-marked
seams: pass a real ``decoder`` callable in production, or use
``fake_decoder`` (deterministic, content-derived) in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: decoder(payload, media_type) -> dict of feature name -> value
Decoder = Callable[[bytes, str], dict]

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("feature_vec", ArrayType(DoubleType()), True),
    ]
)


def real_decoder(payload: bytes, media_type: str) -> dict:
    """Production decode seam. The media libraries (PIL/ffmpeg/librosa)
    are intentionally absent from this environment; wire them here."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; inject a decoder "
        "(see fake_decoder for the contract)"
    )


def fake_decoder(payload: bytes, media_type: str) -> dict:
    """Deterministic content-derived fake: stable pseudo-dimensions and an
    8-dim feature vector from the payload digest. Lets every Spark-side
    contract (schema, batching, partitioning) be tested for real."""
    digest = hashlib.sha256(payload or b"").digest()
    vec = [b / 255.0 for b in digest[:8]]
    return {
        "width": 64 + digest[8] % 192 if media_type == "image" else None,
        "height": 64 + digest[9] % 192 if media_type == "image" else None,
        "duration_s": round(digest[10] / 8.0, 3)
        if media_type in ("audio", "video")
        else None,
        "feature_vec": vec,
    }


def extract_features(
    assets: DataFrame, decoder: Decoder = fake_decoder
) -> DataFrame:
    """Decode/feature-extract over binary payloads via ``mapInPandas``.

    Arrow moves the binary batches to Python whole-partition at a time;
    the decoder runs per asset inside the batch loop. Partitioning is
    preserved (no shuffle); at 100 TB this is an embarrassingly parallel
    scan whose only knob is input split size
    (``spark.sql.files.maxPartitionBytes``).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for _, row in batch.iterrows():
                payload = row["payload"] if row["payload"] is not None else b""
                feats = decoder(bytes(payload), row["media_type"])
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "media_type": row["media_type"],
                        "n_bytes": len(payload),
                        "width": feats.get("width"),
                        "height": feats.get("height"),
                        "duration_s": feats.get("duration_s"),
                        "feature_vec": feats.get("feature_vec"),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURES_SCHEMA.fields],
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def binary_metadata(df: DataFrame, payload_col: str, id_cols: list[str]) -> DataFrame:
    """Cheap JVM-side metadata over binary payloads (no Python): byte
    length + sha256 digest. The fast path for dedup/audit over blobs."""
    return df.select(
        *id_cols,
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256_hex"),
    )
