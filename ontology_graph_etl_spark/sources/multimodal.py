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
    BinaryType,
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


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload_out", BinaryType(), True),
    ]
)

#: resizer(payload, target_w, target_h) -> dict(width, height, payload_out)
Resizer = Callable[[bytes, int, int], dict]


def fake_resizer(payload: bytes, target_w: int, target_h: int) -> dict:
    """Deterministic resize fake: 'pixels' are the raw bytes; the output
    payload is the input truncated/cycled to ``target_w * target_h``
    bytes — content-derived, so identical across runs/partitionings."""
    n = max(0, target_w * target_h)
    src = payload or b"\x00"
    out = (src * (n // len(src) + 1))[:n]
    return {"width": target_w, "height": target_h, "payload_out": out}


def resize_images(
    assets: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Resizer = fake_resizer,
) -> DataFrame:
    """Resize pass over binary image payloads via ``mapInPandas`` —
    1→1 row shape, partition-preserving, Arrow-batched. Production
    wires a PIL/turbojpeg resizer through the seam; the fake keeps the
    Spark-side contract (schema, batching, determinism) testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for _, row in batch.iterrows():
                payload = row["payload"] if row["payload"] is not None else b""
                r = resizer(bytes(payload), target_w, target_h)
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "width": r.get("width"),
                        "height": r.get("height"),
                        "payload_out": r.get("payload_out"),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("frame_idx", IntegerType(), True),
        StructField("t_offset_ms", LongType(), True),
        StructField("frame_payload", BinaryType(), True),
    ]
)

#: sampler(payload, media_type) -> list of dicts, one per sampled frame
FrameSampler = Callable[[bytes, str], list]


def fake_frame_sampler(payload: bytes, media_type: str) -> list:
    """Deterministic frame-sampling fake with an ARITHMETIC spec (every
    field derives from byte length and position, so an external engine
    can re-derive it): duration is ``n_bytes / 8`` seconds, frame
    count is ``1 + n_bytes mod 4`` (so 1-4 frames), frame ``i`` is the
    byte slice ``[i*stride, (i+1)*stride)`` with ``stride = n_bytes div
    n_frames`` at integer offset ``(i * n_bytes * 1000) div (8 *
    n_frames)`` milliseconds — all-integer arithmetic, so no
    engine-specific float rounding can leak into a hash compare. Empty
    payloads yield no frames (a 0-byte video has nothing to sample)."""
    n = len(payload or b"")
    if n == 0:
        return []
    n_frames = 1 + n % 4
    stride = n // n_frames
    frames = []
    for i in range(n_frames):
        frames.append(
            {
                "n_frames": n_frames,
                "frame_idx": i,
                "t_offset_ms": (i * n * 1000) // (8 * n_frames),
                "frame_payload": payload[i * stride : (i + 1) * stride],
            }
        )
    return frames


def sample_frames(
    assets: DataFrame, sampler: FrameSampler = fake_frame_sampler
) -> DataFrame:
    """Frame sampling over binary video/audio payloads via
    ``mapInPandas`` — the 1→N row shape (one input asset fans out to
    multiple frame rows inside the Arrow batch, no explode/shuffle).
    Production wires an ffmpeg/pyav sampler through the seam.

    At 100 TB this stays an embarrassingly parallel scan: output rows
    are produced inside the same task that read the input split, so
    frame fan-out never shuffles; downstream repartitions only if the
    next stage needs a different key."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for _, row in batch.iterrows():
                payload = row["payload"] if row["payload"] is not None else b""
                for f in sampler(bytes(payload), row["media_type"]):
                    rows.append(
                        {
                            "asset_id": row["asset_id"],
                            "media_type": row["media_type"],
                            **f,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def multimodal_near_duplicates(
    assets: DataFrame,
    decoder: Decoder = fake_decoder,
    threshold: float = 0.95,
    n_bands: int = 2,
    band_bits: int = 4,
    center: bool = True,
) -> DataFrame:
    """Perceptual-hash-style near-duplicate detection over binary
    media assets — the multimodal counterpart of the text corpus's
    q82/q87 embedding dedup: decode each payload to a feature vector
    through the injectable ``decoder`` seam
    (:func:`extract_features`), then find near-dup pairs with the
    banded sign-LSH + cosine-verify production path
    (``similarity.embedding_near_duplicates_lsh`` — candidates from a
    (band, bucket) equi-join, linear in rows×bands, never all-pairs).

    ``center=True`` (default) subtracts the per-dimension corpus mean
    before hashing: sign-LSH needs roughly zero-centered coordinates,
    and raw perceptual features (histograms, the digest fake) are
    often all-nonnegative — uncentered they put EVERY asset in the
    all-ones bucket and the candidate set degenerates to all-pairs.
    The means come from one tiny per-dimension aggregate (posexplode →
    avg, rounded to 6 dp for engine portability) broadcast back as an
    array — no driver collect, no corpus rescan. Assets whose decode
    yields no feature vector are skipped.

    Returns ``(id_a, id_b, cosine_sim)`` pairs with rounded cosine >=
    ``threshold`` — exact byte-duplicates score 1.0 by construction.
    At 100 TB the costs are the decode scan (embarrassingly parallel)
    and the rows×bands bucket shuffle; the feature vectors riding the
    joins are decode-sized (a few doubles), never the payloads."""
    from ..operators.similarity import embedding_near_duplicates_lsh

    feats = extract_features(assets, decoder).select(
        "asset_id", "feature_vec"
    )
    vecs = feats.where(
        F.col("feature_vec").isNotNull() & (F.size("feature_vec") > 0)
    )
    if center:
        means = (
            vecs.select(
                F.posexplode("feature_vec").alias("pos", "val")
            )
            .groupBy("pos")
            .agg(F.round(F.avg("val"), 6).alias("mu"))
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "mu"))
                ).alias("pm")
            )
            .select(
                F.transform(F.col("pm"), lambda s: s["mu"]).alias(
                    "mu_vec"
                )
            )
        )
        vecs = vecs.crossJoin(F.broadcast(means)).select(
            "asset_id",
            F.zip_with(
                "feature_vec", "mu_vec", lambda x, m: x - m
            ).alias("feature_vec"),
        )
    return embedding_near_duplicates_lsh(
        vecs,
        "asset_id",
        "feature_vec",
        threshold=threshold,
        n_bands=n_bands,
        band_bits=band_bits,
    )
