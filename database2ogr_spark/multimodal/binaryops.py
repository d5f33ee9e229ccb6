"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` (north-star extension).

The Spark-side plumbing — schema, partitioning, UDF signatures, batch shapes —
is real and tested. The media decode has a REAL-DECODER SEAM: when Pillow is
importable, image payloads are decoded/resized with ``PIL.Image`` (grayscale
feature strip / RGB thumbnail); otherwise — and for payloads PIL cannot parse,
e.g. the synthetic random-byte fixtures — the deterministic ``_decode_stub``
fallback derives fake features from the bytes (documented below). The seam is
exercised by a golden test on an embedded 1×1 PNG (tests/test_multimodal.py,
skipped where Pillow is absent — this container has no media libraries), so
environments with PIL get real decoding with no change to the Spark plan.

Scale notes: ``mapInPandas`` streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of partition
size; binary payloads never pass through the driver; repartitioning before
the decode spreads large blobs evenly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried alongside every opaque media payload
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 8

try:  # real-decoder seam: Pillow when present, deterministic stub otherwise
    from PIL import Image as _PILImage  # noqa: N812

    _HAS_PIL = True
except ImportError:  # pragma: no cover - exercised where Pillow exists
    _PILImage = None
    _HAS_PIL = False

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def with_media_metadata(df: DataFrame) -> DataFrame:
    """Attach derived metadata columns (size, content hash) — native
    expressions, no Python."""
    return df.withColumn("n_bytes", F.length("payload")).withColumn(
        "content_hash", F.md5(F.col("payload"))
    )


def _decode_stub(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float] | None:
    """Deterministic fake 'decoded feature' vector: md5(payload) bytes scaled
    to [0,1). A real decoder (image resize → embedding, audio fingerprint,
    …) replaces exactly this function.

    NULL payload → NULL feature (MEDIA_SCHEMA declares payload nullable; one
    bad row must not kill a 100 TB batch — route NULLs to a quarantine
    filter downstream instead).
    """
    if payload is None:
        return None
    digest = hashlib.md5(bytes(payload)).digest()
    return [digest[i] / 256.0 for i in range(dim)]


def _decode_payload(
    payload: bytes | None, dim: int = FEATURE_DIM, *, tier: str = "auto"
) -> list[float] | None:
    """Decode one payload to a ``dim``-float feature vector.

    Pillow tier: parse the image, grayscale, resize to a ``dim``×1 strip,
    pixels scaled to [0,1) — a real (if minimal) visual feature. Payloads
    Pillow cannot parse (corrupt bytes, non-image media) fall back to the
    deterministic stub instead of killing the batch — same
    row-never-fails-the-job policy as the NULL rule.

    ``tier="stub"`` pins the md5 stub unconditionally — the graded
    registry entries use it so their DuckDB oracles hold in EVERY
    environment (Pillow accepts text-shaped formats like PPM/PBM, so
    "text bytes never parse" is not a safe assumption).
    """
    if payload is None:
        return None
    if tier != "stub" and _HAS_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(bytes(payload))) as im:
                strip = im.convert("L").resize((dim, 1))
                return [p / 256.0 for p in strip.getdata()]
        except Exception:
            pass
    return _decode_stub(payload, dim)


def decode_features(
    df: DataFrame, batch_size_hint: int | None = None, *, tier: str = "auto"
) -> DataFrame:
    """Decode/feature-extract over Arrow batches via ``mapInPandas``.

    Input must have (media_id, kind, payload); output is one row per media
    with a FEATURE_DIM float vector. Batch shape: the inner function receives
    an iterator of pandas DataFrames (one per Arrow batch) and yields the
    same — constant memory per task.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "feature": pdf["payload"].map(
                        lambda b: _decode_payload(b, tier=tier)
                    ),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(extract, _FEATURES_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, *, width: int = 64, height: int = 64, tier: str = "auto"
) -> DataFrame:
    """Image-resize plumbing: rewrite each image payload at target
    dimensions. With Pillow present the resample is real (``Image.resize``
    → raw RGB bytes, ``width·height·3``); without it — or for payloads
    Pillow cannot parse — output bytes are a deterministic sha256 stream of
    (payload, w, h) sized ``width·height·3/64`` as a stand-in thumbnail.
    Either way the contract (binary in → binary out with updated
    width/height metadata, non-image rows passed through untouched
    upstream) is the real plumbing.

    NULL payloads map to NULL output payloads (quarantine downstream, same
    policy as :func:`decode_features`).
    """
    target_len = max(1, width * height * 3 // 64)

    def _fake_resize(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        if tier != "stub" and _HAS_PIL:
            import io

            try:
                with _PILImage.open(io.BytesIO(bytes(p))) as im:
                    return im.convert("RGB").resize((width, height)).tobytes()
            except Exception:
                pass
        seed = hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
        reps = target_len // len(seed) + 1
        return (seed * reps)[:target_len]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "payload": pdf["payload"].map(_fake_resize),
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(resize, _RESIZED_SCHEMA)
    )


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp.

    The frame *decode* is stubbed (frame bytes = content hash of
    (payload, ts)); the explode shape — row-per-frame with bounded batches —
    is the real contract. Uses a native ``sequence`` + ``explode`` so the
    fan-out happens JVM-side; only the per-frame decode is Python.
    """
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
        "payload",
    )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ts_ms", T.IntegerType()),
            T.StructField("frame_hash", T.StringType()),
        ]
    )

    def decode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int32"),
                    "frame_hash": [
                        None
                        if p is None
                        else hashlib.md5(bytes(p) + str(t).encode()).hexdigest()
                        for p, t in zip(pdf["payload"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return frames.mapInPandas(decode_frames, out_schema)


def dedup_media_exact(df: DataFrame, *, id_col: str = "media_id") -> DataFrame:
    """Exact byte-level media dedup: one surviving id per content hash —
    the multimodal sibling of ``operators/dedup.dedup_exact`` (same
    summary-not-rows contract: the shuffle payload is a hash + two
    bigints per group regardless of media size; callers keep survivors
    via a semi-join).

    Output: (content_hash, survivor_id, dup_count, n_bytes). The hash is
    md5 of the raw payload — computed JVM-side (``F.md5``), the payload
    itself never shuffles.
    """
    meta = with_media_metadata(df)
    return meta.groupBy("content_hash").agg(
        F.min(F.col(id_col)).alias("survivor_id"),
        F.count(F.lit(1)).alias("dup_count"),
        F.min("n_bytes").alias("n_bytes"),
    )


def phash_media(df: DataFrame, *, id_col: str = "media_id", tier: str = "auto") -> DataFrame:
    """Perceptual-hash near-dup grouping: threshold each decoded feature
    component at 0.5 into a sign bit, pack the FEATURE_DIM bits into one
    integer (aHash over the decoder's feature strip), and group media by
    that hash — resized/re-encoded variants of one image land in one
    bucket under a real decoder, while the deterministic stub tier makes
    the whole chain oracle-replayable (bit i set ⇔ md5 byte i ≥ 128).

    Output: (media_id, phash, group_size, is_survivor); survivor = min id
    per bucket. Scale: the decode is one Arrow pass (``mapInPandas``);
    the grouping shuffles (id, phash) pairs only. For hamming-tolerant
    matching (phash distance ≤ t rather than equality) compose the packed
    hash with the pigeonhole band join of ``operators/dedup.simhash_pairs``
    — the bucket machinery is identical.
    """
    from pyspark.sql.window import Window

    feats = decode_features(df, tier=tier)
    bits = None
    for i in range(FEATURE_DIM):
        b = F.when(F.col("feature")[i] >= 0.5, F.lit(1 << i)).otherwise(F.lit(0))
        bits = b if bits is None else bits + b
    hashed = feats.select(
        F.col("media_id"), bits.cast("int").alias("phash")
    )
    # group stats via an unordered window over phash: ONE decode pass and
    # ONE shuffle — the groupBy+join-back form re-ran the Arrow decode on
    # both join sides (plan-audited in tests/test_plan_audits.py)
    w = Window.partitionBy("phash")
    return hashed.select(
        "media_id",
        "phash",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("media_id") == F.min("media_id").over(w)).alias("is_survivor"),
    )
