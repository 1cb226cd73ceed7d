"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the schema, partitioning, UDF signatures and Arrow batch shapes are real
and tested; the actual codec work is STUBBED (``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is requested)
because no image/audio libraries exist in this container.  On a real
cluster you drop PIL/torchaudio into ``_decode_image_bytes`` /
``_sample_frames`` and nothing else changes.

Reference tie-in: the OCR engine treats page images exactly this way — an
opaque ref plus metadata (``lib/odem/processing/image.py:21-34`` computes
megapixels/DPI from metadata, never pixels, at planning time).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("dpi", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, doc_id string, mime string, "
    "feat array<float>, decode_error string"
)


def megapixels(meta: F.Column) -> F.Column:
    """planning-time metadata math (reference image.py:21-34); DPI default 300."""
    return F.round(meta["width"] * meta["height"] / F.lit(1_000_000.0), 2)


def dpi_or_default(meta: F.Column, default: int = 300) -> F.Column:
    return F.coalesce(meta["dpi"], F.lit(default))


def media_stats(media: DataFrame) -> DataFrame:
    """A2 analogue: per-doc media size/megapixel aggregates from metadata."""
    return media.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_media"),
        F.round(F.sum(F.col("meta.n_bytes")) / F.lit(1024.0 * 1024), 2).alias("mb"),
        F.round(F.sum(megapixels(F.col("meta"))), 2).alias("mps"),
    )


def megapixel_histogram(media: DataFrame) -> DataFrame:
    """A2's megapixel histogram (reference ``np.unique(return_counts=True)``
    over rounded MPs, ``odem_process_impl.py:354-380``) as a groupBy."""
    return (
        media.select(F.round(megapixels(F.col("meta")), 1).alias("mps"))
        .groupBy("mps")
        .agg(F.count("*").cast("long").alias("n"))
    )


try:  # optional real-decode tier; absent in this container
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - depends on environment
    _PILImage = None
    HAS_PIL = False


def _decode_image_bytes(payload: bytes, fake: bool):
    """Three tiers: deterministic fake (CI), PIL when importable (real
    decode -> 2x2 grayscale feature), else NotImplementedError (honest
    stub — no image library in this container)."""
    if payload is None:
        raise ValueError("empty payload")
    if fake:
        # deterministic fake: 4 'pixels' derived from payload bytes
        b = payload[:16].ljust(16, b"\0")
        return [b[0] / 255.0, b[5] / 255.0, b[10] / 255.0, b[15] / 255.0]
    if HAS_PIL:
        import io

        img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((2, 2))
        return [p / 255.0 for p in img.getdata()]
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; pass fake=True for the deterministic test decoder"
    )


def extract_image_features(
    media: DataFrame, fake_decoder: bool = False, batch_hint: int = 256
) -> DataFrame:
    """Arrow-batched decode/feature stage over binary payloads.

    ``mapInPandas`` keeps whole Arrow batches in flight — payload bytes move
    executor->Python once per batch, never per row.  Decode errors are a
    data channel (``decode_error``), not task failures.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                try:
                    feat = _decode_image_bytes(rec.payload, fake_decoder)
                    out.append((rec.media_id, rec.doc_id, rec.mime, feat, None))
                except Exception as exc:  # noqa: BLE001 - decode errors are
                    # a data channel (incl. codec-library errors like PIL's
                    # UnidentifiedImageError); one bad image must never kill
                    # a 100 TB task
                    out.append((rec.media_id, rec.doc_id, rec.mime, None, str(exc)))
            yield pd.DataFrame(
                out, columns=["media_id", "doc_id", "mime", "feat", "decode_error"]
            )

    cols = media.select("media_id", "doc_id", "mime", "payload")
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (metadata only —
    timestamps derived from duration; the decode itself is the stub above)."""
    n = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return media.where(F.col("mime").startswith("video/")).select(
        "media_id",
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 1), lambda i: (i * every_ms).cast("long")
            )
        ).alias("frame_ts_ms"),
    )
