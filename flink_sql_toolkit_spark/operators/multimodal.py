"""Multimodal columns: binary payloads + typed metadata (north star).

Treats image/audio/video as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schema, batch shape, partitioning) is real and
tested; the actual media decode is stubbed (image/audio libraries
are not in this environment) behind ``decode_image``, which raises
``NotImplementedError`` unless the deterministic fake is requested.

At 100 TB: binary payloads stay columnar in parquet; mapInPandas
streams Arrow batches through Python without materializing a
partition; feature extraction is embarrassingly parallel (no
shuffle). Frame-sampling / resize land in the same iterator shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.tables import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, header_hex string, "
    "content_sha256 string, fake_width int, fake_height int"
)


def decode_image(payload: bytes, *, deterministic_fake: bool = False) -> tuple[int, int]:
    """Decode an image payload → (width, height).

    Recognized containers (PNG/JPEG/GIF/BMP) are decoded FOR REAL by
    the from-spec header parsers in ``media_probe`` — no imaging
    library needed for geometry. Pixel-level decode (resize, crop)
    would need a codec library this container doesn't ship; for
    unrecognized bytes, ``deterministic_fake=True`` derives a stable
    size from the payload hash so pipelines stay testable end-to-end.
    """
    from flink_sql_toolkit_spark.operators.media_probe import probe_media  # noqa: PLC0415

    info = probe_media(payload)
    if info.kind == "image" and info.width is not None:
        return info.width, info.height
    if not deterministic_fake:
        raise NotImplementedError(
            f"payload is not a recognized image container "
            f"(probe: {info.format}); pass deterministic_fake=True "
            "for the testable stub"
        )
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary column → feature rows via Arrow-batched mapInPandas."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            width_height = [
                decode_image(p, deterministic_fake=True) for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "header_hex": payloads.map(lambda p: p[:8].hex()),
                    "content_sha256": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ),
                    "fake_width": pd.Series([w for w, _ in width_height], dtype="int32"),
                    "fake_height": pd.Series([h for _, h in width_height], dtype="int32"),
                }
            )

    return df.mapInPandas(feature_batches, FEATURE_SCHEMA)


PROBE_SCHEMA = (
    "doc_id bigint, format string, kind string, width int, height int, "
    "channels int, sample_rate int, duration_ms bigint"
)


def probe_media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real header metadata per payload (media_probe parsers) via
    Arrow-batched mapInPandas — the typed-metadata extraction stage
    of the multimodal pipeline. Same scale shape as
    extract_media_features: embarrassingly parallel, no shuffle."""
    from flink_sql_toolkit_spark.operators.media_probe import probe_media  # noqa: PLC0415

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            infos = [probe_media(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [i.format for i in infos],
                    "kind": [i.kind for i in infos],
                    "width": pd.array([i.width for i in infos], dtype="Int32"),
                    "height": pd.array([i.height for i in infos], dtype="Int32"),
                    "channels": pd.array([i.channels for i in infos], dtype="Int32"),
                    "sample_rate": pd.array(
                        [i.sample_rate for i in infos], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [i.duration_ms for i in infos], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(probe_batches, PROBE_SCHEMA)


@register(
    "multimodal_features",
    # The payloads are the documents' UTF-8 text bytes, and the
    # fixture text is pure ASCII (verified at every gate SF), so
    # byte offsets == character offsets and every feature — length,
    # 8-byte header hex, sha256, and the fake decode dims derived
    # from the first digest bytes — is restatable in DuckDB SQL.
    # The hex-pair → int arithmetic mirrors `h[0]`/`h[1]` of the
    # digest in decode_image's deterministic fake.
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           strlen(text) AS n_bytes,
           lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
           sha256(text) AS content_sha256,
           64 + ((strpos('0123456789abcdef', substr(sha256(text), 1, 1)) - 1) * 16
               +  (strpos('0123456789abcdef', substr(sha256(text), 2, 1)) - 1)) % 192
             AS fake_width,
           64 + ((strpos('0123456789abcdef', substr(sha256(text), 3, 1)) - 1) * 16
               +  (strpos('0123456789abcdef', substr(sha256(text), 4, 1)) - 1)) % 192
             AS fake_height
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-pipeline plumbing demo over synthetic binary payloads
    (documents' text bytes standing in for media blobs). The decode
    is a stub, but every emitted feature is value-checked against a
    DuckDB restatement over the same bytes."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )
    return extract_media_features(media).orderBy("doc_id")


def resize_image(
    payload: bytes, width: int, height: int, *, deterministic_fake: bool = False
) -> bytes:
    """Pixel-level resize stub — mirror of ``decode_image``: the
    container has no imaging library, so the REAL path raises typed;
    the deterministic fake derives a stable ``width*height``-seeded
    digest blob so the Spark-side plumbing (schema, batch shape,
    output size accounting) is fully testable. Swap the body for
    PIL/libvips at production — the operator shape doesn't change."""
    if not deterministic_fake:
        raise NotImplementedError(
            "pixel decode needs an imaging library (PIL/libvips) not "
            "present in this container — pass deterministic_fake=True "
            "for the plumbing-test stub"
        )
    h = hashlib.sha256(payload + f":{width}x{height}".encode()).digest()
    # a stub "image": digest tiled to a size proportional to the target
    n = max(32, (width * height) // 64)
    return (h * (n // len(h) + 1))[:n]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Batch image resize over binary payloads: Arrow-batched
    ``mapInPandas``, one output row per input row, no shuffle — the
    canonical shape for per-item media transforms at 100 TB (each
    executor streams its partition's blobs; memory is bounded by the
    Arrow batch size, not the partition)."""
    schema = "doc_id bigint, resized binary, out_width int, out_height int, n_bytes bigint"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                if p is None:
                    continue  # NULL payload: skip, don't fail the batch
                ids.append(doc_id)
                out.append(
                    resize_image(
                        bytes(p), width, height,
                        deterministic_fake=deterministic_fake,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="Int64"),
                    "resized": [bytearray(b) for b in out],
                    "out_width": pd.array([width] * len(out), dtype="Int32"),
                    "out_height": pd.array([height] * len(out), dtype="Int32"),
                    "n_bytes": pd.array([len(b) for b in out], dtype="Int64"),
                }
            )

    return df.mapInPandas(work, schema)


def sample_frames(
    df: DataFrame,
    interval_ms: int = 1000,
    payload_col: str = "payload",
    deterministic_fake: bool = False,
    max_frames: int = 10_000,
) -> DataFrame:
    """Frame sampling for video/audio payloads: the sampling PLAN is
    real — one frame per ``interval_ms`` of the duration the from-spec
    header probe reports (media_probe MP4/WAV parsers) — while frame
    CONTENT is the ``deterministic_fake`` digest stub behind the same
    typed gate as ``decode_image`` (no codec in this container).

    Scale shape: a row→many-rows ``mapInPandas`` fan-out (each Arrow
    batch yields its frames in place), no shuffle, no duplication of
    the source payload per frame; ``max_frames`` caps a corrupt
    header's fan-out. Payloads the probe can't time (images, unknown
    formats) emit zero rows rather than failing the batch."""
    from flink_sql_toolkit_spark.operators.media_probe import probe_media  # noqa: PLC0415

    schema = "doc_id bigint, frame_idx int, ts_ms bigint, frame binary"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                if p is None:
                    continue  # NULL payload: zero frames, not a failure
                raw = bytes(p)
                info = probe_media(raw)
                if not info.duration_ms:
                    continue
                n = min(
                    max(int(info.duration_ms // interval_ms), 1), max_frames
                )
                for i in range(n):
                    ts = i * interval_ms
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "frame decode needs a media codec not present "
                            "in this container — pass "
                            "deterministic_fake=True for the plumbing stub"
                        )
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(
                        bytearray(
                            hashlib.sha256(raw + f"@{ts}".encode()).digest()
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "ts_ms": pd.array(tss, dtype="Int64"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(work, schema)
