"""Multimodal column plumbing — image/audio/video as opaque binary columns.

Design (north-star scope; the reference app is text/CSV-only):

* A multimodal asset is a row with a ``binary`` payload column plus typed
  metadata (``modality``, ``n_bytes``, ``content_hash`` …). Payloads stay
  opaque to the engine; Spark shuffles/filters them like any column, and
  metadata predicates prune before any decode touches bytes.
* Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
  only sane shape at 100 TB: batches stream through Python with bounded
  memory, schema declared up front, decode parallelism = partition count.
* The actual image/audio codecs are NOT in this container, so ``_decode``
  is stubbed with a deterministic fake (hash-derived dimensions); the
  Spark-side plumbing — schema, batch iteration, partitioning — is real and
  tested. Swap ``_decode_stub`` for PIL/ffmpeg in production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, width int, height int, "
    "n_frames int, sample_rate int, ok boolean"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a multimodal asset table from any source column (here: utf-8
    bytes standing in for an image payload — deterministic and testable).

    Output: asset_id, modality, payload (binary), n_bytes, content_hash.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("asset_id"),
        (F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col(id_col) % 3 + 1).cast("int"))).alias(
            "modality"
        ),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("content_hash"),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic stand-in for an image/audio decoder. Real deployments
    replace this with PIL / libvips / ffmpeg; everything around it is
    production plumbing."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 + h[2] % 32,
        "sample_rate": 8000 + (h[3] % 5) * 8000,
        "ok": True,
    }


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (asset_id, modality, payload).

    The UDF sees pandas batches (zero-copy via Arrow for binary), emits a
    typed metadata frame; downstream is ordinary relational processing.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": pdf["payload"].map(len).values,
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                    "sample_rate": [m["sample_rate"] for m in meta],
                    "ok": [m["ok"] for m in meta],
                }
            )
            yield out

    return assets.select("asset_id", "modality", "payload").mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index — pure JVM (sequence + explode), no Python in the loop.

    Output: asset_id, frame_idx.
    """
    return (
        decoded.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )


def resize_plan(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning: compute target dims JVM-side; the pixel work would
    ride the same mapInPandas shape as decode_assets.

    Output: asset_id, width, height, target_w, target_h.
    """
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"))
    return decoded.select(
        "asset_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
    )
