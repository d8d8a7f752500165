"""Multimodal column plumbing — image/audio/video as opaque binary columns.

Design (north-star scope; the reference app is text/CSV-only):

* A multimodal asset is a row with a ``binary`` payload column plus typed
  metadata (``modality``, ``n_bytes``, ``content_hash`` …). Payloads stay
  opaque to the engine; Spark shuffles/filters them like any column, and
  metadata predicates prune before any decode touches bytes.
* Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
  only sane shape at 100 TB: batches stream through Python with bounded
  memory, schema declared up front, decode parallelism = partition count.
* The container has no media libraries and the testdata has no real binary
  assets, so ``synthesize_assets`` manufactures REAL container bytes
  (PNG / RIFF-WAVE / GIF89a, stdlib struct+zlib only) with parameters
  derived deterministically from the row id — and ``decode_assets`` then
  genuinely PARSES those formats (signatures, chunk walks, block walks).
  Swapping in Pillow/ffmpeg for full-content decode changes only the
  per-format parser bodies; every Spark-side shape stays identical.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id bigint, modality string, width int, height int, "
    "n_frames int, sample_rate int, ok boolean"
)

# Payloads are corrupted (truncated) for ids on this stride — exercising
# the decoder's error path and the ok=false contract.
CORRUPT_STRIDE = 97


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a multimodal asset table from any source column (here: utf-8
    bytes standing in for an opaque payload — deterministic and testable).

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


# ---------------------------------------------------------------------------
# Real-format synthesis (deterministic params from the asset id)
# ---------------------------------------------------------------------------
def _png_bytes(w: int, h: int) -> bytes:
    """Minimal valid RGB PNG (8-bit, no interlace), stdlib only."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes([y % 256, 0, 255 - y % 256] * w) for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(sample_rate: int, n_samples: int) -> bytes:
    """Minimal valid RIFF/WAVE, 16-bit mono PCM. Samples follow a
    deterministic sawtooth (sᵢ = (i·1103 mod 2001) − 1000) so a CONTENT
    decoder recovers a known RMS schedule, not just header fields."""
    data = b"".join(
        struct.pack("<h", (i * 1103) % 2001 - 1000) for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# LZW streams for a single pixel at min code size 2: codes are
# CLEAR(4), <palette index>, EOI(5), packed LSB-first in 3-bit codes:
# 4 | idx<<3 | 5<<6 → 0x144 (idx 0) / 0x14C (idx 1).
def _gif_pixel_frame(idx: int) -> bytes:
    acc = 4 | (idx << 3) | (5 << 6)
    return (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"  # image descriptor
        + b"\x02"  # LZW min code size
        + bytes([2, acc & 0xFF, acc >> 8])  # one 2-byte data sub-block
        + b"\x00"  # block terminator
    )


_GIF_PIXEL_FRAME = _gif_pixel_frame(0)  # kept for fixture compatibility


def _gif_bytes(w: int, h: int, n_frames: int) -> bytes:
    """Minimal valid multi-frame GIF89a — frame count is real container
    structure, and frame i's single pixel carries palette index i%2
    (black/white), so a CONTENT decoder (LZW inflate + palette lookup)
    recovers a known per-frame luminance schedule, not just counts."""
    header = (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0x80, 0, 0])  # global color table flag, 2 entries
        + b"\x00\x00\x00\xff\xff\xff"
    )
    body = b"".join(_gif_pixel_frame(i % 2) for i in range(n_frames))
    return header + body + b"\x3b"


def synth_params(asset_id: int) -> dict:
    """The deterministic parameter schedule shared with the SQL oracle."""
    m = asset_id % 3
    if m == 0:
        return {
            "modality": "image",
            "width": 1 + asset_id % 64,
            "height": 1 + (asset_id // 64) % 64,
        }
    if m == 1:
        return {
            "modality": "audio",
            "sample_rate": 8000 * (1 + asset_id % 5),
            "n_samples": 50 + asset_id % 50,
        }
    return {
        "modality": "video",
        "width": 1 + asset_id % 32,
        "height": 1 + (asset_id // 32) % 32,
        "n_frames": 1 + asset_id % 24,
    }


def _synth_payload(asset_id: int) -> bytes:
    p = synth_params(asset_id)
    if p["modality"] == "image":
        b = _png_bytes(p["width"], p["height"])
    elif p["modality"] == "audio":
        b = _wav_bytes(p["sample_rate"], p["n_samples"])
    else:
        b = _gif_bytes(p["width"], p["height"], p["n_frames"])
    if asset_id % CORRUPT_STRIDE == 0:
        b = b[:5]  # truncated payload: decoder must flag, not crash
    return b


def synthesize_assets(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture an asset table with REAL container-format payloads.

    Runs as Arrow-batched ``mapInPandas`` — synthesis is embarrassingly
    parallel and stays executor-side; at 100 TB the same shape wraps an
    object-store fetch instead of a generator.

    Output: asset_id, modality, payload (binary).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids.values,
                    "modality": [synth_params(i)["modality"] for i in ids],
                    "payload": [_synth_payload(i) for i in ids],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema="asset_id bigint, modality string, payload binary"
    )


# ---------------------------------------------------------------------------
# Real-format parsing
# ---------------------------------------------------------------------------
def _parse_png(b: bytes) -> Optional[dict]:
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return {"width": w, "height": h, "n_frames": 1}


def _parse_wav(b: bytes) -> Optional[dict]:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(b):  # chunk walk
        tag, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if tag == b"fmt " and pos + 8 + 8 <= len(b):
            return {"sample_rate": struct.unpack("<I", b[pos + 12 : pos + 16])[0]}
        pos += 8 + size + (size & 1)
    return None


def _parse_gif(b: bytes) -> Optional[dict]:
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))  # global color table

    def skip_subblocks(p: int) -> int:
        while p < len(b) and b[p] != 0:
            p += 1 + b[p]
        return p + 1

    frames = 0
    while pos < len(b):
        marker = b[pos]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                return None
            idesc_packed = b[pos + 9]
            pos += 10
            if idesc_packed & 0x80:
                pos += 3 * (2 << (idesc_packed & 0x07))  # local color table
            pos += 1  # LZW min code size
            pos = skip_subblocks(pos)
            frames += 1
        elif marker == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        else:
            return None
    if frames == 0:
        return None
    return {"width": w, "height": h, "n_frames": frames}


_PARSERS = {"image": _parse_png, "audio": _parse_wav, "video": _parse_gif}


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (asset_id, modality, payload),
    dispatching a real header/structure parser per modality (PNG IHDR, WAVE
    chunk walk, GIF block walk). Corrupt payloads yield ok=false + nulls —
    the decoder never throws on bad bytes, the 100 TB contract."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                parser = _PARSERS.get(modality)
                meta = parser(bytes(payload)) if parser and payload is not None else None
                rows.append(
                    {
                        "asset_id": asset_id,
                        "modality": modality,
                        "width": (meta or {}).get("width"),
                        "height": (meta or {}).get("height"),
                        "n_frames": (meta or {}).get("n_frames"),
                        "sample_rate": (meta or {}).get("sample_rate"),
                        "ok": meta is not None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


def _decode_png_pixels(b: bytes) -> Optional[dict]:
    """FULL PNG pixel decode, stdlib-only: IHDR parse, IDAT concatenation,
    zlib inflate, per-row de-filtering (all five filter types per the PNG
    spec §9: None/Sub/Up/Average/Paeth), then per-channel means over the
    raw RGB samples. Only the 8-bit RGB non-interlaced layout the
    synthesizer emits is accepted; anything else returns None."""
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    bit_depth, color_type, _, _, interlace = struct.unpack(">BBBBB", b[24:29])
    if bit_depth != 8 or color_type != 2 or interlace != 0:
        return None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(b):
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += b[pos + 8 : pos + 8 + size]
        if tag == b"IEND":
            break
        pos += 12 + size
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    bpp, stride = 3, 3 * w
    if len(raw) != h * (1 + stride):
        return None
    prev = bytearray(stride)
    sums = [0, 0, 0]
    for y in range(h):
        row_start = y * (1 + stride)
        ftype = raw[row_start]
        cur = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                up = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif ftype != 0:
            return None
        for i in range(0, stride, 3):
            sums[0] += cur[i]
            sums[1] += cur[i + 1]
            sums[2] += cur[i + 2]
        prev = cur
    n_px = w * h
    return {
        "width": w,
        "height": h,
        "mean_r": sums[0] / n_px,
        "mean_g": sums[1] / n_px,
        "mean_b": sums[2] / n_px,
    }


def image_channel_stats(assets: DataFrame) -> DataFrame:
    """Pixel-level image statistics: the same Arrow ``mapInPandas`` shape
    as the other decoders, but the parser INFLATES the PNG's IDAT stream
    and de-filters every scanline before averaging channels — full
    content decode, not header peeking. Failed/corrupt payloads are
    dropped.

    Output: asset_id, width, height, mean_r/g/b (unrounded doubles —
    callers round; integer pixel sums over exact n make them rational).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                meta = (
                    _decode_png_pixels(bytes(payload))
                    if payload is not None
                    else None
                )
                if meta is None:
                    continue
                rows.append({"asset_id": asset_id, **meta})
            if rows:
                yield pd.DataFrame(rows)

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            "asset_id bigint, width int, height int, "
            "mean_r double, mean_g double, mean_b double",
        )
    )


def _lzw_decode_gif(data: bytes, min_code_size: int) -> Optional[list]:
    """General GIF-flavor LZW decode (variable code width, CLEAR resets,
    EOI, KwKwK case) → list of palette indices. Public GIF89a spec §22."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list = []
    table: list = []
    code_size = prev = None

    def reset():
        nonlocal table, code_size, prev
        table = [[i] for i in range(clear)] + [None, None]
        code_size = min_code_size + 1
        prev = None

    reset()
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table) or table[code] is None:
                    return None
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(table[prev] + [entry[0]])
            elif code == len(table):  # KwKwK
                entry = table[prev] + [table[prev][0]]
                table.append(entry)
            else:
                return None
            out.extend(entry)
            prev = code
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _decode_gif_frames(b: bytes) -> Optional[list]:
    """Content decode of every GIF frame: block walk + LZW inflate +
    global-palette lookup → per-frame mean luminance (mean of the RGB
    means over the frame's pixels). Returns a list of dicts or None."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = b[10]
    pos = 13
    palette = []
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        pal = b[pos : pos + 3 * n_colors]
        palette = [
            (pal[i], pal[i + 1], pal[i + 2]) for i in range(0, len(pal), 3)
        ]
        pos += 3 * n_colors
    frames = []
    while pos < len(b):
        marker = b[pos]
        if marker == 0x3B:
            break
        if marker == 0x2C:
            if pos + 10 > len(b):
                return None
            idesc_packed = b[pos + 9]
            pos += 10
            local = palette
            if idesc_packed & 0x80:
                n_colors = 2 << (idesc_packed & 0x07)
                pal = b[pos : pos + 3 * n_colors]
                local = [
                    (pal[i], pal[i + 1], pal[i + 2])
                    for i in range(0, len(pal), 3)
                ]
                pos += 3 * n_colors
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idxs = _lzw_decode_gif(bytes(data), min_code)
            if idxs is None or not local:
                return None
            lums = [sum(local[i]) / 3.0 for i in idxs if i < len(local)]
            if not lums:
                return None
            frames.append(
                {"frame_idx": len(frames), "mean_lum": sum(lums) / len(lums)}
            )
        elif marker == 0x21:
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        else:
            return None
    return frames or None


def video_frame_luminance(assets: DataFrame) -> DataFrame:
    """Per-frame mean luminance from REAL GIF content decode (LZW
    inflate + palette lookup) — one output row per (asset, frame), the
    video counterpart of `image_channel_stats`. Same Arrow
    ``mapInPandas`` shape; corrupt payloads drop out.

    Output: asset_id, frame_idx, mean_lum (double, unrounded)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames = (
                    _decode_gif_frames(bytes(payload))
                    if payload is not None
                    else None
                )
                if frames is None:
                    continue
                for fr in frames:
                    rows.append({"asset_id": asset_id, **fr})
            if rows:
                yield pd.DataFrame(rows)

    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "payload")
        .mapInPandas(gen, "asset_id bigint, frame_idx int, mean_lum double")
    )


def _parse_wav_duration(b: bytes) -> Optional[dict]:
    """Full RIFF walk: fmt (rate, bits, channels) AND data chunk size —
    duration needs both, so a header-only peek isn't enough."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    rate = channels = bits = None
    n_data = None
    pos = 12
    while pos + 8 <= len(b):
        tag, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if tag == b"fmt " and pos + 8 + 16 <= len(b):
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[pos + 8 : pos + 24]
            )
        elif tag == b"data":
            n_data = size
        pos += 8 + size + (size & 1)
    if rate is None or n_data is None or not channels or not bits:
        return None
    n_samples = n_data // (channels * bits // 8)
    return {"sample_rate": rate, "n_samples": n_samples}


def audio_duration(assets: DataFrame) -> DataFrame:
    """Audio-duration extraction: the same Arrow-batched ``mapInPandas``
    shape as :func:`decode_assets`, but the parser walks the RIFF
    structure to the ``data`` chunk and converts its byte length through
    (channels × bits/8 × rate) into samples and seconds — content-length
    decode, not just header peeking. Corrupt payloads are dropped (the
    `multimodal_decode` surface carries the ok=false accounting).

    Output: asset_id, sample_rate, n_samples, duration_s (round 6).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                meta = (
                    _parse_wav_duration(bytes(payload))
                    if payload is not None
                    else None
                )
                if meta is None:
                    continue
                rows.append(
                    {
                        "asset_id": asset_id,
                        "sample_rate": meta["sample_rate"],
                        "n_samples": meta["n_samples"],
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    parsed = (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(gen, "asset_id bigint, sample_rate int, n_samples int")
    )
    # Round JVM-side: SQL round is HALF_UP, Python's is banker's — they
    # disagree on exact ties (51/16000 = 0.0031875), and the oracle is SQL.
    return parsed.withColumn(
        "duration_s",
        F.round(F.col("n_samples").cast("double") / F.col("sample_rate"), 6),
    )


def _decode_wav_samples(b: bytes) -> Optional[dict]:
    """Content decode of 16-bit mono PCM: fmt + data chunk walk, then
    sample statistics (sum of squares → RMS, peak)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    rate = channels = bits = None
    samples = None
    pos = 12
    while pos + 8 <= len(b):
        tag, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if tag == b"fmt " and pos + 8 + 16 <= len(b):
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[pos + 8 : pos + 24]
            )
        elif tag == b"data":
            samples = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if rate is None or samples is None or channels != 1 or bits != 16:
        return None
    n = len(samples) // 2
    if n == 0:
        return None
    vals = struct.unpack(f"<{n}h", samples[: 2 * n])
    ssq = sum(v * v for v in vals)
    return {
        "sample_rate": rate,
        "n_samples": n,
        "rms": (ssq / n) ** 0.5,
        "peak": max(abs(v) for v in vals),
    }


def audio_sample_stats(assets: DataFrame) -> DataFrame:
    """Waveform statistics from REAL PCM decode (data-chunk sample
    unpack): RMS and peak amplitude per audio asset — the loudness
    screen an audio-corpus pipeline runs before filtering silence or
    clipped takes. Same Arrow ``mapInPandas`` shape as the other
    decoders; corrupt payloads drop out.

    Output: asset_id, n_samples, rms (double, unrounded), peak int."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                meta = (
                    _decode_wav_samples(bytes(payload))
                    if payload is not None
                    else None
                )
                if meta is None:
                    continue
                rows.append(
                    {
                        "asset_id": asset_id,
                        "n_samples": meta["n_samples"],
                        "rms": meta["rms"],
                        "peak": meta["peak"],
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(
            gen, "asset_id bigint, n_samples int, rms double, peak int"
        )
    )


def frame_sample(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index — pure JVM (sequence + explode), no Python in the loop; rows with
    null n_frames (failed decode) contribute nothing.

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

    Longest side capped at ``max_side``, aspect preserved. The scale is
    applied in INTEGER arithmetic — ``(side · max_side) div longest`` —
    because ``floor(side × double_scale)`` lands an ulp below a whole
    number on one engine and on it on another (floor(48.0000…1) vs
    floor(47.9999…9)); integer division is exactly reproducible anywhere.

    Output: asset_id, width, height, target_w, target_h.
    """
    longest = F.greatest(F.col("width"), F.col("height"))
    needs = longest > max_side

    def tgt(side: str) -> F.Column:
        return F.when(
            needs, F.expr(f"div({side} * {max_side}, greatest(width, height))")
        ).otherwise(F.col(side)).cast("int")

    return decoded.select(
        "asset_id",
        "width",
        "height",
        tgt("width").alias("target_w"),
        tgt("height").alias("target_h"),
    )


def audio_zero_crossings(assets: DataFrame) -> DataFrame:
    """Zero-crossing count from REAL PCM decode: unpack the data-chunk
    samples and count strict sign changes (sᵢ₋₁·sᵢ < 0 — a zero sample
    breaks the run on both sides), the classic voiced/unvoiced and
    noisiness screen. Same Arrow ``mapInPandas`` shape as the other
    decoders; corrupt payloads drop out.

    Output: asset_id, n_samples, zero_crossings.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                meta = (
                    _decode_wav_samples(bytes(payload))
                    if payload is not None
                    else None
                )
                if meta is None:
                    continue
                b = bytes(payload)
                # Re-walk for the raw samples (decode helper returns stats
                # only — keep its contract stable for the RMS query).
                pos, samples = 12, None
                while pos + 8 <= len(b):
                    tag = b[pos : pos + 4]
                    size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                    if tag == b"data":
                        samples = b[pos + 8 : pos + 8 + size]
                    pos += 8 + size + (size & 1)
                n = len(samples) // 2
                vals = struct.unpack(f"<{n}h", samples[: 2 * n])
                zc = sum(
                    1 for a, c in zip(vals, vals[1:]) if a * c < 0
                )
                rows.append(
                    {
                        "asset_id": asset_id,
                        "n_samples": n,
                        "zero_crossings": zc,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(gen, "asset_id bigint, n_samples int, zero_crossings int")
    )
