"""Property tests for extension batch 33: pixel decoder vs filtered
re-encodings, k-core vs a pure-Python peeling reference, binaryFile
ingestion plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_png_decoder_handles_all_filter_types():
    """Re-encode the same pixel grid under each PNG filter type; the
    de-filtering decoder must recover identical channel means."""
    import struct
    import zlib

    from gemini_data_wrangler_spark.operators.multimodal import (
        _decode_png_pixels,
    )

    w = h = 5
    rows = [bytes([y, 0, 255 - y] * w) for y in range(h)]

    def png_with_filter(ftype: int) -> bytes:
        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        def filt(cur: bytes, prev: bytes) -> bytes:
            bpp, out = 3, bytearray()
            for i, x in enumerate(cur):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 0:
                    out.append(x)
                elif ftype == 1:
                    out.append((x - a) & 0xFF)
                elif ftype == 2:
                    out.append((x - b) & 0xFF)
                elif ftype == 3:
                    out.append((x - ((a + b) >> 1)) & 0xFF)
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    out.append((x - pred) & 0xFF)
            return bytes(out)

        prev = bytes(3 * w)
        raw = bytearray()
        for r in rows:
            raw += bytes([ftype]) + filt(r, prev)
            prev = r
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    expected = None
    for ftype in range(5):
        meta = _decode_png_pixels(png_with_filter(ftype))
        assert meta is not None, f"filter {ftype}"
        got = (meta["mean_r"], meta["mean_g"], meta["mean_b"])
        if expected is None:
            expected = got
        assert got == expected, f"filter {ftype}"
    assert abs(expected[0] - 2.0) < 1e-9  # avg(0..4)
    assert expected[1] == 0.0


def test_image_channel_stats_match_paint_schedule(spark):
    rows = _q("multimodal_image_channel_stats")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert abs(r["mean_r"] - (r["height"] - 1) / 2.0) < 1e-6
        assert r["mean_g"] == 0.0
        assert abs(r["mean_b"] - (255 - (r["height"] - 1) / 2.0)) < 1e-6


def test_binary_file_source_feeds_decoder(spark, tmp_path):
    """Real ingestion plumbing: PNG files on disk → Spark's binaryFile
    source → the decode pipeline recovers each file's dimensions."""
    from gemini_data_wrangler_spark.operators.multimodal import (
        _png_bytes,
        decode_assets,
    )

    dims = {"a.png": (7, 3), "b.png": (12, 5), "c.png": (2, 9)}
    for name, (w, h) in dims.items():
        (tmp_path / name).write_bytes(_png_bytes(w, h))
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(str(tmp_path))
    )
    assets = files.select(
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.monotonically_increasing_id().alias("asset_id"),
        F.lit("image").alias("modality"),
        F.col("content").alias("payload"),
    )
    decoded = decode_assets(assets.select("asset_id", "modality", "payload"))
    by_id = {r["asset_id"]: r for r in decoded.collect()}
    names = {r["asset_id"]: r["name"] for r in assets.collect()}
    assert len(by_id) == 3
    for aid, r in by_id.items():
        w, h = dims[names[aid]]
        assert (r["width"], r["height"], r["ok"]) == (w, h, True)


def _python_k_core(edges: set, k: int):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def test_k_core_matches_python_reference(spark):
    got = {
        r["node"]: r["core_degree"]
        for r in _q("graph_k_core")(spark, SF_ORACLE).collect()
    }
    # Rebuild the same fixed-budget edge list.
    from pyspark.sql import Window

    li = (
        __import__(
            "gemini_data_wrangler_spark.sources.readers", fromlist=["load_sf_tables"]
        ).load_sf_tables(spark, SF_ORACLE)["lineitem"]
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    co = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("sa").asc(), F.col("sb").asc())
    edges = {
        (r["sa"], r["sb"])
        for r in co.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 2000)
        .collect()
    }
    ref = _python_k_core(edges, 4)
    assert got == ref
    assert got and all(d >= 4 for d in got.values())


def test_gif_lzw_decoder_general_stream():
    """The LZW decoder must handle a real multi-pixel stream with
    dictionary growth and the KwKwK self-reference, not just the 1-pixel
    synth frames: encode a known index sequence with a reference GIF-LZW
    encoder and round-trip it."""
    from gemini_data_wrangler_spark.operators.multimodal import _lzw_decode_gif

    seq = [0, 1, 0, 1, 0, 1, 1, 1, 0, 0, 0, 1, 0, 1, 0]  # forces new codes
    min_size = 2
    clear, eoi = 1 << min_size, (1 << min_size) + 1

    # Reference encoder (spec §22): emit CLEAR, then longest-match codes.
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_size + 1
    codes = [clear]
    cur = ()
    sizes = []
    for s in seq:
        if cur + (s,) in table:
            cur = cur + (s,)
        else:
            codes.append(table[cur])
            sizes.append(code_size)
            table[cur + (s,)] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size):
                code_size += 1
            cur = (s,)
    codes.append(table[cur])
    sizes.append(code_size)
    codes.append(eoi)
    sizes.append(code_size)
    sizes.insert(0, min_size + 1)  # CLEAR's width
    acc = nbits = 0
    out = bytearray()
    for c, w in zip(codes, sizes):
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert _lzw_decode_gif(bytes(out), min_size) == seq


def test_video_frame_luminance_alternates(spark):
    rows = _q("multimodal_video_frame_luminance")(spark, SF_ORACLE).collect()
    assert rows
    by_asset: dict = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append((r["frame_idx"], r["mean_lum"]))
    for aid, frames in by_asset.items():
        frames.sort()
        assert [f[0] for f in frames] == list(range(len(frames)))
        for idx, lum in frames:
            assert lum == 255.0 * (idx % 2)
