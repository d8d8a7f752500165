"""Property tests for extension batch 40: Hilbert transform vs the
canonical reference, and the locality claim vs Morton."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def _xy2d(order: int, x: int, y: int) -> int:
    """Canonical iterative Hilbert xy2d (public-domain reference form)."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_spark_fold_matches_canonical_reference(spark):
    from gemini_data_wrangler_spark.queries_ext40 import _SPARK_FOLD

    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (1000, 300), (123, 45678),
           (32768, 32767), (7, 56789)]
    df = spark.createDataFrame(pts, "ck long, dy long")
    got = {
        (r["ck"], r["dy"]): r["h"]
        for r in df.withColumn("h", F.expr(_SPARK_FOLD)).collect()
    }
    for ck, dy in pts:
        assert got[(ck, dy)] == _xy2d(16, ck, dy), (ck, dy)
    # Adjacent curve positions are grid neighbors (the Hilbert property
    # Morton lacks): spot-check d→d+1 pairs via inverse search on a
    # small order-4 grid.
    order = 4
    by_d = {}
    for x in range(16):
        for y in range(16):
            by_d[_xy2d(order, x, y)] = (x, y)
    assert len(by_d) == 256  # bijective
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_zones_tighter_than_morton(spark):
    """The reason to pay for Hilbert: per-file 2-D bounding boxes are
    tighter than Morton's on the same data and file count."""
    hil = _q("layout_hilbert_plan")(spark, SF_ORACLE).collect()
    mor = _q("layout_zorder_plan")(spark, SF_ORACLE).collect()
    assert len(hil) == len(mor) == 64
    # Same partition sizes (both exact ntile splits of the same rows).
    assert sorted(r["n_rows"] for r in hil) == sorted(r["n_rows"] for r in mor)

    def total_area(rows):
        return sum(
            (r["ck_max"] - r["ck_min"] + 1) * (r["dy_max"] - r["dy_min"] + 1)
            for r in rows
        )

    assert total_area(hil) < total_area(mor), (
        f"hilbert {total_area(hil)} vs morton {total_area(mor)}"
    )
