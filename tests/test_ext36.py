"""Property tests for extension batch 36: PCM stats vs direct sample
math, chi-square vs scipy-free direct computation."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_audio_rms_matches_sawtooth_schedule(spark):
    rows = _q("multimodal_audio_rms")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        vals = [(i * 1103) % 2001 - 1000 for i in range(r["n_samples"])]
        rms = math.sqrt(sum(v * v for v in vals) / len(vals))
        assert abs(r["rms"] - round(rms, 6)) < 1e-6
        assert r["peak"] == max(abs(v) for v in vals)
        assert 0 < r["rms"] <= r["peak"]


def test_wav_sample_decoder_rejects_garbage():
    from gemini_data_wrangler_spark.operators.multimodal import (
        _decode_wav_samples,
        _wav_bytes,
    )

    good = _wav_bytes(8000, 10)
    meta = _decode_wav_samples(good)
    assert meta is not None and meta["n_samples"] == 10
    assert _decode_wav_samples(good[:5]) is None
    assert _decode_wav_samples(b"RIFFxxxxNOPE") is None


def test_chi_square_matches_direct(spark):
    r = _q("dq_chi_square_mix")(spark, SF_ORACLE).collect()[0]
    from pyspark.sql import functions as F
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    obs = {
        (x["p"], x["y"]): x["o"]
        for x in orders.groupBy(
            F.col("o_orderpriority").alias("p"),
            F.year(F.to_date("o_orderdate")).alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .collect()
    }
    ps = {p for p, _ in obs}
    ys = {y for _, y in obs}
    n = sum(obs.values())
    rp = {p: sum(v for (pp, _), v in obs.items() if pp == p) for p in ps}
    cy = {y: sum(v for (_, yy), v in obs.items() if yy == y) for y in ys}
    chi2 = sum(
        (o - rp[p] * cy[y] / n) ** 2 / (rp[p] * cy[y] / n)
        for (p, y), o in obs.items()
    )
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-5
    assert r["dof"] == (len(ps) - 1) * (len(ys) - 1)
    assert r["n"] == n
