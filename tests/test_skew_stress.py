"""Skew stress: a power-law key distribution must be BALANCED by salting,
not merely correct.

`test_dialect_skew.py` pins salted_join ≡ plain join (result equality);
this module pins the reason the operator exists — reducer balance. The
fixture is a deterministic Pareto draw (inverse-CDF over an xxhash64
uniform), the hot key holding a large constant fraction of all probe rows:
the classic 100 TB failure mode where one user/session key melts a single
reducer. Assertions are on per-reducer row counts of the join stage itself
(spark_partition_id captured on the join output, before any later
exchange) — deterministic, unlike wall-clock task times — and they FAIL if
salting stops spreading the hot key:

* salted max/median partition load stays under a small bound;
* the plain join's imbalance is an order of magnitude worse (proves the
  fixture actually stresses, so the salted bound is not vacuous);
* AQE's runtime skew-split (the complementary strategy, session default)
  marks the same plain sort-merge join `isSkew=true` when enabled with
  production thresholds scaled to the fixture.
"""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from gemini_data_wrangler_spark.operators.skew import salted_join

N_PROBE = 400_000
N_KEYS = 50_000


def _powerlaw_probe(spark):
    # key = ceil(u^(-1/alpha)) with u uniform on (0,1]: Pareto(alpha≈0.83).
    # P(key=1) = 1 - 2^(-alpha) ≈ 44% — one very hot key, then a heavy
    # tail. xxhash64(id) makes the draw deterministic across runs/plans.
    u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)) + 1) / 1_000_001.0
    key = F.least(F.ceil(F.pow(u, F.lit(-1.0 / 1.2))), F.lit(N_KEYS)).cast("long")
    return (
        spark.range(N_PROBE)
        .select(
            key.alias("k"),
            F.col("id").alias("lv"),
            # Distinct md5 strings: ~32 incompressible bytes per row, so
            # shuffle-partition BYTE sizes track row counts (a hot key of
            # bare repeated longs lz4-compresses below AQE's skew
            # thresholds and hides the very skew being staged).
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(8)  # scatter the source so skew comes from the JOIN key
    )


def _dim(spark):
    return spark.range(1, N_KEYS + 1).select(
        F.col("id").alias("k2"), (F.col("id") * 2).alias("rv")
    )


def _join_partition_sizes(df):
    """Row count per reducer partition of the stage that produced ``df``.

    spark_partition_id() is evaluated where the column is defined — on the
    join output, before the groupBy's own exchange — so this reads the
    actual per-reducer load of the join."""
    sizes = [
        r["cnt"]
        for r in df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    return sorted(sizes, reverse=True)


def test_salted_join_balances_powerlaw_skew(spark):
    probe = _powerlaw_probe(spark)
    dim = _dim(spark)
    conf = spark.conf
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Disable AQE so the measurement sees raw hash-partitioned
        # reducers: AQE's coalescing/skew-split would paper over the very
        # imbalance this test exists to pin on the PLANNED strategy. And
        # force a shuffle join — at this fixture size the dim side would
        # broadcast (no probe shuffle, so no reducer skew to measure); at
        # 100 TB the dim tier that needs salting doesn't fit broadcast.
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        plain = probe.join(dim, probe["k"] == dim["k2"]).select(
            "k", "lv", "payload", "rv"
        )
        plain_sizes = _join_partition_sizes(plain)
        plain_med = statistics.median([s for s in plain_sizes if s > 0])

        salted = salted_join(probe, dim, "k", "k2", salt=16)
        salted_sizes = _join_partition_sizes(salted)
        salted_med = statistics.median([s for s in salted_sizes if s > 0])

        # The fixture genuinely stresses: ~44% of rows on one key → one
        # reducer holds an order of magnitude more than the median.
        assert plain_sizes[0] / plain_med > 8, (plain_sizes[:4], plain_med)
        # Salting spreads the hot key over `salt` reducers: balance holds.
        assert salted_sizes[0] / salted_med < 4, (salted_sizes[:4], salted_med)
        # And the absolute worst reducer shrinks by ~salt/2 at least.
        assert salted_sizes[0] * 4 < plain_sizes[0], (
            salted_sizes[0],
            plain_sizes[0],
        )
        # Semantic transparency at this scale too (counts; full row-set
        # equality is pinned at small scale in test_dialect_skew.py).
        assert sum(salted_sizes) == sum(plain_sizes) == N_PROBE
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_aqe_skew_split_engages_on_powerlaw_join(spark):
    """The runtime strategy: AQE must mark the skewed sort-merge join
    skew=true and split the hot partition. Thresholds are the production
    defaults scaled to the fixture size (the default 256 MB trigger can't
    fire on a ~10 MB shuffle); the PLAN SHAPE assertion is what transfers
    to 100 TB, where the default thresholds fire on real partitions."""
    probe = _powerlaw_probe(spark)
    dim = _dim(spark)
    conf = spark.conf
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        # Keep the dim side out of broadcast range so a sort-merge join
        # (the skew-split site) is planned, as it would be at 100 TB.
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = probe.join(dim, probe["k"] == dim["k2"]).select("k", "payload")
        # Execute THIS dataset (not a derived count plan) so its adaptive
        # plan finalizes, then read the final plan back off it.
        assert len(joined.collect()) == N_PROBE
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
