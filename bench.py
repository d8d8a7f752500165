#!/usr/bin/env python
"""Benchmark harness — times the declared query inventory at sf0.1.

Prints ONE compact JSON line as the FINAL stdout line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

The driver captures only a bounded tail of stdout, so the ``queries`` map
holds a fixed HEADLINE subset (the heavy/representative operators, listed
below) with 2-decimal timings — round 1's full 107-query map overflowed
the capture window and arrived unparseable. The full suite still runs and
is summarized in ``full_total`` / ``n_queries``; per-query numbers for
everything are written to BENCH_LOCAL.json for local inspection.

Env knobs: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default all), ``BENCH_QUERIES`` (comma-separated
subset — overrides both the run set and the reported map).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

# Fixed headline set: every heavy operator family (dedup, similarity, text,
# packing/vocab, sketches, graphs, events, joins incl. skew/fuzzy/interval,
# windows, multimodal) plus a TPC-H cross-section. Keep it stable across
# rounds so BENCH_r{N} timings are comparable; keep it ≤50 names so the
# final JSON line stays under the driver's stdout-tail capture window.
HEADLINE = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "similarity_cosine_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "embedding_kmeans",
    "text_token_stats",
    "text_quality_scores",
    "text_language_id",
    "text_repetition_stats",
    "decontam_ngram_overlap",
    "pack_sequences",
    "vocab_encode_docs",
    "split_train_val_test",
    "sketch_count_min_heavy_hitters",
    "sketch_hll_mergeable",
    "histogram_equidepth",
    "graph_pagerank_parts",
    "graph_label_propagation",
    "graph_triangle_count",
    "events_tumbling_hourly",
    "events_sliding_halfhour",
    "events_sessions",
    "events_funnel_conversion",
    "asof_purchase_last_click",
    "flagship_segment_sales",
    "join_inner_diff_keys",
    "join_salted_skew",
    "join_bloom_prefilter",
    "join_interval_overlap",
    "fuzzy_match_customer_names",
    "window_rank_topn",
    "window_running_sum",
    "merge_upsert_latest",
    "timeseries_gapfill",
    "skyline_price_date",
    "multimodal_decode",
    "multimodal_frame_sample",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q9_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
]

# Forced scale-path routes (round-5 verdict ask #6): auto-routing always
# picks the driver-state path at test scale, so these keep the distributed
# CC loop and the distributed beam search — the 100 TB code paths — under a
# recorded per-round number. Reported under their own `scale_path` key so
# the 47-query HEADLINE total stays like-for-like with the 55.3 s round-2
# baseline and every earlier BENCH_r{N}.
SCALE_PATH = [
    "dedup_clusters_cc_distributed",
    "similarity_graph_ann_topk_distributed",
    "graph_bfs_hops_distributed",
]


def _env_fingerprint(spark) -> dict:
    """Version provenance for the artifact (kept tiny: the driver's stdout
    tail is bounded)."""
    import duckdb
    import numpy

    return {
        "spark": spark.version,
        "duckdb": duckdb.__version__,
        "numpy": numpy.__version__,
        "python": ".".join(map(str, sys.version_info[:3])),
    }


def _merge_best(timings: dict, sf) -> tuple[dict, str]:
    """Rolling per-query MIN across every bench run at the same
    (sf, git HEAD) — the noise-free floor the round-6 verdict asked for
    (ask #7): the committed artifact is one host window, but the best
    observed timing across ALL validation runs of the same code is what
    separates a real regression from a steal burst. Keyed by HEAD so a
    code change resets the floor (a stale min from faster old code must
    not mask a legitimate slowdown); state lives in BENCH_BEST.json
    (gitignored scratch)."""
    import subprocess

    try:
        head = subprocess.run(
            ["git", "-C", REPO_DIR, "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        head = "unknown"
    path = os.path.join(REPO_DIR, "BENCH_BEST.json")
    best: dict[str, float] = {}
    try:
        with open(path) as fh:
            prev = json.load(fh)
        if prev.get("sf") == sf and prev.get("head") == head:
            best = prev.get("best", {})
    except Exception:
        pass
    for n, t in timings.items():
        b = best.get(n)
        best[n] = round(t if b is None else min(t, b), 3)
    with open(path, "w") as fh:
        json.dump({"sf": sf, "head": head, "best": best}, fh, indent=1, sort_keys=True)
    return best, head


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from gemini_data_wrangler_spark.queries import registry
    from gemini_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="gdws-bench")
    spark.sparkContext.setLogLevel("ERROR")

    reg = registry()
    only = os.environ.get("BENCH_QUERIES")
    names = [n.strip() for n in only.split(",")] if only else sorted(reg)
    report = set(names) if only else set(HEADLINE)

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    reg["flagship_segment_sales"][0](spark, sf_dir).count()

    # The host VM shows multi-second CPU-steal bursts (identical queries
    # measured 6 s and 25 s back-to-back on an idle guest, and 20 s vs
    # 6 s five minutes apart in round 5): one-shot timings are noise for
    # anything non-trivial. Since round 4 EVERY query runs twice and
    # reports the MIN — one uniform policy so headline and full-suite
    # numbers are like-for-like. Round 5 adds an instability retry: when
    # the two runs of a non-trivial query disagree by >2x, the burst
    # likely spanned both, so up to two extra runs are taken (still
    # reporting the min). The policy is recorded in the artifact.
    TIMING_POLICY = "min_of_2_plus_instability_retries"

    def _run_once(builder) -> float:
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        # Force full execution without collecting result rows to the driver.
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Absolute tail-outlier cutoff for the instability retry, scaled to
    # the scale factor (round-5 ADVICE: a flat 8 s is an sf0.1 constant —
    # at sf1 a legitimately slower query would always burn 4 runs without
    # converging). 80 s/sf ≈ 8 s at the default sf0.1, FLOORED at 8 s
    # (round-6 ADVICE: linear scaling DOWN made the cutoff 0.8 s at
    # sf0.01, so every moderately heavy query there burned the 2 extra
    # retries and small-sf iteration loops ran ~2x slower than needed).
    slow_cutoff = max(8.0, 80.0 * sf) if sf else 8.0

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        builder, _ = reg[name]
        try:
            runs = [_run_once(builder), _run_once(builder)]
            # Instability retry: a steal burst that spans both runs leaves
            # min(2 runs) inflated — detectable as a >2x spread between
            # the runs, or as an absolute tail outlier (no query in the
            # registry legitimately needs >8 s at sf0.1; a burst hitting
            # both runs equally shows no spread at all). Two more attempts
            # bound the added wall time to the genuinely noisy queries.
            for _ in range(2):
                unstable = max(runs) > 2 * min(runs) and min(runs) > 1.0
                if not (unstable or min(runs) > slow_cutoff):
                    break
                runs.append(_run_once(builder))
            timings[name] = round(min(runs), 3)
        except Exception as exc:  # noqa: BLE001 — one bad query must not
            # abort the whole bench run (the driver parses the final JSON).
            errors[name] = repr(exc)[:200]
            print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
        # Drop per-query persisted intermediates (dedup/similarity stage
        # caches) so successive queries don't accumulate heap pressure.
        # clearCache only covers the SQL cache manager — localCheckpoint
        # blocks (connected components) are freed by the ContextCleaner,
        # which needs the Python refs collected first; nudge both so each
        # query starts from a clean block manager.
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    full_total = round(sum(timings.values()), 2)
    headline = {n: round(t, 2) for n, t in timings.items() if n in report}
    best, best_head = _merge_best(timings, sf)
    # Self-diagnosing noise markers for the driver artifact: the headline
    # total at the session's best-observed floor, plus the queries whose
    # committed timing sits >1.3x above their own floor (host-window
    # spikes read directly off the artifact instead of being re-derived
    # from a separate builder run each round).
    best_observed = round(sum(best[n] for n in headline if n in best), 2)
    noise_suspects = sorted(
        n for n, t in headline.items()
        if n in best and t > 1.3 * best[n] + 0.2
    )
    payload = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(headline.values()), 2),
        "unit": "sec",
        "queries": headline,
        "sf": sf,
        "full_total": full_total,
        "n_queries": len(timings),
        "timing_policy": TIMING_POLICY,
        "scale_path": {
            n: round(timings[n], 2) for n in SCALE_PATH if n in timings
        },
        "best_observed": best_observed,
        "best_head": best_head,
        "noise_suspects": noise_suspects[:8],
        # Environment fingerprint: rounds 4 and 5 each burned a cycle on
        # "mismatch/outlier only in the driver env" — one line of
        # provenance localizes an engine-version divergence immediately.
        "env": _env_fingerprint(spark),
    }
    if errors:
        # Keep the printed line bounded: error names only, capped at 5 —
        # full reprs go to BENCH_LOCAL.json / stderr.
        payload["n_errors"] = len(errors)
        payload["errors"] = sorted(errors)[:5]
    with open(os.path.join(REPO_DIR, "BENCH_LOCAL.json"), "w") as fh:
        json.dump(
            {
                "timings": timings,
                "error_detail": errors,
                "best_observed_per_query": best,
                **payload,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    # The driver parses the stdout tail (2000 bytes observed in round 1);
    # if the line ever outgrows it, shed headline entries largest-name-first
    # until it fits — totals always survive.
    line = json.dumps(payload, separators=(",", ":"))
    while len(line) > 1900 and payload["queries"]:
        payload["queries"].pop(max(payload["queries"], key=len))
        line = json.dumps(payload, separators=(",", ":"))
    # Stop the session BEFORE the final print so no JVM/py4j shutdown noise
    # lands after the JSON line the driver parses from the stdout tail.
    spark.stop()
    sys.stdout.flush()
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
