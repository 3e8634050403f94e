"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Per-query wall time = full plan execution including the parquet scan, with
results drained via count() on a cached-free plan (no driver-side collect of
payloads — mirrors how a cluster job would be measured). Each query runs
``$SPARK_GRAFT_BENCH_REPEATS`` times (default 3) and the fastest run is
reported: early executions pay one-time whole-stage-codegen compilation and
C2 JIT (amortized on any long-lived cluster — the 64-aggregate MinHash
stage needs ~3 invocations to reach compiled steady state), and host-level
noise on a shared VM otherwise dominates query-level differences run to run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dataingestion_pt_ms_spark.queries import registry
from dataingestion_pt_ms_spark.session import get_spark

HEADLINE = [
    "flagship_region_monthly_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q21_last_to_ship",
    "join_left_outer_order_counts",
    "window_cumulative_range",
    "window_extended_family",
    "pivot_status_matrix",
    "set_except_all",
    "udf_grouped_map_zscore",
    "dedup_simhash_banded_pairs",
    "ingest_status_serving",
    "events_sessionize_gap30m",
    "asof_join_last_purchase",
    "ohlc_daily_resample",
    "text_term_frequency",
    "pipeline_pretrain_corpus",
    "text_quality_score",
    "dedup_exact_groups",
    "dedup_minhash_lsh_pairs",
    "dedup_cross_corpus_minhash",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "docs_source_stats",
    "histogram_order_totals",
    "text_cross_doc_spans",
    "timeseries_gapfill_interpolate",
    "events_scd2_history",
    "join_bloom_runtime_filter",
    "sim_pq_adc_topk",
    "sim_cosine_topk_bruteforce",
    "sim_ann_ivf_topk",
    "sim_blocked_nearest_neighbor",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench")
    specs = registry()

    # warm-up: one JVM action (codegen/scan setup) + one Python-worker action
    # (worker pools are persistent on a real cluster; the first-UDF fork cost
    # shouldn't be billed to whichever query happens to run first)
    specs["q1_pricing_summary"].fn(spark, sf_dir).count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    times: dict[str, float] = {}
    for name in HEADLINE:
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
