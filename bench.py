"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The per-query number is wall-clock for plan + execution + a driver-side
count-style consumption (collect of the already-small result). A warmup
query runs first so JVM/codegen startup isn't billed to the first key.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dodo_spark import registry
from dodo_spark.session import get_spark

# Headline set: the heavier, shuffle/join/window-shaped keys. Everything
# else still runs in the driver's correctness pass.
HEADLINE = [
    "agg_group",
    "join_inner",
    "join_theta",
    "agg_distinct",
    "agg_cube",
    "window_rank",
    "window_frame",
    "topk_per_group",
    "sort_limit",
    "subquery_in",
    "cte_reuse",
    "scan_project_filter",
    "explode_array",
    "scalar_json",
    "text_match",
    "analytics_shipping_priority",
    "analytics_revenue_by_nation",
    "analytics_order_funnel",
    "analytics_market_share",
    "analytics_returned_revenue",
    "analytics_priority_mix",
    "analytics_nation_volume",
    "analytics_large_orders",
    "dedup_exact",
    "dedup_near",
    "events_tumbling",
    "text_stats",
    "stats_column",
    "agg_key_merge",
    "events_funnel",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("dodo_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries = registry.queries()

    # warmup: touch the biggest table once (JVM + codegen + FS cache)
    all_queries["agg_group"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = all_queries.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rows = df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        del rows

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
