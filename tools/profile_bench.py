"""Round-13 optimization profiler: per-key cost breakdown + plan capture.

For every bench.py HEADLINE key, measures at $SPARK_GRAFT_SF_DIR:
  - build_s:   time to construct the DataFrame (Python-side plan build)
  - action_s:  time for .collect() (bench methodology) — median of N runs
  - jobs:      number of Spark jobs the key fires END-TO-END (plan build +
               every run, divided by runs is NOT meaningful because many
               keys fire driver-side actions during build; we count build
               plus ONE collect in a dedicated job group)
  - explain:   .explain("formatted") written to plans/<round>/<key>_before.txt
               (or _after.txt with --after)

Usage: python tools/profile_bench.py [--after] [--runs N] [--keys k1,k2,...]
Writes PROFILE_<round>_{before|after}.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from dodo_spark import registry  # noqa: E402
from dodo_spark.session import get_spark  # noqa: E402


def main() -> None:
    after = "--after" in sys.argv
    runs = 3
    keys = None
    for i, a in enumerate(sys.argv):
        if a == "--runs":
            runs = int(sys.argv[i + 1])
        if a == "--keys":
            keys = sys.argv[i + 1].split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = "after" if after else "before"
    rnd = os.environ.get("DODO_PROFILE_ROUND", "r14")
    plan_dir = os.path.join(root, "plans", rnd)
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("dodo_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries = registry.queries()
    all_queries["agg_group"](spark, sf_dir).collect()  # warmup

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    names = keys or [k for k in HEADLINE if k in all_queries]
    for name in names:
        fn = all_queries[name]
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        spark.sparkContext.setJobDescription(name)

        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t0
        jobs_build = len(tracker.getJobIdsForGroup(group))

        # one timed collect inside the group: job count for a single run
        t0 = time.perf_counter()
        df.collect()
        first_collect_s = time.perf_counter() - t0
        jobs_total = len(tracker.getJobIdsForGroup(group))

        # bench-methodology medians (build+collect per run, fresh build)
        samples = []
        for _ in range(max(0, runs - 1)):
            t0 = time.perf_counter()
            d2 = fn(spark, sf_dir)
            d2.collect()
            samples.append(time.perf_counter() - t0)
        samples.append(build_s + first_collect_s)
        med = statistics.median(samples)

        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            try:
                plan = df._jdf.queryExecution().explainString(
                    df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception as e:  # noqa: BLE001
                plan = f"<explain failed: {e}>"
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)

        out[name] = {
            "build_s": round(build_s, 4),
            "first_collect_s": round(first_collect_s, 4),
            "median_s": round(med, 4),
            "jobs_build": jobs_build,
            "jobs_one_run": jobs_total,
            "exchanges": plan.count("Exchange"),
            "loadavg": round(os.getloadavg()[0], 2),
        }
        sc.setJobGroup(None, None)
        print(
            f"{name}: build={build_s:.3f}s collect={first_collect_s:.3f}s "
            f"median={med:.3f}s jobs(build)={jobs_build} "
            f"jobs(run)={jobs_total - jobs_build}",
            flush=True,
        )

    path = os.path.join(root, f"PROFILE_{rnd}_{tag}.json")
    with open(path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "runs": runs,
                "total_median_s": round(sum(v["median_s"] for v in out.values()), 2),
                "keys": out,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
