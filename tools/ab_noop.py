"""Interleaved A/B of registry keys with the noop sink (guide §1.4).

Times ONLY the computation (write.format("noop")), alternating keys
round-robin for REPS rounds so host-regime drift hits all variants
equally. Prints per-key min/median.

Usage: python tools/ab_noop.py key1 key2 ... [--reps N] [--collect]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dodo_spark import registry  # noqa: E402
from dodo_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 5
    collect = False
    keys = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--collect":
            collect = True
            i += 1
        else:
            keys.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dodo_spark_ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    qs["agg_group"](spark, sf_dir).collect()  # warmup

    times: dict[str, list[float]] = {k: [] for k in keys}
    for r in range(reps):
        for k in keys:
            spark.sparkContext.setJobDescription(f"ab:{k}:{r}")
            t0 = time.perf_counter()
            df = qs[k](spark, sf_dir)
            if collect:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
            print(f"  r{r} {k}: {times[k][-1]:.3f}s", flush=True)
    print(f"loadavg={os.getloadavg()[0]:.2f}")
    for k in keys:
        print(
            f"{k}: min={min(times[k]):.3f} med={statistics.median(times[k]):.3f}"
            f" all={[round(t, 3) for t in times[k]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
