"""Measure the ANN tier table (recall@k vs exact brute force + wall-clock)
for operators/ann.py's docstring and SCALE.md §ANN.

Run: python tools/ann_tiers.py [--sf-dir /root/testdata/sf0.01] [--k 10]
Prints one markdown table row per tier; recall is mean over the query set
against the brute-force ranking (ties broken identically in every tier,
so exact agreement is well-defined).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from dodo_spark.operators.ann import ANN_METHODS, ann_search
    from dodo_spark.session import get_spark

    spark = get_spark()
    spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet")).count()

    def run(method):
        t0 = time.monotonic()
        rows = ann_search(spark, args.sf_dir, method=method, k=args.k).collect()
        dt = time.monotonic() - t0
        return {(r["query_id"], r["neighbor_id"]) for r in rows}, dt, len(rows)

    exact, t_brute, n_brute = run("brute")
    per_q = {}
    for q, n in exact:
        per_q.setdefault(q, set()).add(n)

    print(f"| method | recall@{args.k} | rows | seconds (sf={args.sf_dir.rsplit('sf',1)[-1]}) |")
    print("|---|---|---|---|")
    print(f"| brute | 1.000 | {n_brute} | {t_brute:.2f} |")
    for m in [x for x in ANN_METHODS if x != "brute"]:
        got, dt, n = run(m)
        hits = sum(len({x for x in per_q[q]} & {nb for qq, nb in got if qq == q})
                   for q in per_q)
        recall = hits / sum(len(v) for v in per_q.values())
        print(f"| {m} | {recall:.3f} | {n} | {dt:.2f} |")


if __name__ == "__main__":
    main()
