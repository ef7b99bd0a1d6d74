"""Measure text/dedup-family scale curves past sf1 (round-13 extension of
the simhash curve — same corpora, the OTHER documents-only flagship keys).

Reuses the documents-only corpora `tools/simhash_scale_curve.py` generates
at sf1 (50k docs) and sf3 (150k docs) and measures, per key, wall time of a
full engine-side materialization (count, never a driver collect):

  - dedup_near:        banded MinHash-LSH near-dup pair emission — SCALE.md
                       argues wall follows OUTPUT pair mass, sub-linearly
  - dedup_clusters:    pointer-doubling connected components over those
                       pairs — the cluster representation that avoids
                       enumerating O(k^2) intra-cluster pairs
  - text_bpe_encode:   merge-chain application at VOCABULARY granularity —
                       the vocab (distinct (lang, word)) grows far slower
                       than the corpus, so wall should be strongly
                       sub-linear in docs
  - text_lm_novelty:   n-gram posting join — shuffle on ngram key
  - corpus_clean:      scan-side normalization funnel — linear scan shape,
                       wall should track docs ~1:1 or better

Writes TEXT_SCALE_r13.json at the repo root. Run on a quiet box AFTER
simhash_scale_curve has populated the workdir (it reuses the parquet).

Usage: python tools/text_scale_curve.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.simhash_scale_curve import SCALES, generate_documents  # noqa: E402

KEYS = [
    "dedup_near",
    "dedup_clusters",
    "text_bpe_encode",
    "text_lm_novelty",
    "corpus_clean",
]


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/simhash_curve"
    os.makedirs(workdir, exist_ok=True)

    from dodo_spark import registry
    from dodo_spark.session import get_spark

    spark = get_spark("text_scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    rows = []
    for scale in SCALES:
        d = generate_documents(workdir, scale)
        row: dict = {
            "scale": scale,
            "sf": scale / 10.0,
            "docs": scale * 5000,
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }
        for key in KEYS:
            # one untimed warm pass first: these kernels run 1-20s, where
            # JVM/codegen/page-cache cold-start would otherwise dominate
            # the sf1 leg and fake a "faster at 3x data" curve (the first
            # run of this tool did exactly that)
            qs[key](spark, d).count()
            t0 = time.perf_counter()
            n = int(qs[key](spark, d).count())
            row[key] = {"rows": n, "spark_s": round(time.perf_counter() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    a, b = rows[0], rows[-1]
    ratios = {
        key: {
            "rows_ratio": round(b[key]["rows"] / max(a[key]["rows"], 1), 2),
            "spark_s_ratio": round(
                b[key]["spark_s"] / max(a[key]["spark_s"], 0.1), 2
            ),
        }
        for key in KEYS
    }
    summary = {"rows": rows, "ratios": ratios}
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TEXT_SCALE_r13.json",
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(ratios))
    spark.stop()


if __name__ == "__main__":
    main()
