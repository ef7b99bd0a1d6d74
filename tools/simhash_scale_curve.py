"""Measure the simhash pair-mass scale curve past sf1 (round-13 ask #4).

SCALE.md argues the banded simhash join's wall time is linear in the
QUALIFYING PAIR MASS (the number of hamming<=2 pairs the corpus actually
contains), not in corpus size squared — and that the capped variant
(`dedup_simhash_capped`) stays bounded regardless. Both claims were only
measured up to sf1. This tool generates documents-only corpora at sf1
(scale 10 = 50k docs) and sf3 (scale 30 = 150k docs) with the SAME
gendata config the scale rehearsal dogfoods, then measures:

  - pair_mass: COUNT(*) over dedup_simhash_pairs (engine-side aggregate —
    the ~1e8..1e9-row pair list is never collected)
  - pairs_s:   wall time of that count (generation dominates: the banded
    join must enumerate every qualifying pair to count them)
  - stats_s:   wall time of dedup_simhash_stats (same mass, aggregated
    per hamming distance)
  - capped_s:  wall time of the SIMHASH_BUCKET_CAP-bounded variant, which
    must stay roughly FLAT: per-bucket work is capped at cap^2 and the
    number of sparse buckets grows only linearly in docs

Writes SIMHASH_SCALE_r13.json at the repo root and prints the SCALE.md
table rows. Run on a quiet box; each scale is measured once (these are
minutes-long joins — median-of-3 would triple a half-hour tool for a
trend-level answer).

Usage: python tools/simhash_scale_curve.py [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_rehearsal import BASE_ROWS, DDLS, genconf  # noqa: E402

SCALES = [10, 30]  # x BASE_ROWS => sf1, sf3 (documents: 50k / 150k rows)


def generate_documents(workdir: str, scale: int) -> str:
    """Documents-only gendata run (the simhash keys read nothing else)."""
    import yaml

    from dodo_spark.cli import main as cli_main

    label = f"docs_x{scale}"
    out = os.path.join(workdir, label)
    dst = os.path.join(out, "documents.parquet")
    if os.path.isdir(dst):
        return out  # deterministic generator + same conf: reuse
    conf_dir = os.path.join(workdir, f"_conf_{label}")
    os.makedirs(conf_dir, exist_ok=True)
    ddl_path = os.path.join(conf_dir, "documents.table.sql")
    with open(ddl_path, "w") as f:
        f.write(DDLS["documents"])
    conf = genconf(scale)
    conf["tables"] = [t for t in conf["tables"] if t["name"] == "documents"]
    conf_path = os.path.join(conf_dir, "genconf.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    rc = cli_main(
        ["gendata", "--genconf", conf_path, "--output", out, "--ddl", ddl_path]
    )
    assert rc == 0, f"gendata CLI failed rc={rc}"
    src = os.path.join(out, "documents")
    if os.path.exists(src):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(src, dst)
    return out


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/simhash_curve"
    os.makedirs(workdir, exist_ok=True)

    from pyspark.sql import functions as F

    from dodo_spark.operators.dedup import (
        dedup_simhash_capped,
        dedup_simhash_pairs,
        dedup_simhash_stats,
    )
    from dodo_spark.session import get_spark

    spark = get_spark("simhash_scale_curve")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for scale in SCALES:
        d = generate_documents(workdir, scale)
        docs = scale * BASE_ROWS["documents"]

        t0 = time.perf_counter()
        pair_mass = int(
            dedup_simhash_pairs(spark, d)
            .agg(F.count("*").cast("bigint").alias("n"))
            .collect()[0]["n"]
        )
        pairs_s = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        stats = dedup_simhash_stats(spark, d).collect()
        stats_s = round(time.perf_counter() - t0, 1)
        assert sum(int(r["pair_cnt"]) for r in stats) == pair_mass

        t0 = time.perf_counter()
        capped_pairs = int(dedup_simhash_capped(spark, d).count())
        capped_s = round(time.perf_counter() - t0, 1)

        row = {
            "scale": scale,
            "sf": scale / 10.0,
            "docs": docs,
            "pair_mass": pair_mass,
            "pairs_s": pairs_s,
            "stats_s": stats_s,
            "capped_pairs": capped_pairs,
            "capped_s": capped_s,
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    a, b = rows[0], rows[-1]
    summary = {
        "rows": rows,
        "pair_mass_ratio": round(b["pair_mass"] / max(a["pair_mass"], 1), 2),
        "pairs_s_ratio": round(b["pairs_s"] / max(a["pairs_s"], 0.1), 2),
        "stats_s_ratio": round(b["stats_s"] / max(a["stats_s"], 0.1), 2),
        "capped_s_ratio": round(b["capped_s"] / max(a["capped_s"], 0.1), 2),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SIMHASH_SCALE_r13.json",
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    spark.stop()


if __name__ == "__main__":
    main()
