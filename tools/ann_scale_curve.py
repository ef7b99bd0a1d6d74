"""Measure the ANN/similarity family past sf1 (round-13; sibling of
tools/simhash_scale_curve.py and tools/text_scale_curve.py).

SCALE.md argues the ANN tiers by construction: the brute-force cosine
top-k (`similarity_topk`) is the O(n*q) correctness baseline and must
grow ~linearly in corpus size, while the bucketed tiers (`similarity_lsh`)
and the cell-pruned IVF (`similarity_ivf`, `similarity_ivf_pruned`) probe
only a fixed number of buckets/cells per query and should grow
sub-linearly. None of that was measured above sf1. This tool generates
embeddings-only corpora at sf1 (20k vectors) and sf3 (60k) with the same
gendata config the rehearsal dogfoods and times each key engine-side
(count over the full result, never a driver collect), one untimed warm
pass per key first (JVM/codegen cold-start otherwise bills to the sf1
leg — see text_scale_curve.py's first-run pitfall).

Writes ANN_SCALE_r13.json at the repo root.

Usage: python tools/ann_scale_curve.py [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_rehearsal import BASE_ROWS, DDLS, genconf  # noqa: E402

# default x10 vs x100 (20k vs 200k vectors): the first run of this tool
# used x10 vs x30 and EVERY tier measured flat-to-noise (1-4s absolutes,
# brute "0.69x" at 3x data) — at 60k vectors the whole family is fixed-
# overhead-bound and the curve differentiates nothing. The O(n*q) brute
# term needs ~200k vectors before it rises out of the overhead floor.
SCALES = [int(s) for s in os.environ.get("ANN_CURVE_SCALES", "10,100").split(",")]

KEYS = [
    "similarity_topk",       # brute O(n*q) baseline -> expect ~linear
    "similarity_lsh",        # hyperplane-bucketed -> expect sub-linear
    "similarity_ivf",        # fixed-centroid cell probe -> sub-linear
    "similarity_ivf_pruned", # cell-partitioned index + pruned probe
]


def generate_embeddings(workdir: str, scale: int) -> str:
    """Embeddings-only gendata run (the ANN keys read nothing else)."""
    import yaml

    from dodo_spark.cli import main as cli_main

    label = f"emb_x{scale}"
    out = os.path.join(workdir, label)
    dst = os.path.join(out, "embeddings.parquet")
    if os.path.isdir(dst):
        return out
    conf_dir = os.path.join(workdir, f"_conf_{label}")
    os.makedirs(conf_dir, exist_ok=True)
    ddl_path = os.path.join(conf_dir, "embeddings.table.sql")
    with open(ddl_path, "w") as f:
        f.write(DDLS["embeddings"])
    conf = genconf(scale)
    conf["tables"] = [t for t in conf["tables"] if t["name"] == "embeddings"]
    conf_path = os.path.join(conf_dir, "genconf.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    rc = cli_main(
        ["gendata", "--genconf", conf_path, "--output", out, "--ddl", ddl_path]
    )
    assert rc == 0, f"gendata CLI failed rc={rc}"
    src = os.path.join(out, "embeddings")
    if os.path.exists(src):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(src, dst)
    return out


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/simhash_curve"
    os.makedirs(workdir, exist_ok=True)

    from dodo_spark import registry
    from dodo_spark.session import get_spark

    spark = get_spark("ann_scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    rows = []
    for scale in SCALES:
        d = generate_embeddings(workdir, scale)
        row: dict = {
            "scale": scale,
            "sf": scale / 10.0,
            "vectors": scale * BASE_ROWS["embeddings"],
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }
        for key in KEYS:
            qs[key](spark, d).count()  # warm pass, untimed
            t0 = time.perf_counter()
            n = int(qs[key](spark, d).count())
            row[key] = {"rows": n, "spark_s": round(time.perf_counter() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    a, b = rows[0], rows[-1]
    ratios = {
        key: round(b[key]["spark_s"] / max(a[key]["spark_s"], 0.1), 2)
        for key in KEYS
    }
    summary = {"rows": rows, "spark_s_ratios": ratios}
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ANN_SCALE_r13.json",
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(ratios))
    spark.stop()


if __name__ == "__main__":
    main()
