"""Measure the events/time-series family past sf1 (round-13; sibling of
tools/ann_scale_curve.py — same warm-pass protocol, events-only corpora).

The events operators are the engine's streaming-adjacent batch surface:
windowed aggregation, session splitting, as-of and range joins, OHLC
rollup. SCALE.md argues they all shuffle on (user/session/window) keys
whose cardinality grows linearly with the corpus and therefore scale
~linearly on a fixed core count; none had a measurement above sf1. This
tool generates events-only corpora at x10 (1M rows ~ sf1) and x100
(10M rows ~ sf10) with the rehearsal's gendata config and times each key
engine-side (count over the full result), one untimed warm pass per key.

Writes EVENTS_SCALE_r13.json at the repo root.

Usage: python tools/events_scale_curve.py [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_rehearsal import BASE_ROWS, DDLS, genconf  # noqa: E402

SCALES = [int(s) for s in os.environ.get("EVENTS_CURVE_SCALES", "10,100").split(",")]

KEYS = [
    "events_tumbling",    # window agg: one shuffle on (window) keys
    "events_session",     # session split: window over user, gap compare
    "events_asof_join",   # backward as-of: union-merge window technique
    "events_range_join",  # interval containment join
    "events_ohlc",        # per-bucket open/high/low/close rollup
]


TABLES = ["events", "orders"]  # events_range_join probes orders intervals


def generate_events(workdir: str, scale: int) -> str:
    """Events+orders gendata run (events_range_join also reads orders)."""
    import yaml

    from dodo_spark.cli import main as cli_main

    label = f"ev_x{scale}"
    out = os.path.join(workdir, label)
    if all(os.path.isdir(os.path.join(out, f"{t}.parquet")) for t in TABLES):
        return out
    conf_dir = os.path.join(workdir, f"_conf_{label}")
    os.makedirs(conf_dir, exist_ok=True)
    ddl_paths = []
    for t in TABLES:
        ddl_path = os.path.join(conf_dir, f"{t}.table.sql")
        with open(ddl_path, "w") as f:
            f.write(DDLS[t])
        ddl_paths.append(ddl_path)
    conf = genconf(scale)
    conf["tables"] = [t for t in conf["tables"] if t["name"] in TABLES]
    conf_path = os.path.join(conf_dir, "genconf.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    rc = cli_main(
        ["gendata", "--genconf", conf_path, "--output", out,
         "--ddl", *ddl_paths]
    )
    assert rc == 0, f"gendata CLI failed rc={rc}"
    for t in TABLES:
        src = os.path.join(out, t)
        dst = os.path.join(out, f"{t}.parquet")
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

    spark = get_spark("events_scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    rows = []
    for scale in SCALES:
        d = generate_events(workdir, scale)
        row: dict = {
            "scale": scale,
            "sf": scale / 10.0,
            "events": scale * BASE_ROWS["events"],
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
        "EVENTS_SCALE_r13.json",
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(ratios))
    spark.stop()


if __name__ == "__main__":
    main()
