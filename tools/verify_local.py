"""Local emulation of the driver's correctness pass.

Runs every registered verify key at sf0.01, timing Spark-side execution and
the DuckDB oracle, and comparing row counts + sorted-column value hashes the
same way the driver does. Prints per-key timing so slow keys (the reason the
round-1 driver pass stopped at 50/93) are visible.

Usage: python tools/verify_local.py [--sf-dir /root/testdata/sf0.01] [--keys k1,k2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols):
    """Order-insensitive hash over rows with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    digests = sorted(
        hashlib.md5(
            "|".join(_norm(row[i]) for i in order).encode()
        ).hexdigest()
        for row in rows
    )
    return hashlib.md5("".join(digests).encode()).hexdigest()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default=None)
    ap.add_argument("--timing-only", action="store_true",
                    help="skip oracle compare; just time Spark side")
    ap.add_argument("--out", default="/tmp/verify_local.json",
                    help="result path; at round end commit the full sweep "
                    "as VERIFY_LOCAL_r{N}.json next to CORRECTNESS_r{N}")
    args = ap.parse_args()

    import duckdb
    from dodo_spark.session import get_spark

    spark = get_spark()
    from dodo_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    keys = args.keys.split(",") if args.keys else list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    total0 = time.monotonic()
    for name in keys:
        t0 = time.monotonic()
        entry = {"spark_s": None, "oracle_s": None, "rows_match": None,
                 "hash_match": None, "err": None}
        try:
            df = qs[name](spark, args.sf_dir)
            rows = df.collect()
            cols = df.columns
            entry["spark_s"] = round(time.monotonic() - t0, 3)
            entry["spark_rows"] = len(rows)
            if not args.timing_only and name in oracles:
                t1 = time.monotonic()
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                entry["oracle_s"] = round(time.monotonic() - t1, 3)
                entry["oracle_rows"] = len(orows)
                entry["rows_match"] = len(rows) == len(orows)
                entry["schema_match"] = sorted(cols) == sorted(ocols)
                entry["hash_match"] = (
                    value_hash([tuple(r) for r in rows], cols)
                    == value_hash(orows, ocols)
                )
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
            entry["spark_s"] = round(time.monotonic() - t0, 3)
        results[name] = entry
        flag = ""
        if entry["err"]:
            flag = " ERR " + entry["err"][:120]
        elif entry.get("hash_match") is False or entry.get("rows_match") is False:
            flag = " MISMATCH"
        print(f"{name:32s} spark={entry['spark_s']}s oracle={entry.get('oracle_s')}s{flag}",
              flush=True)
    n_pass = sum(1 for e in results.values()
                 if e.get("hash_match") and e.get("rows_match"))
    print(f"TOTAL {round(time.monotonic() - total0, 1)}s for {len(keys)} keys "
          f"({n_pass} hash-green)", flush=True)
    with open(args.out, "w") as f:
        json.dump(
            {"sf_dir": args.sf_dir, "n_keys": len(keys), "results": results},
            f, indent=1, sort_keys=True,
        )


if __name__ == "__main__":
    main()
