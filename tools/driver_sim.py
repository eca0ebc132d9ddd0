"""Simulate the driver's per-round correctness pass locally.

The driver verifies a bounded PREFIX of ``__spark_entry__.queries()``
(50 names per round) through a VANILLA SparkSession (not this repo's
session factory) against ``oracle_sql()`` in DuckDB at sf0.01. This
tool replicates that exactly — same ordering, same comparison path
(tests/oracle_harness.compare) — so a local green means the real
driver row will be green.

Usage:
    python tools/driver_sim.py                      # first 50, sf0.01
    python tools/driver_sim.py --n 28 --out /tmp/sim.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod
    from oracle_harness import compare, duckdb_conn

    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    con = duckdb_conn(args.sf_dir)
    names = list(qs)[: args.n]
    results: dict[str, dict] = {}
    n_fail = 0
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
            if name in osql:
                odf = con.execute(osql[name]).fetchdf()
                probs = compare(sdf, odf, name)
            else:
                probs = [] if len(sdf) >= 0 else ["rows-only check failed"]
            status = "ok" if not probs else "FAIL"
        except Exception as e:  # noqa: BLE001 — a sim must survive any query
            probs = [f"err: {e}"]
            status = "ERR"
        if status != "ok":
            n_fail += 1
        dt = time.time() - t0
        print(f"[{i}/{len(names)}] {name}: {status} ({dt:.1f}s)"
              + (f" {probs[:2]}" if probs else ""), flush=True)
        results[name] = {"status": status, "seconds": round(dt, 2),
                         "problems": probs[:5]}
    print(f"DRIVER-SIM {len(names) - n_fail}/{len(names)} green "
          f"at {args.sf_dir}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
