"""Decompose per-query bench time into DataFrame BUILD (py4j construction +
analysis) vs EXECUTION (noop write) — guide §1: know where the time goes.

Usage: python scripts/overhead_probe.py [--sf SF_DIR] [--sample N | query ...]

For each query: 2 passes of (build, write), reporting the second pass
(steady state). Prints a per-query table and the aggregate split.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from sqlserver2pgsql_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--sample", type=int, default=0)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("overhead_probe")
    sc = spark.sparkContext
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    qs = entrymod.queries()
    names = args.queries or sorted(qs)
    if args.sample:
        names = names[:: max(1, len(names) // args.sample)][: args.sample]

    import gc

    rows = []
    for name in names:
        fn = qs[name]
        build = write = 0.0
        for i in range(args.passes):
            gc.collect()
            for jrdd in sc._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build, write = t1 - t0, t2 - t1  # keep last (steady) pass
        rows.append((name, build, write))
        print(f"{name:45s} build={build:6.3f}s write={write:6.3f}s", flush=True)

    tb = sum(r[1] for r in rows)
    tw = sum(r[2] for r in rows)
    print(f"\nTOTAL over {len(rows)} queries: build={tb:.1f}s write={tw:.1f}s "
          f"(build share {100*tb/(tb+tw):.0f}%)")
    rows.sort(key=lambda r: -r[1])
    print("top build-cost queries:")
    for name, b, w in rows[:25]:
        print(f"  {name:45s} build={b:6.3f}s write={w:6.3f}s")


if __name__ == "__main__":
    main()
