"""Per-query profiling harness for optimization rounds (guide §1).

For each named query: run 1 cold + N warm noop-sink passes, count the Spark
jobs each pass launches (statusTracker under a dedicated job group), and
optionally dump .explain('formatted') to a file.

Usage:
    python scripts/profile_query.py [--sf SF_DIR] [--passes N]
        [--explain-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
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
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--unpersist", action="store_true",
                    help="unpersist leftover RDD blocks before each pass")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    sc = spark.sparkContext
    import gc

    qs = entrymod.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    for name in args.queries:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        times = []
        jobs = []
        for i in range(args.passes + 1):
            gc.collect()
            if args.unpersist:
                # drop the previous pass's localCheckpoint blocks directly:
                # Python refcounting already detached the RDD wrappers, but
                # their storage blocks wait on a JVM GC + ContextCleaner
                # drain (System.gc() per pass measured WORSE — the cleanup
                # flood executes inside the next timed pass)
                for jrdd in sc._jsc.getPersistentRDDs().values():
                    jrdd.unpersist(False)
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            st = sc.statusTracker()
            nj = len(st.getJobIdsForGroup(group))
            times.append(dt)
            jobs.append(nj)
        warm = times[1:]
        print(
            f"{name:42s} cold={times[0]:6.2f}s warm="
            + "/".join(f"{t:.2f}" for t in warm)
            + f"  min={min(warm):.2f} med={sorted(warm)[len(warm)//2]:.2f}"
            + f"  jobs={jobs[1]}"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
