"""Clean-window A/B for q55 (VERDICT r4 item 3).

Round 4's full sweep read q55_ini_pipeline at 4.69 s vs round 3's 1.51 s
(3.1x) — in a window with steal 3.66 % and with the q10-q12 cluster (also
2.4-3.1x movers) re-ordered to the sweep tail.  Protocol (same as the r4
A/B that cleared q34/q44): fresh session, local[32], sf0.1, the query runs
FIRST (one warm-up rep then N timed reps), load and steal-delta logged so
the window qualifies or disqualifies itself.

    python BENCH/ab_q55.py [reps] [--queries q55_ini_pipeline,...]

Prints one JSON line per query: {"query", "reps": [...], "load_before",
"steal_pct"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _steal_ticks() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    names = ["q55_ini_pipeline"]
    if args and args[0].isdigit():
        reps = int(args.pop(0))
    if args and args[0] == "--queries":
        names = args[1].split(",")

    from ocrd_odem_spark.plans.queries import registry, retired_relational
    from ocrd_odem_spark.session import get_spark

    reg = registry()
    reg.update(retired_relational())

    hz = os.sysconf("SC_CLK_TCK")
    ncpu = os.cpu_count() or 32
    load_before = round(os.getloadavg()[0], 2)
    spark = get_spark("ab-q55", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _ = reg[name]
        fn(spark, SF_DIR).collect()  # warm-up rep (parquet cache, JIT)
        times = []
        c0, t0 = _steal_ticks(), time.time()
        for _ in range(reps):
            r0 = time.time()
            fn(spark, SF_DIR).collect()
            times.append(round(time.time() - r0, 3))
        wall = time.time() - t0
        steal = round(100.0 * (_steal_ticks() - c0) / hz / (wall * ncpu), 2)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": SF_DIR,
                    "reps": times,
                    "load_before": load_before,
                    "steal_pct": steal,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
