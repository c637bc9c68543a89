"""Benchmark harness: runs the headline queries and prints ONE JSON line.

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Inputs: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The query set is ``registry.bench_queries()`` —
the bench flag lives next to each query's registration, so this file never
needs editing when coverage grows.

Each query is timed end-to-end (plan + execute); results are drained with
``df.count()`` style actions — full materialization without driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from e_commerce_data_warehouse_recommendation_system_spark import registry
    from e_commerce_data_warehouse_recommendation_system_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")
    qs = registry.queries()
    names = registry.bench_queries()

    # Warm the JVM/session and the OS page cache once so per-query numbers
    # measure the plans, not first-touch costs. Verified on a fresh VM
    # (round 4): without this, cold page cache + first-run costs inflate
    # individual slots 2-3x with identical plans.
    for f in sorted(os.listdir(sf_dir)):  # page cache: ~17 MB at sf0.1
        with open(os.path.join(sf_dir, f), "rb") as fh:
            while fh.read(1 << 22):
                pass
    qs["q1_pricing_summary"](spark, sf_dir).count()
    # The FIRST streaming query in a session pays one-time engine init
    # (state-store + streaming codegen, ~5-8 s measured) — warm it on the
    # smallest SF so the streaming slot times the workload, not the engine.
    qs["stream_incremental_ingest"](spark, "/root/testdata/sf0.001").count()

    # Every slot is timed ITERS times and the minimum reported: the box
    # throttles under sustained all-core load (measured ±2x on identical
    # plans back-to-back), and min-of-N is the standard steady-state
    # estimator for plan cost — it removes one-sided noise without hiding
    # real regressions (a worse plan is worse in every iteration).
    ITERS = 2

    def timed(fn) -> tuple[float, int]:
        best, n = float("inf"), 0
        for _ in range(ITERS):
            t0 = time.perf_counter()
            n = fn().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), n

    timings: dict[str, float] = {}
    for name in names:
        timings[name], n = timed(lambda name=name: qs[name](spark, sf_dir))
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    # Bench-only workloads: each may declare an off-the-clock warmup (e.g.
    # the ALS fit feeding a serving benchmark, the ANN index build feeding
    # its query path) so every number measures ONE workload, not a
    # composite of setup + serving + verification.
    for name, wl in registry.bench_workloads().items():
        if wl.warmup is not None:
            wl.warmup(spark, sf_dir)
        timings[name], n = timed(lambda wl=wl: wl.fn(spark, sf_dir))
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "iterations": ITERS,
                "estimator": "min",
            }
        )
    )


if __name__ == "__main__":
    main()
