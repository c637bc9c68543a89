"""Isolated idle probe for bench-slot adjudication (r13 verdict #2/#3).

The per-round BENCH sweep times 31+ slots back-to-back under whatever load
the box happens to carry; when a slot rises round-over-round with spread
< 1.1 the adjudication rule demands an ISOLATED probe at a truly idle box
plus a plan pin — this script is that probe, factored out of the ad-hoc
one-offs earlier rounds ran inline (COVERAGE.md round 13: etl_fact_sales).

Per slot it:
  1. waits for 1-min loadavg < PROBE_LOADAVG (or gives up after the wait
     budget and flags degraded_host, the bench.py convention);
  2. runs the slot's off-clock warmup if it is a bench workload (so the
     probe times the workload, not fixture builds);
  3. times ITERS runs (min is the steady-state estimator, matching bench);
  4. fingerprints the optimized plan (node-class histogram — a cheap,
     diff-able pin: a changed plan changes the histogram);
  5. for text_curation_pipeline, also records per-stage seconds via the
     component's stage_times hook.

Usage: python scripts/probe_slot.py [slot ...]   (default: the two r13
watch items). Prints one JSON line per slot + a trailing summary line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ITERS = int(os.environ.get("PROBE_ITERS", "3"))
PROBE_LOADAVG = float(os.environ.get("PROBE_LOADAVG", "2.0"))
PROBE_WAIT_SEC = int(os.environ.get("PROBE_WAIT_SEC", "600"))

DEFAULT_SLOTS = ["dedup_shared_spans", "text_curation_pipeline"]


def plan_fingerprint(df) -> dict:
    """Node-class histogram of the executed plan — the pin. Stable across
    cosmetic id churn (#123 suffixes stripped), sensitive to shape changes
    (an extra Exchange/Sort/Join changes the counts)."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    nodes: dict[str, int] = {}
    for line in txt.splitlines():
        m = re.search(r"[+:*-]*\s*\(?\d*\)?\s*([A-Za-z][A-Za-z0-9]+)", line)
        if m:
            nodes[m.group(1)] = nodes.get(m.group(1), 0) + 1
    return nodes


def main() -> None:
    slots = sys.argv[1:] or DEFAULT_SLOTS

    waited = 0
    while os.getloadavg()[0] > PROBE_LOADAVG and waited < PROBE_WAIT_SEC:
        print(
            f"# waiting for idle: loadavg {os.getloadavg()[0]:.2f} ({waited}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
    degraded = os.getloadavg()[0] > PROBE_LOADAVG

    from e_commerce_data_warehouse_recommendation_system_spark import registry
    from e_commerce_data_warehouse_recommendation_system_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]")
    qs = registry.queries()
    wls = registry.bench_workloads()
    comps = registry.components()

    # era evidence (round 14): the Spark-shaped probe alongside the slot
    # probes, so an isolated adjudication carries the same JVM/IO-era
    # context the sweep artifact does (bench.calibrate_jvm)
    import bench

    jvm_probe = bench.calibrate_jvm(spark)
    print(f"# jvm probe: {json.dumps(jvm_probe)}", file=sys.stderr)

    out: dict[str, dict] = {}
    for slot in slots:
        if slot in wls:
            wl = wls[slot]
            if wl.warmup is not None:
                wl.warmup(spark, SF_DIR)
            fn = wl.fn
        elif slot in qs:
            fn = qs[slot]
        elif slot in comps:
            fn = comps[slot].fn
        else:
            print(f"# unknown slot: {slot}", file=sys.stderr)
            continue
        runs = []
        n = 0
        df = None
        for _ in range(ITERS):
            la = round(os.getloadavg()[0], 2)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)  # plan build is part of the timed cost
            n = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
        rec = {
            "runs": runs,
            "min": min(runs),
            "spread": round(max(runs) / max(min(runs), 1e-9), 3),
            "rows": n,
            "loadavg_last": la,
            "degraded_host": degraded,
            # fingerprint the LAST timed run's frame — re-invoking fn would
            # execute component-internal eager work a whole extra time
            # (r14 review: +33% probe wall clock for nothing)
            "plan_nodes": plan_fingerprint(df),
        }
        if slot == "text_curation_pipeline":
            from e_commerce_data_warehouse_recommendation_system_spark.operators.curation import (
                text_curation_pipeline,
            )

            stage_times: dict[str, float] = {}
            t0 = time.perf_counter()
            text_curation_pipeline(spark, SF_DIR, stage_times=stage_times).count()
            total = round(time.perf_counter() - t0, 3)
            stage_times["s7_pack_and_summary_remainder"] = round(
                total - sum(stage_times.values()), 3
            )
            rec["stage_seconds"] = stage_times
            rec["stage_total"] = total
        out[slot] = rec
        print(json.dumps({slot: rec}))
    print(
        json.dumps(
            {"sf_dir": SF_DIR, "iters": ITERS, "jvm_probe": jvm_probe, "slots": out}
        )
    )


if __name__ == "__main__":
    main()
