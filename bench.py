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

#: Slot genealogy across rounds (old composite slot -> the slots that now
#: cover the same work). Emitted into the bench JSON so round-over-round
#: comparison is mechanical: to compare BENCH_r{N} against a round that
#: predates a split, sum the listed successor slots.
SLOT_HISTORY: dict[str, dict] = {
    "rec_als_topk": {
        "replaced_by": ["rec_als_fit", "rec_als_serve_all", "rec_als_serve_subset"],
        "since_round": 5,
        "note": "r3's slot timed fit + both serving paths + contract "
        "verification in one number; the successors time one workload each "
        "(fit cold; serving on a warmed model).",
    },
    "sim_ann_digest": {
        "replaced_by": ["sim_ann_lsh", "sim_ann_ivf"],
        "since_round": 5,
        "note": "r3's slot timed both ANN variants + index builds; the "
        "successors time each query path with the index build off-clock.",
    },
}


#: Host-speed calibration (r12 verdict #1): three consecutive rounds of
#: bench archaeology ("is the 72->119 s rise code or box?") because the
#: artifact carried no measure of how fast the HOST was when it was
#: recorded. Two deterministic fixed-work CPU probes — single-thread
#: (per-core speed / frequency throttling) and 32-process (all-core
#: contention, the shape Spark slots actually run) — run at sweep start
#: and end; their ratio to the pinned idle reference is the slowdown
#: factor that normalizes slot deltas round-over-round. References were
#: measured min-of-3 on this box at loadavg < 2 (round 13).
CALIB_REF_SINGLE_SEC = 0.17
CALIB_REF_MULTI_SEC = 0.71
CALIB_PROCS = 32
#: r13 verdict #1: the pinned constants above are only the INITIAL floor.
#: BENCH_r13's own loaded sweep beat the pinned "idle floor" (multi32
#: 0.600 s vs 0.71), proving the constant was measured on a slower host
#: era — a sub-1 slowdown then INFLATED value_normalized above raw. The
#: floor is therefore self-maintaining: each sweep persists
#: min(previous floor, observed) in BENCH_stats.json, and the sweep
#: slowdown used for normalization is clamped to >= 1, so
#: value_normalized can never exceed raw (normalization DISMISSES risers,
#: it never manufactures them).


#: Spark-shaped calibration probe (round 14). The CPU probes above
#: demonstrably cannot see JVM/IO-era drift: COVERAGE round 14 recorded a
#: host era where the CPU probe read FASTER than its floor (0.600 vs
#: 0.71 s) while every Spark slot read ~1.35-1.5x slower — the drift was
#: engine-side (JVM, shuffle machinery, page-cache/IO path), exactly the
#: component a pure-numpy probe is blind to, and both r13/r14 watch items
#: (dedup_shared_spans, etl_fact_sales) were adjudicated by hand for that
#: reason. This probe is fixed Spark work — range -> project -> hash
#: aggregate over 100k groups (a real Exchange + whole-stage codegen) ->
#: one-row global checksum — timed min-of-N with warm runs off the clock
#: (the JIT ramp on a cold session measured 10.9 -> 1.6 s, so the min
#: over too few runs would time compilation, not the engine). Its floor
#: self-maintains exactly like the CPU floor; NOTE its era coverage
#: begins round 14 (the faster r11-r13 host is gone and cannot be
#: re-measured, so the initial pin is this round's best observation —
#: the first sweep on a fast-era host will lower it).
CALIB_REF_JVM_SEC = 0.85
_JVM_PROBE_ROWS = 2_000_000
_JVM_PROBE_GROUPS = 100_000
_JVM_PROBE_CHECKSUM = 4799870976549
_JVM_WARM_RUNS = 2
_JVM_TIMED_RUNS = 4


def _jvm_probe_frame(spark):
    """The fixed probe plan. Deterministic integer arithmetic end-to-end
    (checksum pinned above) so the work can neither vary by input nor be
    optimized away; 64 input partitions + a 100k-group hash aggregate give
    it a genuine shuffle on every run."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, _JVM_PROBE_ROWS, 1, 64)
        .select(
            ((F.col("id") * 2654435761) % _JVM_PROBE_GROUPS).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
        .select(F.sum(F.col("k") * F.col("s")).alias("chk"))
    )


def calibrate_jvm(spark) -> dict:
    """min-of-N Spark-probe seconds. Warm runs off the clock (JIT ramp);
    a checksum mismatch is FLAGGED, never asserted (the CPU-probe
    convention — probe timing stays valid either way)."""
    for _ in range(_JVM_WARM_RUNS):
        _jvm_probe_frame(spark).collect()
    runs = []
    probe_value_ok = True
    for _ in range(_JVM_TIMED_RUNS):
        t0 = time.perf_counter()
        v = _jvm_probe_frame(spark).collect()[0]["chk"]
        runs.append(time.perf_counter() - t0)
        probe_value_ok = (v == _JVM_PROBE_CHECKSUM) and probe_value_ok
    return {
        "jvm_sec": round(min(runs), 3),
        "runs": [round(r, 3) for r in runs],
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "probe_value_ok": probe_value_ok,
    }


def _load_jvm_floor(sidecar_path: str) -> float:
    """Previous sweep's persisted JVM-probe floor; pinned initial era on a
    fresh checkout or a pre-r14 sidecar (same fallback ladder as
    _load_floor, including the non-positive-floor guard)."""
    try:
        with open(sidecar_path) as f:
            v = float(json.load(f)["calibration"]["jvm"]["floor_sec"])
        if v <= 0:
            raise ValueError("non-positive persisted jvm floor")
        return v
    except (OSError, KeyError, ValueError, TypeError):
        return CALIB_REF_JVM_SEC


def _jvm_floor_and_slowdown(floor_sec: float, start: dict, end: dict) -> tuple[float, float]:
    """Same semantics as _floor_and_slowdown, for the Spark probe: floor
    absorbs any faster observation (min), slowdown is the sweep's BEST
    probe vs the floor, clamped >= 1 — normalization can only DISMISS."""
    floor_sec = round(min(floor_sec, start["jvm_sec"], end["jvm_sec"]), 3)
    slowdown = round(
        max(1.0, min(start["jvm_sec"], end["jvm_sec"]) / floor_sec), 3
    )
    return floor_sec, slowdown


def _load_floor(sidecar_path: str) -> dict:
    """Previous sweep's persisted probe floor, falling back to the pinned
    round-13 constants for a fresh checkout."""
    try:
        with open(sidecar_path) as f:
            fl = json.load(f)["calibration"]["floor"]
        out = {
            "single_sec": float(fl["single_sec"]),
            "multi32_sec": float(fl["multi32_sec"]),
        }
        # a zero/negative floor (truncated or badly merged sidecar) would
        # divide-by-zero at the very END of a full sweep (r14 review) —
        # treat it like a missing sidecar and restart from the pinned era
        if out["single_sec"] <= 0 or out["multi32_sec"] <= 0:
            raise ValueError("non-positive persisted floor")
        return out
    except (OSError, KeyError, ValueError, TypeError):
        return {
            "single_sec": CALIB_REF_SINGLE_SEC,
            "multi32_sec": CALIB_REF_MULTI_SEC,
        }
#: a sweep started above this 1-min loadavg first WAITS (the r12 artifact
#: was recorded at loadavg 10.38 and its headline overstated even the
#: slowed host); if the box never settles, the sweep still runs — a
#: missing BENCH_r{N} is worse than a flagged one — but the artifact
#: carries degraded_host=true plus the calibration evidence.
BENCH_LOADAVG_GATE = float(os.environ.get("BENCH_LOADAVG_GATE", "4.0"))
BENCH_LOAD_WAIT_SEC = int(os.environ.get("BENCH_LOAD_WAIT_SEC", "300"))


def _floor_and_slowdown(floor: dict, calib_start: dict, calib_end: dict) -> tuple[dict, float]:
    """Update the self-maintaining floor with this sweep's probes and
    derive the sweep slowdown against it. floor <= observed by
    construction, so slowdown >= 1 structurally; the max(1.0, ...) is
    belt-and-braces — normalized can NEVER exceed raw (r13 verdict #1).

    The slowdown uses the sweep's BEST (min) probe, not the mean: the
    best probe is the host's demonstrated capability, so one anomalous
    probe can never over-excuse a riser (measured round 14: a cold-start
    probe read 1.398 s at loadavg 0.12 while the end probe read 0.535 s
    — the mean would have normalized the whole sweep by 1.8x on the
    strength of a single unexplained reading). Normalization exists only
    to DISMISS risers; min is the conservative direction."""
    floor = {
        "single_sec": round(
            min(floor["single_sec"], calib_start["single_sec"], calib_end["single_sec"]), 3
        ),
        "multi32_sec": round(
            min(floor["multi32_sec"], calib_start["multi32_sec"], calib_end["multi32_sec"]), 3
        ),
    }
    slowdown = round(
        max(
            1.0,
            min(calib_start["multi32_sec"], calib_end["multi32_sec"])
            / floor["multi32_sec"],
        ),
        3,
    )
    return floor, slowdown


def _calib_work(_=None) -> int:
    """Fixed, seeded, pure-CPU work: xorshift + sort over a 2M int64
    array, 5 rounds. Deterministic (result value pinned below) so the
    probe can never optimize away or vary by input."""
    import numpy as np

    rng = np.random.default_rng(12345)
    a = rng.integers(0, 1 << 60, size=2_000_000, dtype=np.int64)
    for _ in range(5):
        a = np.sort(a ^ (a >> 13))
    return int(a[0])


def calibrate() -> dict:
    """min-of-3 single-thread and 32-process probe times + slowdown
    factors vs the pinned idle reference. ~5 s on an idle box."""
    from multiprocessing import Pool

    _calib_work()  # warm numpy + page cache off the clock
    with Pool(CALIB_PROCS) as p:  # warm the fork path off the clock too:
        p.map(_calib_work, range(CALIB_PROCS))  # cold first map read 5x
    single, multi = [], []
    # Seeded => exact on the numpy this was pinned against, but NumPy does
    # not guarantee Generator stream stability across feature releases
    # (r13 ADVICE): a mismatch is FLAGGED in the artifact (probe timing is
    # still valid — the work is identical either way), never asserted, so
    # a numpy upgrade can't turn every bench run into a crash.
    probe_value_ok = True
    for _ in range(3):
        t0 = time.perf_counter()
        probe_value_ok = (_calib_work() == 40315031199) and probe_value_ok
        single.append(time.perf_counter() - t0)
    for _ in range(3):
        t0 = time.perf_counter()
        with Pool(CALIB_PROCS) as p:
            p.map(_calib_work, range(CALIB_PROCS))
        multi.append(time.perf_counter() - t0)
    st, mt = min(single), min(multi)
    return {
        "single_sec": round(st, 3),
        "multi32_sec": round(mt, 3),
        "single_slowdown": round(st / CALIB_REF_SINGLE_SEC, 3),
        "multi32_slowdown": round(mt / CALIB_REF_MULTI_SEC, 3),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "probe_value_ok": probe_value_ok,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # Load gate: never record the round's comparison artifact from a box
    # that is still busy (r12: loadavg 10.38 at start, uninterpretable
    # headline). Wait for settle; proceed-but-flag if it never does.
    degraded_host = False
    waited = 0
    while os.getloadavg()[0] > BENCH_LOADAVG_GATE and waited < BENCH_LOAD_WAIT_SEC:
        print(
            f"# load gate: loadavg {os.getloadavg()[0]:.2f} > "
            f"{BENCH_LOADAVG_GATE}, waiting ({waited}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
    if os.getloadavg()[0] > BENCH_LOADAVG_GATE:
        degraded_host = True
    loadavg_start = round(os.getloadavg()[0], 2)
    calib_start = calibrate()

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
    for warm in (
        # The FIRST streaming query in a session pays one-time engine init
        # (state-store + streaming codegen, ~5-8 s measured) — warm it on the
        # smallest SF so the streaming slot times the workload, not the engine.
        # Streaming warm runs FIRST: q1 is the first TIMED slot, and warming
        # it before the streaming bootstrap left its first timed run paying
        # the post-bootstrap session churn (r9 idle: 1.25 s vs 0.35 s on
        # identical plans — spread 3.6 on the one slot warmed out of order).
        lambda: qs["stream_incremental_ingest"](spark, "/root/testdata/sf0.001").count(),
        lambda: qs["q1_pricing_summary"](spark, sf_dir).count(),
    ):
        try:
            warm()
        except Exception as exc:  # a broken warmup slot still gets its own error row below
            print(f"# warmup error: {type(exc).__name__}: {exc}"[:200], file=sys.stderr)

    # Spark-shaped host probe, AFTER the session/page-cache warmups so it
    # measures the engine era, not first-touch costs (see CALIB_REF_JVM_SEC).
    # A probe failure must never zero the artifact (the per-slot fault-
    # isolation rule): the fallback reads jvm_sec == the persisted floor,
    # i.e. jvm_slowdown 1.0 — raw stands, the conservative direction.
    def _safe_jvm_probe(label: str) -> dict:
        try:
            p = calibrate_jvm(spark)
        except Exception as exc:  # noqa: BLE001 — evidence, not the workload
            p = {
                "jvm_sec": _load_jvm_floor(
                    os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_stats.json")
                ),
                "probe_error": f"{type(exc).__name__}: {exc}"[:200],
                "probe_value_ok": False,
            }
        print(f"# jvm probe ({label}): {p}", file=sys.stderr)
        return p

    jvm_start = _safe_jvm_probe("start")

    # Every slot is timed ITERS times and the minimum reported: the box
    # throttles under sustained all-core load (measured ±2x on identical
    # plans back-to-back), and min-of-N is the standard steady-state
    # estimator for plan cost — it removes one-sided noise without hiding
    # real regressions (a worse plan is worse in every iteration).
    # Round 11 (VERDICT item 5): slots at >= EXTRA_ITER_FLOOR seconds get a
    # THIRD iteration, and every slot records the 1-min loadavg at its
    # start — together with the spread this makes round-over-round deltas
    # self-adjudicating (rule in COVERAGE.md: a riser is a REAL regression
    # only if spread < 1.1 AND its loadavg was flat; anything else is box
    # state). Three rounds running (r8 ALS, r9 bm25, r10 whole-sweep +18%)
    # the deltas were box noise that cost manual A/B archaeology.
    ITERS = 2
    EXTRA_ITER_FLOOR = 2.0

    def timed(fn) -> tuple[list[float], int]:
        runs, n = [], 0
        for _ in range(ITERS):
            t0 = time.perf_counter()
            n = fn().count()
            runs.append(round(time.perf_counter() - t0, 3))
        if min(runs) >= EXTRA_ITER_FLOOR:
            t0 = time.perf_counter()
            n = fn().count()
            runs.append(round(time.perf_counter() - t0, 3))
        return runs, n

    # One query raising must NOT zero the whole artifact (round 4's bench
    # crashed on a single AnalysisException and the round had no number at
    # all): record the error per-slot, keep timing the rest, and exit
    # non-zero only if NOTHING ran.
    timings: dict[str, float] = {}
    #: per-slot evidence for round-over-round adjudication: all raw runs +
    #: max/min spread, so a regression in BENCH_r{N} is attributable (tight
    #: spread = real plan change; wide spread = box contention) without
    #: re-running the round.
    stats: dict[str, dict] = {}
    errors: dict[str, str] = {}

    def run_slot(name: str, fn) -> None:
        la = round(os.getloadavg()[0], 2)
        try:
            runs, n = timed(fn)
            timings[name] = min(runs)
            stats[name] = {
                "runs": runs,
                "max": max(runs),
                "spread": round(max(runs) / max(min(runs), 1e-9), 2),
                "loadavg_1m": la,
                # r14 verdict item 7 (cached-slot visibility): slots whose
                # plan legitimately cache()s an intermediate consumed
                # several times within one execution report a min that is
                # a warm-cache run; surfacing iteration 1 (and flagging a
                # >1.5x iter-1/min ratio) keeps the one-time build cost
                # visible in the sidecar without changing the headline
                # estimator or the one-line JSON contract (additions-only).
                "first_run_sec": runs[0],
                **(
                    {"warm_cache_suspect": True}
                    if runs[0] / max(min(runs), 1e-9) > 1.5
                    else {}
                ),
            }
            print(f"# {name}: {timings[name]:.2f}s ({n} rows; runs={runs})", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — per-slot fault isolation
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)

    for name in names:
        run_slot(name, lambda name=name: qs[name](spark, sf_dir))

    # Bench-only workloads: each may declare an off-the-clock warmup (e.g.
    # the ALS fit feeding a serving benchmark, the ANN index build feeding
    # its query path) so every number measures ONE workload, not a
    # composite of setup + serving + verification.
    for name, wl in registry.bench_workloads().items():
        # bind BOTH loop variables as defaults: run_slot/errors close over
        # them, and default-binding keeps the labels correct even if a
        # refactor ever defers these invocations
        def one(name=name, wl=wl):
            if wl.warmup is not None:
                wl.warmup(spark, sf_dir)
            return run_slot(name, lambda: wl.fn(spark, sf_dir))
        try:
            one()
        except Exception as exc:  # warmup itself failed
            errors[name] = f"warmup {type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: WARMUP ERROR {errors[name][:120]}", file=sys.stderr)

    if not timings:
        print(json.dumps({"metric": "headline_queries_total", "value": None, "errors": errors}))
        sys.exit(1)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # The driver captures only the TAIL of stdout (~2000 chars): round 6's
    # line outgrew the window when per-slot stats were added inline and the
    # round shipped with an unparseable artifact. The stdout line therefore
    # carries ONLY the headline fields (~900 chars at 20 slots); the full
    # adjudication evidence (per-slot raw runs/spread + slot genealogy)
    # goes to the BENCH_stats.json sidecar + stderr.
    jvm_end = _safe_jvm_probe("end")
    calib_end = calibrate()
    # Normalization: divide the raw total by the sweep's mean all-core
    # slowdown (the shape Spark slots run), measured against the
    # SELF-MAINTAINING floor: min(persisted floor, both probes of this
    # sweep). floor <= observed by construction, so each per-probe
    # slowdown >= 1 and the clamp below is belt-and-braces — the
    # normalized value can never exceed raw (r13 verdict #1: the pinned
    # constant floor was beaten by a loaded sweep and inflated the
    # normalized total ~17 %).
    sidecar_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_stats.json")
    floor, slowdown = _floor_and_slowdown(_load_floor(sidecar_path), calib_start, calib_end)
    jvm_floor, jvm_slowdown = _jvm_floor_and_slowdown(
        _load_jvm_floor(sidecar_path), jvm_start, jvm_end
    )
    # the era-aware slowdown: a Spark slot's host excuse is bounded by the
    # WORSE of the two demonstrated slowdowns (CPU contention vs engine
    # era); still clamped >= 1 through both inputs, so the full-normalized
    # value can never exceed raw either
    slowdown_full = max(slowdown, jvm_slowdown)
    # per-slot calibration-normalized minima — the numbers the
    # adjudication rule actually compares round-over-round
    for name, t in timings.items():
        if name in stats:
            stats[name]["normalized"] = round(t / max(slowdown, 1e-9), 3)
            # the number round-over-round adjudication should use from r15
            # on: normalized by the era-aware slowdown (see sidecar note)
            stats[name]["normalized_full"] = round(t / max(slowdown_full, 1e-9), 3)
    sidecar = {
        "query_stats": stats,
        "slot_history": SLOT_HISTORY,
        "iterations": ITERS,
        "extra_iteration_floor_sec": EXTRA_ITER_FLOOR,
        "estimator": "min",
        "calibration": {
            "start": calib_start,
            "end": calib_end,
            "reference": {
                "single_sec": CALIB_REF_SINGLE_SEC,
                "multi32_sec": CALIB_REF_MULTI_SEC,
                "note": "initial pinned floor (round 13); superseded by the "
                "self-maintaining 'floor' block below",
            },
            "floor": {
                **floor,
                "note": "self-maintaining idle floor: min(previous sweep's "
                "persisted floor, this sweep's probes); sweep slowdown is "
                "measured against THIS and clamped >= 1 (round 14)",
            },
            "sweep_multi32_slowdown": slowdown,
            "jvm": {
                "start": jvm_start,
                "end": jvm_end,
                "floor_sec": jvm_floor,
                "reference_sec": CALIB_REF_JVM_SEC,
                "sweep_jvm_slowdown": jvm_slowdown,
                "note": "Spark-shaped fixed-work probe (range -> 100k-group "
                "hash agg -> checksum); captures the JVM/IO-era drift the "
                "CPU probe is blind to (COVERAGE r14: CPU probe beat its "
                "floor while Spark slots ran 1.35-1.5x slower). Floor era "
                "coverage begins round 14; self-maintains downward",
            },
            "sweep_slowdown_full": slowdown_full,
            "loadavg_gate": BENCH_LOADAVG_GATE,
            "degraded_host": degraded_host,
        },
        "adjudication": "slot deltas are judged on calibration-normalized "
        "times; from round 15 use 'normalized_full' (raw / "
        "max(sweep_multi32_slowdown, sweep_jvm_slowdown) — the CPU probe "
        "measures contention, the Spark probe measures engine-era drift, "
        "and a slot's host excuse is bounded by the worse of the two; both "
        "slowdowns are measured vs self-maintaining floors and clamped "
        ">= 1 so normalized <= raw always). 'normalized' (CPU-only) is "
        "kept for continuity with r13-r14 history. A riser is real only "
        "if its NORMALIZED delta holds with spread < 1.1. Normalization "
        "DISMISSES risers, never claims speedups: CPU-light slots inflate "
        "less than the all-core probe under contention (measured round "
        "13: 24-hog load -> probe 3.1x, slots 1.2-2.3x), so a normalized "
        "FALL proves nothing while a normalized rise survives any host "
        "excuse. See COVERAGE.md rounds 13-14",
    }
    try:
        with open(sidecar_path, "w") as f:
            json.dump(sidecar, f, indent=1)
    except OSError as exc:  # read-only checkout: evidence still lands on stderr
        print(f"# sidecar write failed: {exc}", file=sys.stderr)
    print(f"# stats sidecar: {json.dumps(sidecar)}"[:4000], file=sys.stderr)
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_val,
            # contention evidence: 1-min loadavg before/after the sweep.
            # An idle box sits near 0 at start; a loaded one explains a
            # wide per-slot spread without a code change.
            "loadavg_start": loadavg_start,
            "loadavg_end": round(os.getloadavg()[0], 2),
            # host-speed evidence (full probe detail in the sidecar):
            # value_normalized = value / calib_slowdown is the
            # round-over-round comparable number
            "calib_slowdown": slowdown,
            "value_normalized": round(total / max(slowdown, 1e-9), 3),
            # engine-era evidence (round 14): Spark-probe slowdown + the
            # era-aware normalized total (raw / max of both slowdowns)
            "calib_jvm_slowdown": jvm_slowdown,
            "value_normalized_full": round(total / max(slowdown_full, 1e-9), 3),
            **({"degraded_host": True} if degraded_host else {}),
            # a partial total sums only the slots that ran — flag it
            # STRUCTURALLY so a round with a failed slot can never read
            # as a speedup in round-over-round comparison
            **({"errors": errors, "partial": True} if errors else {}),
        }
    )
    if len(line) > 1900:  # belt-and-braces: never outgrow the tail window
        line = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "loadavg_start": loadavg_start,
                "calib_slowdown": slowdown,
                "value_normalized": round(total / max(slowdown, 1e-9), 3),
                "calib_jvm_slowdown": jvm_slowdown,
                "value_normalized_full": round(total / max(slowdown_full, 1e-9), 3),
                **({"degraded_host": True} if degraded_host else {}),
                **({"partial": True} if errors else {}),
            }
        )
    print(line)


if __name__ == "__main__":
    main()
