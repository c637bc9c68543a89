"""CLI corpus-curation entry point — runs the end-to-end training-data
curation pipeline (operators/curation.text_curation_pipeline: C4 funnel →
exact dedup → shared-span excision → 13-gram decontamination →
temperature-mixture downsample → BPE encode → fixed-budget packing) and
materializes BOTH artifacts a training run consumes:

    python scripts/curate_corpus.py --out /path/to/curated [--sf-dir ...]

- ``<out>/stage_summary.parquet`` — the 7-row conservation ledger
  (docs/tokens kept+dropped per stage, survivor checksums) that the
  registered component verifies cross-engine;
- ``<out>/summary.json`` — the same ledger as one JSON object for
  dashboards/CI gates (e.g. "fail the crawl if the funnel keep-rate
  drops below X").

The heavy lifting is the registered, oracle-checked component — this
script is the task body an orchestrator schedules, exactly like
run_etl.py wraps the warehouse build.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run the corpus-curation pipeline")
    ap.add_argument("--out", required=True, help="output directory for the artifacts")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    args = ap.parse_args(argv)

    from e_commerce_data_warehouse_recommendation_system_spark.operators.curation import (
        text_curation_pipeline,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.session import get_spark

    spark = get_spark()
    summary = text_curation_pipeline(spark, args.sf_dir)
    os.makedirs(args.out, exist_ok=True)
    summary.coalesce(1).write.mode("overwrite").parquet(
        f"{args.out}/stage_summary.parquet"
    )
    rows = [r.asDict() for r in summary.orderBy("stage_ord").collect()]
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump({"stages": rows, "sf_dir": args.sf_dir}, f, indent=1)
    print(json.dumps({"stages": {r["stage"]: r["docs_kept"] for r in rows}, "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
