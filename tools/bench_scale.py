"""Scale-ladder bench: the heaviest operators at sf0.1 AND sf1.

r8 verdict, next-round item 1: every 100-TB claim so far rests on plan-
shape arguments measured only at sf0.1. This runs the 10 heaviest
registry queries at two scales (10x apart) and reports the per-query
scaling exponent

    alpha = log(t_sf1 / t_sf0.1) / log(10)

so alpha ~ 1.0 is linear scaling, < 1 is fixed-overhead-dominated, and
anything well above 1 flags a plan that will not survive the next 100x.

Protocol per (query, scale): one untimed warmup run (JIT + persisted-
state build for the stateful queries — state cost is a one-time
scheduled job at scale, not per-query serve cost; its cold time is
recorded separately), then RUNS timed runs, min taken (same protocol as
bench.py). clearCache between runs.

Usage: python tools/bench_scale.py [out.json] [query ...]
Env:   SCALE_SMALL (default /root/testdata/sf0.1)
       SCALE_BIG   (default <repo>/scale-ladder/sf1)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

HEAVY = [
    "dedup_weighted_jaccard",
    "dedup_ngram_jaccard",
    "dedup_threshold_curve",
    "graph_label_propagation",
    "graph_resource_allocation",
    "sim_ann_trained_recall",
    "lm_perplexity_gate",
    "emb_semdedup",
    "dedup_lsh_recall_audit",
    "corpus_neardup_decontamination",
]

RUNS = 2


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    names = sys.argv[2:] or HEAVY
    small = os.environ.get("SCALE_SMALL", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big = os.environ.get(
        "SCALE_BIG", os.path.join(repo, "scale-ladder", "sf1")
    )
    ratio = 10.0  # sf0.1 -> sf1

    registry = load_all()
    spark = build_session(app_name="bench-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    results: dict[str, dict] = {}
    for name in names:
        q = registry[name]
        row: dict = {}
        for label, sf_dir in (("small", small), ("big", big)):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()  # warmup + state build
            cold = time.perf_counter() - t0
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(RUNS):
                t0 = time.perf_counter()
                q.build(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            row[f"{label}_cold_s"] = round(cold, 3)
            row[f"{label}_warm_s"] = round(best, 3)
            print(
                f"{name} @ {label}: cold={cold:.2f}s warm={best:.2f}s",
                flush=True,
            )
        row["alpha_warm"] = round(
            math.log(row["big_warm_s"] / row["small_warm_s"]) / math.log(ratio), 3
        )
        row["alpha_cold"] = round(
            math.log(row["big_cold_s"] / row["small_cold_s"]) / math.log(ratio), 3
        )
        results[name] = row

    payload = {
        "small": small,
        "big": big,
        "ratio": ratio,
        "runs": RUNS,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": results,
    }
    print(json.dumps(payload))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
