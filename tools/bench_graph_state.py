"""Scale ladder for the persisted graph state (round-13 verdict item #1
"Done" criterion): measure the FULL BUILD, the O(delta)+O(touched)
MAINTAIN of a ~4% FK-complete append, the DEFERRED REFRESH (the first
stale read's fixpoint + top-K recompute), and the WARM SERVE at sf0.1
and sf1, and report per-phase scaling exponents
(alpha = log10(t_big / t_small), ladder is 10x).

Expected shape (the honest at-scale contract documented in
operators/graph_state.py):

* build    — corpus-linear (edge extraction reads orders+lineitem once);
* maintain — O(delta) edge/okc appends + O(touched) cp adjustments
  (the per-part pair explode runs over the delta's parts only);
  MUST be far below build cost — this is the round-13 fix for the
  r12 finding that maintain cost ~90% of a rebuild;
* refresh  — the deferred O(graph) cost: 4 exact fixpoints over the
  state edge set + one pair-mass-linear top-K fold, paid ONCE per
  staleness epoch (K appends + 1 read = 1 refresh, not K);
* warm serve — O(result): near-flat alpha (parquet read of the
  materialized rank table).

Usage: python tools/bench_graph_state.py [out.json]
Env:   SCALE_SMALL (default /root/testdata/sf0.1)
       SCALE_BIG   (default <repo>/scale-ladder/sf1)
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from conduit_connector_s3_iceberg_spark.operators import graph_state as gs  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

DELTA_PRED = "o_orderkey % 25 = 0"  # ~4% of orders, FK-complete slice


def _move_parts(df, table_dir: str, name: str) -> None:
    stage = table_dir + f".stage_{name}"
    df.write.mode("overwrite").parquet(stage)
    os.makedirs(table_dir, exist_ok=True)
    for i, part in enumerate(sorted(glob.glob(os.path.join(stage, "part-*")))):
        shutil.move(part, os.path.join(table_dir, f"{name}_{i}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def bench_one(spark, sf_dir: str, work: str) -> dict:
    corpus = os.path.join(work, "corpus")
    os.makedirs(corpus)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    shutil.copy(
        os.path.join(sf_dir, "supplier.parquet"),
        os.path.join(corpus, "supplier.parquet"),
    )
    d_orders = orders.filter(F.expr(DELTA_PRED))
    b_orders = orders.filter(~F.expr(DELTA_PRED))
    d_li = li.join(
        d_orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    ).drop("o_orderkey")
    b_li = li.join(
        b_orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    ).drop("o_orderkey")
    _move_parts(b_orders, os.path.join(corpus, "orders.parquet"), "base")
    _move_parts(b_li, os.path.join(corpus, "lineitem.parquet"), "base")

    root_holder = os.path.join(work, "state")

    real_path = gs.graph_state_path
    gs.graph_state_path = lambda _sf: root_holder
    try:
        t0 = time.perf_counter()
        gs.ensure_graph_state(spark, corpus)
        build_s = time.perf_counter() - t0

        _move_parts(d_orders, os.path.join(corpus, "orders.parquet"), "d1")
        _move_parts(d_li, os.path.join(corpus, "lineitem.parquet"), "d1")
        t0 = time.perf_counter()
        gs.ensure_graph_state(spark, corpus)
        maintain_s = time.perf_counter() - t0

        # deferred refresh: the one-per-staleness-epoch O(graph) cost
        t0 = time.perf_counter()
        gs.refresh_graph_state(spark, root_holder)
        refresh_s = time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            gs.serve_pagerank(spark, corpus).collect()
            best = min(best, time.perf_counter() - t0)
        # warm link-prediction serve (round 12): the full adamic-adar
        # query over the persisted cp_pairs artifact
        from conduit_connector_s3_iceberg_spark.plans.registry import load_all
        aa = load_all()["graph_adamic_adar"]
        best_link = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            aa.build(spark, corpus).collect()
            best_link = min(best_link, time.perf_counter() - t0)
        n_edges = gs.serve_edges(spark, corpus).count()
        n_cp = gs.serve_cp_edges(spark, corpus).count()
    finally:
        gs.graph_state_path = real_path
    return {
        "build_s": round(build_s, 3),
        "maintain_s": round(maintain_s, 3),
        "refresh_s": round(refresh_s, 3),
        "warm_serve_s": round(best, 3),
        "warm_link_s": round(best_link, 3),
        "n_und_edges": n_edges,
        "n_cp_edges": n_cp,
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    small = os.environ.get("SCALE_SMALL", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big = os.environ.get("SCALE_BIG", os.path.join(repo, "scale-ladder", "sf1"))
    spark = build_session(app_name="bench_graph_state", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    result = {}
    for label, sf_dir in (("sf0.1", small), ("sf1", big)):
        work = tempfile.mkdtemp(prefix=f"graphscale_{label}_")
        try:
            result[label] = bench_one(spark, sf_dir, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    for phase in ("build_s", "maintain_s", "refresh_s", "warm_serve_s",
                  "warm_link_s"):
        t_s, t_b = result["sf0.1"][phase], result["sf1"][phase]
        result[f"alpha_{phase.removesuffix('_s')}"] = round(
            math.log10(max(t_b, 1e-9) / max(t_s, 1e-9)), 3
        )
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
