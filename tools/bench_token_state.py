"""Scale ladder for the persisted token/bigram counts state (round-12
verdict item #4 "Done" criterion): measure the FULL BUILD, the O(delta)
MAINTAIN of a ~4% document append, and the WARM SERVE (lm_bigram_score,
the model+scoring consumer) at sf0.1 and sf1; report per-phase alphas
(10x ladder).

Expected shape (operators/lm_state.py): build corpus-linear (one
tokenize+explode pass); maintain O(delta) — the appended files are
tokenized, standing rows untouched (per-document counts only ADD rows);
warm serve reads the state parquet and regroups — no corpus text scan.

Usage: python tools/bench_token_state.py [out.json]
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

from conduit_connector_s3_iceberg_spark.operators import lm_state as ls  # noqa: E402
from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

DELTA_PRED = "doc_id % 25 = 0"  # ~4% of documents


def _move_parts(df, table_dir: str, name: str) -> None:
    stage = table_dir + f".stage_{name}"
    df.write.mode("overwrite").parquet(stage)
    os.makedirs(table_dir, exist_ok=True)
    for i, part in enumerate(sorted(glob.glob(os.path.join(stage, "part-*")))):
        shutil.move(part, os.path.join(table_dir, f"{name}_{i}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def bench_one(spark, sf_dir: str, work: str, consumer) -> dict:
    corpus_dir = os.path.join(work, "sf")
    table = os.path.join(corpus_dir, "documents.parquet")
    os.makedirs(corpus_dir)
    # the lm consumers only need documents; link the other tables so the
    # registry query can resolve them without copying gigabytes
    for t in os.listdir(sf_dir):
        if t != "documents.parquet":
            os.symlink(
                os.path.join(sf_dir, t), os.path.join(corpus_dir, t)
            )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    _move_parts(
        docs.filter(~F.expr(DELTA_PRED)), table, "base"
    )

    root_holder = os.path.join(work, "state")
    real_path = ls.token_counts_path
    ls.token_counts_path = lambda _sf: root_holder
    try:
        t0 = time.perf_counter()
        ls.ensure_token_counts(spark, corpus_dir)
        build_s = time.perf_counter() - t0

        _move_parts(docs.filter(F.expr(DELTA_PRED)), table, "d1")
        t0 = time.perf_counter()
        ls.ensure_token_counts(spark, corpus_dir)
        maintain_s = time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            consumer.build(spark, corpus_dir).collect()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        from conduit_connector_s3_iceberg_spark.state import read_manifest

        man = read_manifest(root_holder)
        n_bi = ls._read_kind(spark, root_holder, man, "bi").count()
    finally:
        ls.token_counts_path = real_path
    return {
        "build_s": round(build_s, 3),
        "maintain_s": round(maintain_s, 3),
        "warm_serve_s": round(best, 3),
        "n_bi_rows": n_bi,
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    small = os.environ.get("SCALE_SMALL", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big = os.environ.get("SCALE_BIG", os.path.join(repo, "scale-ladder", "sf1"))
    spark = build_session(app_name="bench_token_state", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    consumer = load_all()["lm_bigram_score"]

    result = {}
    for label, sf_dir in (("sf0.1", small), ("sf1", big)):
        work = tempfile.mkdtemp(prefix=f"tokscale_{label}_")
        try:
            result[label] = bench_one(spark, sf_dir, work, consumer)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    for phase in ("build_s", "maintain_s", "warm_serve_s"):
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
