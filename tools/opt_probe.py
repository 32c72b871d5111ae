"""Optimization probe: per-query formatted plans + isolated noop-sink timing.

Usage:
    python tools/opt_probe.py plan  <tag> <query> [query ...]
        -> writes plans/<round>/<query>_<tag>.txt  (tag: before|after;
           round dir from $OPT_ROUND, default r14)
    python tools/opt_probe.py time  <query> [query ...]
        -> per-query: N collect() runs and N noop-sink runs, prints each

Timing methodology matches bench.py (same session config, warmup job,
min-of-3 collect) and adds the guide §1.4 noop-sink timing so the sink
cost is visible separately.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

RUNS = 3
USAGE = (
    "usage: opt_probe.py plan <tag> <query> [query ...]\n"
    "       opt_probe.py time <query> [query ...]"
)


def main() -> int:
    # validate argv FULLY before paying the session build (r13 ADVICE:
    # a typo'd mode used to crash with IndexError or burn a session
    # build + warmup before reporting "unknown mode")
    if len(sys.argv) < 2 or sys.argv[1] not in ("plan", "time"):
        print(USAGE, file=sys.stderr)
        return 2
    mode = sys.argv[1]
    if mode == "plan" and len(sys.argv) < 4:
        print(USAGE, file=sys.stderr)
        return 2
    if mode == "time" and len(sys.argv) < 3:
        print(USAGE, file=sys.stderr)
        return 2

    from conduit_connector_s3_iceberg_spark.plans.registry import load_all
    from conduit_connector_s3_iceberg_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = build_session(app_name="opt_probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if mode == "plan":
        tag = sys.argv[2]
        names = sys.argv[3:]
        round_dir = os.environ.get("OPT_ROUND", "r14")
        os.makedirs(f"plans/{round_dir}", exist_ok=True)
        for name in names:
            df = registry[name].build(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/{round_dir}/{name}_{tag}.txt"
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt.splitlines())} lines)")
        return 0

    # mode == "time"
    # C2-warm the session the way a long bench run is warm: cold-JVM
    # min-of-3 numbers are 1.5-3x off and produced false regressions
    # (measured r13) — always warm before timing.
    for w in (
        "q01_pricing_summary",
        "q03_shipping_priority",
        "text_quality_score",
        "lm_stupid_backoff",
        "sketch_kmv_jaccard",
    ):
        for _ in range(2):
            registry[w].build(spark, sf_dir).collect()
            spark.catalog.clearCache()

    names = sys.argv[2:]
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"opt_probe: {name}")
        coll, noop = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            coll.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        for _ in range(RUNS):
            t0 = time.perf_counter()
            (
                q.build(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            noop.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: collect={['%.3f' % t for t in coll]} "
            f"noop={['%.3f' % t for t in noop]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
