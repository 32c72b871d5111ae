"""Same-boot paired runs of a named query subset (r7 verdict #3 protocol).

Runs min-of-3 for each named query in a fresh JVM, prints one JSON line.
Invoke twice back-to-back for the pair; compare with tools/bench_compare.py
or by eye against the driver record.

Usage: python tools/bench_pair3.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conduit_connector_s3_iceberg_spark.plans.registry import load_all
from conduit_connector_s3_iceberg_spark.session import build_session


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = build_session(app_name="bench_pair", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, float] = {}
    for name in names:
        q = registry[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
