"""Count base-table scans in the EXECUTED plan of registered queries.

The r3 verdict's scale finding: dedup_jaccard_prefix_filter re-derived its
shingle index per consumer, showing 22 `Scan parquet` instances for one
query. This probe collects a query at the given SF and classifies the
final (AQE) executed plan's scan nodes:

* ``top_scans``   — parquet scans that execute as part of this plan
  (NOT under an InMemoryRelation): each is a real base-table read.
* ``cached_scans``— parquet scans inside ONE InMemoryRelation definition:
  they execute exactly once, when the cache materializes (every
  InMemoryTableScan consumer reprints the same cached subtree, so the
  raw string count over-states them by the consumer count).
* ``imts``        — InMemoryTableScan consumers reading the cache.

Effective base-table reads = top_scans + cached_scans. Usage:

    python tools/scan_count.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

_TREE = " :+-*()0123456789"


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(_TREE))


def classify_scans(plan: str) -> dict[str, int]:
    top = cached = imts = relations = 0
    imr_indent: int | None = None  # inside an InMemoryRelation subtree
    for line in plan.splitlines():
        ind = _indent(line)
        if imr_indent is not None and ind <= imr_indent:
            imr_indent = None
        if "InMemoryRelation" in line:
            if imr_indent is None:
                imr_indent = ind
            relations += 1
            continue
        if "InMemoryTableScan" in line and imr_indent is None:
            imts += 1
            continue
        if "Scan parquet" in line:
            if imr_indent is None:
                top += 1
            elif relations == 1:
                # count cached scans from the FIRST relation print only —
                # every other consumer reprints the identical subtree
                cached += 1
    return {"top_scans": top, "cached_scans": cached, "imts": imts}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.001"
    registry = load_all()
    spark = build_session(shuffle_partitions=32)
    for name in args:
        df = registry[name].build(spark, sf_dir)
        df.collect()  # AQE: final plan only exists after execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        c = classify_scans(plan)
        spark.catalog.clearCache()
        print(
            f"{name}: effective_reads={c['top_scans'] + c['cached_scans']} "
            f"(top={c['top_scans']} cached={c['cached_scans']} "
            f"cache_consumers={c['imts']})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
