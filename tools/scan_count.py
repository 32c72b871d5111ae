"""Count base-table scans in the EXECUTED plan of registered queries.

The r3 verdict's scale finding: dedup_jaccard_prefix_filter re-derived its
shingle index per consumer, showing 22 `Scan parquet` instances for one
query. This probe collects a query at the given SF and classifies the
final (AQE) executed plan's scan nodes by WALKING THE PLAN TREE (the
treeString is unusable for this: every InMemoryTableScan consumer
reprints its cache's definition, and nested caches reprint recursively —
the naive string count reported 64 "reads" for a plan that scans the
corpus once):

* ``top_scans``   — FileSourceScan nodes reached outside any cache: each
  is a real base-table read per execution.
* ``cached_scans``— FileSourceScan nodes inside DISTINCT InMemoryRelation
  cached plans (deduped by relation object identity, recursing through
  nested caches): they execute once, when the cache materializes.
* ``imts``        — InMemoryTableScan consumers in the executing plan.

Effective base-table reads = top_scans + cached_scans (a static upper
bound: runtime ReuseExchange inside a stage can dedup further). Usage:

    python tools/scan_count.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def classify_scans_tree(df, jvm) -> dict[str, int]:
    """Walk the executed SparkPlan via py4j, deduping InMemoryRelations
    by object identity so each cache's scans count once."""
    counters = {"top_scans": 0, "cached_scans": 0, "imts": 0}
    seen: set[int] = set()

    def walk(node, in_cache: bool) -> None:
        nm = node.getClass().getSimpleName()
        if nm == "FileSourceScanExec":
            counters["cached_scans" if in_cache else "top_scans"] += 1
            return
        if nm == "InMemoryTableScanExec":
            if not in_cache:
                counters["imts"] += 1
            rel = node.relation()
            # dedup by the shared CachedRDDBuilder: AQE gives each cache
            # CONSUMER its own InMemoryRelation instance, but all of them
            # share one builder (one materialization)
            rid = jvm.java.lang.System.identityHashCode(rel.cacheBuilder())
            if rid not in seen:
                seen.add(rid)
                walk(rel.cachedPlan(), True)
            return
        if "AdaptiveSparkPlan" in nm:
            walk(node.executedPlan(), in_cache)
            return
        if "QueryStage" in nm:
            walk(node.plan(), in_cache)
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), in_cache)

    walk(df._jdf.queryExecution().executedPlan(), False)
    return counters


def main() -> int:
    from conduit_connector_s3_iceberg_spark.plans.registry import load_all
    from conduit_connector_s3_iceberg_spark.session import build_session

    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.001"
    registry = load_all()
    spark = build_session(shuffle_partitions=32)
    jvm = spark._jvm
    for name in args:
        df = registry[name].build(spark, sf_dir)
        df.collect()  # AQE: final plan only exists after execution
        c = classify_scans_tree(df, jvm)
        spark.catalog.clearCache()
        print(
            f"{name}: effective_reads={c['top_scans'] + c['cached_scans']} "
            f"(top={c['top_scans']} cached={c['cached_scans']} "
            f"cache_consumers={c['imts']})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
