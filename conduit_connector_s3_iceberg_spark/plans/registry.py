"""Query registry: every engine operator demonstrated as a named query.

Each entry pairs a PySpark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB. The driver harness runs
both at sf=0.01 and compares row count + schema + order-insensitive value
hash (see ``__spark_entry__.py``), so:

* every computed column is aliased identically on both sides;
* double aggregates accumulate in DECIMAL (exact, order-independent) and are
  cast to double at the end — Spark's shuffled partial aggregation and
  DuckDB's sequential scan then produce bit-identical results;
* ties in top-k / window ranks are broken by a unique key column.

Entries whose semantics a SQL oracle can't express (LSH bucketing with
engine-specific hashing, stateful streaming) register ``oracle=None`` and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


QUERIES: dict[str, Query] = {}

# Persisted intermediates tracked per registry query. A builder that caches
# a shared front end (e.g. text_collocations_pmi's pair table) registers it
# via track_cache(); the NEXT registry-query invocation releases everything
# tracked so far. The returned DataFrame has usually been materialized by
# then (harness pattern: build -> collect -> next query); if it hasn't,
# unpersist() merely drops the cache and the plan recomputes — correctness
# is never at stake. This bounds executor cache growth in a long-lived
# session running many registry queries (previously only an external
# spark.catalog.clearCache() released them).
_TRACKED_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next registry
    query invocation (or an explicit release_tracked_caches())."""
    df.persist()
    _TRACKED_CACHES.append(df)
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked cache; returns how many were released."""
    n = len(_TRACKED_CACHES)
    for df in _TRACKED_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED_CACHES.clear()
    return n


def query(name: str, oracle: str | None, doc: str = ""):
    """Register a query under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_tracked_caches()
            return fn(spark, sf_dir)

        build.__doc__ = fn.__doc__
        build.__name__ = fn.__name__
        QUERIES[name] = Query(
            name=name, build=build, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every module that registers queries; return the registry."""
    from . import advanced, core, events, relational2  # noqa: F401
    from ..operators import (  # noqa: F401
        bpe,
        cdc_batch,
        corpus,
        dedup,
        graph,
        gt_topk,
        joins,
        layout,
        lm,
        lm_state,
        multimodal,
        retrieval,
        sampling,
        similarity,
        sketches,
        text,
        timeseries,
    )

    return QUERIES
