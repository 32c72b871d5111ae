"""Property tests for the graph operators: invariants the oracle's
value-hash alone doesn't state (mass conservation, triangle closure),
plus a hand-built fixture where the exact answer is known."""

import itertools

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.graph import (
    PR_SCALE,
    TRI_BUCKET_CAP,
    graph_pagerank,
    graph_triangles,
)
from conduit_connector_s3_iceberg_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pagerank_conserves_mass(spark):
    """Scaled-integer PageRank on an undirected graph neither creates nor
    (materially) destroys rank mass: the total stays within the floor-
    division loss bound — each node's update can lose < 20 units and each
    edge contribution < 1, far under 0.1% of total mass — and every rank
    is positive."""
    rows = graph_pagerank(spark, SF).collect()
    total = sum(r["rank_scaled"] for r in rows)
    assert 0.999 * PR_SCALE <= total <= PR_SCALE
    assert all(r["rank_scaled"] > 0 for r in rows)
    # the emitted double is exactly the scaled integer / SCALE
    assert all(r["rank"] == r["rank_scaled"] / PR_SCALE for r in rows)


def test_pagerank_rank_follows_degree_on_bipartite_graph(spark):
    """On the customer↔supplier graph the ~100 suppliers aggregate the
    rank of ~1500 customers: mean supplier rank must exceed mean customer
    rank (authority concentrates on the dense side)."""
    rows = graph_pagerank(spark, SF).collect()
    sup = [r["rank"] for r in rows if r["id"].startswith("s")]
    cus = [r["rank"] for r in rows if r["id"].startswith("c")]
    assert sup and cus
    assert sum(sup) / len(sup) > sum(cus) / len(cus)


def test_triangles_match_bruteforce_closure(spark):
    """The distributed per-node triangle counts equal a driver-side
    brute-force count over the same (tiny) edge list, and the clustering
    coefficient is exactly 2T / (d(d-1))."""
    ev = (
        load_table(spark, SF, "events")
        .select(
            F.date_trunc("hour", "ts").alias("h"), "event_type", "user_id"
        )
        .distinct()
        .collect()
    )
    buckets: dict[tuple, list[int]] = {}
    for r in ev:
        buckets.setdefault((r["h"], r["event_type"]), []).append(r["user_id"])
    edges = set()
    for us in buckets.values():
        for u, v in itertools.combinations(sorted(us)[:TRI_BUCKET_CAP], 2):
            edges.add((u, v))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # each triangle (a < b < c) credits all three nodes once
    tri = {u: 0 for u in adj}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: count each triangle exactly once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    got = {r["user_id"]: r for r in graph_triangles(spark, SF).collect()}
    assert set(got) == set(adj)
    for u, r in got.items():
        assert r["degree"] == len(adj[u])
        assert r["triangles"] == tri[u], f"user {u}"
        if r["degree"] >= 2:
            assert r["clustering"] == (
                2 * tri[u] / (r["degree"] * (r["degree"] - 1))
            )
        else:
            assert r["clustering"] == 0.0


def test_kcore_reaches_fixpoint_and_degrees_check(spark):
    from collections import defaultdict

    from conduit_connector_s3_iceberg_spark.operators.graph import (
        KCORE_K,
        _cs_edges,
        graph_kcore_peel,
    )

    sf = "/root/testdata/sf0.001"
    core = {r["id"]: r["core_degree"] for r in graph_kcore_peel(spark, sf).collect()}
    edges = [(r["src"], r["dst"]) for r in _cs_edges(spark, sf).collect()]
    # recompute degrees inside the reported core: every member must hold
    # >= K neighbors IN the core, and match the reported degree (fixpoint:
    # one more peel would drop nobody)
    deg = defaultdict(int)
    for s, d in edges:
        if s in core and d in core:
            deg[s] += 1
    assert set(deg) == set(core)
    for n, c in core.items():
        assert deg[n] == c
        assert c >= KCORE_K
