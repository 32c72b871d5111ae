"""Stage-level profile of one registered query: runs it (warm) with event
logging on, then prints per-stage wall time, task count, and the first line
of the stage's callsite — the poor man's Spark UI for a headless sandbox.

Usage: python tools/stage_profile.py <query> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    registry = load_all()
    spark = build_session(
        app_name=f"profile-{name}",
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for w in ("q01_pricing_summary", "text_quality_score", "lm_stupid_backoff"):
        for _ in range(2):
            registry[w].build(spark, sf_dir).collect()
            spark.catalog.clearCache()
    q = registry[name]
    # one warm pass first so state ensures / JIT don't pollute the profile
    q.build(spark, sf_dir).collect()
    spark.catalog.clearCache()
    t_epoch = time.time() * 1000.0
    t0 = time.perf_counter()
    q.build(spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    spark.stop()

    events = []
    paths = [
        p
        for pat in ("*", "*/*")
        for p in glob.glob(os.path.join(evdir, pat))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for p in paths:
        with open(p) as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except Exception:
                    pass
    # keep only stages submitted after the marker job
    marker_seen = [False]
    stages = {}
    jobs = {}
    for ev in events:
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = ev.get("Properties", {}).get(
                "spark.job.description", ""
            )
        if k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub and comp:
                stages[si["Stage ID"]] = {
                    "ms": comp - sub,
                    "sub": sub,
                    "tasks": si.get("Number of Tasks"),
                    "name": si.get("Stage Name", "")[:90],
                }
    # keep only stages submitted during the profiled run
    run = {
        sid: s
        for sid, s in stages.items()
        if s.get("sub", 0) >= t_epoch
    }
    total = sum(s["ms"] for s in run.values())
    print(f"query={name} wall={wall:.3f}s  stages={len(run)} "
          f"stage-time-sum={total/1000.0:.3f}s")
    for sid, s in sorted(run.items(), key=lambda kv: -kv[1]["ms"])[:30]:
        print(f"  stage {sid:>5}  {s['ms']:>7} ms  tasks={s['tasks']:<4} {s['name']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
