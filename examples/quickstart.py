"""Quickstart: the reference connector's workflow, end to end, on this
engine — then the extension surface a training-data pipeline adds on top.

Run from the repo root (takes ~1 min on local[8]):

    python examples/quickstart.py

Walkthrough:
  1. connector config validation + parameter spec (the reference's
     Configure/Specify surface);
  2. a local warehouse table + CDC apply — create / update / delete
     records, exactly the reference's record semantics (stringified struct
     keys, FAILFAST payload conformance, composite keys ANDed);
  3. batched last-write-wins apply (the idiomatic micro-batch form);
  4. analytics over the driver-generated warehouse: one relational query,
     one dedup pipeline, one re-aggregable sketch rollup.
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import types as T  # noqa: E402

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.records import Operation, Record  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import (  # noqa: E402
    ConnectorConfig,
    build_session,
    spec,
)
from conduit_connector_s3_iceberg_spark.writer import (  # noqa: E402
    CdcWriter,
    ParquetWarehouse,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    # 1. Config surface (reference: Configure + Specify) -------------------
    cfg = ConnectorConfig.from_map(
        {
            "catalog.name": "demo",
            "catalog.catalog-impl": "org.apache.iceberg.rest.RESTCatalog",
            "namespace": "webshop",
            "table.name": "items",
            "s3.access-key-id": "minioadmin",
            "s3.secret-access-key": "minioadmin",
            "s3.region": "us-east-1",
            "catalog.uri": "http://localhost:8181",  # catalog.* passthrough
        }
    )
    print(f"config ok: table={cfg.qualified_table}")
    print(f"spec advertises {len(spec())} parameters")

    spark = build_session(app_name="quickstart", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # 2. CDC apply (reference: SparkDestinationStream) ---------------------
    with tempfile.TemporaryDirectory() as tmp:
        wh = ParquetWarehouse(spark, f"{tmp}/warehouse")
        wh.create_table(
            "items",
            T.StructType(
                [
                    T.StructField("id", T.IntegerType(), False),
                    T.StructField("name", T.StringType(), True),
                    T.StructField("qty", T.IntegerType(), True),
                ]
            ),
        )
        writer = CdcWriter(wh, "items")

        def rec(op, key=None, after=None):
            return Record(
                position=b"p",
                operation=op,
                key=json.dumps(key).encode() if key else None,
                payload_after=json.dumps(after).encode() if after else None,
            )

        writer.write(rec(Operation.CREATE, after={"id": 1, "name": "bolt", "qty": 10}))
        writer.write(rec(Operation.CREATE, after={"id": 2, "name": "nut", "qty": 5}))
        # integral-in-float payload (qty: 7.0 -> int column) + update
        writer.write(
            rec(Operation.UPDATE, key={"id": 2},
                after={"id": 2, "name": "nut", "qty": 7.0})
        )
        writer.write(rec(Operation.DELETE, key={"id": 1}))
        print("after CDC apply:",
              sorted(tuple(r) for r in wh.read("items").collect()))

        # 3. Batched last-write-wins apply (one commit per micro-batch) ----
        writer.apply_batch(
            [
                rec(Operation.CREATE, after={"id": 3, "name": "washer", "qty": 1}),
                rec(Operation.UPDATE, key={"id": 3},
                    after={"id": 3, "name": "washer", "qty": 2}),
                rec(Operation.UPDATE, key={"id": 3},
                    after={"id": 3, "name": "washer", "qty": 3}),
            ],
            key_fields=["id"],
        )
        print("after batch apply:",
              sorted(tuple(r) for r in wh.read("items").collect()))

    # 4. Analytics over the synthetic warehouse ----------------------------
    registry = load_all()
    top = registry["q03_shipping_priority"].build(spark, SF_DIR)
    print("q03 top row:", top.limit(1).collect())

    pairs = registry["dedup_minhash_verified"].build(spark, SF_DIR)
    print(f"verified near-dup pairs: {pairs.count()}")

    from conduit_connector_s3_iceberg_spark.operators.sketches import (
        distinct_sketches,
        union_rollup,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    per_type = distinct_sketches(ev, ["event_type"], "user_id")
    global_users = union_rollup(per_type, []).collect()[0]["approx_distinct"]
    print(f"approx distinct users (sketch union, no rescan): {global_users}")

    spark.stop()


if __name__ == "__main__":
    main()
