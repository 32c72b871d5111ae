"""conduit_connector_s3_iceberg_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
``conduitio-labs/conduit-connector-s3-iceberg`` (a Conduit destination
connector that applies OpenCDC change streams to an Iceberg-on-S3 table via
an embedded SparkSession), built Spark-first:

* ``session``   — SparkSession factory + config model (reference:
  ``SparkUtils.java:36-59``, ``DestinationConfig.java:41-133``).
* ``records``   — OpenCDC record model and key/payload decoding
  (reference: ``SparkDestinationStream.java:138-262``).
* ``writer``    — the CDC apply data plane: insert / delete / update /
  batched MERGE (reference: ``SparkDestinationStream.java:94-235``).
* ``catalog``   — table abstraction: Iceberg catalog when the runtime jar is
  present, parquet-backed warehouse with copy-on-write row-level DML
  otherwise (same semantics, test-friendly).
* ``plans``     — the declarative query surface (SURVEY.md §2B/§2C):
  scans, joins, aggregations, windows, set ops, scalar functions.
* ``operators`` — north-star extension operators: dedup (exact + MinHash-LSH
  + SimHash + n-gram Jaccard + embedding-cosine), similarity search,
  text analysis, multimodal binary columns.
* ``streaming`` — Structured Streaming CDC ingest and windowed analytics.

Everything is DataFrame/SQL-declarative so Catalyst handles pushdown,
pruning, join selection, and AQE; Python UDFs are avoided on hot paths.
"""

__version__ = "0.1.0"
