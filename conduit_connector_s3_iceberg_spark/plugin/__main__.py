"""``python -m conduit_connector_s3_iceberg_spark.plugin [port]`` — the
process entry point (``Application.java:26-39``)."""

from .server import main

raise SystemExit(main())
