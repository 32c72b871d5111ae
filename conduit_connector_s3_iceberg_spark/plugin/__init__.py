"""Conduit plugin process surface: lifecycle services + wire server.

The reference connector is not a library — it is a *plugin process* that
Conduit launches and speaks gRPC to (``Application.java:26-39``,
``Server.java:27-92``, ``connector.proto:84-137``). This package
re-expresses that surface:

* :mod:`.service` — transport-agnostic ``DestinationService`` /
  ``SpecifierService`` implementing the configure → start → run(stream) →
  stop → teardown state machine with the reference's error taxonomy.
* :mod:`.server` — the process entry point: go-plugin handshake line,
  newline-delimited-JSON TCP transport via the stdlib (the sandbox has no
  ``grpc``), with a documented seam to bind the same services to gRPC
  when the runtime is importable.
"""

from .service import (  # noqa: F401
    DestinationService,
    DestinationStream,
    PluginStateError,
    ServiceError,
    SpecifierService,
)
from .server import PluginServer, main  # noqa: F401
