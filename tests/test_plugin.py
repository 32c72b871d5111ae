"""Plugin lifecycle + wire server tests.

The reference's actual entry point is a plugin process speaking the
Conduit destination protocol (``Application.java:26-39``,
``DestinationService.java:31-114``, ``connector.proto:84-110``). These
tests drive the transport-agnostic services with a recording observer —
the exact pattern of ``SparkDestinationStreamIT.java:101-106`` (Mockito
mock of ``StreamObserver``) — then drive the full state machine over a
real TCP socket through the NDJSON server.
"""

import json
import socket

import pytest
from pyspark.sql import types as T

from conduit_connector_s3_iceberg_spark.plugin import (
    DestinationService,
    PluginServer,
    SpecifierService,
)
from conduit_connector_s3_iceberg_spark.plugin.server import handshake_line
from conduit_connector_s3_iceberg_spark.plugin.service import (
    ConfigureRequest,
    MemoryObserver,
    RunRequest,
    ServiceError,
    StartRequest,
    StopRequest,
    TeardownRequest,
    record_from_wire,
)
from conduit_connector_s3_iceberg_spark.records import Operation, Record
from conduit_connector_s3_iceberg_spark.session import REQUIRED_KEYS
from conduit_connector_s3_iceberg_spark.writer import CdcWriter, ParquetWarehouse

SCHEMA = T.StructType(
    [
        T.StructField("string_field", T.StringType(), False),
        T.StructField("integer_field", T.IntegerType(), True),
        T.StructField("float_field", T.FloatType(), True),
    ]
)

VALID_CONFIG = {
    "catalog.name": "demo",
    "catalog.catalog-impl": "org.apache.iceberg.rest.RESTCatalog",
    "namespace": "conduit",
    "table.name": "plugin_t",
    "s3.access-key-id": "admin",
    "s3.secret-access-key": "password",
    "s3.region": "us-east-1",
}


@pytest.fixture()
def service(spark, tmp_path):
    """DestinationService with the test seams the reference IT uses: the
    shared session and a temp-warehouse-backed writer."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("plugin_t", SCHEMA)

    return DestinationService(
        session_factory=lambda cfg: spark,
        writer_factory=lambda s, cfg: CdcWriter(wh, cfg.table_name),
        stop_spark_on_teardown=False,
    ), wh


def unary(fn, request):
    obs = MemoryObserver()
    fn(request, obs)
    return obs


def rec(op, key=None, payload=None, position=b"pos-1"):
    return Record(position, op, key=key, payload_after=payload)


# ------------------------------------------------------------ specifier ----


def test_specify_exposes_parameter_spec():
    obs = MemoryObserver()
    SpecifierService().specify(None, obs)
    assert obs.completed and not obs.errors
    [resp] = obs.values
    for key in REQUIRED_KEYS:
        assert resp.destination_params[key]["required"] is True
    assert resp.name and resp.version


# ------------------------------------------------------- configure/start ---


def test_configure_ok(service):
    svc, _ = service
    obs = unary(svc.configure, ConfigureRequest(VALID_CONFIG))
    assert obs.completed and not obs.errors
    assert svc.config.table_name == "plugin_t"


def test_configure_error_taxonomy(service):
    svc, _ = service
    bad = dict(VALID_CONFIG)
    del bad["table.name"]
    obs = unary(svc.configure, ConfigureRequest(bad))
    assert not obs.completed and not obs.values
    [err] = obs.errors
    assert err.code == "INTERNAL"
    assert str(err).startswith("couldn't configure task: ")
    assert "table.name" in str(err)


def test_start_before_configure_errors(service):
    svc, _ = service
    obs = unary(svc.start, StartRequest())
    [err] = obs.errors
    assert str(err).startswith("couldn't start connector: ")


def test_run_before_start_raises(service):
    svc, _ = service
    with pytest.raises(ServiceError, match="Start was not called"):
        svc.run(MemoryObserver())


def test_stop_before_run_errors(service):
    svc, _ = service
    obs = unary(svc.stop, StopRequest())
    [err] = obs.errors
    assert str(err).startswith("couldn't stop: ")


# ------------------------------------------------------------- lifecycle ---


def lifecycle_to_run(svc):
    assert not unary(svc.configure, ConfigureRequest(VALID_CONFIG)).errors
    assert not unary(svc.start, StartRequest()).errors
    stream_obs = MemoryObserver()
    return svc.run(stream_obs), stream_obs


def test_run_stream_acks_each_record(service, spark):
    svc, wh = service
    stream, obs = lifecycle_to_run(svc)
    stream.on_next(
        RunRequest(
            rec(
                Operation.CREATE,
                payload=b'{"string_field": "a", "integer_field": 1,'
                b' "float_field": 1.5}',
                position=b"p-1",
            )
        )
    )
    stream.on_next(
        RunRequest(
            rec(
                Operation.SNAPSHOT,
                payload=b'{"string_field": "b", "integer_field": 2.0,'
                b' "float_field": 3.0}',
                position=b"p-2",
            )
        )
    )
    assert [r.ack_position for r in obs.values] == [b"p-1", b"p-2"]
    assert not obs.errors
    got = {r.string_field: r for r in wh.read("plugin_t").collect()}
    assert got["a"].integer_field == 1
    # integral-in-float normalization (reference :237-262) through the
    # full service path: 2.0 lands in the int column as 2
    assert got["b"].integer_field == 2


def test_run_stream_update_and_delete(service):
    svc, wh = service
    stream, obs = lifecycle_to_run(svc)
    stream.on_next(
        RunRequest(
            rec(
                Operation.CREATE,
                payload=b'{"string_field": "a", "integer_field": 1,'
                b' "float_field": 1.5}',
            )
        )
    )
    stream.on_next(
        RunRequest(
            rec(
                Operation.UPDATE,
                key=b'{"integer_field": 1}',
                payload=b'{"string_field": "a2", "integer_field": 1,'
                b' "float_field": 2.5}',
            )
        )
    )
    [r] = wh.read("plugin_t").collect()
    assert r.string_field == "a2"
    stream.on_next(RunRequest(rec(Operation.DELETE, key=b'{"integer_field": 1}')))
    assert wh.read("plugin_t").count() == 0
    assert len(obs.values) == 3 and not obs.errors


def test_run_stream_write_error_taxonomy(service):
    """Reference :76-84: a failed record surfaces INTERNAL
    'couldn't write record: <cause>' on the response stream."""
    svc, _ = service
    stream, obs = lifecycle_to_run(svc)
    stream.on_next(RunRequest(rec(Operation.DELETE, key=b"{}")))
    [err] = obs.errors
    assert err.code == "INTERNAL"
    assert str(err).startswith("couldn't write record: ")
    assert "key has no fields" in str(err)

    stream2, obs2 = svc.run(MemoryObserver()), None  # fresh stream after error
    stream2.on_next(RunRequest(rec(Operation.DELETE, key=b"not json")))
    [err2] = stream2.response_observer.errors
    assert "input data is not JSON" in str(err2)


def test_stream_closed_after_error_drops_records(service):
    svc, wh = service
    stream, obs = lifecycle_to_run(svc)
    stream.on_next(RunRequest(rec(Operation.DELETE, key=b"{}")))
    stream.on_next(
        RunRequest(
            rec(
                Operation.CREATE,
                payload=b'{"string_field": "late", "integer_field": 9,'
                b' "float_field": 0.0}',
            )
        )
    )
    assert len(obs.errors) == 1 and not obs.values
    assert wh.read("plugin_t").count() == 0


def test_stop_flushes_and_half_closes(service):
    svc, _ = service
    stream, obs = lifecycle_to_run(svc)
    stop_obs = unary(svc.stop, StopRequest())
    assert stop_obs.completed and not stop_obs.errors
    assert obs.completed  # run response stream half-closed (reference :92)


def test_teardown_stops_spark_when_owned():
    class FakeSpark:
        stopped = False

        def stop(self):
            self.stopped = True

    fake = FakeSpark()
    svc = DestinationService(session_factory=lambda cfg: fake)
    assert not unary(svc.configure, ConfigureRequest(VALID_CONFIG)).errors
    assert not unary(svc.start, StartRequest()).errors
    obs = unary(svc.teardown, TeardownRequest())
    assert obs.completed and fake.stopped and svc.spark is None


def test_teardown_without_start_is_ok(service):
    svc, _ = service
    obs = unary(svc.teardown, TeardownRequest())
    assert obs.completed and not obs.errors


# ------------------------------------------------------------ wire decode --


def test_record_from_wire_raw_and_struct():
    r = record_from_wire(
        {
            "position": "p-9",
            "operation": "create",
            "key": {"raw": '{"id": 1}'},
            "payload": {"after": {"struct": {"id": 1, "name": "x"}}},
            "metadata": {"source": "t"},
        }
    )
    assert r.position == b"p-9"
    assert r.operation is Operation.CREATE
    assert r.key == b'{"id": 1}'
    assert r.payload_after == {"id": 1, "name": "x"}
    assert r.metadata == {"source": "t"}


# ---------------------------------------------------------------- server ---


def test_handshake_line_format():
    assert handshake_line(12345) == "1|1|tcp|localhost:12345|grpc"


class Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("localhost", port), timeout=30)
        self.rfile = self.sock.makefile("rb")

    def call(self, obj):
        self.sock.sendall((json.dumps(obj) + "\n").encode())
        return json.loads(self.rfile.readline())

    def send(self, obj):
        self.sock.sendall((json.dumps(obj) + "\n").encode())

    def recv(self):
        return json.loads(self.rfile.readline())

    def close(self):
        self.sock.close()


def test_server_end_to_end(service):
    """The full plugin conversation over a real TCP socket: specify →
    configure → start → run(stream of records with interleaved acks,
    including a failing record on a later stream) → stop → teardown."""
    svc, wh = service
    server = PluginServer(port=0, destination=svc)
    server.start()
    try:
        import base64 as _b64

        def b64(s: str) -> str:
            return _b64.b64encode(s.encode()).decode()

        c = Client(server.port)
        resp = c.call({"rpc": "specify"})
        assert resp["ok"] and resp["response"]["name"]

        # canonical wire: each "request"/"response" subtree is the RPC's
        # proto-JSON message (connector.proto:221-324)
        assert c.call(
            {"rpc": "configure", "request": {"config": VALID_CONFIG}}
        ) == {"ok": True, "response": {}}
        assert c.call({"rpc": "start"}) == {"ok": True, "response": {}}
        assert c.call({"rpc": "run"}) == {"ok": True, "stream": "open"}

        c.send(
            {
                "record": {
                    "position": b64("w-1"),
                    "operation": "OPERATION_CREATE",
                    "payload": {
                        "after": {
                            "rawData": b64(
                                '{"string_field": "wire", '
                                '"integer_field": 5, "float_field": 0.5}'
                            )
                        }
                    },
                }
            }
        )
        ack = c.recv()
        assert ack["ok"]
        # Destination.Run.Response: base64 ackPosition + empty error
        # (connector.proto:241-248)
        assert ack["response"] == {"ackPosition": b64("w-1"), "error": ""}
        c.send({"end": True})

        assert c.call({"rpc": "stop"}) == {"ok": True, "response": {}}
        assert wh.read("plugin_t").count() == 1

        # a fresh stream surfaces the write-error taxonomy over the wire
        assert c.call({"rpc": "run"}) == {"ok": True, "stream": "open"}
        c.send(
            {
                "record": {
                    "position": b64("w-2"),
                    "operation": "OPERATION_DELETE",
                    "key": {"rawData": b64("{}")},
                }
            }
        )
        err = c.recv()["error"]
        assert err["code"] == "INTERNAL"
        assert err["description"].startswith("couldn't write record: ")

        assert c.call({"rpc": "teardown"}) == {"ok": True, "response": {}}
        c.close()
    finally:
        server.stop()


def test_server_rejects_unknown_rpc(service):
    svc, _ = service
    server = PluginServer(port=0, destination=svc)
    server.start()
    try:
        c = Client(server.port)
        resp = c.call({"rpc": "nope"})
        assert resp["error"]["code"] == "UNIMPLEMENTED"
        c.close()
    finally:
        server.stop()


def test_lifecycle_rpcs_unimplemented_like_reference(service):
    """The reference never overrides the Lifecycle RPCs, so its gRPC base
    class answers UNIMPLEMENTED (connector.proto:120-130); the NDJSON
    transport preserves that contract."""
    svc, _ = service
    server = PluginServer(port=0, destination=svc)
    server.start()
    try:
        c = Client(server.port)
        for rpc in (
            "lifecycle_on_created",
            "lifecycle_on_updated",
            "lifecycle_on_deleted",
        ):
            resp = c.call({"rpc": rpc})
            assert resp["error"]["code"] == "UNIMPLEMENTED"
        c.close()
    finally:
        server.stop()


def test_collection_router_fans_out_one_stream(spark, tmp_path):
    """One Run stream, records stamped with opencdc.collection metadata,
    fan out to per-collection tables; unstamped records fall back to the
    configured default; unknown collections surface the write-error
    taxonomy."""
    from conduit_connector_s3_iceberg_spark.writer import CollectionRouter

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.create_table("plugin_t", SCHEMA)
    wh.create_table("other", SCHEMA)
    svc = DestinationService(
        session_factory=lambda cfg: spark,
        writer_factory=lambda s, cfg: CollectionRouter(wh, cfg.table_name),
        stop_spark_on_teardown=False,
    )
    assert not unary(svc.configure, ConfigureRequest(VALID_CONFIG)).errors
    assert not unary(svc.start, StartRequest()).errors
    obs = MemoryObserver()
    stream = svc.run(obs)

    def payload(name):
        return (
            b'{"string_field": "' + name + b'", "integer_field": 1,'
            b' "float_field": 0.5}'
        )

    stream.on_next(
        RunRequest(Record(b"p1", Operation.CREATE, payload_after=payload(b"dflt")))
    )
    stream.on_next(
        RunRequest(
            Record(
                b"p2",
                Operation.CREATE,
                payload_after=payload(b"routed"),
                metadata={"opencdc.collection": "other"},
            )
        )
    )
    assert [v.ack_position for v in obs.values] == [b"p1", b"p2"]
    assert [r.string_field for r in wh.read("plugin_t").collect()] == ["dflt"]
    assert [r.string_field for r in wh.read("other").collect()] == ["routed"]

    stream.on_next(
        RunRequest(
            Record(
                b"p3",
                Operation.CREATE,
                payload_after=payload(b"lost"),
                metadata={"opencdc.collection": "nope"},
            )
        )
    )
    [err] = obs.errors
    assert str(err).startswith("couldn't write record: ")
    assert "unknown collection" in str(err)


def test_plugin_process_entry_point(tmp_path):
    """Launch the plugin exactly as Conduit would (`Application.main`
    parity): spawn the process, read the go-plugin handshake off stdout,
    connect to the advertised port, run specify + an unconfigured-start
    error, then teardown (exit_on_teardown shuts the process down)."""
    import subprocess
    import sys
    import time

    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "conduit_connector_s3_iceberg_spark.plugin",
            "0",
            "--ndjson-handshake",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=str(pathlib_repo_root()),
    )
    try:
        line = proc.stdout.readline().strip()
        parts = line.split("|")
        assert parts[0] == "1" and parts[1] == "1" and parts[2] == "tcp"
        assert parts[4] == "grpc"
        port = int(parts[3].rsplit(":", 1)[1])

        c = Client(port)
        resp = c.call({"rpc": "specify"})
        assert resp["ok"] and resp["response"]["name"] == "s3-iceberg-spark"
        err = c.call({"rpc": "start"})["error"]
        assert err["description"].startswith("couldn't start connector: ")
        assert c.call({"rpc": "teardown"}) == {"ok": True, "response": {}}
        c.close()
        for _ in range(100):
            if proc.poll() is not None:
                break
            time.sleep(0.1)
        assert proc.poll() is not None, "process should exit after teardown"
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait(timeout=10)


def test_plugin_handshake_token_gated_without_ack():
    """Without --ndjson-handshake (and no grpc runtime), the handshake
    must NOT claim the grpc transport — a real go-plugin host would dial
    gRPC at an NDJSON port. The token degrades to 'ndjson' (ADVICE r5)."""
    import subprocess
    import sys

    from conduit_connector_s3_iceberg_spark.plugin.server import (
        grpc_available,
    )

    if grpc_available():  # pragma: no cover - env-dependent
        import pytest

        pytest.skip("grpc runtime present; token is legitimately 'grpc'")
    proc = subprocess.Popen(
        [sys.executable, "-m", "conduit_connector_s3_iceberg_spark.plugin", "0"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=str(pathlib_repo_root()),
    )
    try:
        parts = proc.stdout.readline().strip().split("|")
        assert parts[:3] == ["1", "1", "tcp"]
        assert parts[4] == "ndjson"
        port = int(parts[3].rsplit(":", 1)[1])
        c = Client(port)
        assert c.call({"rpc": "teardown"}) == {"ok": True, "response": {}}
        c.close()
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait(timeout=10)


def test_plugin_server_stop_drains_inflight_handler():
    """stop() must join live handler threads up to the grace timeout
    (the reference's 30 s awaitTermination) — an in-flight call finishes
    and its response is written before the listener closes (ADVICE r5)."""
    import threading
    import time as _time

    from conduit_connector_s3_iceberg_spark.plugin.service import (
        DestinationService,
    )
    from conduit_connector_s3_iceberg_spark.plugin.server import PluginServer

    svc = DestinationService()
    release = threading.Event()
    started = threading.Event()
    orig = svc.teardown

    def slow_teardown(*args, **kwargs):
        started.set()
        release.wait(timeout=10)
        return orig(*args, **kwargs)

    svc.teardown = slow_teardown
    server = PluginServer(destination=svc)
    server.start()
    c = Client(server.port)
    result = {}

    def call():
        result["resp"] = c.call({"rpc": "teardown"})

    t = threading.Thread(target=call)
    t.start()
    assert started.wait(timeout=5), "handler never started"

    stopper = threading.Thread(target=lambda: server.stop(grace_seconds=10))
    stopper.start()
    _time.sleep(0.2)  # let stop() reach the drain join
    release.set()
    stopper.join(timeout=10)
    t.join(timeout=10)
    c.close()
    assert not stopper.is_alive(), "stop() did not return"
    assert result.get("resp") == {"ok": True, "response": {}}, (
        "in-flight handler response was cut off by stop()"
    )


def pathlib_repo_root():
    import pathlib

    return pathlib.Path(__file__).resolve().parent.parent
