"""Integration test for the socket-level engine protocol server (the
gRPC+FlatBuffers stand-in): a request travels through the wire framing,
the subprocess engine invocation, and back — both methods, plus the
error envelope for a malformed method."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kamu_engine_flink_spark.protocol.socket_server import EngineSocketServer, call


@pytest.fixture(scope="module")
def server():
    srv = EngineSocketServer(host="127.0.0.1", port=0)
    srv.serve_background()
    yield srv
    srv.shutdown()
    srv.server_close()


def _ticker(path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t0 = dt.datetime(2000, 1, 1, tzinfo=dt.timezone.utc)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    pq.write_table(
        pa.table(
            {
                "offset": pa.array([0, 1, 2], pa.int64()),
                "op": pa.array([0, 0, 0], pa.int32()),
                "system_time": pa.array([ts(5)] * 3, pa.timestamp("ms", tz="UTC")),
                "event_time": pa.array([ts(1), ts(2), ts(3)], pa.timestamp("ms", tz="UTC")),
                "price": pa.array([10, 20, 30], pa.int64()),
            }
        ),
        path,
    )


def test_execute_transform_over_the_wire(server, tmp_path):
    data = str(tmp_path / "in" / "ticker.parquet")
    _ticker(data)
    out = str(tmp_path / "out.parquet")
    doc = {
        "datasetId": "did:odf:sock",
        "datasetAlias": "sock/test",
        "systemTime": "2000-01-01T01:00:00Z",
        "nextOffset": 0,
        "vocab": {},
        "transform": {
            "kind": "Sql",
            "engine": "spark",
            "queries": [
                {"query": "SELECT event_time, price * 2 as price2 FROM ticker"}
            ],
        },
        "queryInputs": [
            {
                "datasetId": "did:odf:in",
                "queryAlias": "ticker",
                "dataPaths": [data],
                "schemaFile": data,
                "explicitWatermarks": [
                    {
                        "eventTime": "2000-01-01T00:03:00Z",
                        "systemTime": "2000-01-01T00:05:00Z",
                    }
                ],
                "vocab": {},
            }
        ],
        "newCheckpointPath": str(tmp_path / "ckpt"),
        "newDataPath": out,
    }
    resp = call("127.0.0.1", server.port, "executeTransform", doc)
    assert resp["new_offset_interval"] == {"start": 0, "end": 2}, resp
    table = pq.read_table(out)
    assert table.column_names[:3] == ["offset", "op", "system_time"]
    assert table.num_rows == 3
    assert os.path.isdir(str(tmp_path / "ckpt"))  # state persisted for resume


def test_execute_raw_query_over_the_wire(server, tmp_path):
    data = str(tmp_path / "raw" / "input.parquet")
    os.makedirs(os.path.dirname(data), exist_ok=True)
    pq.write_table(
        pa.table({"x": pa.array([1, 2, 3, 4], pa.int64())}), data
    )
    out = str(tmp_path / "raw_out.parquet")
    doc = {
        "inputDataPaths": [data],
        "transform": {
            "kind": "Sql",
            "engine": "spark",
            "queries": [{"query": "SELECT x, x * x AS x2 FROM input WHERE x > 1"}],
        },
        "outputDataPath": out,
    }
    resp = call("127.0.0.1", server.port, "executeRawQuery", doc)
    assert resp == {"num_records": 3}, resp
    assert pq.read_table(out).num_rows == 3


def test_unknown_method_error_envelope(server):
    resp = call("127.0.0.1", server.port, "executeNonsense", {})
    assert resp["kind"] == "invalidRequest"
