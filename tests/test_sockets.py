"""Socket-transport analog of the reference's UCX layer (SURVEY.md §2.5
ucx_conn / ucx_server / ucx_client) and the dissociated protocol over it.

Covers: tagged probe/mask matching with out-of-order claims, AM + IOV
sends, the >2 GiB guard, listener/pending-queue/worker-per-client server
lifecycle with graceful shutdown, the want_data handshake branch, the
flatbuffer bodyLength peek, streaming ordered reassembly, and the
reference's chunked-parquet serving scenario end-to-end.
"""

from __future__ import annotations

import struct
import threading

import pyarrow as pa
import pytest

from arrow_experiments_spark.transport.dissociated import _BODY_BIT
from arrow_experiments_spark.transport.server import DatasetRegistry
from arrow_experiments_spark.transport.sockets import (
    WANT_CTRL_MASK,
    WANT_CTRL_TAG,
    WANT_DATA_TAG,
    DissociatedSocketServer,
    SocketConn,
    SocketServer,
    _fb_body_length,
    connect,
    fetch_dissociated_sockets,
)


@pytest.fixture()
def table() -> pa.Table:
    return pa.table(
        {
            "a": pa.array(range(10_000), pa.int64()),
            "s": pa.array([f"row-{i % 97}" for i in range(10_000)]),
        }
    )


class _EchoServer(SocketServer):
    """Echo AMs back; claim tagged messages on request."""

    def do_work(self, conn: SocketConn) -> None:
        while True:
            am_id, payload = conn.recv_am()
            if payload == b"quit":
                return
            conn.send_am(am_id, payload)


@pytest.fixture()
def echo():
    server = _EchoServer()
    host, port = server.init()
    yield host, port
    server.shutdown()


def test_am_roundtrip_and_iov(echo):
    host, port = echo
    conn = connect(host, port)
    try:
        # IOV send: the payload crosses as several buffers, one frame
        conn.send_am(7, b"hello ", b"world", b"!")
        am_id, payload = conn.recv_am()
        assert (am_id, payload) == (7, b"hello world!")
    finally:
        conn.send_am(0, b"quit")
        conn.close()


def test_tag_probe_out_of_order_claims():
    """Tags sent 3,1,2 are claimable in order 1,2,3 — matching is by
    tag/mask against the pending queue, not arrival order (the UCX
    semantics the wire's TCP ordering must not break)."""
    a, b = __import__("socket").socketpair()
    left, right = SocketConn(a), SocketConn(b)
    try:
        for seq in (3, 1, 2):
            left.send_tag(_BODY_BIT | seq, f"payload-{seq}".encode())
        for seq in (1, 2, 3):
            info, payload = right.probe_tag_sync(
                _BODY_BIT | seq, 0xFFFFFFFFFFFFFFFF, remove=True
            )
            assert info.sender_tag == _BODY_BIT | seq
            assert payload == f"payload-{seq}".encode()
    finally:
        left.close()
        right.close()


def test_tag_probe_mask_semantics():
    """probe(WANT_DATA_TAG, ~CTRL_MASK) matches BOTH want tags (shared
    low bits); the ctrl bits of sender_tag then tell the role — the
    server's handshake branch (cudf-flight-server.cc:115-135)."""
    a, b = __import__("socket").socketpair()
    left, right = SocketConn(a), SocketConn(b)
    try:
        left.send_tag(WANT_CTRL_TAG, b"ident")
        info, payload = right.probe_tag_sync(
            WANT_DATA_TAG, ~WANT_CTRL_MASK & 0xFFFFFFFFFFFFFFFF, remove=True
        )
        assert info.sender_tag & WANT_CTRL_MASK  # ctrl role
        assert payload == b"ident"
    finally:
        left.close()
        right.close()


def test_am_2gib_guard_send_and_recv():
    a, b = __import__("socket").socketpair()
    left, right = SocketConn(a), SocketConn(b)
    try:
        with pytest.raises(ValueError, match="2 GiB"):
            # send-side guard fires on declared total, no allocation
            class _Huge(bytes):
                def __len__(self) -> int:
                    return 1 << 31

            left.send_am(1, _Huge())
        # recv-side guard: forge an AM header declaring >2 GiB
        a.sendall(struct.pack("<BIQ", 1, 1, 1 << 31))
        with pytest.raises(ValueError, match="2 GiB"):
            right.recv_am()
    finally:
        left.close()
        right.close()


def test_server_worker_per_client(echo):
    """Concurrent clients are each served by their own worker thread —
    interleaved request/response on N connections makes a single-threaded
    handler deadlock-or-serialize visible."""
    host, port = echo
    results = {}

    def client(i: int) -> None:
        conn = connect(host, port)
        try:
            conn.send_am(i, f"from-{i}".encode())
            results[i] = conn.recv_am()
            conn.send_am(0, b"quit")
        finally:
            conn.close()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert results == {i: (i, f"from-{i}".encode()) for i in range(4)}


def test_fb_body_length_peek(table):
    """The manual flatbuffer read of Message.bodyLength agrees with
    pyarrow's own message bodies for schema + batch messages."""
    import pyarrow.ipc as ipc

    schema_msg = ipc.read_message(table.schema.serialize())
    assert _fb_body_length(schema_msg.metadata.to_pybytes()) == 0
    for batch in table.to_batches(max_chunksize=1024):
        msg = ipc.read_message(batch.serialize())
        assert _fb_body_length(msg.metadata.to_pybytes()) == msg.body.size


@pytest.fixture()
def dissociated(table):
    registry = DatasetRegistry()
    registry.register_table("trading", table)
    server = DissociatedSocketServer(registry)
    host, port = server.init()
    yield host, port
    server.shutdown()


def test_dissociated_sockets_roundtrip(dissociated, table):
    host, port = dissociated
    got = fetch_dissociated_sockets(host, port, "trading")
    assert got.equals(table)


def test_dissociated_sockets_streaming_order(dissociated, table):
    """batch_callback observes batches in sequence order while the
    fetch is still in flight — ordered streaming, not collect-then-parse."""
    host, port = dissociated
    seen: list[int] = []
    got = fetch_dissociated_sockets(
        host, port, "trading", batch_callback=lambda b: seen.append(b.num_rows)
    )
    assert sum(seen) == table.num_rows
    assert len(seen) == len(got.to_batches())


def test_dissociated_sockets_unknown_dataset(dissociated):
    host, port = dissociated
    with pytest.raises(ValueError, match="no such dataset"):
        fetch_dissociated_sockets(host, port, "nope")


def test_dissociated_sockets_taxi_scenario(tmp_path):
    """The reference's dissociated serving scenario over the socket
    transport: parquet read in 1 MiB chunks, served as meta+body streams,
    reassembled and verified (cudf-flight-server.cc:68-93)."""
    import pyarrow.parquet as pq

    from arrow_experiments_spark.sources.arrow_ipc import register_parquet_chunked

    path = str(tmp_path / "train.parquet")
    t = pa.table(
        {
            "vendor": pa.array([i % 3 for i in range(50_000)], pa.int32()),
            "fare": pa.array([float(i % 997) / 7 for i in range(50_000)]),
        }
    )
    pq.write_table(t, path)
    registry = DatasetRegistry()
    register_parquet_chunked(registry, "train.parquet", path)
    server = DissociatedSocketServer(registry)
    host, port = server.init()
    try:
        got = fetch_dissociated_sockets(host, port, "train.parquet")
        assert got.combine_chunks().equals(t.combine_chunks())
    finally:
        server.shutdown()


def test_graceful_shutdown_mid_session():
    """shutdown() with a live client: worker exits, client sees the
    close as ConnectionClosed, no hang."""
    server = _EchoServer()
    host, port = server.init()
    conn = connect(host, port)
    conn.send_am(1, b"ping")
    assert conn.recv_am() == (1, b"ping")
    conn.send_am(0, b"quit")
    server.shutdown()
    conn.close()


def test_large_am_survives_slow_reader():
    """A frame larger than the socket send buffer must arrive complete
    even when the receiver starts reading late — the send loop must keep
    writing past the first partial sendmsg."""
    import socket as socket_mod
    import threading

    a, b = socket_mod.socketpair()
    a.settimeout(30)  # timeout-mode socket: sendmsg returns partial writes
    left, right = SocketConn(a), SocketConn(b)
    payload = bytes(range(256)) * (1 << 16)  # 16 MiB
    try:
        sender = threading.Thread(target=left.send_am, args=(9, payload))
        sender.start()
        import time

        time.sleep(0.2)  # let the send buffer fill before draining
        am_id, got = right.recv_am()
        sender.join(timeout=30)
        assert (am_id, len(got)) == (9, len(payload))
        assert got == payload
    finally:
        left.close()
        right.close()
