"""Dissociated-IPC analog over HTTP (SURVEY.md §2.5, CPU/HTTP scope).

The reference's Dissociated IPC Protocol splits an Arrow IPC stream into a
**metadata stream** (Flatbuffers message metadata, always host memory) and a
**body stream** (raw body buffers, possibly device memory), correlated by
sequence number (dissociated-ipc/README.md:25-28).  This module reproduces
those wire semantics with HTTP in place of UCX:

  - metadata stream: sequence-numbered messages, schema first (seq 0), then
    per-batch metadata, then EOS — each message a 5-byte prefix (type byte +
    little-endian u32 seq) followed by the Flatbuffer payload
    (cudf-flight-server.cc:138-182, 189-225; msg types cudf-flight-ucx.h:32-35)
  - body stream: per-batch tagged frames, tag = body-type bit (<<55) |
    little-endian seq, body buffers padded to 8-byte alignment
    (cudf-flight-server.cc:227-325; tag layout cudf-flight-ucx.h:22-30;
    RoundUpToMultipleOf8 cudf-flight-server.cc:273-277)
  - reassembly: the client maps seq→metadata and seq→body, then rebuilds
    encapsulated IPC messages in sequence order — the Python analog of
    ``ipc::Message::Open(metadata, body)`` (cudf-flight-client.cc:102-288)

GPU residency and RDMA do not survive the HTTP mapping (documented scope cut,
SURVEY.md §3.3); the split/correlate/reassemble protocol does.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor
from urllib.request import urlopen

import pyarrow as pa
import pyarrow.ipc as ipc

# message type bytes (metadata-stream prefix), mirroring the reference's
# MessageType enum role (cudf-flight-ucx.h:32-35)
MSG_METADATA = 0
MSG_EOS = 1

_BODY_BIT = 1 << 55  # tag layout: body-type bit | LE seq (cudf-flight-ucx.h:22-30)
_CONTINUATION = b"\xff\xff\xff\xff"


def _pad8(n: int) -> int:
    """RoundUpToMultipleOf8 (cudf-flight-server.cc:273-277)."""
    return (-n) % 8


def _messages(reader: pa.RecordBatchReader) -> Iterator[ipc.Message]:
    """Schema message (seq 0) then one record-batch message per batch —
    the metadata-stream ordering of cudf-flight-server.cc:152-181 (our
    tables carry no dictionary batches: dictionaries are decoded at ingest,
    SURVEY.md §1.2 row 19)."""
    yield ipc.read_message(reader.schema.serialize())
    for batch in reader:
        yield ipc.read_message(batch.serialize())


def encode_meta_stream(reader: pa.RecordBatchReader) -> Iterator[bytes]:
    """Metadata stream: [type u8][seq LE u32][len LE u32][flatbuffer bytes]
    per message, terminated by an EOS message with empty payload."""
    seq = 0
    for msg in _messages(reader):
        meta = msg.metadata.to_pybytes()
        yield struct.pack("<BII", MSG_METADATA, seq, len(meta)) + meta
        seq += 1
    yield struct.pack("<BII", MSG_EOS, seq, 0)


def encode_body_stream(reader: pa.RecordBatchReader) -> Iterator[bytes]:
    """Body stream: [tag LE u64][len LE u64][body bytes padded to 8] per
    message that has a body (schema seq 0 has none, so bodies start at
    seq 1 — cudf-flight-server.cc:227-258)."""
    for seq, msg in enumerate(_messages(reader)):
        body = msg.body
        if body is None or body.size == 0:
            continue
        raw = body.to_pybytes()
        raw += b"\x00" * _pad8(len(raw))
        yield struct.pack("<QQ", _BODY_BIT | seq, len(raw)) + raw


def _encapsulate(metadata: bytes, body: bytes | None) -> bytes:
    """Rebuild one encapsulated IPC message from its dissociated halves —
    the client-side ``ipc::Message::Open(metadata, body)`` analog
    (cudf-flight-client.cc:264-288).  Prefix + padded metadata must land on
    an 8-byte boundary; body buffers are already 8-aligned by the writer."""
    pad = _pad8(4 + 4 + len(metadata))
    meta_padded = metadata + b"\x00" * pad
    out = _CONTINUATION + struct.pack("<I", len(meta_padded)) + meta_padded
    if body:
        out += body
    return out


def parse_meta_stream(data: bytes) -> dict[int, bytes]:
    """seq → flatbuffer metadata bytes, EOS-terminated."""
    out: dict[int, bytes] = {}
    off = 0
    while off < len(data):
        mtype, seq, length = struct.unpack_from("<BII", data, off)
        off += 9
        if mtype == MSG_EOS:
            break
        out[seq] = bytes(data[off : off + length])
        off += length
    return out


def parse_body_stream(data: bytes) -> dict[int, bytes]:
    """seq → padded body bytes (tag's low 32 bits are the seq — the
    client's tag-mask recv, cudf-flight-client.cc:164-200)."""
    out: dict[int, bytes] = {}
    off = 0
    while off < len(data):
        tag, length = struct.unpack_from("<QQ", data, off)
        off += 16
        if not tag & _BODY_BIT:
            raise ValueError(f"body frame without body bit: tag={tag:#x}")
        out[tag & 0xFFFFFFFF] = bytes(data[off : off + length])
        off += length
    return out


def reassemble(meta: dict[int, bytes], body: dict[int, bytes]) -> pa.Table:
    """Ordered merge of the two streams: for each seq in order, rebuild the
    encapsulated message; messages without a queued body ship metadata-only
    (the schema).  The result decodes with a stock IPC stream reader."""
    if sorted(meta) != list(range(len(meta))):
        raise ValueError(f"metadata seqs not contiguous: {sorted(meta)}")
    stream = b"".join(
        _encapsulate(meta[seq], body.get(seq)) for seq in sorted(meta)
    )
    stream += _CONTINUATION + b"\x00\x00\x00\x00"  # EOS
    return ipc.open_stream(pa.BufferReader(stream)).read_all()


def fetch_dissociated(meta_url: str, body_url: str) -> pa.Table:
    """Client: fetch both streams concurrently (the reference's meta/data
    loop threads, cudf-flight-client.cc:71-72) and reassemble."""
    with ThreadPoolExecutor(2) as pool:
        meta_f = pool.submit(lambda: urlopen(meta_url).read())
        body_f = pool.submit(lambda: urlopen(body_url).read())
        return reassemble(
            parse_meta_stream(meta_f.result()), parse_body_stream(body_f.result())
        )
