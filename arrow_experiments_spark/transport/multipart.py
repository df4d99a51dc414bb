"""multipart/mixed responses: JSON metadata part + Arrow IPC stream part +
optional text/plain footnotes part (SURVEY.md §2.3 multipart_boundary /
multipart_write / multipart_parse; protocol doc
http/get_multipart/README.md:34-56).

Boundary: 28 bytes of CSPRNG entropy, base64url — fresh per response, so
it cannot collide with part payloads chosen in advance.
"""

from __future__ import annotations

import io
import json
import secrets
import time
from collections.abc import Iterable, Iterator
from email.parser import BytesFeedParser

import pyarrow as pa

from arrow_experiments_spark.transport.ipc_stream import encode_ipc_chunks
from arrow_experiments_spark.transport.negotiation import ARROW_STREAM_CONTENT_TYPE


def make_boundary() -> str:
    return secrets.token_urlsafe(28)


def content_type(boundary: str) -> str:
    return f'multipart/mixed; boundary="{boundary}"'


def _part_header(boundary: str, ctype: str, extra: dict[str, str] | None = None) -> bytes:
    lines = [f"--{boundary}", f"Content-Type: {ctype}"]
    for k, v in (extra or {}).items():
        lines.append(f"{k}: {v}")
    return ("\r\n".join(lines) + "\r\n\r\n").encode()


def encode_multipart(
    boundary: str,
    meta: dict,
    schema: pa.Schema,
    batches: Iterable[pa.RecordBatch],
    footnotes: bool = True,
) -> Iterator[bytes]:
    """Yield the multipart/mixed body: JSON part, Arrow part, stats part."""
    t0 = time.perf_counter()
    yield _part_header(boundary, "application/json")
    yield json.dumps(meta).encode()
    yield b"\r\n"

    yield _part_header(
        boundary,
        ARROW_STREAM_CONTENT_TYPE,
        {"Content-Disposition": 'attachment; filename="data.arrows"'},
    )
    n_chunks = 0
    n_bytes = 0
    n_batches = 0

    def counting() -> Iterator[pa.RecordBatch]:
        nonlocal n_batches
        for b in batches:
            n_batches += 1
            yield b

    for chunk in encode_ipc_chunks(schema, counting(), "identity"):
        n_chunks += 1
        n_bytes += len(chunk)
        yield chunk
    yield b"\r\n"

    if footnotes:
        elapsed = time.perf_counter() - t0
        stats = (
            f"batches: {n_batches}\n"
            f"elapsed: {elapsed:.2f}s\n"
            f"chunks: {n_chunks}\n"
            f"avg chunk size: {n_bytes // max(n_chunks, 1)} bytes\n"
        )
        yield _part_header(boundary, "text/plain")
        yield stats.encode()
        yield b"\r\n"

    yield f"--{boundary}--\r\n".encode()


def form_data_content_type(boundary: str) -> str:
    return f'multipart/form-data; boundary="{boundary}"'


def encode_form_data(
    boundary: str,
    meta: dict,
    schema: pa.Schema,
    batches: Iterable[pa.RecordBatch],
) -> Iterator[bytes]:
    """Client-side body for POST ingest (reference
    http/post_multipart/README.md:22): ``multipart/form-data`` with a JSON
    metadata part (field ``metadata``) and an Arrow IPC stream part (field
    ``data``)."""
    yield _part_header(
        boundary,
        "application/json",
        {"Content-Disposition": 'form-data; name="metadata"'},
    )
    yield json.dumps(meta).encode()
    yield b"\r\n"
    yield _part_header(
        boundary,
        ARROW_STREAM_CONTENT_TYPE,
        {"Content-Disposition": 'form-data; name="data"; filename="data.arrows"'},
    )
    yield from encode_ipc_chunks(schema, batches, "identity")
    yield b"\r\n"
    yield f"--{boundary}--\r\n".encode()


def parse_multipart(body: bytes, content_type_header: str) -> dict[str, list[bytes]]:
    """Parse a multipart/mixed body into {content_type: [payload, ...]},
    using the stdlib MIME feed parser with a synthetic header block."""
    parser = BytesFeedParser()
    parser.feed(f"Content-Type: {content_type_header}\r\n\r\n".encode())
    parser.feed(body)
    msg = parser.close()
    out: dict[str, list[bytes]] = {}
    for part in msg.walk():
        if part.is_multipart():
            continue
        out.setdefault(part.get_content_type(), []).append(part.get_payload(decode=True))
    return out


def read_arrow_part(parts: dict[str, list[bytes]]) -> pa.Table:
    payloads = parts.get(ARROW_STREAM_CONTENT_TYPE)
    if not payloads:
        raise ValueError("no Arrow stream part in multipart response")
    return pa.ipc.open_stream(io.BytesIO(payloads[0])).read_all()
