"""Arrow-over-HTTP client with the reference's measurement protocol
(SURVEY.md §2.4): every fetch reports elapsed seconds (2 dp), batch count,
byte count, time-to-schema and time-to-first-batch.
"""

from __future__ import annotations

import io
import json
import time
import urllib.request
from dataclasses import dataclass, field

import pyarrow as pa

from arrow_experiments_spark.transport.ipc_stream import decode_body
from arrow_experiments_spark.transport.negotiation import ARROW_STREAM_CONTENT_TYPE


@dataclass
class FetchMetrics:
    url: str
    elapsed_sec: float = 0.0
    batches: int = 0
    rows: int = 0
    bytes_received: int = 0
    time_to_schema_sec: float = 0.0
    time_to_first_batch_sec: float = 0.0
    content_type: str = ""
    content_encoding: str = ""
    extra: dict = field(default_factory=dict)

    def summary(self) -> str:
        return (
            f"{self.batches} record batches received, {self.rows} rows, "
            f"{self.bytes_received} bytes, {self.elapsed_sec:.2f} seconds elapsed"
        )


class _CountingReader(io.RawIOBase):
    """File-like wrapper that counts bytes as they stream through, so the
    metrics contract (bytes received) survives incremental decoding."""

    def __init__(self, raw) -> None:
        self._raw = raw
        self.count = 0

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        n = self._raw.readinto(b)
        if n:
            self.count += n
        return n or 0


def fetch_arrow(
    url: str,
    accept: str | None = None,
    accept_encoding: str | None = None,
    close_connection: bool = False,
    collect_table: bool = True,
) -> tuple[pa.Table | None, FetchMetrics]:
    """GET an Arrow IPC stream; decode per the response's declared
    compression (Content-Encoding coding, or transparent IPC codec).

    The body is stream-decoded straight off the socket — no intermediate
    full-body buffer — matching the reference client's incremental
    ``pa.ipc.open_stream(response)`` model
    (http/get_simple/python/client/urllib.request/client.py:31-39).
    ``close_connection`` sends an explicit ``Connection: close`` for
    one-shot fetches (keepalive_off, reference
    http/get_simple/c_glib/client/client.c:33-41).

    ``collect_table=False`` streams, counts, and discards batches —
    returning ``(None, metrics)`` — exactly the reference client's
    metrics protocol (batch count + elapsed seconds, get_simple
    README.md:37; its clients do not retain the stream either).  Beyond
    O(result) memory, retention costs real CPU: each socket-decoded
    batch is a fresh allocation (no zero-copy source buffer to
    reference), measured ~5× elapsed on a 3 GiB stream."""
    metrics = FetchMetrics(url=url)
    req = urllib.request.Request(url)
    if accept:
        req.add_header("Accept", accept)
    if accept_encoding:
        req.add_header("Accept-Encoding", accept_encoding)
    if close_connection:
        req.add_header("Connection", "close")

    t0 = time.perf_counter()
    with urllib.request.urlopen(req) as resp:
        ctype = resp.headers.get("Content-Type", "")
        if not ctype.startswith(ARROW_STREAM_CONTENT_TYPE):
            raise ValueError(f"unexpected content type: {ctype!r}")
        metrics.content_type = ctype
        coding = resp.headers.get("Content-Encoding", "identity")
        metrics.content_encoding = coding
        counting = _CountingReader(resp)
        reader = decode_body(io.BufferedReader(counting, 1 << 20), coding)
        metrics.time_to_schema_sec = time.perf_counter() - t0
        batches = []
        for batch in reader:
            if metrics.batches == 0:
                metrics.time_to_first_batch_sec = time.perf_counter() - t0
            metrics.batches += 1
            metrics.rows += batch.num_rows
            if collect_table:
                batches.append(batch)
        metrics.bytes_received = counting.count
        # reader.stats, per the reference's compressed-path metrics
        # (http/get_compressed/python/client/client.py:85-86)
        st = reader.stats
        metrics.extra["ipc_stats"] = {
            "num_messages": st.num_messages,
            "num_record_batches": st.num_record_batches,
            "num_dictionary_batches": st.num_dictionary_batches,
            "num_replaced_dictionaries": st.num_replaced_dictionaries,
            "num_dictionary_deltas": st.num_dictionary_deltas,
        }
    metrics.elapsed_sec = time.perf_counter() - t0
    if not collect_table:
        return None, metrics
    table = pa.Table.from_batches(batches, schema=reader.schema)
    return table, metrics


def fetch_multipart(
    url: str, chunk_bytes: int = 1 << 16, collect_table: bool = True
) -> tuple[dict, pa.Table | None, FetchMetrics]:
    """GET a multipart/mixed dataset (JSON meta + Arrow part), decoding
    the Arrow part incrementally off the socket via the feed-based parser
    (r7 verdict #5).  ENCODED-side buffering is O(part-header + chunk) —
    the reference client's ``BytesFeedParser`` loop
    (http/get_multipart/python/client/simple_client.py:35-58) without its
    whole-part buffering.  The DECODED side depends on ``collect_table``:
    the default accumulates every batch and returns a full ``pa.Table``
    (peak memory = the decoded dataset, like any collect); pass
    ``collect_table=False`` to drain batch-by-batch for metrics only
    (peak memory = one batch — the multi-GB streaming posture, matching
    ``fetch_arrow``), in which case the table slot is ``None``."""
    from arrow_experiments_spark.transport.multipart import (
        stream_multipart_arrow,
    )

    metrics = FetchMetrics(url=url)
    t0 = time.perf_counter()
    with urllib.request.urlopen(url) as resp:
        ctype = resp.headers.get("Content-Type", "")
        if not ctype.startswith("multipart/mixed"):
            raise ValueError(f"unexpected content type: {ctype!r}")
        metrics.content_type = ctype

        def chunks():
            while True:
                c = resp.read(chunk_bytes)
                if not c:
                    return
                metrics.bytes_received += len(c)
                yield c

        meta, reader = stream_multipart_arrow(chunks(), ctype)
        metrics.time_to_schema_sec = time.perf_counter() - t0
        batches = []
        for batch in reader:
            if metrics.batches == 0:
                metrics.time_to_first_batch_sec = time.perf_counter() - t0
            metrics.batches += 1
            metrics.rows += batch.num_rows
            if collect_table:
                batches.append(batch)
    metrics.elapsed_sec = time.perf_counter() - t0
    if not collect_table:
        return meta, None, metrics
    return meta, pa.Table.from_batches(batches, schema=reader.schema), metrics


def post_arrow(
    url: str,
    table: pa.Table,
    meta: dict | None = None,
) -> dict:
    """POST a table to an ingest endpoint.  Without ``meta`` the body is a
    plain Arrow IPC stream (post_simple); with ``meta`` it is
    ``multipart/form-data`` with a JSON metadata part + Arrow stream part
    (post_multipart, reference http/post_multipart/README.md:22).
    Returns the server's JSON acknowledgement."""
    from arrow_experiments_spark.transport.multipart import (
        encode_form_data,
        form_data_content_type,
        make_boundary,
    )

    if meta is None:
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
        body = sink.getvalue()
        ctype = ARROW_STREAM_CONTENT_TYPE
    else:
        boundary = make_boundary()
        body = b"".join(
            encode_form_data(boundary, meta, table.schema, table.to_batches())
        )
        ctype = form_data_content_type(boundary)
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def fetch_catalog(url: str) -> list[str]:
    """GET a catalog JSON document and return the .arrows stream URIs
    (get_indirect client shape)."""
    with urllib.request.urlopen(url) as resp:
        doc = json.loads(resp.read())
    return [entry["uri"] for entry in doc.get("arrow_stream_files", [])]


def fetch_indirect(catalog_url: str) -> dict[str, tuple[pa.Table, FetchMetrics]]:
    """Two-step fetch: catalog → each referenced Arrow stream."""
    out: dict[str, tuple[pa.Table, FetchMetrics]] = {}
    for uri in fetch_catalog(catalog_url):
        name = uri.rsplit("/", 1)[-1]
        out[name] = fetch_arrow(uri)
    return out


def fetch_range(url: str, n_parts: int = 3) -> tuple[bytes, int]:
    """Split download via byte-range requests: HEAD for Content-Length,
    then n_parts GETs with Range headers, reassembled in order
    (get_range client shape).  Returns (bytes, content_length)."""
    head = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(head) as resp:
        total = int(resp.headers["Content-Length"])
        if resp.headers.get("Accept-Ranges") != "bytes":
            raise ValueError("server does not accept byte ranges")

    part_size = (total + n_parts - 1) // n_parts
    parts: list[bytes] = []
    for i in range(n_parts):
        start = i * part_size
        end = min(start + part_size - 1, total - 1)
        if start > end:
            break
        req = urllib.request.Request(url, headers={"Range": f"bytes={start}-{end}"})
        with urllib.request.urlopen(req) as resp:
            if resp.status != 206:
                raise ValueError(f"expected 206 Partial Content, got {resp.status}")
            parts.append(resp.read())
    return b"".join(parts), total


def fetch_resume(url: str, partial: bytes) -> tuple[bytes, int]:
    """Resume an interrupted download from ``len(partial)`` bytes via an
    open-ended Range request — the ``curl -C -`` shape of the reference's
    range client (http/get_range/curl/client/client.sh:42-49: retry loop
    with ``--continue-at -`` until the full Content-Length arrives).
    Returns (complete_bytes, content_length)."""
    head = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(head) as resp:
        total = int(resp.headers["Content-Length"])
        if resp.headers.get("Accept-Ranges") != "bytes":
            raise ValueError("server does not accept byte ranges")
    if len(partial) >= total:
        return partial[:total], total
    req = urllib.request.Request(
        url, headers={"Range": f"bytes={len(partial)}-"}
    )
    with urllib.request.urlopen(req) as resp:
        if resp.status != 206:
            raise ValueError(f"expected 206 Partial Content, got {resp.status}")
        rest = resp.read()
    return partial + rest, total
