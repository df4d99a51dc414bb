"""Spark 4 Python DataSource: ``spark.read.format("arrows")``.

The engine's ingress boundary as a first-class Spark source (SURVEY.md §2.1
`scan_ipc_stream` / `source_http_arrow` / `source_http_indirect`, Phase 3):

    spark.read.format("arrows").load("/path/to/random.arrows")
    spark.read.format("arrows").option("urls", "http://a/x.arrows,http://b/y.arrows").load()
    spark.read.format("arrows").option("catalog_url", "http://host/catalog").load()

Scale design: one input partition per URI — the reference's only parallel
ingest shape (get_indirect fans one GET per listed file,
http/get_indirect/curl/client/client.sh:25-28) becomes one Spark task per
stream; each task decodes incrementally (pa.ipc.open_stream pulls batch by
batch off the socket — O(batch) memory, the reference client loop of
http/get_simple/python/client/urllib.request/client.py:31-39).  Schema is
read driver-side from the first stream's schema message only (no data
pulled).  Arrow types Spark lacks are widened per the schema sidecar
(sources/sidecar.py); batches are yielded as Arrow (zero row-wise Python).

IPC *file* format (``.arrow``, or ``ipc_format=file``) goes further: the
footer indexes every record-batch block, so ONE file splits into
``file_splits`` independent partitions and each task reads only its block
ranges — over HTTP via byte-range requests (the get_range pattern,
http/get_range/curl/client/client.sh:21-49, realized as FilePartition-
style splits instead of a driver-side reassembly).  An IPC *stream* has no
footer, which is why streams stay one-task-per-URI (SURVEY §7 Phase 3).

HTTP decompression mirrors the client matrix
(http/get_compressed/python/client/client.py:26-48): Content-Encoding
gzip/zstd/br wrap the raw stream; IPC-level codecs are transparent to the
reader.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from urllib.request import Request, urlopen

import pyarrow as pa
from pyarrow import ipc
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.pandas.types import from_arrow_schema
from pyspark.sql.types import StructType

ARROW_STREAM_CONTENT_TYPE = "application/vnd.apache.arrow.stream"


def _open_source(uri: str):
    """Open a URI (http(s) or local path) as a file-like of IPC-stream
    bytes, transparently undoing HTTP content-codings."""
    if uri.startswith(("http://", "https://")):
        req = Request(uri, headers={"Accept": ARROW_STREAM_CONTENT_TYPE})
        resp = urlopen(req)
        coding = resp.headers.get("Content-Encoding", "identity").lower()
        if coding in ("", "identity"):
            return resp
        # pyarrow names brotli differently from the HTTP token
        codec = {"br": "brotli"}.get(coding, coding)
        return pa.CompressedInputStream(resp, codec)
    return open(uri, "rb")


def _fetch_catalog_uris(catalog_url: str) -> list[str]:
    """get_indirect listing: {"arrow_stream_files": [{"uri": ...}, ...]}
    (http/get_indirect/python/server/server.py:26-44)."""
    import json

    with urlopen(catalog_url) as resp:
        doc = json.loads(resp.read())
    return [entry["uri"] for entry in doc.get("arrow_stream_files", [])]


def _apply_server_params(uri: str, options: dict) -> str:
    """Forward ``columns``/``limit``/``batch_rows`` options as query params
    on engine HTTP URIs — projection and slicing then happen server-side
    BEFORE bytes cross the wire (the scan-level pruning story applied to
    the transport boundary).  ``limit`` is per stream.  Local paths and
    static file servers are left untouched (no option ⇒ no param)."""
    if not uri.startswith(("http://", "https://")):
        return uri
    from urllib.parse import quote

    pairs = [
        f"{k}={quote(str(options[k]), safe=',')}"
        for k in ("columns", "limit", "batch_rows")
        if options.get(k)
    ]
    if not pairs:
        return uri
    sep = "&" if "?" in uri else "?"
    return uri + sep + "&".join(pairs)


def _resolve_uris(options: dict) -> list[str]:
    if options.get("catalog_url"):
        uris = _fetch_catalog_uris(options["catalog_url"])
    elif options.get("urls"):
        uris = [u.strip() for u in options["urls"].split(",") if u.strip()]
    elif options.get("path"):
        uris = [options["path"]]
    else:
        raise ValueError("arrows source needs one of: path, urls, catalog_url")
    return [_apply_server_params(u, options) for u in uris]


def _widen_batch(batch: pa.RecordBatch, target: pa.Schema) -> pa.RecordBatch:
    if batch.schema == target:
        return batch
    tbl = pa.Table.from_batches([batch])
    from arrow_experiments_spark.sources.sidecar import widen_for_spark

    widened, _ = widen_for_spark(tbl)
    out = widened.combine_chunks().to_batches()
    return out[0] if out else pa.RecordBatch.from_pylist([], schema=target)


class _HttpRangeFile(io.RawIOBase):
    """Seekable read-only file over HTTP Range requests (the get_range
    client shape, http/get_range/curl/client/client.sh:21-49, as a file
    object).  Content-codings are deliberately not requested: transfer
    compression would break byte offsets, and range-served artifacts are
    stored uncompressed (reference serves static files)."""

    def __init__(self, url: str) -> None:
        super().__init__()
        self.url = url
        with urlopen(Request(url, method="HEAD")) as resp:
            if resp.headers.get("Accept-Ranges") != "bytes":
                raise ValueError(f"{url} does not accept byte ranges")
            self._size = int(resp.headers["Content-Length"])
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        base = {io.SEEK_SET: 0, io.SEEK_CUR: self._pos, io.SEEK_END: self._size}[whence]
        self._pos = max(0, base + offset)
        return self._pos

    def tell(self) -> int:
        return self._pos

    def readinto(self, b) -> int:
        n = min(len(b), self._size - self._pos)
        if n <= 0:
            return 0
        req = Request(
            self.url, headers={"Range": f"bytes={self._pos}-{self._pos + n - 1}"}
        )
        with urlopen(req) as resp:
            # a 200 here means the server ignored Range — the bytes would
            # be from offset 0, not self._pos; corrupt reads must not pass
            if resp.status != 206:
                raise OSError(
                    f"expected 206 Partial Content from {self.url}, "
                    f"got {resp.status}"
                )
            data = resp.read()[:n]
        b[: len(data)] = data
        self._pos += len(data)
        return len(data)


def _open_seekable(uri: str):
    """Seekable source for the IPC *file* format: local open or HTTP
    ranges, buffered so footer parsing and block reads coalesce."""
    if uri.startswith(("http://", "https://")):
        return io.BufferedReader(_HttpRangeFile(uri), 1 << 20)
    return open(uri, "rb")


def _is_file_format(uri: str, options: dict) -> bool:
    fmt = options.get("ipc_format")
    if fmt:
        return fmt == "file"
    return uri.partition("?")[0].endswith(".arrow")


class ArrowsPartition(InputPartition):
    def __init__(self, uri: str, batch_lo: int = -1, batch_hi: int = -1) -> None:
        self.uri = uri
        self.batch_lo = batch_lo  # -1 ⇒ whole stream
        self.batch_hi = batch_hi


class ArrowsReader(DataSourceReader):
    def __init__(self, options: dict, arrow_schema_bytes: bytes) -> None:
        self._options = dict(options)
        self._schema_bytes = arrow_schema_bytes

    def partitions(self) -> list[InputPartition]:
        parts: list[InputPartition] = []
        n_splits = int(self._options.get("file_splits", 8))
        for uri in _resolve_uris(self._options):
            if not _is_file_format(uri, self._options):
                parts.append(ArrowsPartition(uri))
                continue
            # IPC *file* format: the footer indexes every record-batch
            # block, so the file splits into independent block ranges —
            # one Spark task per contiguous index range, each task
            # Range-reading ONLY its blocks (SURVEY §2.1 source_http_range
            # realized as FilePartition-style splits).
            src = _open_seekable(uri)
            try:
                n_batches = ipc.open_file(src).num_record_batches
            finally:
                src.close()
            k = max(1, min(n_splits, n_batches))
            step = (n_batches + k - 1) // k
            for lo in range(0, n_batches, step):
                parts.append(ArrowsPartition(uri, lo, min(lo + step, n_batches)))
        return parts

    def read(self, partition: ArrowsPartition) -> Iterator[pa.RecordBatch]:
        target = ipc.read_schema(io.BytesIO(self._schema_bytes))
        if partition.batch_lo >= 0:
            src = _open_seekable(partition.uri)
            try:
                reader = ipc.open_file(src)
                for i in range(partition.batch_lo, partition.batch_hi):
                    yield _widen_batch(reader.get_batch(i), target)
            finally:
                src.close()
            return
        src = _open_source(partition.uri)
        try:
            reader = ipc.open_stream(src)
            for batch in reader:
                yield _widen_batch(batch, target)
        finally:
            close = getattr(src, "close", None)
            if close:
                close()


class ArrowsDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(ArrowsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "arrows"

    def _widened_arrow_schema(self) -> pa.Schema:
        uri = _resolve_uris(self.options)[0]
        if _is_file_format(uri, self.options):
            src = _open_seekable(uri)
            try:
                # footer-only read: schema comes from the file footer, no
                # record-batch blocks are fetched
                raw = ipc.open_file(src).schema
            finally:
                src.close()
        else:
            src = _open_source(uri)
            try:
                # open_stream consumes only the schema message here — no
                # record batches are pulled off the wire for inference.
                raw = ipc.open_stream(src).schema
            finally:
                close = getattr(src, "close", None)
                if close:
                    close()
        from arrow_experiments_spark.sources.sidecar import _widened_type

        return pa.schema(
            [pa.field(f.name, _widened_type(f.type), f.nullable) for f in raw]
        )

    def schema(self) -> StructType:
        return from_arrow_schema(self._widened_arrow_schema())

    def reader(self, schema: StructType) -> ArrowsReader:
        widened = self._widened_arrow_schema()
        return ArrowsReader(self.options, widened.serialize().to_pybytes())


def register_arrows_source(spark) -> None:
    spark.dataSource.register(ArrowsDataSource)
