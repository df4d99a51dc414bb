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


class ArrowsPartition(InputPartition):
    def __init__(self, uri: str) -> None:
        self.uri = uri


class ArrowsReader(DataSourceReader):
    def __init__(self, options: dict, arrow_schema_bytes: bytes) -> None:
        self._options = dict(options)
        self._schema_bytes = arrow_schema_bytes

    def partitions(self) -> list[InputPartition]:
        return [ArrowsPartition(u) for u in _resolve_uris(self._options)]

    def read(self, partition: ArrowsPartition) -> Iterator[pa.RecordBatch]:
        target = ipc.read_schema(io.BytesIO(self._schema_bytes))
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
