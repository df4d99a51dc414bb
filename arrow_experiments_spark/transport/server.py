"""Arrow-over-HTTP egress service (SURVEY.md §2.3 / §3.1-3.2).

Endpoints (the union of the reference's protocol patterns):
  GET  /datasets/{name}               Arrow IPC stream, negotiated
                                      compression, chunked on HTTP/1.1
                                      (get_simple + get_compressed)
  GET  /datasets/{name}?multipart=1   multipart/mixed: JSON meta + Arrow
                                      stream + footnotes (get_multipart)
  GET  /datasets/{name}?columns=a,b&limit=N&batch_rows=M
                                      serve-time projection + row slice +
                                      fixed-size re-chunking (drop_column /
                                      slice / rebatch at the egress
                                      boundary; 400 on unknown column)
  GET  /catalog                       {"arrow_stream_files": [{"uri":…}]}
                                      (get_indirect)
  GET  /files/{name}                  static .arrows artifact with
                                      Content-Length, Accept-Ranges and
                                      byte-range support (get_range)
  POST /ingest/{name}                 Arrow IPC stream body → registered
                                      dataset (post_simple; README-only in
                                      the reference, defined here)
  GET  /datasets/{name}/describe      JSON schema + endpoint URIs — the
                                      Flight GetFlightInfo analog
                                      (dissociated-ipc control plane,
                                      SURVEY.md §3.3)
  GET  /datasets/{name}/meta          dissociated metadata stream: seq-
                                      numbered Flatbuffer message metadata
                                      (SURVEY.md §2.5; transport/dissociated.py)
  GET  /datasets/{name}/body          dissociated body stream: tagged,
                                      8-byte-padded body buffers
  GET  /query?sql=...                 ad-hoc SQL through the engine's
                                      sql_runner (enabled by
                                      serve(sql_runner=...); Catalyst-
                                      planned when fronting Spark), same
                                      negotiated Arrow egress

The server is engine-agnostic: datasets are callables returning a
``pa.RecordBatchReader`` so it can front Spark DataFrames (see
sources/egress.py) or plain pyarrow data in tests.  Pre-materialize-once,
serve-many (reference server.py:552-555) is the registry's caching default.
"""

from __future__ import annotations

import io
import json
import re
import threading
from collections.abc import Callable, Iterable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

from arrow_experiments_spark.transport.ipc_stream import (
    decode_body,
    encode_ipc_chunks,
    write_chunked,
)
from arrow_experiments_spark.transport.multipart import (
    content_type as multipart_content_type,
    encode_multipart,
    make_boundary,
)
from arrow_experiments_spark.transport.negotiation import (
    ARROW_STREAM_CONTENT_TYPE,
    NotAcceptable,
    choose_strategy,
)

AVAILABLE_IPC_CODECS = ["zstd", "lz4"]
AVAILABLE_CODINGS = ["zstd", "br", "gzip"]

ReaderFactory = Callable[[], pa.RecordBatchReader]


def project_reader(
    reader: pa.RecordBatchReader,
    columns: list[str] | None = None,
    limit: int | None = None,
) -> pa.RecordBatchReader:
    """Egress-boundary projection + slice: select ``columns`` and stop
    after ``limit`` rows, streaming batch-by-batch (the reference's
    drop_column and slice ops applied at serve time; SURVEY.md §4 notes
    Accept-driven projection is a ``select``, never a planner rule).
    Raises KeyError on an unknown column, ValueError on a negative limit."""
    schema = reader.schema
    if columns is not None:
        missing = [c for c in columns if schema.get_field_index(c) < 0]
        if missing:
            raise KeyError(f"unknown column(s): {', '.join(missing)}")
        schema = pa.schema(
            [schema.field(c) for c in columns], metadata=schema.metadata
        )
    if limit is not None and limit < 0:
        raise ValueError("limit must be >= 0")

    def gen():
        remaining = limit
        for batch in reader:
            if remaining is not None and remaining <= 0:
                break
            if columns is not None:
                batch = batch.select(columns)
            if remaining is not None:
                if batch.num_rows > remaining:
                    batch = batch.slice(0, remaining)
                remaining -= batch.num_rows
            yield batch

    return pa.RecordBatchReader.from_batches(schema, gen())


def rebatch_iter(batches, n: int):
    """Re-chunk an iterable of record batches to fixed ``n``-row batches
    — the ONE rebatch implementation, shared by :func:`rebatch_reader`
    (serve boundary) and the executor-side spill writer
    (sources/arrow_ipc.py spill_dataframe).  Streams with O(n) memory:
    buffered rows never exceed one incoming batch + n."""
    buf: pa.Table | None = None
    for batch in batches:
        # fast path: stream already batched at n (the common case when
        # the spill writer and the serve boundary agree) — zero-copy
        if (buf is None or buf.num_rows == 0) and batch.num_rows == n:
            yield batch
            continue
        t = pa.Table.from_batches([batch])
        buf = t if buf is None else pa.concat_tables([buf, t])
        while buf.num_rows >= n:
            head = buf.slice(0, n).combine_chunks()
            yield from head.to_batches(max_chunksize=n)
            buf = buf.slice(n)
    if buf is not None and buf.num_rows:
        yield from buf.combine_chunks().to_batches(max_chunksize=n)


def rebatch_reader(reader: pa.RecordBatchReader, n: int) -> pa.RecordBatchReader:
    """Re-chunk a stream to fixed ``n``-row batches (the reference's
    rebatch op: arrow-commits.R:48-55 re-batches to 1024 rows before
    writing; servers pick 4096/6144).  Raises ValueError if ``n <= 0``."""
    if n <= 0:
        raise ValueError("batch_rows must be >= 1")
    return pa.RecordBatchReader.from_batches(reader.schema, rebatch_iter(reader, n))


class DatasetRegistry:
    """name → RecordBatchReader factory (+ optional metadata dict)."""

    # pre-materialized tables up to this size also cache their serialized
    # identity IPC body (see identity_body) — beyond it, stream per request
    IDENTITY_CACHE_MAX_BYTES = 1 << 30

    def __init__(self) -> None:
        self._factories: dict[str, ReaderFactory] = {}
        self._meta: dict[str, dict] = {}
        self._schemas: dict[str, pa.Schema] = {}
        self._files: dict[str, bytes] = {}
        self._tables: dict[str, pa.Table] = {}
        self._bodies: dict[str, pa.Buffer] = {}
        self._coded_bodies: dict[tuple[str, str], bytes] = {}
        self._raw: dict[str, Callable[[], "Iterable[bytes]"]] = {}
        self._artifacts: dict[str, str] = {}  # name -> encoded-cache dir
        self._lock = threading.Lock()

    def register(
        self,
        name: str,
        factory: ReaderFactory,
        meta: dict | None = None,
        schema: pa.Schema | None = None,
    ) -> None:
        """``schema`` lets /describe answer without invoking the factory —
        essential when the factory runs a full Spark job (a lazy query
        dataset must not execute just to report its columns)."""
        with self._lock:
            self._factories[name] = factory
            self._meta[name] = meta or {}
            if schema is not None:
                self._schemas[name] = schema
            else:
                self._schemas.pop(name, None)
            # re-registration (e.g. POST /ingest over an existing name)
            # must not keep serving the previous table's cached bytes
            self._tables.pop(name, None)
            self._bodies.pop(name, None)
            for k in [k for k in self._coded_bodies if k[0] == name]:
                self._coded_bodies.pop(k, None)
            self._raw.pop(name, None)
            artifact_dir = self._artifacts.pop(name, None)
        if artifact_dir is not None:
            import shutil as _shutil

            _shutil.rmtree(artifact_dir, ignore_errors=True)

    def register_table(self, name: str, table: pa.Table, meta: dict | None = None) -> None:
        def factory() -> pa.RecordBatchReader:
            return pa.RecordBatchReader.from_batches(table.schema, table.to_batches())

        self.register(name, factory, meta, schema=table.schema)
        with self._lock:
            self._tables[name] = table

    def identity_body(self, name: str) -> memoryview | None:
        """Serialized identity IPC stream for a pre-materialized table,
        built once and shared by every request — the reference's
        serve-many replay model (get_simple server.py:144) taken to its
        conclusion for the uncompressed case: concurrent handler threads
        write zero-copy slices of one immutable buffer (sendall releases
        the GIL), instead of each re-running the Python writer loop.
        None for factory datasets, oversized tables, or any request that
        projects/rebatches/compresses — those stream per request."""
        with self._lock:
            body = self._bodies.get(name)
            if body is not None:
                return memoryview(body)
            table = self._tables.get(name)
        if table is None or table.nbytes > self.IDENTITY_CACHE_MAX_BYTES:
            return None
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, table.schema) as writer:
            for batch in table.to_batches():
                writer.write_batch(batch)
        body = sink.getvalue()
        with self._lock:
            self._bodies.setdefault(name, body)
        return memoryview(body)

    IDENTITY_SLICE_BYTES = 1 << 20

    def identity_slices(self, name: str):
        """1 MiB zero-copy slices of the cached identity body, or None —
        the ONE implementation both server forms stream from."""
        body = self.identity_body(name)
        if body is None:
            return None
        step = self.IDENTITY_SLICE_BYTES
        return (body[i : i + step] for i in range(0, len(body), step))

    # Compress-once replay for pre-materialized tables: the identity body
    # is already cached whole, so each pure content coding's twin is
    # compressed ONCE and replayed — the identity-body serve-many model
    # extended to negotiated codings (what gzip_static / a CDN variant
    # cache does).  Encoder choices are the measured knees: brotli one-shot
    # level 2 matches the streaming default's ratio at ~1/34 the CPU
    # (0.593 vs 0.586 on a 19 MiB body, 0.13 s vs 4.4 s — and the
    # streaming CompressedOutputStream has no level knob at all); gzip
    # uses the same level-4 knee the streaming path does; zstd its
    # pyarrow default.
    BR_CACHE_LEVEL = 2
    CACHED_CODINGS = ("br", "gzip", "zstd")

    def encoded_body(self, name: str, coding: str) -> memoryview | None:
        """Cached ``coding``-compressed body of a pre-materialized table,
        or None (same eligibility as identity_body; compressed once,
        shared by every request)."""
        if coding not in self.CACHED_CODINGS:
            return None
        key = (name, coding)
        with self._lock:
            body = self._coded_bodies.get(key)
        if body is not None:
            return memoryview(body)
        identity = self.identity_body(name)
        if identity is None:
            return None
        if coding == "br":
            body = pa.Codec(
                "brotli", compression_level=self.BR_CACHE_LEVEL
            ).compress(identity, asbytes=True)
        elif coding == "gzip":
            import gzip as _gzip

            from arrow_experiments_spark.transport.ipc_stream import GZIP_LEVEL

            body = _gzip.compress(bytes(identity), compresslevel=GZIP_LEVEL)
        else:
            body = pa.Codec("zstd").compress(identity, asbytes=True)
        with self._lock:
            body = self._coded_bodies.setdefault(key, body)
        return memoryview(body)

    def encoded_slices(self, name: str, coding: str):
        """1 MiB slices of the cached compressed body, or None."""
        body = self.encoded_body(name, coding)
        if body is None:
            return None
        step = self.IDENTITY_SLICE_BYTES
        return (body[i : i + step] for i in range(0, len(body), step))

    # IPC buffer-compressed twins (identity+zstd / identity+lz4): the
    # encoded stream is deterministic per (table, codec) — self-describing
    # record-batch buffer compression, no per-request state — so it has
    # exactly the cacheability of the HTTP codings above (r8 verdict #2:
    # these were the two strategies the compress-once cache did NOT cover,
    # and the only per-request encodes left on pre-materialized serves).
    CACHED_IPC_CODECS = ("zstd", "lz4")

    def ipc_codec_body(self, name: str, codec: str) -> memoryview | None:
        """Cached IPC-buffer-compressed stream body of a pre-materialized
        table, or None (same eligibility as identity_body; encoded once,
        shared by every request)."""
        if codec not in self.CACHED_IPC_CODECS:
            return None
        key = (name, f"ipc+{codec}")
        with self._lock:
            body = self._coded_bodies.get(key)
            if body is not None:
                return memoryview(body)
            table = self._tables.get(name)
        if table is None or table.nbytes > self.IDENTITY_CACHE_MAX_BYTES:
            return None
        sink = pa.BufferOutputStream()
        opts = pa.ipc.IpcWriteOptions(compression=codec)
        with pa.ipc.new_stream(sink, table.schema, options=opts) as writer:
            for batch in table.to_batches():
                writer.write_batch(batch)
        body = sink.getvalue()
        with self._lock:
            body = self._coded_bodies.setdefault(key, body)
        return memoryview(body)

    def ipc_codec_slices(self, name: str, codec: str):
        """1 MiB zero-copy slices of the cached IPC-codec body, or None."""
        body = self.ipc_codec_body(name, codec)
        if body is None:
            return None
        step = self.IDENTITY_SLICE_BYTES
        return (body[i : i + step] for i in range(0, len(body), step))

    def register_raw(self, name: str, raw_factory: Callable[[], Iterable[bytes]]) -> None:
        """Supplement an existing dataset with a pre-encoded identity-IPC
        byte source (e.g. mmap'd spill artifacts spliced into one stream —
        sources/arrow_ipc.py raw_spill_stream).  Plain uncompressed GETs
        then stream these bytes zero-copy instead of re-running the
        per-batch IPC writer loop; every other request shape (projection,
        rebatch, compression, multipart, dissociated) still goes through
        the batch-reader factory.  Call AFTER register() — re-registering
        the name drops the raw source."""
        with self._lock:
            if name not in self._factories:
                raise KeyError(f"register() {name!r} before register_raw()")
            self._raw[name] = raw_factory

    def identity_stream(self, name: str):
        """Zero-copy identity-IPC byte chunks for a plain request, or
        None: the cached in-memory body for pre-materialized tables, else
        a registered raw (file-backed) source.  The ONE lookup both
        server forms use."""
        slices = self.identity_slices(name)
        if slices is not None:
            return slices
        factory = self._raw.get(name)
        return factory() if factory is not None else None

    def register_file(self, name: str, data: bytes) -> None:
        """Static .arrows artifact served with range support."""
        with self._lock:
            self._files[name] = data

    # ---- encoded-artifact replay (disk-backed encode-once) ---------------
    #
    # The compress-once caches above hold bodies in memory and only for
    # pre-materialized tables under the cap.  Factory datasets at spill
    # scale (the 42M trading serve: ~1 GB dict-encoded + zstd) get the
    # DISK seat of the same pattern: the first request's encoded bytes
    # tee to a cache file (atomic rename on completion), every later
    # request replays the file — nginx's gzip_static, or the reference's
    # pre-materialize-then-replay model applied to the encoded form.
    # OPT-IN ONLY: a factory may be non-deterministic (live query, stream
    # snapshot), so nothing is cached unless the caller asserts
    # determinism via enable_encoded_artifact().

    ARTIFACT_SLICE_BYTES = 1 << 20

    def enable_encoded_artifact(self, name: str, cache_dir: str | None = None) -> str:
        """Opt ``name`` into encoded-artifact replay; the caller asserts
        the factory's encoded output is deterministic.  Returns the cache
        dir (caller-owned when passed, else a per-registry tempdir the
        caller may remove).  Call AFTER register()."""
        import os
        import tempfile

        with self._lock:
            if name not in self._factories:
                raise KeyError(f"register() {name!r} before enabling artifacts")
            if cache_dir is None:
                cache_dir = tempfile.mkdtemp(prefix=f"aes_artifact_{name}_")
            else:
                os.makedirs(cache_dir, exist_ok=True)
            self._artifacts[name] = cache_dir
        return cache_dir

    def _artifact_path(self, name: str, strategy: str) -> str | None:
        import os
        import re as _re

        d = self._artifacts.get(name)
        if d is None:
            return None
        return os.path.join(d, _re.sub(r"[^A-Za-z0-9+_-]", "_", strategy) + ".bin")

    def encoded_artifact_stream(self, name: str, strategy: str):
        """mmap'd 1 MiB slices of a completed encoded artifact, or None."""
        import mmap
        import os

        path = self._artifact_path(name, strategy)
        if path is None or not os.path.exists(path):
            return None

        def slices():
            with open(path, "rb") as fh:
                size = os.fstat(fh.fileno()).st_size
                if size == 0:
                    return
                with mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ) as mm:
                    step = self.ARTIFACT_SLICE_BYTES
                    for i in range(0, size, step):
                        yield mm[i : i + step]

        return slices()

    def tee_encoded(self, name: str, strategy: str, chunks):
        """Pass ``chunks`` through while writing them to the artifact
        cache; the file lands atomically only when the stream completes
        (a broken/aborted encode leaves no artifact).  No-op passthrough
        for datasets not opted in."""
        import os
        import uuid

        path = self._artifact_path(name, strategy)
        if path is None:
            return chunks

        def tee():
            tmp = f"{path}.tmp{uuid.uuid4().hex[:8]}"
            ok = False
            try:
                with open(tmp, "wb") as fh:
                    for chunk in chunks:
                        fh.write(chunk)
                        yield chunk
                ok = True
            finally:
                if ok:
                    os.replace(tmp, path)
                else:
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass

        return tee()

    def reader(self, name: str) -> pa.RecordBatchReader | None:
        factory = self._factories.get(name)
        return factory() if factory else None

    def schema(self, name: str) -> pa.Schema | None:
        """Schema without side effects where known; falls back to opening
        the reader (which may execute the underlying query)."""
        if name in self._schemas:
            return self._schemas[name]
        reader = self.reader(name)
        return reader.schema if reader is not None else None

    def meta(self, name: str) -> dict:
        return self._meta.get(name, {})

    def names(self) -> list[str]:
        return sorted(self._factories)

    def file(self, name: str) -> bytes | None:
        return self._files.get(name)

    def file_names(self) -> list[str]:
        return sorted(self._files)


_RANGE_RE = re.compile(r"bytes=(\d*)-(\d*)$")


def resolve_range(header: str, total: int) -> tuple[int, int] | None:
    """Parse a single-range ``Range`` header against a ``total``-byte body.
    Returns (start, end) inclusive, or None for an unsatisfiable/malformed
    range (caller answers 416 with ``Content-Range: bytes */total``).
    Shared by the threaded and ASGI server forms."""
    m = _RANGE_RE.match(header.strip())
    if not m:
        return None
    start_s, end_s = m.groups()
    if start_s:
        start = int(start_s)
        end = int(end_s) if end_s else total - 1
    else:  # suffix range: last N bytes
        start = max(total - int(end_s), 0)
        end = total - 1
    end = min(end, total - 1)
    if start > end or start >= total:
        return None
    return start, end


class ArrowHttpHandler(BaseHTTPRequestHandler):
    registry: DatasetRegistry  # set by serve()
    enable_cors: bool = False
    # optional ad-hoc SQL entry point: str -> RecordBatchReader (set by
    # serve(sql_runner=...); None disables GET /query)
    sql_runner = None

    # ---- helpers ----------------------------------------------------------

    def _cors(self) -> None:
        if self.enable_cors:
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "GET, POST")
            self.send_header("Access-Control-Allow-Headers", "Content-Type")

    def _send_json(self, obj, status: int = 200) -> None:
        body = json.dumps(obj).encode()
        self.send_response(status)
        self._cors()
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_406(self, why: str) -> None:
        msg = f"Not Acceptable: {why}\n"
        for h in ("Accept", "Accept-Encoding"):
            v = self.headers.get(h)
            if v is not None:
                msg += f"`{h}` header was {v!r}.\n"
        body = msg.encode()
        self.send_response(406, "Not Acceptable")
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_404(self) -> None:
        self.send_response(404)
        self.send_header("Content-Length", "0")
        self.end_headers()

    # ---- GET routing ------------------------------------------------------

    def do_GET(self) -> None:  # noqa: N802 (stdlib API)
        path, _, query = self.path.partition("?")
        params = dict(p.split("=", 1) if "=" in p else (p, "1") for p in query.split("&") if p)
        if path == "/query":
            self._get_query(params)
        elif path == "/catalog":
            self._get_catalog()
        elif path.startswith("/datasets/") and path.endswith("/describe"):
            self._get_describe(path[len("/datasets/") : -len("/describe")])
        elif path.startswith("/datasets/") and path.endswith(("/meta", "/body")):
            name, _, which = path[len("/datasets/") :].rpartition("/")
            self._get_dissociated(name, which, params)
        elif path.startswith("/datasets/"):
            self._get_dataset(path[len("/datasets/") :], params)
        elif path.startswith("/files/"):
            self._get_file(path[len("/files/") :])
        else:
            self._send_404()

    def _get_catalog(self) -> None:
        host = self.headers.get("Host", "localhost")
        listing = {
            "arrow_stream_files": [
                {"uri": f"http://{host}/files/{n}"} for n in self.registry.file_names()
            ]
            + [{"uri": f"http://{host}/datasets/{n}"} for n in self.registry.names()]
        }
        self._send_json(listing)

    def _get_describe(self, name: str) -> None:
        schema = self.registry.schema(name)
        if schema is None:
            self._send_404()
            return
        host = self.headers.get("Host", "localhost")
        self._send_json(
            {
                "name": name,
                "schema": [
                    {"name": f.name, "type": str(f.type), "nullable": f.nullable}
                    for f in schema
                ],
                # FlightInfo carries one endpoint with *two* locations (ctrl
                # + data URI) — cudf-flight-server.cc:349-371; ours are the
                # single-stream URI plus the dissociated meta/body pair.
                # the meta/body URIs carry the want_data ident the client
                # must echo — the handshake of the dissociated protocol
                # (client sends the ident, server probes it to pick its
                # stream role: cudf-flight-server.cc:115-135, client :66-74)
                "endpoints": [
                    {"uri": f"http://{host}/datasets/{name}"},
                    {
                        "meta_uri": f"http://{host}/datasets/{name}/meta?want_data={name}",
                        "body_uri": f"http://{host}/datasets/{name}/body?want_data={name}",
                    },
                ],
                "metadata": self.registry.meta(name),
                # serve-time query params the dataset endpoint accepts
                "params": ["columns", "limit", "batch_rows", "multipart"],
            }
        )

    def _get_dissociated(self, name: str, which: str, params: dict[str, str]) -> None:
        from arrow_experiments_spark.transport.dissociated import (
            encode_body_stream,
            encode_meta_stream,
        )

        reader = self.registry.reader(name)
        if reader is None:
            self._send_404()
            return
        # want_data handshake: the client must echo the dataset ident from
        # the describe endpoint before either stream is served (the
        # reference's tag probe, cudf-flight-server.cc:115-135).
        if params.get("want_data") != name:
            self._send_json(
                {
                    "error": "want_data handshake required",
                    "expected": name,
                    "got": params.get("want_data"),
                },
                status=400,
            )
            return
        encode = encode_meta_stream if which == "meta" else encode_body_stream
        self.protocol_version = "HTTP/1.1"
        self.send_response(200)
        self._cors()
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        write_chunked(self.wfile, encode(reader))

    def _get_query(self, params: dict[str, str]) -> None:
        """Ad-hoc SQL entry point (SURVEY.md §7 Phase 1): ``GET
        /query?sql=...`` plans the statement through the engine's
        ``sql_runner`` (Catalyst, when the server fronts a SparkSession)
        and streams the result with the same negotiated Arrow egress as
        any dataset.  404 when the server was started without a runner;
        400 with the planner's message on bad SQL."""
        if self.sql_runner is None:
            self._send_404()
            return
        from urllib.parse import unquote_plus

        sql = unquote_plus(params.get("sql", "")).strip()
        if not sql:
            self._send_json({"error": "missing sql parameter"}, status=400)
            return
        try:
            reader = self.sql_runner(sql)
        except Exception as e:  # noqa: BLE001 — planner errors → 400
            self._send_json({"error": str(e).split("\n")[0][:500]}, status=400)
            return
        self._stream_negotiated(reader)

    def _stream_negotiated(self, reader: pa.RecordBatchReader, tee=None) -> None:
        """Negotiate a strategy and stream ``reader`` — the shared tail of
        the dataset and ad-hoc query paths.  ``tee``, when given, wraps
        the encoded chunk stream (the encoded-artifact cache fill)."""
        http10 = self.request_version == "HTTP/1.0"
        self.protocol_version = "HTTP/1.0" if http10 else "HTTP/1.1"
        default = "identity" if http10 else "gzip"
        try:
            strategy = choose_strategy(
                self.headers, AVAILABLE_IPC_CODECS, AVAILABLE_CODINGS, default
            )
        except NotAcceptable as e:
            self._send_406(str(e))
            return
        if strategy is None:
            self._send_406("no available coding is acceptable")
            return
        self.send_response(200)
        self._cors()
        if strategy.startswith("identity+"):
            self.send_header(
                "Content-Type", f"{ARROW_STREAM_CONTENT_TYPE}; codecs={strategy[9:]}"
            )
        else:
            self.send_header("Content-Type", ARROW_STREAM_CONTENT_TYPE)
        self.send_header("Content-Disposition", 'attachment; filename="output.arrows"')
        if not strategy.startswith("identity"):
            self.send_header("Content-Encoding", strategy)
        chunks = encode_ipc_chunks(reader.schema, reader, strategy)
        if tee is not None:
            chunks = tee(chunks)
        if http10:
            self.end_headers()
            for chunk in chunks:
                self.wfile.write(chunk)
        else:
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            write_chunked(self.wfile, chunks)

    def _get_dataset(self, name: str, params: dict[str, str]) -> None:
        reader = self.registry.reader(name)
        if reader is None:
            self._send_404()
            return

        # ?columns=a,b&limit=N&batch_rows=M — serve-time projection, slice,
        # and re-chunking (applies to both plain-stream and multipart paths)
        if "columns" in params or "limit" in params or "batch_rows" in params:
            from urllib.parse import unquote

            try:
                cols = (
                    [unquote(c) for c in params["columns"].split(",") if c]
                    if "columns" in params
                    else None
                )
                limit = int(params["limit"]) if "limit" in params else None
                if cols is not None or limit is not None:
                    reader = project_reader(reader, cols, limit)
                if "batch_rows" in params:
                    reader = rebatch_reader(reader, int(params["batch_rows"]))
            except (KeyError, ValueError) as e:
                self._send_json({"error": str(e)}, status=400)
                return

        if params.get("multipart"):
            self._send_multipart(name, reader)
            return

        http10 = self.request_version == "HTTP/1.0"
        self.protocol_version = "HTTP/1.0" if http10 else "HTTP/1.1"
        default = "identity" if http10 else "gzip"
        try:
            strategy = choose_strategy(
                self.headers, AVAILABLE_IPC_CODECS, AVAILABLE_CODINGS, default
            )
        except NotAcceptable as e:
            self._send_406(str(e))
            return
        if strategy is None:
            self._send_406("no available coding is acceptable")
            return

        plain = not any(
            k in params for k in ("columns", "limit", "batch_rows", "multipart")
        )
        if strategy == "identity" and plain:
            slices = self.registry.identity_stream(name)
            if slices is not None:
                self.send_response(200)
                self._cors()
                self.send_header("Content-Type", ARROW_STREAM_CONTENT_TYPE)
                self.send_header(
                    "Content-Disposition", 'attachment; filename="output.arrows"'
                )
                if http10:
                    self.end_headers()
                    for sl in slices:
                        self.wfile.write(sl)
                else:
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    write_chunked(self.wfile, slices)
                return

        if strategy in DatasetRegistry.CACHED_CODINGS and plain:
            # compress-once replay of the cached body (see encoded_body)
            slices = self.registry.encoded_slices(name, strategy)
            if slices is not None:
                self.send_response(200)
                self._cors()
                self.send_header("Content-Type", ARROW_STREAM_CONTENT_TYPE)
                self.send_header(
                    "Content-Disposition", 'attachment; filename="output.arrows"'
                )
                self.send_header("Content-Encoding", strategy)
                if http10:
                    self.end_headers()
                    for sl in slices:
                        self.wfile.write(sl)
                else:
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    write_chunked(self.wfile, slices)
                return

        if strategy.startswith("identity+") and plain:
            # encode-once replay of the IPC-buffer-compressed body — no
            # Content-Encoding header (the compression is inside the IPC
            # stream, declared by the codecs content-type parameter)
            codec = strategy[9:]
            slices = self.registry.ipc_codec_slices(name, codec)
            if slices is not None:
                self.send_response(200)
                self._cors()
                self.send_header(
                    "Content-Type",
                    f"{ARROW_STREAM_CONTENT_TYPE}; codecs={codec}",
                )
                self.send_header(
                    "Content-Disposition", 'attachment; filename="output.arrows"'
                )
                if http10:
                    self.end_headers()
                    for sl in slices:
                        self.wfile.write(sl)
                else:
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    write_chunked(self.wfile, slices)
                return

        if plain and strategy != "identity":
            # disk-backed encode-once replay for opted-in factory datasets
            # (enable_encoded_artifact): replay the completed artifact, or
            # tee this encode into the cache while serving it
            slices = self.registry.encoded_artifact_stream(name, strategy)
            if slices is not None:
                self.send_response(200)
                self._cors()
                if strategy.startswith("identity+"):
                    self.send_header(
                        "Content-Type",
                        f"{ARROW_STREAM_CONTENT_TYPE}; codecs={strategy[9:]}",
                    )
                else:
                    self.send_header("Content-Type", ARROW_STREAM_CONTENT_TYPE)
                    self.send_header("Content-Encoding", strategy)
                self.send_header(
                    "Content-Disposition", 'attachment; filename="output.arrows"'
                )
                if http10:
                    self.end_headers()
                    for sl in slices:
                        self.wfile.write(sl)
                else:
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    write_chunked(self.wfile, slices)
                return
            self._stream_negotiated(
                reader, tee=lambda chunks: self.registry.tee_encoded(
                    name, strategy, chunks
                )
            )
            return

        self._stream_negotiated(reader)

    def _send_multipart(self, name: str, reader: pa.RecordBatchReader) -> None:
        boundary = make_boundary()
        self.protocol_version = "HTTP/1.1"
        self.send_response(200)
        self._cors()
        self.send_header("Content-Type", multipart_content_type(boundary))
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        meta = {"name": name, **self.registry.meta(name)}
        write_chunked(
            self.wfile, encode_multipart(boundary, meta, reader.schema, reader)
        )

    def _get_file(self, name: str) -> None:
        data = self.registry.file(name)
        if data is None:
            self._send_404()
            return
        rng = self.headers.get("Range")
        self.protocol_version = "HTTP/1.1"
        if rng:
            resolved = resolve_range(rng, len(data))
            if resolved is None:
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{len(data)}")
                self.end_headers()
                return
            start, end = resolved
            part = data[start : end + 1]
            self.send_response(206)
            self.send_header("Content-Type", ARROW_STREAM_CONTENT_TYPE)
            self.send_header("Content-Range", f"bytes {start}-{end}/{len(data)}")
            self.send_header("Content-Length", str(len(part)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            self.wfile.write(part)
        else:
            self.send_response(200)
            self.send_header("Content-Type", ARROW_STREAM_CONTENT_TYPE)
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            self.wfile.write(data)

    # ---- HEAD / POST ------------------------------------------------------

    def do_HEAD(self) -> None:  # noqa: N802
        path = self.path.partition("?")[0]
        if path.startswith("/files/"):
            data = self.registry.file(path[len("/files/") :])
            if data is None:
                self._send_404()
                return
            self.send_response(200)
            self.send_header("Content-Type", ARROW_STREAM_CONTENT_TYPE)
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
        else:
            self._send_404()

    def do_POST(self) -> None:  # noqa: N802
        path = self.path.partition("?")[0]
        if not path.startswith("/ingest/"):
            self._send_404()
            return
        name = path[len("/ingest/") :]
        length = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "")
        meta: dict = {}
        try:
            if ctype.lower().startswith("multipart/form-data"):
                # post_multipart (http/post_multipart/README.md:22): JSON
                # metadata part + Arrow IPC stream part in one form body.
                from arrow_experiments_spark.transport.multipart import (
                    parse_multipart,
                    read_arrow_part,
                )

                parts = parse_multipart(body, ctype)
                if "application/json" in parts:
                    meta = json.loads(parts["application/json"][0])
                    if not isinstance(meta, dict):
                        raise ValueError("metadata part must be a JSON object")
                tbl = read_arrow_part(parts)
            else:
                # post_simple: the body IS the (optionally content-coded)
                # Arrow IPC stream.
                coding = self.headers.get("Content-Encoding", "identity")
                reader = decode_body(io.BytesIO(body), coding)
                tbl = reader.read_all()
        except Exception as e:  # malformed stream / malformed parts
            self._send_json({"error": str(e)}, status=400)
            return
        self.registry.register_table(name, tbl, meta=meta or None)
        self._send_json(
            {
                "name": name,
                "rows": tbl.num_rows,
                "columns": tbl.num_columns,
                "metadata": meta,
            }
        )

    def log_message(self, fmt: str, *args) -> None:  # quiet by default
        pass


def serve(
    registry: DatasetRegistry,
    host: str = "127.0.0.1",
    port: int = 0,
    cors: bool = False,
    sql_runner=None,
) -> ThreadingHTTPServer:
    """Start the server on a background thread; returns the server object
    (``server_address`` carries the bound port when port=0).  With
    ``sql_runner`` (str -> RecordBatchReader) the server also answers
    ``GET /query?sql=...``."""
    handler = type(
        "BoundArrowHttpHandler",
        (ArrowHttpHandler,),
        {"registry": registry, "enable_cors": cors, "sql_runner": staticmethod(sql_runner) if sql_runner else None},
    )
    httpd = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd
