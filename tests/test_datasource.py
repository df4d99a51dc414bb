"""The "arrows" Python DataSource (sources/datasource.py): local files,
HTTP streams, multi-URI parallel ingest, catalog (get_indirect) fan-out,
and the 21-type widening path."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from pyarrow import ipc

from arrow_experiments_spark.sources.datasource import register_arrows_source
from arrow_experiments_spark.sources.generators import gen_many_types
from arrow_experiments_spark.transport.server import DatasetRegistry, serve


@pytest.fixture(scope="module")
def small_table() -> pa.Table:
    n = 5_000
    return pa.table(
        {
            "a": pa.array(range(n), pa.int64()),
            "b": pa.array([i * 3 for i in range(n)], pa.int64()),
            "s": pa.array([f"r{i}" for i in range(n)]),
        }
    )


def _stream_bytes(table: pa.Table, chunk: int = 1000) -> bytes:
    sink = io.BytesIO()
    with ipc.new_stream(sink, table.schema) as w:
        for b in table.to_batches(max_chunksize=chunk):
            w.write_batch(b)
    return sink.getvalue()


@pytest.fixture(scope="module")
def server(small_table):
    registry = DatasetRegistry()
    registry.register_file("part1.arrows", _stream_bytes(small_table.slice(0, 2500)))
    registry.register_file("part2.arrows", _stream_bytes(small_table.slice(2500)))
    httpd = serve(registry)
    host, port = httpd.server_address
    yield f"http://{host}:{port}"
    httpd.shutdown()


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_arrows_source(spark)


def test_local_file(spark, small_table, tmp_path_factory):
    p = tmp_path_factory.mktemp("ds") / "t.arrows"
    p.write_bytes(_stream_bytes(small_table))
    df = spark.read.format("arrows").load(str(p))
    assert df.count() == small_table.num_rows
    assert df.columns == ["a", "b", "s"]
    assert df.agg({"b": "sum"}).collect()[0][0] == sum(range(5000)) * 3


def test_http_single_url(spark, server, small_table):
    df = (
        spark.read.format("arrows")
        .option("urls", f"{server}/files/part1.arrows")
        .load()
    )
    assert df.count() == 2500


def test_http_multi_url_parallel(spark, server, small_table):
    df = (
        spark.read.format("arrows")
        .option(
            "urls",
            f"{server}/files/part1.arrows,{server}/files/part2.arrows",
        )
        .load()
    )
    # one Spark partition per URI (the get_indirect parallel-fetch shape)
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == small_table.num_rows
    got = {r["a"] for r in df.select("a").collect()}
    assert got == set(range(5000))


def test_catalog_fanout(spark, server, small_table):
    df = (
        spark.read.format("arrows")
        .option("catalog_url", f"{server}/catalog")
        .load()
    )
    assert df.count() == small_table.num_rows
    assert df.rdd.getNumPartitions() == 2


def test_curated_snapshot_ingested_back_through_catalog(spark, tmp_path_factory):
    """r10 verdict #6 — close the last loop between the pipeline side and
    the transport side: the COMPOSED curation sink's survivor snapshot is
    registered as a catalog dataset, fetched back through the engine's
    own ingress (``arrows`` DataSource, catalog → per-URI-partitioned
    ingest — the get_indirect two-step), and the ingested rows must
    equal BOTH the local snapshot read and the batch funnel's own
    selection computed live from the same corpus with the registered
    stage operators (quality ∧ cluster-canonical ∧ ¬flagged — the
    pipeline_curate_end_to_end staging, materialized as rows).

    The corpus is built so the funnel's selection is UNAMBIGUOUS (no
    unequal-length near-dup pairs): the sink's greedy first-seen gate
    and the batch funnel's longest-text canonical rule then provably
    select the same documents, so row-equality is a correctness claim,
    not a coincidence.  (Where the two funnels' documented chain
    semantics diverge, the oracle-checked twin
    pipeline_curate_incremental_full pins the sink's side.)"""
    import glob
    import os
    import shutil

    import pyspark.sql.functions as F

    from arrow_experiments_spark.operators.dedup import (
        curate_corpus,
        decontaminate_flags,
        dedup_keep_canonical,
    )
    from arrow_experiments_spark.streaming.egress import (
        incremental_neardup_sink,
        read_snapshot,
        register_snapshot,
    )

    tmp = tmp_path_factory.mktemp("curate_interop")

    def filler(d: int) -> str:
        # per-doc-UNIQUE filler tokens (shared filler would make every
        # doc a near-dup of every other via the common shingles) with
        # enough stopwords to pass the sr >= 0.05 gate
        return " ".join(
            f"alpha{d}x{i} the beta{d}x{i} of gamma{d}x{i} and delta{d}x{i}"
            for i in range(12)
        )

    texts = {
        0: "the quick brown fox jumps over a lazy dog near the river " + filler(0),
        1: "a stitch in time saves nine and the early bird takes worms " + filler(1),
        2: "all that glitters is not gold but the river keeps secrets " + filler(2),
        13: "never put off until tomorrow what you can do today he said " + filler(13),
        14: "actions speak louder than words and the proof is in pudding " + filler(14),
    }
    train_rows = [
        (0, "srcA", texts[0]),
        (1, "srcA", texts[1]),
        (2, "srcB", texts[2]),
        (10, "srcB", "too short"),     # quality reject
        (11, "srcB", texts[0]),        # exact dup of 0 (same length -> same canonical)
        (13, "srcA", texts[13]),       # contaminated (shares shingles w/ eval)
        (14, "srcB", texts[14]),       # clean
    ]
    eval_rows = [(900, "src0", texts[13])]
    docs = spark.createDataFrame(
        [(i, s, t, len(t)) for i, s, t in train_rows + eval_rows],
        "doc_id bigint, source string, text string, n_chars int",
    )
    sf_dir = str(tmp / "sf")
    os.makedirs(sf_dir)
    docs.coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    # the batch funnel's selection as ROWS (the per-source counts of
    # pipeline_curate_end_to_end come from exactly this staging)
    corpus = curate_corpus(spark, sf_dir)
    qual = (
        (F.col("n_tokens") >= 20) & (F.col("dr") >= 0.4) & (F.col("sr") >= 0.05)
    )
    kept = dedup_keep_canonical(spark, sf_dir, corpus=corpus).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    flagged = decontaminate_flags(spark, sf_dir, corpus=corpus).select(
        F.col("train_id").alias("doc_id")
    )
    batch_sel = sorted(
        r["doc_id"]
        for r in corpus.filter(F.col("source") != "src0")
        .filter(qual)
        .join(kept, "doc_id")
        .join(flagged, "doc_id", "left_anti")
        .select("doc_id")
        .collect()
    )
    assert batch_sel == [0, 1, 2, 14], batch_sel

    # the composed sink over the same train docs (two micro-batches),
    # eval set = the src0 row
    train = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    staged = str(tmp / "staged")
    os.makedirs(staged)
    for i, frame in enumerate(
        (train.filter(F.col("doc_id") < 10), train.filter(F.col("doc_id") >= 10))
    ):
        wdir = str(tmp / f"w{i}")
        frame.coalesce(1).write.parquet(wdir)
        dst = os.path.join(staged, f"{i:03d}.parquet")
        shutil.copy(glob.glob(os.path.join(wdir, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
    base = str(tmp / "funnel")
    incremental_neardup_sink(
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged),
        base,
        n_buckets=8,
        eval_docs=docs.filter(F.col("source") == "src0").select("doc_id", "text"),
    )
    snap = os.path.join(base, "docs")
    local = read_snapshot(spark, snap)
    local_rows = sorted(
        (r["doc_id"], r["content_hash"], r["text"])
        for r in local.select("doc_id", "content_hash", "text").collect()
    )
    assert [r[0] for r in local_rows] == batch_sel

    # serve it, then ingest it back through the engine's own source
    registry = DatasetRegistry()
    register_snapshot(registry, "curated_full", snap)
    httpd = serve(registry)
    host, port = httpd.server_address
    try:
        ingested = (
            spark.read.format("arrows")
            .option("catalog_url", f"http://{host}:{port}/catalog")
            .load()
        )
        # one Spark partition per catalog URI — the get_indirect fan-out
        assert ingested.rdd.getNumPartitions() == 1
        got = sorted(
            (r["doc_id"], r["content_hash"], r["text"])
            for r in ingested.select("doc_id", "content_hash", "text").collect()
        )
        assert got == local_rows
        assert [r[0] for r in got] == batch_sel
    finally:
        httpd.shutdown()


def test_many_types_widening(spark, tmp_path_factory):
    """21-type fixture round-trips through the source with sidecar
    widening (unsigned → wider ints, ns → µs, dictionary → values)."""
    reader = gen_many_types(batches=3, rows_per_batch=100)
    sink = io.BytesIO()
    with ipc.new_stream(sink, reader.schema) as w:
        for b in reader:
            w.write_batch(b)
    p = tmp_path_factory.mktemp("ds21") / "many.arrows"
    p.write_bytes(sink.getvalue())

    df = spark.read.format("arrows").load(str(p))
    assert df.count() == 300
    dtypes = dict(df.dtypes)
    assert dtypes["col_4"] == "smallint"  # uint8 widened
    assert dtypes["col_7"] == "decimal(20,0)"  # uint64 widened
    assert dtypes["col_19"] == "string"  # dictionary decoded
    # values survive: col_3 is int64 passthrough
    assert df.select("col_3").distinct().count() > 1


def test_server_side_projection_pushdown(spark, small_table):
    """columns/limit options ride the URI so the SERVER prunes before any
    bytes cross the wire; schema inference sees the projected schema."""
    registry = DatasetRegistry()
    registry.register_table("part", small_table)
    httpd = serve(registry)
    host, port = httpd.server_address
    try:
        df = (
            spark.read.format("arrows")
            .option("urls", f"http://{host}:{port}/datasets/part")
            .option("columns", "a,s")
            .option("limit", "100")
            .load()
        )
        assert df.columns == ["a", "s"]
        rows = df.collect()
        assert len(rows) == 100
        assert [r.a for r in rows] == list(range(100))
    finally:
        httpd.shutdown()


def _file_bytes(table: pa.Table, chunk: int = 1000) -> bytes:
    sink = io.BytesIO()
    with ipc.new_file(sink, table.schema) as w:
        for b in table.to_batches(max_chunksize=chunk):
            w.write_batch(b)
    return sink.getvalue()


def test_ipc_file_local_splits(spark, small_table, tmp_path_factory):
    """IPC file format splits into block-range partitions."""
    p = tmp_path_factory.mktemp("dsf") / "t.arrow"
    p.write_bytes(_file_bytes(small_table))  # 5 blocks of 1000 rows
    df = spark.read.format("arrows").option("file_splits", "3").load(str(p))
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == small_table.num_rows
    assert df.agg({"b": "sum"}).collect()[0][0] == sum(range(5000)) * 3


def test_ipc_file_http_range_partitioned(spark, small_table):
    """Each task range-reads only its blocks of ONE remote .arrow file —
    distributed HTTP ingest of a single artifact (get_range as splits)."""
    registry = DatasetRegistry()
    registry.register_file("whole.arrow", _file_bytes(small_table))
    httpd = serve(registry)
    host, port = httpd.server_address
    try:
        df = (
            spark.read.format("arrows")
            .option("urls", f"http://{host}:{port}/files/whole.arrow")
            .option("file_splits", "5")
            .load()
        )
        assert df.rdd.getNumPartitions() == 5
        assert df.count() == small_table.num_rows
        got = df.orderBy("a").toPandas()
        assert list(got["a"]) == list(range(5000))
    finally:
        httpd.shutdown()


def test_ivf_index_served_through_catalog_probe_parity(spark, tmp_path):
    """r11 verdict #5: the maintained IVF index artifact is a catalog
    dataset — fetched via the get_indirect two-step (catalog -> dataset
    URI) as multipart/mixed (JSON geometry part + Arrow postings part,
    the reference's index-with-geometry response shape), a probe
    REBUILT from the fetched parts alone must agree exactly with
    ann_ivf_index_probe over the on-disk index."""
    import json
    import os
    import urllib.request

    from arrow_experiments_spark.operators.similarity import (
        _IVF_INDEX_DIR_CONF,
        _ivf_probe_score,
        _ivf_probes,
        ann_ivf_index_probe,
        ensure_ivf_index,
    )
    from arrow_experiments_spark.streaming.egress import register_ivf_index
    from arrow_experiments_spark.transport.multipart import (
        parse_multipart,
        read_arrow_part,
    )

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set(_IVF_INDEX_DIR_CONF, str(tmp_path / "idx"))
    try:
        base, k = ensure_ivf_index(spark, sf_dir)
        registry = DatasetRegistry()
        register_ivf_index(registry, "ivf_index", base)
        httpd = serve(registry)
        host, port = httpd.server_address
        try:
            # two-step: the catalog names the dataset URI
            with urllib.request.urlopen(
                f"http://{host}:{port}/catalog"
            ) as r:
                cat = json.loads(r.read())
            uris = [
                e["uri"]
                for e in cat["arrow_stream_files"]
                if "ivf_index" in e["uri"]
            ]
            assert len(uris) == 1, cat
            # multipart fetch: JSON geometry part + Arrow postings part
            with urllib.request.urlopen(uris[0] + "?multipart=1") as r:
                ctype = r.headers["Content-Type"]
                body = r.read()
            parts = parse_multipart(body, ctype)
            meta_raw = parts.get("application/json")
            assert meta_raw, parts.keys()
            meta = json.loads(meta_raw[0])
            assert meta["geometry"]["ivf_k"] == k
            assert meta["layout"]["n_buckets"] >= 1
            fetched = read_arrow_part(parts)
            assert set(fetched.column_names) >= {
                "cell", "vec_id", "embedding",
            }

            # rebuild the probe from the FETCHED parts alone: query
            # cells assigned with the JSON part's k, scoring over the
            # Arrow part's postings — no disk index touched
            idx = spark.createDataFrame(fetched.to_pandas())
            want = ann_ivf_index_probe(spark, sf_dir)
            got = _ivf_probe_score(
                idx, _ivf_probes(spark, sf_dir, meta["geometry"]["ivf_k"])
            )
            assert got.count() == want.count() > 0
            assert got.exceptAll(want).count() == 0
            assert want.exceptAll(got).count() == 0
            # postings count matches the served snapshot exactly
            local_n = (
                spark.read.parquet(
                    os.path.join(
                        base,
                        "cells",
                        open(os.path.join(base, "cells", "LATEST")).read().strip(),
                    )
                ).count()
            )
            assert fetched.num_rows == local_n
        finally:
            httpd.shutdown()
    finally:
        spark.conf.unset(_IVF_INDEX_DIR_CONF)
