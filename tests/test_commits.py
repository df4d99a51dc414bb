"""Commit-log fixture tests (arrow-commits analog, SURVEY.md §2.1):
scan git log → drop author / UTC time / first-line message → 1024-row
.arrows + JSONL mirror, with the reference's round-trip identity check
(data/arrow-commits/arrow-commits.R:26-77)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from arrow_experiments_spark.sources.commits import (
    COMMITS_BATCH_ROWS,
    build_commits_table,
    scan_git_log,
    write_commits_fixture,
)

REPO = "/root/repo"


@pytest.fixture(scope="module")
def commits_df(spark):
    df = build_commits_table(spark, REPO)
    df.persist()
    yield df
    df.unpersist()


def test_scan_git_log_raw_schema():
    t = scan_git_log(REPO, max_count=5)
    assert t.column_names == ["commit", "author", "time", "files", "merge", "message"]
    assert 0 < t.num_rows <= 5
    assert t.schema.field("files").type == pa.int32()
    # every sha is 40 hex chars; files counts are non-negative
    assert all(len(s.as_py()) == 40 for s in t["commit"])
    assert all(f.as_py() >= 0 for f in t["files"])


def test_published_table_shape(commits_df):
    # reference schema: commit/time/files/merge/message — author dropped
    assert commits_df.columns == ["commit", "time", "files", "merge", "message"]
    row = commits_df.first()
    assert "\n" not in row["message"]  # first-line only (arrow-commits.R:37-42)
    types = dict(commits_df.dtypes)
    assert types["time"] == "timestamp"
    assert types["merge"] == "boolean"


def test_fixture_roundtrip_and_jsonl(commits_df, tmp_path):
    out = write_commits_fixture(commits_df, str(tmp_path))
    n = commits_df.count()
    assert out["rows"] == n
    with open(out["arrows"], "rb") as f:
        reader = pa.ipc.open_stream(f)
        batches = list(reader)
    assert sum(b.num_rows for b in batches) == n
    assert all(b.num_rows <= COMMITS_BATCH_ROWS for b in batches)
    docs = [json.loads(ln) for ln in open(out["jsonl"], encoding="utf-8")]
    assert len(docs) == n
    shas = {b["commit"] for b in docs}
    assert {r["commit"] for r in commits_df.select("commit").collect()} == shas


def test_fixture_schema_metadata_stripped(commits_df, tmp_path):
    out = write_commits_fixture(commits_df, str(tmp_path), stem="clean")
    with open(out["arrows"], "rb") as f:
        schema = pa.ipc.open_stream(f).schema
    assert schema.metadata in (None, {})
    assert all(f.metadata in (None, {}) for f in schema)
