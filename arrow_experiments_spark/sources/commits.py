"""Commit-log fixture builder — the arrow-commits analog (SURVEY.md §2.1
``scan_git_log`` + ``sink_jsonl``).

The reference builds a 5-column commit table from a git repository and
publishes it as an IPC stream plus a JSONL mirror
(data/arrow-commits/arrow-commits.R:26-77):

  - scan ``git log``                          (arrow-commits.R:26-29)
  - drop the author column                    (:31)
  - normalize timestamps to UTC               (:34)
  - keep only the first line of each message  (:37-42)
  - re-batch to 1024-row record batches       (:49-55)
  - write the IPC stream                      (:57-63)
  - read it back and assert identical()       (:66)
  - mirror to JSONL "for comparison/testing"  (:68-77)

Schema (data/arrow-commits/README.md:59-65):
  commit: string, time: timestamp[us, UTC], files: int32, merge: bool,
  message: string

Scanning ``git log`` is inherently a driver-side fixture step (the reference
runs it in R on one machine); the *transform chain* — drop / tz-normalize /
first-line — runs as Spark DataFrame ops so it is the same code path a
distributed table would take.
"""

from __future__ import annotations

import subprocess

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMMITS_BATCH_ROWS = 1024  # arrow-commits.R:49

# record separator / unit separator keep parsing robust against any
# message content except an embedded \x1e, which git never emits in %H/%cI.
_RS, _US = "\x1e", "\x1f"


def scan_git_log(repo: str, max_count: int | None = None) -> pa.Table:
    """Raw commit table from ``git log``: commit, author, time (ISO string
    with offset), files (int32 changed-file count), merge (bool), message
    (full body).  The author column is present so the published pipeline
    can *drop* it, as the reference does (arrow-commits.R:31)."""
    # A trailing unit separator AFTER %B delimits the body explicitly, so
    # multi-paragraph commit messages (which contain blank lines) cannot
    # bleed into the --name-only changed-file block.
    cmd = [
        "git",
        "-C",
        repo,
        "log",
        f"--pretty=format:{_RS}%H{_US}%an{_US}%cI{_US}%P{_US}%B{_US}",
        "--name-only",
    ]
    if max_count:
        cmd.insert(4, f"--max-count={max_count}")
    out = subprocess.run(cmd, capture_output=True, check=True).stdout.decode(
        "utf-8", errors="replace"
    )
    commits, authors, times, files, merges, messages = [], [], [], [], [], []
    for rec in out.split(_RS):
        if not rec.strip():
            continue
        sha, author, iso, parents, body, file_block = rec.split(_US, 5)
        commits.append(sha)
        authors.append(author)
        times.append(iso)
        files.append(sum(1 for ln in file_block.splitlines() if ln.strip()))
        merges.append(len(parents.split()) > 1)
        messages.append(body.rstrip("\n"))
    return pa.table(
        {
            "commit": pa.array(commits, pa.string()),
            "author": pa.array(authors, pa.string()),
            "time": pa.array(times, pa.string()),
            "files": pa.array(files, pa.int32()),
            "merge": pa.array(merges, pa.bool_()),
            "message": pa.array(messages, pa.string()),
        }
    )


def build_commits_table(spark: SparkSession, repo: str) -> DataFrame:
    """The published commit table: drop author, UTC-normalize time,
    first-line-of-message — the reference's exact transform chain
    (arrow-commits.R:31-42) as Spark DataFrame ops."""
    raw = spark.createDataFrame(scan_git_log(repo))
    return (
        raw.drop("author")
        # %cI carries a UTC offset; to_timestamp resolves it to a UTC
        # instant under the session's UTC timezone (arrow-commits.R:34).
        .withColumn("time", F.to_timestamp("time", "yyyy-MM-dd'T'HH:mm:ssXXX"))
        .withColumn("message", F.split(F.col("message"), "\n+").getItem(0))
        .select("commit", "time", "files", "merge", "message")
    )


def write_commits_fixture(df: DataFrame, out_dir: str, stem: str = "commits") -> dict:
    """Publish the fixture: ``<stem>.arrows`` in 1024-row batches plus the
    JSONL mirror, with the reference's read-back identity check
    (arrow-commits.R:57-77).  Returns {"arrows": path, "jsonl": path,
    "rows": n}."""
    from .arrow_ipc import df_to_reader, strip_schema_metadata

    arrows = f"{out_dir}/{stem}.arrows"
    jsonl = f"{out_dir}/{stem}.jsonl"
    # strip implementation metadata before writing (arrow-commits.R:44-46)
    reader = strip_schema_metadata(df_to_reader(df, COMMITS_BATCH_ROWS))
    n = 0
    with open(arrows, "wb") as f, pa.ipc.new_stream(f, reader.schema) as writer:
        for batch in reader:
            writer.write_batch(batch)
            n += batch.num_rows
    with open(arrows, "rb") as f:
        back = pa.ipc.open_stream(f).read_all()
    expect = df.toArrow()
    if not back.cast(expect.schema).equals(expect.combine_chunks()):
        raise AssertionError("commits fixture round-trip mismatch")
    # JSONL mirror (arrow-commits.R:68-77): ISO-8601 time, one doc per row.
    with open(jsonl, "w", encoding="utf-8") as f:
        for line in (
            df.select(
                F.to_json(
                    F.struct("commit", "time", "files", "merge", "message"),
                    {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss'Z'"},
                ).alias("j")
            )
            .toLocalIterator()
        ):
            f.write(line["j"] + "\n")
    return {"arrows": arrows, "jsonl": jsonl, "rows": n}
