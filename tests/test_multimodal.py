"""Multimodal plumbing tests: binary payload + metadata schema, Arrow-batched
mapInPandas feature extraction (stubbed codec), resize shape contract."""

from __future__ import annotations

import hashlib

import pytest

from arrow_experiments_spark.functions.multimodal import (
    decode_image_stub,
    documents_as_binary,
    extract_image_features,
    resize_stub,
)
from arrow_experiments_spark.tables import table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus(spark):
    return documents_as_binary(table(spark, SF_DIR, "documents"))


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"payload")


def test_decode_stub_deterministic():
    a = decode_image_stub(b"same bytes", fake=True)
    b = decode_image_stub(b"same bytes", fake=True)
    assert a == b
    assert 64 <= a["width"] <= 255 and 1 <= a["n_channels"] <= 4


def test_corpus_schema(corpus):
    assert dict(corpus.dtypes)["payload"] == "binary"
    meta = corpus.select("meta.*").columns
    assert meta == ["mime_type", "n_chars", "lang"]


def test_extract_features_end_to_end(spark, corpus):
    feats = extract_image_features(corpus, fake=True)
    rows = feats.collect()
    docs = {r["doc_id"]: r for r in rows}
    assert len(rows) == corpus.count()
    # spot-check against a locally computed row
    sample = corpus.filter("doc_id = 0").first()
    payload = bytes(sample["payload"])
    want = decode_image_stub(payload, fake=True)
    got = docs[0]
    assert got["width"] == want["width"]
    assert got["content_sha256"] == hashlib.sha256(payload).hexdigest()
    assert got["payload_bytes"] == len(payload)


def test_resize_shape_contract(spark, corpus):
    out = resize_stub(corpus, 32, 16, fake=True)
    first = out.first()
    assert len(bytes(first["payload"])) == 32 * 16
    assert (first["width"], first["height"]) == (32, 16)
    assert out.count() == corpus.count()
