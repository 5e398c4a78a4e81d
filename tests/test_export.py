"""Shard export + integrity manifest: roundtrip fidelity, deterministic
bytes, tamper/truncation/missing-file detection, immutability."""

from __future__ import annotations

import glob
import json
import os

import pytest

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.sources import export as X

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long, shard int"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def test_export_roundtrip_and_manifest(spark, tmp_path):
    path = str(tmp_path / "exp")
    X.export_jsonl_shards(_docs(spark), path, "doc_id", n_shards=8)

    m = X.read_manifest(path)
    assert m["format"] == "jsonl-shards-v1"
    assert m["n_shards"] == 8 and m["n_files"] == 8
    assert m["n_rows"] == 500
    assert all(len(f["sha256"]) == 64 for f in m["files"])

    back = X.read_jsonl_shards(spark, path, SCHEMA)
    a = sorted(tuple(r) for r in back.drop("shard").collect())
    b = sorted(tuple(r) for r in _docs(spark).collect())
    assert a == b
    assert X.verify_export(spark, path) == []


def test_export_bytes_are_deterministic(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    X.export_jsonl_shards(_docs(spark), p1, "doc_id", n_shards=4)
    X.export_jsonl_shards(_docs(spark), p2, "doc_id", n_shards=4)
    h1 = {f["shard"]: f["sha256"] for f in X.read_manifest(p1)["files"]}
    h2 = {f["shard"]: f["sha256"] for f in X.read_manifest(p2)["files"]}
    assert h1 == h2  # identical bytes per shard, not just identical rows
    # a different salt is a different permutation -> different bytes
    p3 = str(tmp_path / "c")
    X.export_jsonl_shards(_docs(spark), p3, "doc_id", n_shards=4, salt=1)
    h3 = {f["shard"]: f["sha256"] for f in X.read_manifest(p3)["files"]}
    assert h3 != h1


def test_verify_detects_tamper_and_loss(spark, tmp_path):
    path = str(tmp_path / "exp")
    X.export_jsonl_shards(_docs(spark), path, "doc_id", n_shards=4)
    victim = sorted(glob.glob(os.path.join(path, "shard=2", "part-*")))[0]

    with open(victim, "ab") as f:  # tamper: append bytes
        f.write(b'{"doc_id":999999}\n')
    problems = X.verify_export(spark, path, raise_on_diff=False)
    assert any("sha256" in p for p in problems)
    assert any("n_bytes" in p or "n_rows" in p for p in problems)

    os.remove(victim)  # loss: whole shard file gone
    problems = X.verify_export(spark, path, raise_on_diff=False)
    assert any(p.startswith("missing file") for p in problems)
    with pytest.raises(ValueError, match="integrity"):
        X.verify_export(spark, path)


def test_export_path_is_immutable(spark, tmp_path):
    path = str(tmp_path / "exp")
    X.export_jsonl_shards(_docs(spark), path, "doc_id", n_shards=2)
    with pytest.raises(FileExistsError):
        X.export_jsonl_shards(_docs(spark), path, "doc_id", n_shards=2)


def test_export_roundtrips_hostile_content(spark, tmp_path):
    """Embedded newlines, quotes, unicode, and NULLs survive the JSONL
    shard encoding (the writer escapes; read-back with explicit schema
    is the identity)."""
    hostile = spark.createDataFrame(
        [
            (1, 'line1\nline2\t"quoted", comma', "en"),
            (2, None, None),
            (3, "emoji \U0001f600 and ünïcode", "fr"),
            (4, "", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "exp")
    X.export_jsonl_shards(hostile, path, "doc_id", n_shards=2)
    back = X.read_jsonl_shards(
        spark, path, "doc_id long, text string, lang string, shard int"
    )
    a = sorted(tuple(r) for r in back.drop("shard").collect())
    b = sorted(tuple(r) for r in hostile.collect())
    assert a == b
    assert X.verify_export(spark, path) == []
