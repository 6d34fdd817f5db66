"""JSONL source/sink: round-trip fidelity, explicit-schema read, corrupt-
line quarantine, partitioned layout."""

import json
import os

import pytest
from pyspark.sql import functions as F

from bytehub_spark.sources import DOCUMENTS_DDL, load_table, read_jsonl, write_jsonl

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, compression=None)
    back = read_jsonl(spark, path, schema=DOCUMENTS_DDL)
    assert back.schema == docs.schema
    a = docs.orderBy("doc_id").toPandas()
    b = back.orderBy("doc_id").toPandas()
    assert a.equals(b)


def test_jsonl_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_jsonl(docs, path, compression=None, partition_by=["lang"])
    assert os.path.isdir(os.path.join(path, "lang=en"))
    back = read_jsonl(
        spark, path, schema="doc_id bigint, text string, source string, n_chars bigint"
    ).where(F.col("lang") == "en")
    n_en = docs.where(F.col("lang") == "en").count()
    assert back.count() == n_en
    # partition filter must prune at the source, not post-scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    path = str(tmp_path / "mixed.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "ok"}) + "\n")
        f.write("{broken json line\n")
        f.write(json.dumps({"doc_id": 2, "text": "also ok"}) + "\n")
    df = read_jsonl(
        spark, path, schema="doc_id bigint, text string", keep_corrupt=True
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 1 and bad[0]["doc_id"] is None


def test_chunk_documents_reconstructs_text(spark):
    """Dropping each chunk's leading overlap and concatenating must
    reproduce the original text exactly; every chunk except the last is
    full-width; boundaries follow the stride."""
    from bytehub_spark.operators import curation

    texts = [
        (1, " ".join(f"w{i}" for i in range(100))),
        (2, " ".join(f"w{i}" for i in range(32))),   # exactly one chunk
        (3, " ".join(f"w{i}" for i in range(33))),   # one word spill
        (4, "short doc"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    out = curation.chunk_documents(docs, chunk_words=32, overlap=8).toPandas()
    stride = 24
    for doc_id, text in texts:
        ch = out[out["doc_id"] == doc_id].sort_values("chunk_idx")
        words = text.split(" ")
        rebuilt = []
        for _, row in ch.iterrows():
            cw = row["chunk_text"].split(" ")
            assert row["n_words"] == len(cw)
            rebuilt.extend(cw if row["chunk_idx"] == 0 else cw[8:])
            start = row["chunk_idx"] * stride
            assert cw == words[start : start + 32]
        assert rebuilt == words
    assert out[out["doc_id"] == 2]["chunk_idx"].tolist() == [0]
    assert out[out["doc_id"] == 3]["chunk_idx"].tolist() == [0, 1]


def test_group_centroids_match_numpy(spark):
    import numpy as np
    from bytehub_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    got = similarity.group_centroids(emb).toPandas()
    pdf = emb.toPandas()
    for label in sorted(pdf["label"].unique()):
        mat = np.array([np.asarray(v, dtype=np.float64)
                        for v in pdf[pdf["label"] == label]["embedding"]])
        expect = mat.mean(axis=0)
        g = got[got["label"] == label].sort_values("dim")
        assert (g["n_vectors"] == len(mat)).all()
        assert np.allclose(g["centroid_val"].to_numpy(), expect, atol=1e-9)
