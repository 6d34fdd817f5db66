"""ORC source/sink: roundtrip fidelity + the scan-level claims pinned in
the plan (predicate pushdown, column pruning, partition pruning)."""

import pandas as pd
from pyspark.sql import functions as F

from bytehub_spark.sources import load_table
from bytehub_spark.sources.orc import read_orc, write_orc

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orc_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    a = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_orc_pushdown_and_pruning(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_orc2")
    write_orc(docs, path)
    df = read_orc(spark, path, columns=["doc_id", "lang"]).where(
        F.col("doc_id") > 100
    )
    p = _plan(df)
    assert "PushedFilters" in p
    assert "GreaterThan(doc_id,100)" in p.replace(" ", "") or "doc_id" in p.split("PushedFilters", 1)[1][:120]
    read_schema = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" not in read_schema  # pruned
    assert "doc_id" in read_schema and "lang" in read_schema


def test_orc_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_orc3")
    write_orc(docs, path, partition_by=["source"])
    df = read_orc(spark, path).where(F.col("source") == "src3")
    p = _plan(df)
    assert "PartitionFilters" in p
    got = df.count()
    want = docs.where(F.col("source") == "src3").count()
    assert got == want > 0
