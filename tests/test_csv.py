"""CSV source/sink: roundtrip, explicit-schema read, corrupt-row
quarantine, pruned ReadSchema."""

import pandas as pd
from pyspark.sql import functions as F

from bytehub_spark.sources import load_table
from bytehub_spark.sources.csv import read_csv, write_csv

SF = "/root/testdata/sf0.001"
DDL = "doc_id bigint, lang string, source string, n_chars bigint"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_csv_roundtrip_metadata(spark, tmp_path):
    """Text column excluded: CSV is for metadata tables; embedded
    newlines/quotes in document text belong in jsonl/parquet."""
    meta = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "meta_csv")
    write_csv(meta, path)
    back = read_csv(spark, path, schema=DDL)
    a = meta.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_csv_corrupt_row_quarantine(spark, tmp_path):
    src = tmp_path / "dirty"
    src.mkdir()
    (src / "part.csv").write_text(
        "doc_id,lang,source,n_chars\n"
        "1,en,src0,10\n"
        "not-a-number,xx,src1,oops\n"
        "3,de,src2,30\n"
    )
    df = read_csv(spark, str(src), schema=DDL, keep_corrupt=True)
    rows = df.toPandas()
    good = rows[rows["_corrupt_record"].isna()]
    bad = rows[rows["_corrupt_record"].notna()]
    assert sorted(good["doc_id"].dropna()) == [1, 3]
    assert len(bad) == 1 and "not-a-number" in bad["_corrupt_record"].iloc[0]


def test_csv_column_pruning(spark, tmp_path):
    meta = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "meta_csv2")
    write_csv(meta, path)
    df = read_csv(spark, path, schema=DDL, columns=["doc_id", "lang"])
    p = _plan(df)
    read_schema = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "n_chars" not in read_schema and "source" not in read_schema
    assert "doc_id" in read_schema and "lang" in read_schema
