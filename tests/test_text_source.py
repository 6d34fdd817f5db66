"""Raw-text source/sink: line splitting, delimiter-separated records,
file-per-doc ingest, and write roundtrips."""

import gzip
import os

from pyspark.sql import functions as F

from bytehub_spark.sources import read_text_docs, read_text_lines, write_text


def test_lines_roundtrip_and_custom_sep(spark, tmp_path):
    src = tmp_path / "lines"
    os.makedirs(src)
    (src / "a.txt").write_text("one\ntwo\nthree")
    df = read_text_lines(spark, str(src))
    assert sorted(r.value for r in df.collect()) == ["one", "three", "two"]

    # blank-line-separated documents via lineSep
    (tmp_path / "docs.txt").write_text("doc one line\n\ndoc two\n\ndoc three")
    d2 = read_text_lines(spark, str(tmp_path / "docs.txt"), line_sep="\n\n")
    assert sorted(r.value for r in d2.collect()) == [
        "doc one line",
        "doc three",
        "doc two",
    ]


def test_wholetext_docs_with_provenance(spark, tmp_path):
    src = tmp_path / "corpus"
    os.makedirs(src)
    (src / "x.txt").write_text("alpha\nbeta")
    (src / "y.txt").write_text("gamma")
    got = {
        os.path.basename(r.file): r.text
        for r in read_text_docs(spark, str(src)).collect()
    }
    assert got == {"x.txt": "alpha\nbeta", "y.txt": "gamma"}


def test_write_text_roundtrip_gzip(spark, tmp_path):
    df = spark.range(5).select(F.concat(F.lit("row"), F.col("id")).alias("t"))
    out = str(tmp_path / "out_txt")
    write_text(df, out, column="t")
    names = os.listdir(out)
    assert any(n.endswith(".gz") for n in names)
    back = read_text_lines(spark, out)
    assert sorted(r.value for r in back.collect()) == [f"row{i}" for i in range(5)]
