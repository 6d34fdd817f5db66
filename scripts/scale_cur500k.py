# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_cur500k.py
# Corpus: /tmp/sf100_docs (r06 recipe in NEXT.md)
"""Curation-family scale datapoint: 500k docs (/tmp/sf100_docs)."""
import time
from pyspark.sql import functions as F
from bytehub_spark.session import get_spark
from bytehub_spark.operators import curation, text, profile
from bytehub_spark.plans.scratch import release_scratch

spark = get_spark("cur500k")
docs = spark.read.parquet("/tmp/sf100_docs/documents.parquet").repartition(64).persist()
print("docs:", docs.count(), flush=True)

def run(label, fn):
    t0 = time.time()
    n = fn().count()
    print(f"{label}: {n:,} rows in {time.time()-t0:.1f}s", flush=True)
    release_scratch()

run("chunk_documents", lambda: curation.chunk_documents(docs))
run("pack_sequences", lambda: curation.pack_sequences(docs))
run("curation_pipeline", lambda: text.curation_pipeline(docs))
run("table_profile", lambda: profile.table_profile(docs))
run("check_constraints", lambda: profile.check_constraints(docs, [
    (0, "not_null", "text"), (1, "unique", "doc_id"),
    (2, "range", "n_chars", 1, 100_000), (3, "like", "lang", "__")]))
