# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_profile10m.py
# Corpus: python scripts/gen_scale_corpora.py ev10m
"""Single-scan claim measured: table_profile + check_constraints on the
10M-row events table and the 500k-doc corpus."""
import time
from bytehub_spark.session import get_spark
from bytehub_spark.operators import profile

spark = get_spark("profile10m")
ev = spark.read.parquet("/tmp/sf100_stream/events.parquet")
t0 = time.time()
p1 = profile.table_profile(ev).toPandas()
t1 = time.time() - t0
t0 = time.time()
p1a = profile.table_profile(ev, approx=True).toPandas()
t1a = time.time() - t0
t0 = time.time()
g = profile.check_constraints(ev, [
    (0, "not_null", "event_type"), (1, "unique", "event_id"),
    (2, "range", "value", 0.0, 1000.0), (3, "like", "event_type", "%e%"),
]).toPandas()
t2 = time.time() - t0
docs = spark.read.parquet("/tmp/sf100_docs/documents.parquet")
t0 = time.time()
p3 = profile.table_profile(docs).toPandas()
t3 = time.time() - t0
print(f"profile 10M events (exact distincts, 6 cols): {t1:.1f}s")
print(f"profile 10M events (approx distincts): {t1a:.1f}s")
print(f"gate 10M events (4 rules): {t2:.1f}s")
print(f"profile 500k docs (exact, 5 cols incl. full text distinct): {t3:.1f}s")
print(p1[["column","n_distinct","n_null"]].to_string(index=False))
