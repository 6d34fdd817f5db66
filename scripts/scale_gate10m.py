# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_gate10m.py
# Needs scripts/scale_stream10m.py's ev_src split to exist (run it first)
"""QualityGateMonitor at 10M events: additive counters + a 10M-distinct
unique-rule state (the per-value dimension pattern at its heaviest)."""
import os, shutil, time
from pyspark.sql import types as T
from bytehub_spark.session import get_spark
from bytehub_spark.streaming import stream_quality_gate
from bytehub_spark.operators import profile

work = "/tmp/gate10m_work"
shutil.rmtree(work, ignore_errors=True); os.makedirs(work)
spark = get_spark("gate10m")
EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])
src = "/tmp/stream10m_work/ev_src"
rules = [
    (0, "not_null", "event_type"),
    (1, "unique", "event_id"),
    (2, "range", "value", 0.0, 1000.0),
    (3, "like", "event_type", "%e%"),
]
ev = (spark.readStream.schema(EV_SCHEMA)
      .option("maxFilesPerTrigger", 1).parquet(src))
t0 = time.time()
q, mon = stream_quality_gate(ev, os.path.join(work, "ck"), rules)
q.awaitTermination(2400)
res = mon.result().toPandas()
dt = time.time() - t0
print(f"quality_gate: 10,000,000 events in {dt:.1f}s = {10_000_000/dt:,.0f} ev/s; "
      f"unique-state rows={mon._ustate[1].count():,}", flush=True)
batch = profile.check_constraints(
    spark.read.parquet("/tmp/sf100_stream/events.parquet"), rules).toPandas()
import pandas as pd
pd.testing.assert_frame_equal(res, batch)
print("gate stream==batch True at 10M", flush=True)
print(res.to_string(index=False), flush=True)
