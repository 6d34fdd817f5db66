# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_band_native10m.py
# Corpus: python scripts/gen_scale_corpora.py ev10m  (/tmp/sf100_stream)
"""BandPlanMonitor 10M-event counter-datapoint: the SAME corpus at a
native-resolution eps grid (values are 2-decimal -> nothing below
eps_u=10_000 adds information). Expectation per the docstring guidance:
state collapses to ~|occupied buckets| and throughput recovers."""
import os, shutil, time
from pyspark.sql import functions as F
from pyspark.sql import types as T
from bytehub_spark.session import get_spark
from bytehub_spark.streaming import stream_band_plan
from bytehub_spark.operators import asof

WORK="/tmp/band10m_native"
spark = get_spark("band_native10m")
ev = spark.read.parquet("/tmp/sf100_stream/events.parquet").select(
    "event_id", "event_type", "value")
GRID=(10_000, 100_000, 1_000_000); BUDGET=200_000_000

def steal():
    with open("/proc/stat") as f: return int(f.readline().split()[8])

s0=steal()
expect = asof.band_plan(ev, ["event_type"], "value", GRID, BUDGET).toPandas()
shutil.rmtree(WORK, ignore_errors=True)
src=os.path.join(WORK,"src"); os.makedirs(src)
for i in range(10):
    ev.where(F.col("event_id") % 10 == i).coalesce(4).write.mode(
        "overwrite").parquet(os.path.join(src, f"slice={i}"))
schema=T.StructType([T.StructField("event_id",T.LongType()),
    T.StructField("event_type",T.StringType()),
    T.StructField("value",T.DoubleType())])
stream=(spark.readStream.schema(schema).option("maxFilesPerTrigger",4)
        .parquet(os.path.join(src,"slice=*")))
t0=time.time()
q,mon=stream_band_plan(stream, os.path.join(WORK,"ck"), ["event_type"],
                       "value", GRID, BUDGET)
q.awaitTermination(2400)
res=mon.result().toPandas(); dt=time.time()-t0
state=mon.state.count()
print(f"native-grid monitor: 10,000,000 events in {dt:.1f}s = "
      f"{10_000_000/dt:,.0f} ev/s; state rows={state} "
      f"(sum n_buckets={int(expect['n_buckets'].sum())})", flush=True)
cols=list(expect.columns)
b=expect[cols].sort_values("eps_u").reset_index(drop=True)
g=res[cols].sort_values("eps_u").reset_index(drop=True)
print("stream==batch:", b.equals(g), "| steal:", steal()-s0, flush=True)
shutil.rmtree(WORK, ignore_errors=True)
