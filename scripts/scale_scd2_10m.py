# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_scd2_10m.py
# Corpus: python scripts/gen_scale_corpora.py ev10m  (/tmp/sf100_stream)
"""Scd2Monitor 10M-event datapoint (14th monitor, round 10): 10 x 1M
time-ordered micro-batches of streaming SCD2 maintenance, then

- stream == batch: result() must equal events_ops.scd2_history on the
  union, row for row (exceptAll both directions — versions, validity
  tiling, merged counts all participate);
- state bound: ``open`` is EXACTLY one row per distinct user; the
  ``closed`` frame is the maintained dimension itself (output-sized by
  design, a sink in production — see the class docstring)."""
import os
import shutil
import time

import pyarrow.parquet as pq_
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bytehub_spark import streaming as st
from bytehub_spark.operators import events_ops
from bytehub_spark.session import get_spark

work = "/tmp/scd2_10m_work"
shutil.rmtree(work, ignore_errors=True)
src = os.path.join(work, "ev_src")
os.makedirs(src)
t = pq_.read_table("/tmp/sf100_stream/events.parquet")
rows_per = t.num_rows // 10
prev_max_ts = None
for i in range(10):
    # last slice takes the remainder so no tail event is dropped
    sl = t.slice(i * rows_per) if i == 9 else t.slice(i * rows_per, rows_per)
    # Row-position slicing assumes the file is globally time-sorted —
    # the monitor's event-time-ordered arrival contract (ADVICE r10:
    # surface a generator regression here, not as a confusing
    # stream!=batch mismatch downstream).
    import pyarrow.compute as pc

    lo = pc.min(sl.column("ts")).as_py()
    hi = pc.max(sl.column("ts")).as_py()
    if prev_max_ts is not None and lo < prev_max_ts:
        raise SystemExit(
            f"slice {i} min ts {lo} < slice {i - 1} max ts {prev_max_ts}"
            " — events.parquet is not globally time-sorted; regenerate"
            " the corpus or sort before slicing"
        )
    prev_max_ts = hi
    pq_.write_table(sl, f"{src}/part-{i:03d}.parquet")
    time.sleep(0.05)  # distinct modTimes -> deterministic batch order
n_total = t.num_rows
del t

spark = get_spark("scd2_10m")
spark.conf.set("spark.sql.session.timeZone", "UTC")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
s0 = steal()
ev_stream = (
    spark.readStream.schema(EV_SCHEMA)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
t0 = time.time()
q, mon = st.stream_scd2(ev_stream, os.path.join(work, "ck"))
finished = q.awaitTermination(1800)
if not finished:
    q.stop()
    raise SystemExit("stream did not drain within 1800s — result would be partial/racy; rerun in a quieter window")
res = mon.result().persist()
n_res = res.count()
dt = time.time() - t0
print(f"scd2 stream: {n_total:,} events in {dt:.1f}s = {n_total/dt:,.0f} ev/s; "
      f"{n_res:,} versions")

batch = spark.read.parquet(src)
expect = events_ops.scd2_history(batch).persist()
n_exp = expect.count()
d1 = res.exceptAll(expect).count()
d2 = expect.exceptAll(res).count()
n_users = batch.select("user_id").distinct().count()
n_open = mon.open.count()
print(f"batch: {n_exp:,} versions; stream==batch "
      f"{n_res == n_exp and d1 == 0 and d2 == 0} "
      f"(exceptAll {d1}/{d2})")
print(f"open state {n_open:,} rows == distinct users {n_users:,}: "
      f"{n_open == n_users}")
print(f"TOTAL {time.time() - t0:.1f}s steal_delta {steal() - s0}")
shutil.rmtree(work, ignore_errors=True)
