# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_groupedhll10m.py
# Corpus: python scripts/gen_scale_corpora.py ev10m  (/tmp/sf100_stream)
"""GroupedHllMonitor 10M-event datapoint (18th monitor, round 12):
10 x 1M micro-batches of per-event-type distinct-user register
maintenance, then

- stream == batch: result() must equal the one-shot grouped
  hll_registers over the whole stream exactly (max-merge per
  (group, bucket) is structural — shared kernel);
- idempotence: re-processing the last batch leaves state unchanged;
- state bound: |regs| <= groups * m ints regardless of event count;
- estimates(): the corrected per-group estimates next to exact.
"""
import os
import shutil
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bytehub_spark import streaming as st
from bytehub_spark.operators import sketches
from bytehub_spark.session import get_spark

work = "/tmp/groupedhll10m_work"
shutil.rmtree(work, ignore_errors=True)
src = os.path.join(work, "ev_src")
os.makedirs(work)

spark = get_spark("grouped_hll_10m")
ev = spark.read.parquet("/tmp/sf100_stream/events.parquet")
n_events = ev.count()
ev.repartition(10).write.parquet(src)


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


s0, t0 = steal(), time.time()
stream = (
    spark.readStream.schema(spark.read.parquet(src).schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
q, mon = st.stream_hll_by_group(stream, os.path.join(work, "ck"))
finished = q.awaitTermination(1800)
if not finished:
    q.stop()
    raise SystemExit("stream did not drain within 1800s")
wall = time.time() - t0
print(
    f"stream: {n_events:,} events in {wall:.1f}s"
    f" = {n_events / wall:,.0f} ev/s (steal {steal() - s0});"
    f" state = {len(mon.regs)} (group, bucket) registers"
)

keyed = spark.read.parquet(src).where(F.col("user_id").isNotNull())
got = sorted(map(tuple, mon.result().collect()))
want = sorted(
    map(
        tuple,
        sketches.hll_registers(keyed, "user_id", "event_type", 64)
        .select(F.col("event_type").cast("string"), "bucket", "rho")
        .collect(),
    )
)
assert got == want, "stream != batch"
print(f"stream == batch EXACT ({len(got)} register rows)")

# idempotence at scale: re-deliver one full 1M file
before = dict(mon.regs)
mon.process_batch(spark.read.parquet(src).limit(1_000_000))
assert mon.regs == before
print("re-delivered 1M-event batch: state unchanged (idempotent)")

est = {r["event_type"]: r for r in mon.estimates().collect()}
exact = {
    r["event_type"]: r["x"]
    for r in keyed.groupBy("event_type")
    .agg(F.countDistinct("user_id").alias("x"))
    .collect()
}
for g in sorted(exact):
    r = est[g]
    print(
        f"  {g}: est={r['est_distinct']} exact={exact[g]}"
        f" err={abs(r['est_distinct'] - exact[g]) / exact[g]:.3f}"
    )
shutil.rmtree(work, ignore_errors=True)
