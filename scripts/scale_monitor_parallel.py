# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_monitor_parallel.py
# Corpus: python scripts/gen_scale_corpora.py ev100m  (/tmp/sf100_stream100m)
"""Monitor throughput vs per-trigger parallelism at 100M events
(VERDICT r13 #5) — the follow-up to the r13 row-group-layout lesson
(scale_monitors100m.py: with maxFilesPerTrigger=1 a micro-batch's scan
parallelism IS the trigger file's row-group count). Open question: now
that layout is pinned at 8 MB row groups, does throughput respond to
the OTHER two per-trigger knobs?

Three CountMinMonitor replays of the SAME 100M events (CMS = the most
compute per event of the three sketch monitors):

  a) 20 files x 5M,   maxFilesPerTrigger=1  (the r13 baseline shape)
  b) 40 files x 2.5M, maxFilesPerTrigger=1  (2x batches, half the
     rows + half the row groups per trigger — does per-batch overhead
     eat the datapoint, or is per-event cost flat?)
  c) 40 files x 2.5M, maxFilesPerTrigger=2  (same rows per trigger as
     (a), but spread over 2 files — same row-group count per trigger;
     tests whether trigger composition matters vs raw row-group count)

Each run asserts stream == batch cell-exact before its number counts.
"""
import os
import shutil
import time

from pyspark.sql import functions as F

from bytehub_spark import streaming as st
from bytehub_spark.operators import sketches
from bytehub_spark.session import get_spark

SRC_PARQUET = "/tmp/sf100_stream100m/events.parquet"
work = "/tmp/monitor_parallel_work"
shutil.rmtree(work, ignore_errors=True)
os.makedirs(work)

spark = get_spark("monitor_parallel")
ev = spark.read.parquet(SRC_PARQUET)
n_events = ev.count()
print(f"events: {n_events:,}", flush=True)

keyed = ev.where(F.col("user_id").isNotNull())
want = {
    (r["row"], r["col"]): r["cnt"]
    for r in sketches.cms_build(keyed, "user_id").collect()
}
print(f"one-shot cms_build total count {sum(want.values()):,}", flush=True)


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def layout(n_files: int) -> str:
    src = os.path.join(work, f"src{n_files}")
    if not os.path.isdir(src):
        ev.repartition(n_files).write.option(
            "parquet.block.size", 8 * 1024 * 1024
        ).parquet(src)
    return src


def run(n_files: int, per_trigger: int) -> None:
    src = layout(n_files)
    s0, t0 = steal(), time.time()
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(src)
    )
    ck = os.path.join(work, f"ck_{n_files}_{per_trigger}")
    q, mon = st.stream_cms(stream, ck)
    if not q.awaitTermination(3600):
        q.stop()
        raise SystemExit("stream did not drain within 3600s")
    wall = time.time() - t0
    assert mon.cells == want, "cms stream != batch"
    print(
        f"files={n_files} perTrigger={per_trigger}: "
        f"{n_events / wall:,.0f} ev/s ({wall:.1f}s, "
        f"{-(-n_files // per_trigger)} batches, steal {steal() - s0}) "
        f"stream==batch EXACT",
        flush=True,
    )


run(20, 1)
run(40, 1)
run(40, 2)
shutil.rmtree(work, ignore_errors=True)
