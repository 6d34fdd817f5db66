# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_funnel10m.py
# Corpus: /tmp/sf100_docs10m (gen_scale_corpora.py docs10m — 10M docs,
# 2,000 exact copies of sf0.1 documents).
"""CurationFunnelMonitor 10M-doc datapoint (VERDICT r11 item 6): the
500k harness at 20x — 10 x 1M id-ordered micro-batches of incremental
curation-funnel maintenance, then

- stream == batch: result() aggregated per batch must equal
  curation.curation_funnel_flags on the whole corpus grouped by the
  same id boundaries, row for row;
- state bound: ``fps`` has exactly one row per distinct normalized
  fingerprint (~5k on this corpus no matter the input size — the
  funnel's cost tracks survivors), ``buckets`` one row per distinct
  claimed (band, bh).
"""
import os
import shutil
import time

import pyarrow.parquet as pq_

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bytehub_spark import streaming as st
from bytehub_spark.operators import curation, dedup
from bytehub_spark.session import get_spark

N_BATCHES = 10
work = "/tmp/funnel10m_work"
shutil.rmtree(work, ignore_errors=True)
src = os.path.join(work, "doc_src")
os.makedirs(src)
# NOTE: no sort_by here — pyarrow's take overflows int32 string
# offsets on a 10M-row text column ("offset overflow while
# concatenating arrays"). The generator writes copies in ascending
# doc_id blocks, so the file is globally id-ordered by construction;
# assert it instead of re-sorting.
t = pq_.read_table("/tmp/sf100_docs10m/documents.parquet").select(
    ["doc_id", "text"]
)
import numpy as np

ids = t.column("doc_id").to_numpy()
assert (np.diff(ids) > 0).all(), "corpus not id-ordered — regenerate"
del ids
rows_per = t.num_rows // N_BATCHES
for i in range(N_BATCHES):
    sl = (
        t.slice(i * rows_per)
        if i == N_BATCHES - 1
        else t.slice(i * rows_per, rows_per)
    )
    pq_.write_table(sl, f"{src}/part-{i:03d}.parquet")
    time.sleep(0.05)  # distinct modTimes -> deterministic batch order
n_total = t.num_rows
bounds = [i * rows_per for i in range(N_BATCHES)] + [n_total]
del t

spark = get_spark("funnel_10m")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
s0 = steal()
stream = (
    spark.readStream.schema(SCHEMA)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
t0 = time.time()
q, mon = st.stream_curation_funnel(stream, os.path.join(work, "ck"))
finished = q.awaitTermination(3600)
if not finished:
    q.stop()
    raise SystemExit(
        "stream did not drain within 3600s — result would be partial;"
        " rerun in a quieter window"
    )
wall = time.time() - t0
got = mon.result().toPandas().sort_values("batch").reset_index(drop=True)
s1 = steal()
print(got.to_string())
print(
    f"stream: {n_total} docs / {N_BATCHES} batches in {wall:.1f}s"
    f" = {n_total / wall:,.0f} docs/s  (steal {s1 - s0})"
)

# state bounds
docs = spark.read.parquet(src)
n_fp = (
    docs.where(F.col("text").isNotNull())
    .select(F.md5(dedup.normalized()).alias("fp"))
    .distinct()
    .count()
)
assert mon.fps.count() == n_fp, (mon.fps.count(), n_fp)
n_buckets = mon.buckets.count()
assert mon.buckets.distinct().count() == n_buckets
print(f"state: fps = {n_fp} (== distinct fingerprints), buckets = {n_buckets}")

# stream == batch on the same boundaries
t0 = time.time()
flags = curation.curation_funnel_flags(docs).toPandas()
batch_wall = time.time() - t0
flags = flags.sort_values("doc_id").reset_index(drop=True)
flags["batch"] = 0
for i in range(N_BATCHES):
    flags.loc[bounds[i] : bounds[i + 1] - 1, "batch"] = i
expect = (
    flags.groupby("batch")
    .agg(
        n_in=("doc_id", "count"),
        n_gate=("gated", "sum"),
        n_exact_new=("exact_new", "sum"),
        n_near_new=("near_new", "sum"),
    )
    .reset_index()
)
import pandas as pd

pd.testing.assert_frame_equal(
    got.astype("int64"), expect.astype("int64"), check_dtype=False
)
print(f"stream == batch EXACT (batch one-shot: {batch_wall:.1f}s)")
