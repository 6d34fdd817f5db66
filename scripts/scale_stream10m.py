# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_stream10m.py
# Corpora: python scripts/gen_scale_corpora.py all (+ /tmp/sf100_docs from the r06 recipe)
"""10M-event / 500k-doc / 500k-vector streaming datapoint for the
round-6 monitors: TransitionMonitor (10M events, time-ordered files),
BloomFilterMonitor (500k docs), EmbeddingDriftMonitor (500k vectors).
Verifies bounded state row counts and stream==batch where the arrival
contract holds."""
import os, shutil, time
import pyarrow.parquet as pq_
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql import types as T
from bytehub_spark.session import get_spark
from bytehub_spark import streaming as st
from bytehub_spark.streaming.ingest import (
    BloomFilterMonitor, EmbeddingDriftMonitor,
)
from bytehub_spark.operators import events_ops, similarity

work = "/tmp/stream10m_work"
shutil.rmtree(work, ignore_errors=True)
os.makedirs(work)

# --- 1. time-ordered event files (10 files x 1M rows; copies ascend in ts)
src = os.path.join(work, "ev_src")
os.makedirs(src)
t = pq_.read_table("/tmp/sf100_stream/events.parquet")
rows_per = t.num_rows // 10
for i in range(10):
    pq_.write_table(t.slice(i * rows_per, rows_per), f"{src}/part-{i:03d}.parquet")
    time.sleep(0.05)  # distinct modTimes -> deterministic batch order
del t

spark = get_spark("stream10m")
EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])
ev_stream = (spark.readStream.schema(EV_SCHEMA)
             .option("maxFilesPerTrigger", 1).parquet(src))
t0 = time.time()
q, mon = st.stream_transitions(ev_stream, os.path.join(work, "ck_tr"))
q.awaitTermination(1200)
res = mon.result().persist(); n_state = res.count()
dt = time.time() - t0
print(f"transitions: 10,000,000 events in {dt:.1f}s = {10_000_000/dt:,.0f} ev/s; "
      f"state rows={n_state} (types^2 bound)", flush=True)
batch = events_ops.event_transitions(
    spark.read.parquet("/tmp/sf100_stream/events.parquet")).toPandas()
got = res.toPandas()
cols = sorted(set(batch.columns) & set(got.columns))
import pandas as pd
b2 = batch[cols].sort_values(cols).reset_index(drop=True)
g2 = got[cols].sort_values(cols).reset_index(drop=True)
print("transitions stream==batch:", b2.equals(g2), flush=True)

# --- 2. Bloom over 500k docs (m=2^22 like the dedup datapoint)
dsrc = os.path.join(work, "doc_src")
os.makedirs(dsrc)
dt_ = pq_.read_table("/tmp/sf100_docs/documents.parquet", columns=["doc_id", "text"])
rows_per = dt_.num_rows // 10
for i in range(10):
    pq_.write_table(dt_.slice(i * rows_per, rows_per), f"{dsrc}/part-{i:03d}.parquet")
    time.sleep(0.05)
del dt_
D_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType()),
])
doc_stream = (spark.readStream.schema(D_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(dsrc))
t0 = time.time()
q, bmon = st.stream_bloom_filter(doc_stream, os.path.join(work, "ck_bl"),
                                 n=4, m_bits=1 << 22, k_hashes=7)
q.awaitTermination(2400)
nb = bmon.result().count()
dt = time.time() - t0
print(f"bloom: 500,000 docs in {dt:.1f}s = {500_000/dt:,.0f} docs/s; "
      f"state rows={nb} (m_bits/32={1<<22>>5})", flush=True)
print("bloom covered telemetry (last batch):", bmon.batch_log[-1], flush=True)

# --- 3. embedding drift over 500k vectors vs a 50k reference slice
esrc = os.path.join(work, "emb_src")
os.makedirs(esrc)
et = pq_.read_table("/tmp/sf100_emb/embeddings.parquet")
ref_tab = et.slice(0, 50_000)
pq_.write_table(ref_tab, os.path.join(work, "ref.parquet"))
rows_per = et.num_rows // 10
for i in range(10):
    pq_.write_table(et.slice(i * rows_per, rows_per), f"{esrc}/part-{i:03d}.parquet")
    time.sleep(0.05)
del et, ref_tab
E_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])
ref = spark.read.parquet(os.path.join(work, "ref.parquet"))
emb_stream = (spark.readStream.schema(E_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(esrc))
t0 = time.time()
q, emon = st.stream_embedding_drift(emb_stream, os.path.join(work, "ck_dr"), ref)
q.awaitTermination(2400)
nd = emon.result().count()
n_state = emon.state.count()
dt = time.time() - t0
print(f"drift: 500,000 vectors in {dt:.1f}s = {500_000/dt:,.0f} vec/s; "
      f"state rows={n_state} (labels*dims=640), result rows={nd}", flush=True)
print("STREAM10M OK", flush=True)
