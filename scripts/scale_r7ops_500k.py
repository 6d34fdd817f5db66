"""The round-7 operators themselves at 500k vectors: lsh_plane_plan
(the packaged decision table) and cluster_quality (knn -> distributed
CC -> tightness rollup) on /tmp/sf100_emb."""
import time
from pyspark.sql import functions as F
from bytehub_spark.session import get_spark
from bytehub_spark.operators import similarity, dedup

spark = get_spark("r7ops500k")
emb = spark.read.parquet("/tmp/sf100_emb/embeddings.parquet").repartition(64).persist()
print("vectors:", emb.count(), flush=True)

t0 = time.time()
plan = similarity.lsh_plane_plan(
    emb, planes_options=(12, 16, 20), budget_pairs=20_000_000
).toPandas()
print(f"lsh_plane_plan: {len(plan)} rows in {time.time()-t0:.1f}s", flush=True)
tot = plan.groupby("n_planes").first()[["shape_cand_pairs", "within_budget", "recommended"]]
print(tot.to_string(), flush=True)

t0 = time.time()
q = similarity.cluster_quality(emb, k=10, n_planes=20, bands=6).persist()
n = q.count()
dt = time.time() - t0
stats = q.agg(
    F.sum("n_members").alias("mem"), F.max("n_members").alias("mx"),
    F.expr("sum(mean_edge_cos_u * n_edges) div sum(n_edges)").alias("w_cos"),
).collect()[0]
print(f"cluster_quality: {n:,} multi-member clusters in {dt:.1f}s; "
      f"members={stats.mem:,} max_size={stats.mx} "
      f"edge-weighted mean cos_u={stats.w_cos} "
      f"cc_rounds={dedup._cc_last_rounds}", flush=True)
