# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_ann500k_knn.py
# Corpus: python scripts/gen_scale_corpora.py emb500k
"""Phase 2: knn_graph (k=10, n_planes=20 per the balance prepass) ->
mutual-kNN edges -> connected_components (distributed path expected:
>1M edges). Same composition as similarity.graph_clusters, with the
knn output persisted so edge stats don't re-pay the GEMM."""
import time
from pyspark import StorageLevel
from pyspark.sql import functions as F
from bytehub_spark.session import get_spark
from bytehub_spark.operators import similarity, dedup

spark = get_spark()
emb = spark.read.parquet("/tmp/sf100_emb/embeddings.parquet").repartition(64).persist()
print("rows:", emb.count(), flush=True)

t0 = time.time()
knn = similarity.knn_graph(emb, k=10, n_planes=20, bands=6).persist(StorageLevel.MEMORY_AND_DISK)
n_knn = knn.count()
t_knn = time.time() - t0
print(f"knn_graph: {n_knn:,} directed edges in {t_knn:.1f}s", flush=True)

t0 = time.time()
fwd = knn.where(F.col("cos_u") >= 9_000).select("vec_id", "neighbor_id")
rev = fwd.select(F.col("neighbor_id").alias("vec_id"), F.col("vec_id").alias("neighbor_id"))
mutual = (fwd.join(rev, ["vec_id", "neighbor_id"])
          .where(F.col("vec_id") < F.col("neighbor_id"))
          .select(F.col("vec_id").alias("doc_a"), F.col("neighbor_id").alias("doc_b"))
          ).persist(StorageLevel.MEMORY_AND_DISK)
n_mut = mutual.count()
t_mut = time.time() - t0
print(f"mutual edges: {n_mut:,} in {t_mut:.1f}s (driver cap 1,000,000 -> "
      f"{'DISTRIBUTED' if n_mut > 1_000_000 else 'driver'} CC)", flush=True)

t0 = time.time()
comp = dedup.connected_components(mutual, vertices=emb.select("vec_id"), id_col="vec_id")
stats = comp.agg(F.countDistinct("component").alias("n_comp"), F.count("*").alias("n_vert")).collect()[0]
t_cc = time.time() - t0
print(f"CC: {stats.n_comp:,} components over {stats.n_vert:,} vertices in "
      f"{t_cc:.1f}s, rounds={dedup._cc_last_rounds}", flush=True)

# component-size profile: expect ~10k groups of ~50
sizes = comp.groupBy("component").count().groupBy("count").agg(F.count("*").alias("n")).orderBy("count").collect()
big = [r for r in sizes if r["count"] >= 40]
print("size profile (top):", [(r["count"], r["n"]) for r in sizes[-5:]],
      "| comps with >=40 members:", sum(r.n for r in big), flush=True)
print("TOTAL OK", flush=True)
