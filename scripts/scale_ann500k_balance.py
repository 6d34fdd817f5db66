# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_ann500k_balance.py
# Corpus: python scripts/gen_scale_corpora.py emb500k
"""Phase 1 of the 500k ANN datapoint: the lsh_bucket_balance decision
table at n_planes 12/16/20 (bands=6) BEFORE committing to the knn join."""
import time
from bytehub_spark.session import get_spark
from bytehub_spark.operators import similarity

spark = get_spark()
emb = spark.read.parquet("/tmp/sf100_emb/embeddings.parquet")
emb = emb.repartition(64).persist()
print("rows:", emb.count())
for p in (12, 16, 20):
    t0 = time.time()
    rows = similarity.lsh_bucket_balance(emb, n_planes=p).collect()
    tot = sum(r.cand_pairs for r in rows)
    mx = max(r.max_bucket_rows for r in rows)
    imb = max(r.imbalance_ppm for r in rows)
    print(f"n_planes={p}: cand_pairs={tot:,} max_bucket={mx:,} "
          f"worst_imbalance_ppm={imb:,} [{time.time()-t0:.1f}s]", flush=True)
