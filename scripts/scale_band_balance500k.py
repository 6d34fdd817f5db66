"""Post-fix imbalance_ppm at 500k docs: the exact two-term form on the
corpus whose hot buckets motivated the monitor (r06 datapoint)."""
import time
from bytehub_spark.session import get_spark
from bytehub_spark.operators import dedup

spark = get_spark("bb500k")
docs = spark.read.parquet("/tmp/sf100_docs/documents.parquet").repartition(64).persist()
print("docs:", docs.count(), flush=True)
t0 = time.time()
rows = dedup.minhash_band_balance(docs).collect()
print(f"band_balance 500k docs: {len(rows)} rows in {time.time()-t0:.1f}s", flush=True)
import collections
by_shape = collections.defaultdict(list)
for r in rows:
    by_shape[r.bands].append(r)
for b in sorted(by_shape):
    rs = by_shape[b]
    tot = sum(r.cand_pairs for r in rs)
    mx = max(r.max_bucket_rows for r in rs)
    imb = max(r.imbalance_ppm for r in rs)
    print(f"bands={b}: cand_pairs={tot:,} max_bucket={mx:,} "
          f"worst_imbalance_ppm={imb:,}", flush=True)
