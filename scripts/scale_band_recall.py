"""band_recall scale probe: 20k-doc shard of the 500k low-diversity
corpus, WITH the df-cut (truth join explodes without it)."""
import time
from pyspark.sql import functions as F
from bytehub_spark.session import get_spark
from bytehub_spark.operators import dedup

spark = get_spark("band_recall_scale")
docs = (spark.read.parquet("/tmp/sf100_docs/documents.parquet")
        .where(F.col("doc_id") % 25 == 0).repartition(32).persist())
print("shard docs:", docs.count(), flush=True)
t0 = time.time()
out = dedup.minhash_band_recall(docs, max_doc_freq=200).toPandas()
print(f"band_recall (df-cut 200): {len(out)} rows in {time.time()-t0:.1f}s", flush=True)
print(out.to_string(index=False), flush=True)
