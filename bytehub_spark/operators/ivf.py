"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

The classic two-stage ANN: coarse-quantize vectors into cells around
k-means centroids, then search only the `n_probe` cells nearest the query.
At 100 TB this turns a full-corpus scan into a handful of cell scans; the
cell column doubles as a physical partition key so probes prune at the
parquet layer.

Training is driver-side numpy over a deterministic sample (a few thousand
rows — the standard IVF recipe; centroids are tiny and broadcast to
executors inside an Arrow-vectorized pandas UDF that does one matmul per
batch — no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample_size: int = 4096,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """K-means centroids from a deterministic sample (hash-ordered, so the
    sample is stable across runs and cluster layouts)."""
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_size)
        .toPandas()
    )
    x = np.array(sample[vec_col].tolist(), dtype=np.float64)
    # normalize → cosine k-means (spherical)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(n_iter):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / np.maximum(np.linalg.norm(m), 1e-12)
    return cents


def assign_cells(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Add the nearest-centroid cell id — one numpy matmul per Arrow batch."""
    cents = centroids  # captured; broadcast with the serialized UDF (small)

    @F.pandas_udf(T.IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ cents.T).argmax(axis=1).astype(np.int32))

    return embeddings.withColumn(out_col, nearest(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine: probe the n_probe nearest cells per query,
    exact re-rank inside (same scoring as similarity.cosine_topk)."""
    from .similarity import _dot

    cents = train_centroids(embeddings, n_cells, id_col=id_col, vec_col=vec_col)
    from ..plans.scratch import scratch_persist

    celled = scratch_persist(assign_cells(embeddings, cents, vec_col))

    queries = celled.where(F.col(id_col).isin(query_ids)).toPandas()
    qx = np.array(queries[vec_col].tolist(), dtype=np.float64)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    probe_cells = np.argsort(-(qx @ cents.T), axis=1)[:, :n_probe]

    spark = embeddings.sparkSession
    probe_rows = [
        (int(qid), [int(c) for c in cells], list(map(float, vec)))
        for qid, cells, vec in zip(queries[id_col], probe_cells, queries[vec_col])
    ]
    probes = spark.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("probe_cells", T.ArrayType(T.IntegerType())),
                T.StructField("q_vec", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    cand = celled.join(
        F.broadcast(probes),
        F.array_contains(F.col("probe_cells"), F.col("cell"))
        & (F.col(id_col) != F.col("query_id")),
    )
    sim = _dot(vec_col, "q_vec") / (
        F.sqrt(_dot(vec_col, vec_col)) * F.sqrt(_dot("q_vec", "q_vec"))
    )
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), F.round(sim, 4).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
        .orderBy("query_id", "rank")
    )


def write_cell_partitioned(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the IVF index physically: vectors written Hive-
    partitioned by their cell, one file per cell. Probing then prunes at
    the parquet layer — a 100 TB corpus scan becomes n_probe directory
    reads. Returns the centroids (persist them next to the index)."""
    cents = train_centroids(embeddings, n_cells, id_col=id_col, vec_col=vec_col)
    celled = assign_cells(embeddings, cents, vec_col)
    (
        celled.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return cents


def ivf_topk_partitioned(
    spark,
    path: str,
    centroids: np.ndarray,
    query_vecs: dict[int, list[float]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a cell-partitioned IVF index: only the n_probe nearest cells'
    partitions are read (static partition pruning — assert via
    plans.partition_filters). query_vecs maps query_id -> vector."""
    from .similarity import _dot

    qx = np.array(list(query_vecs.values()), dtype=np.float64)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qx @ centroids.T), axis=1)[:, :n_probe]
    all_cells = sorted({int(c) for row in probe for c in row})

    index = spark.read.parquet(path).where(F.col("cell").isin(all_cells))
    probes = spark.createDataFrame(
        [
            (int(qid), [int(c) for c in cells], [float(x) for x in vec])
            for (qid, vec), cells in zip(query_vecs.items(), probe)
        ],
        "query_id long, probe_cells array<int>, q_vec array<float>",
    )
    cand = index.join(
        F.broadcast(probes),
        F.array_contains(F.col("probe_cells"), F.col("cell"))
        & (F.col(id_col) != F.col("query_id")),
    )
    sim = _dot(vec_col, "q_vec") / (
        F.sqrt(_dot(vec_col, vec_col)) * F.sqrt(_dot("q_vec", "q_vec"))
    )
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), F.round(sim, 4).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
        .orderBy("query_id", "rank")
    )
