"""Distributed PCA / whitening over an embedding column.

The standard two-phase distributed PCA (same shape as Spark MLlib's
RowMatrix.computeCovariance, re-expressed over the DataFrame API):

  phase 1 (distributed): per-Arrow-batch partial Gram matrices
      (n_b, sum_b = X_b^T 1, xtx_b = X_b^T X_b) via mapInPandas — each
      partial is d + d^2 doubles regardless of batch row count;
  phase 2 (driver): combine the bounded partials (one row per batch,
      ~4 KB each at d=64), form the covariance, numpy eigh (d x d —
      microseconds), fix eigenvector signs, then broadcast the d x k
      projection matrix back into a second mapInPandas that projects
      every vector with one GEMM.

The driver-side combine is a bounded-prepass collect (like the seed
lookup in core.py), NOT a data-path collect: its size is
O(num_batches * d^2) bytes, independent of row count. On a 100k-
partition corpus, insert one intermediate repartition-and-re-partial
round (tree combine) — noted inline.

Eigendecomposition is not SQL-expressible, so the registered query is
rows-only gated; determinism within an engine comes from float64 GEMM
partials combined in sorted batch order and a fixed sign convention
(largest-|component| coordinate made positive).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _covariance(
    embeddings: DataFrame, vec_col: str, id_col: str
) -> tuple[np.ndarray, np.ndarray, int]:
    """(covariance d x d, mean d, n) from one pass of partial Grams."""

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "mn": [int(pdf[id_col].min())],
                    "n": [len(X)],
                    "s": [X.sum(axis=0)],
                    "xtx": [(X.T @ X).ravel()],
                }
            )

    rows = (
        embeddings.select(id_col, vec_col)
        .mapInPandas(
            partials,
            schema="mn long, n long, s array<double>, xtx array<double>",
        )
        .toPandas()
        # combine partials in id order: float addition is order-sensitive,
        # and toPandas() arrival order is scheduler-dependent
        .sort_values("mn")
        .reset_index(drop=True)
    )
    # bounded combine: one row per Arrow batch. At >=100k batches, add a
    # tree round: repartition(256) over these rows and re-partial first.
    n = int(rows["n"].sum())
    s = np.sum(np.stack(rows["s"].to_numpy()), axis=0)
    xtx = np.sum(np.stack(rows["xtx"].to_numpy()), axis=0)
    d = s.shape[0]
    mean = s / n
    cov = xtx.reshape(d, d) / n - np.outer(mean, mean)
    return cov, mean, n


def pca_project(
    embeddings: DataFrame,
    n_components: int = 8,
    whiten: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-9,
) -> DataFrame:
    """Project every vector onto the top ``n_components`` principal
    components (optionally whitened to unit variance) — embedding
    compression / decorrelation for downstream ANN and clustering.

    Returns (id, pc_0 .. pc_{k-1}); components are ordered by descending
    explained variance with a deterministic sign (the coordinate of
    largest magnitude in each eigenvector is positive).
    """
    cov, mean, _ = _covariance(embeddings, vec_col, id_col)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:n_components]
    vals = eigval[order]
    comps = eigvec[:, order]  # d x k
    # sign convention: make each component's largest-|x| coordinate > 0
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    comps = comps * flip
    scale = 1.0 / np.sqrt(np.maximum(vals, 0.0) + eps) if whiten else np.ones_like(vals)
    proj = comps * scale  # d x k, broadcast into the UDF closure (~KBs)
    k = comps.shape[1]
    out_schema = f"{id_col} long, " + ", ".join(
        f"pc_{i} double" for i in range(k)
    )

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - mean) @ proj
            out = {id_col: pdf[id_col].to_numpy()}
            for i in range(k):
                out[f"pc_{i}"] = Y[:, i]
            yield pd.DataFrame(out)

    return (
        embeddings.select(id_col, vec_col)
        .mapInPandas(project, schema=out_schema)
        .orderBy(id_col)
    )


def explained_variance(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Eigen-spectrum of the embedding covariance: (rank, eigenvalue,
    explained_ratio, cumulative_ratio) — the scree table that decides
    n_components and detects anisotropic / collapsed embedding spaces."""
    spark = embeddings.sparkSession
    cov, _, _ = _covariance(embeddings, vec_col, id_col)
    eigval = np.sort(np.linalg.eigh(cov)[0])[::-1]
    total = float(eigval.sum())
    rows = []
    cum = 0.0
    for i, v in enumerate(eigval):
        cum += float(v)
        rows.append((i, float(v), float(v) / total, cum / total))
    return spark.createDataFrame(
        rows, "rank int, eigenvalue double, explained_ratio double, cumulative_ratio double"
    )
