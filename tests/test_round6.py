"""Round-6 contracts: the ADVICE r05 fixes pinned by tests.

- ``_int_gemm_scored`` id types are derived from the candidate schema,
  so ``knn_graph`` works with STRING vector ids (same generalization
  ``connected_components`` got in round 5).
- ``connected_components`` drops null edge endpoints before the Arrow
  fast-path probe (a null previously raised in createDataFrame on the
  non-nullable component schema, or corrupted long ids to float64 in
  the non-Arrow fallback).
- ``scratch_persist`` warns (rather than silently ignoring) when an
  equal plan is already cached at a different storage level.
"""

import warnings

import pandas as pd
import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

from bytehub_spark.operators import dedup, similarity


def test_knn_graph_string_ids(spark):
    # 4 vectors, two near-identical pairs; string ids must survive the
    # mapInPandas GEMM boundary end-to-end
    rows = [
        ("alpha", [1.0, 0.0, 0.0, 0.0]),
        ("bravo", [0.99, 0.01, 0.0, 0.0]),
        ("charlie", [0.0, 1.0, 0.0, 0.0]),
        ("delta", [0.0, 0.99, 0.01, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = similarity.knn_graph(df, k=2, n_planes=4, bands=4).toPandas()
    assert got["vec_id"].dtype == object  # strings, not floats
    assert set(got["vec_id"]) <= {"alpha", "bravo", "charlie", "delta"}
    # the twin must be each vector's top neighbor where both share buckets
    top = got[got["rank"] == 1].set_index("vec_id")["neighbor_id"].to_dict()
    if "alpha" in top:
        assert top["alpha"] == "bravo"
    if "charlie" in top:
        assert top["charlie"] == "delta"


def test_connected_components_null_endpoints(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, None], "doc_b": [2, None, 3]}),
        "doc_a long, doc_b long",
    )
    got = dedup.connected_components(pairs).toPandas()
    comp = got.set_index("doc_id")["component"].to_dict()
    # only the (1,2) edge survives; 3 never appears as a valid endpoint
    assert comp == {1: 1, 2: 1}
    # ids stayed integral (the old non-Arrow fallback coerced to float64)
    assert str(got["component"].dtype).startswith("int")


def test_scratch_persist_level_mismatch_warns(spark):
    from bytehub_spark.plans.scratch import release_scratch, scratch_persist

    df = spark.range(10).withColumn("x", F.col("id") * 2)
    scratch_persist(df, StorageLevel.MEMORY_ONLY)
    df.count()
    rebuilt = spark.range(10).withColumn("x", F.col("id") * 2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scratch_persist(rebuilt, StorageLevel.MEMORY_AND_DISK)
    assert any("first cacher" in str(x.message) for x in w)
    release_scratch()
