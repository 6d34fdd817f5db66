"""Z-order layout: Morton-key correctness and the measurable pruning
claim — a z-ordered layout gives BOTH columns usable per-file min/max
stats, where a single-column sort only serves its own column."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytehub_spark.sources import load_table
from bytehub_spark.sources.zorder import (
    overlap_fraction,
    write_zordered,
    zorder_keys,
)

SF = "/root/testdata/sf0.001"


def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_keys_match_reference(spark):
    pdf = pd.DataFrame(
        {
            "id": range(64),
            "x": [i % 8 for i in range(64)],
            "y": [i // 8 for i in range(64)],
        }
    )
    out = (
        zorder_keys(spark.createDataFrame(pdf), "x", "y", bits=3)
        .toPandas()
        .sort_values("id")
    )
    # x,y already span [0, 7] -> quantization at 3 bits is the identity
    assert (out["q_a"] == out["x"]).all()
    assert (out["q_b"] == out["y"]).all()
    expect = [_morton_ref(a, b, 3) for a, b in zip(out["x"], out["y"])]
    assert list(out["zkey"]) == expect
    # the 8x8 grid maps bijectively onto [0, 64)
    assert sorted(out["zkey"]) == list(range(64))


def test_zorder_quantization_bounds(spark):
    pdf = pd.DataFrame({"id": range(100), "x": range(0, 10_000, 100),
                        "y": range(100)})
    out = zorder_keys(spark.createDataFrame(pdf), "x", "y", bits=4).toPandas()
    assert out["q_a"].between(0, 15).all()
    assert out["q_b"].between(0, 15).all()
    assert out["q_a"].nunique() > 8  # quantization actually spreads


def test_zordered_layout_prunes_both_columns(spark, tmp_path):
    ev = load_table(spark, SF, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    z_path = str(tmp_path / "z")
    t_path = str(tmp_path / "t")
    write_zordered(ev, z_path, "user_id", "ts_us", n_files=8, bits=16)
    # baseline: time-sorted layout (the default ingest order)
    (
        ev.repartitionByRange(8, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .parquet(t_path)
    )
    users = [r["user_id"] for r in ev.select("user_id").distinct().collect()]
    lo_u = min(users)
    t0 = ev.agg(F.min("ts_us")).collect()[0][0]
    t1 = ev.agg(F.max("ts_us")).collect()[0][0]
    mid = (t0 + t1) // 2
    span = (t1 - t0) // 8

    # single-user point predicate: the time-sorted layout reads EVERY
    # file; the z-ordered layout skips a real fraction of them
    zu = overlap_fraction(spark, z_path, "user_id", lo_u, lo_u)
    tu = overlap_fraction(spark, t_path, "user_id", lo_u, lo_u)
    assert tu == 1.0
    assert zu <= 0.75

    # narrow time range: time-sorted is near-perfect; z-ordered must
    # still prune (the curve trades a little ts locality, not all of it)
    zt = overlap_fraction(spark, z_path, "ts_us", mid, mid + span)
    tt = overlap_fraction(spark, t_path, "ts_us", mid, mid + span)
    assert tt <= 0.5
    assert zt <= 0.75
    # and the written data round-trips completely
    assert spark.read.parquet(z_path).count() == ev.count()
