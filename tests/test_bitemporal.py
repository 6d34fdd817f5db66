"""Time travel + last() — reference scenarios
tests/test_featurestore.py:550-624."""

import numpy as np
import pandas as pd

rng = np.random.default_rng(11)


def test_time_travel(fs):
    """Three overlapping saves with created_time = time - {10,30,60}min;
    time_travel='-15min' must see only rows known 15min before event time,
    i.e. the -30min and -60min generations (latest of those: -30min)."""
    fs.create_feature("test/tt1")
    idx = pd.date_range("2021-01-01", periods=10, freq="D")
    gens = {}
    for off in (60, 30, 10):  # save oldest-known first
        vals = rng.integers(0, 100, size=10).astype("int64")
        gens[off] = vals
        fs.save_dataframe(
            pd.DataFrame({
                "time": idx,
                "created_time": idx - pd.Timedelta(minutes=off),
                "value": vals,
            }),
            "test/tt1",
        )

    # no time travel → latest created_time wins → -10min generation
    out = fs.load_pandas("test/tt1")
    np.testing.assert_array_equal(out["test/tt1"].values, gens[10])

    # as-of 15min before event time → -30min generation is the latest known
    out = fs.load_pandas("test/tt1", time_travel="-15min")
    np.testing.assert_array_equal(out["test/tt1"].values, gens[30])

    # as-of 45min before → only the -60min generation
    out = fs.load_pandas("test/tt1", time_travel="-45min")
    np.testing.assert_array_equal(out["test/tt1"].values, gens[60])


def test_last_values(fs):
    fs.create_feature("test/l1")
    fs.create_feature("test/l2")
    fs.create_feature("test/l3")  # never saved
    idx = pd.date_range("2021-01-01", periods=10, freq="D")
    v1 = rng.integers(0, 100, size=10).astype("int64")
    v2 = rng.normal(size=10)
    fs.save_dataframe(pd.DataFrame({"time": idx, "value": v1}), "test/l1")
    fs.save_dataframe(pd.DataFrame({"time": idx, "value": v2}), "test/l2")

    result = fs.last(["test/l1", "test/l2", "test/l3"])
    assert result["test/l1"] == v1[-1]
    assert abs(result["test/l2"] - v2[-1]) < 1e-12
    assert result["test/l3"] is None


def test_last_respects_bitemporal_dedup(fs):
    fs.create_feature("test/l4")
    idx = pd.date_range("2021-01-01", periods=5, freq="D")
    fs.save_dataframe(
        pd.DataFrame({"time": idx, "created_time": pd.Timestamp("2021-02-01"),
                      "value": [1.0] * 5}), "test/l4")
    fs.save_dataframe(
        pd.DataFrame({"time": idx, "created_time": pd.Timestamp("2021-02-02"),
                      "value": [9.0] * 5}), "test/l4")
    assert fs.last("test/l4")["test/l4"] == 9.0


def test_serialized_schema_evolution(fs):
    """serialized=True JSON-encodes evolving payloads; a non-serialized
    feature must fail the same evolving append (ref :494-521)."""
    import pytest
    from bytehub_spark import StorageError

    fs.create_feature("test/ser1", serialized=True)
    idx1 = pd.date_range("2020-01-01", periods=5, freq="D")
    fs.save_dataframe(
        pd.DataFrame({"time": idx1, "value": list(range(5))}), "test/ser1")
    idx2 = pd.date_range("2020-01-06", periods=5, freq="D")
    fs.save_dataframe(
        pd.DataFrame({"time": idx2, "value": [{"x": i} for i in range(5)]}),
        "test/ser1")
    out = fs.load_pandas("test/ser1")
    assert len(out) == 10
    assert out["test/ser1"].iloc[0] == 0
    assert out["test/ser1"].iloc[-1] == {"x": 4}

    fs.create_feature("test/ser2")  # not serialized
    fs.save_dataframe(
        pd.DataFrame({"time": idx1, "value": list(range(5))}), "test/ser2")
    with pytest.raises(StorageError):
        fs.save_dataframe(
            pd.DataFrame({"time": idx2, "value": [{"x": i} for i in range(5)]}),
            "test/ser2")
