"""Data lifecycle — delete with data, clean_namespace GC, clone with copy
(reference scenarios tests/test_featurestore.py:274-347)."""

import os

import numpy as np
import pandas as pd


def _save(fs, name, n=5):
    fs.create_feature(name)
    idx = pd.date_range("2021-01-01", periods=n, freq="D")
    vals = np.arange(float(n))
    fs.save_dataframe(pd.DataFrame({"time": idx, "value": vals}), name)
    return vals


def test_delete_feature_with_data(fs):
    _save(fs, "test/del1")
    storage = fs._storage("test")
    assert storage.exists("del1")
    fs.delete_feature("test/del1", delete_data=True)
    assert not storage.exists("del1")
    assert len(fs.list_features(namespace="test")) == 0


def test_delete_feature_keeps_data_then_gc(fs):
    _save(fs, "test/del2")
    storage = fs._storage("test")
    fs.delete_feature("test/del2")  # metadata only
    assert storage.exists("del2")
    orphans = fs.clean_namespace("test")
    assert orphans == ["del2"]
    assert not storage.exists("del2")


def test_clone_feature_with_data(fs):
    vals = _save(fs, "test/cl_src")
    fs.clone_feature("test/cl_dst", from_name="test/cl_src")
    out = fs.load_pandas("test/cl_dst")
    np.testing.assert_allclose(out["test/cl_dst"].values, vals)
    # metadata copied
    row = fs.list_features(name="test/cl_dst").iloc[0]
    assert row["partition"] == "date"


def test_clone_transform_feature_copies_no_data(fs):
    _save(fs, "test/cl_raw")

    @fs.transform("test/cl_t", from_features=["test/cl_raw"])
    def t(df):
        return df + 1

    fs.clone_feature("test/cl_t2", from_name="test/cl_t")
    storage = fs._storage("test")
    assert not storage.exists("cl_t2")  # virtual: no dataset
    out = fs.load_pandas("test/cl_t2")
    np.testing.assert_allclose(out["test/cl_t2"].values, np.arange(5.0) + 1)


def test_partition_layout_year(fs):
    """partition='year' lays out partition=YYYY dirs; 'date' partition=YYYY-MM-DD."""
    fs.create_feature("test/py1", partition="year")
    idx = pd.date_range("2020-12-30", periods=4, freq="D")
    fs.save_dataframe(pd.DataFrame({"time": idx, "value": [1.0, 2, 3, 4]}),
                      "test/py1")
    storage = fs._storage("test")
    assert storage.list_partitions("py1") == ["2020", "2021"]

    fs.create_feature("test/pd1", partition="date")
    fs.save_dataframe(pd.DataFrame({"time": idx, "value": [1.0, 2, 3, 4]}),
                      "test/pd1")
    assert storage.list_partitions("pd1") == [
        "2020-12-30", "2020-12-31", "2021-01-01", "2021-01-02"]


def test_append_writes_one_file_per_partition(fs, spark):
    """The write path must not fan each task's rows into every partition
    dir (tiny-file explosion at scale)."""
    import os

    idx = pd.date_range("2021-01-01", periods=40, freq="6h")  # 10 days
    fs.create_feature("test/compact", partition="date")
    fs.save_dataframe(
        pd.DataFrame({"time": idx, "value": np.arange(40.0)}), "test/compact"
    )
    root = fs._storage("test").feature_path("compact")
    for d in os.listdir(root):
        if not d.startswith("partition="):
            continue
        files = [f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"


def test_compact_heals_fragmented_partitions(fs):
    """8 appends fragment each partition dir into 8 files; compaction
    rewrites to 1 file/partition and the bitemporal read is unchanged."""
    import pandas as pd

    fs.create_feature("test/frag")
    idx = pd.date_range("2021-01-01", periods=10, freq="D")
    for k in range(8):
        fs.save_dataframe(
            pd.DataFrame(
                {
                    "time": idx,
                    "created_time": idx + pd.Timedelta(minutes=k),
                    "value": [float(k * 100 + i) for i in range(10)],
                }
            ),
            "test/frag",
        )
    storage = fs._storage("test")
    before = storage.partition_file_counts("frag")
    assert max(before.values()) == 8
    loaded_before = fs.load_pandas("test/frag")

    stats = fs.compact_feature("test/frag")
    assert stats["partitions"] == 10
    assert stats["files_before"] == 80 and stats["files_after"] == 10
    after = storage.partition_file_counts("frag")
    assert set(after.values()) == {1}

    loaded_after = fs.load_pandas("test/frag")
    pd.testing.assert_frame_equal(loaded_before, loaded_after)

    # idempotent: nothing fragmented -> no-op
    assert fs.compact_feature("test/frag")["partitions"] == 0


def test_compact_recovers_interrupted_swap(fs):
    """Simulated crash mid-swap: a partition renamed aside but never
    swapped back must be restored by the next compact (no lost rows)."""
    import os
    import shutil

    fs.create_feature("test/crash")
    idx = pd.date_range("2021-01-01", periods=6, freq="D")
    for k in range(3):
        fs.save_dataframe(
            pd.DataFrame(
                {
                    "time": idx,
                    "created_time": idx + pd.Timedelta(minutes=k),
                    "value": [float(k * 10 + i) for i in range(6)],
                }
            ),
            "test/crash",
        )
    storage = fs._storage("test")
    loaded_before = fs.load_pandas("test/crash")
    root = storage.feature_path("crash")

    # crash scenario A: live dir moved aside, staged rename never happened
    retiring = root + "__retiring"
    os.makedirs(retiring, exist_ok=True)
    victim = "partition=2021-01-02"
    shutil.move(os.path.join(root, victim), os.path.join(retiring, victim))
    # crash scenario B: stale staging dir left behind
    os.makedirs(root + "__compacting", exist_ok=True)
    storage.invalidate("crash")

    stats = storage.recover_compaction("crash")
    assert stats["restored"] == 1
    assert not os.path.exists(retiring)
    assert not os.path.exists(root + "__compacting")
    pd.testing.assert_frame_equal(loaded_before, fs.load_pandas("test/crash"))

    # work dirs never leak into the dataset listing
    assert storage.ls() == ["crash"]

    # a full compact after recovery behaves normally
    stats = fs.compact_feature("test/crash")
    assert stats["partitions"] == 6
    pd.testing.assert_frame_equal(loaded_before, fs.load_pandas("test/crash"))


def test_compact_zero_row_partition_untouched(fs, spark):
    """A partition whose files hold zero rows stages nothing; compact must
    leave it intact (no KeyError, no dropped dir)."""
    import os

    import pyspark.sql.types as T

    fs.create_feature("test/zr")
    idx = pd.date_range("2021-01-01", periods=4, freq="D")
    for k in range(2):
        fs.save_dataframe(
            pd.DataFrame(
                {
                    "time": idx,
                    "created_time": idx + pd.Timedelta(minutes=k),
                    "value": [float(i) for i in range(4)],
                }
            ),
            "test/zr",
        )
    storage = fs._storage("test")
    root = storage.feature_path("zr")
    # fabricate a fragmented partition made only of zero-row files
    schema = T.StructType(
        [
            T.StructField("time", T.TimestampType()),
            T.StructField("created_time", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    zdir = os.path.join(root, "partition=2021-02-01")
    for k in range(2):
        spark.createDataFrame([], schema).coalesce(1).write.mode("append").parquet(
            zdir
        )
    storage.invalidate("zr")
    counts = storage.partition_file_counts("zr")
    assert counts["2021-02-01"] >= 2

    stats = fs.compact_feature("test/zr")
    assert os.path.isdir(zdir), "zero-row partition dir must survive"
    assert stats["files_after"] >= counts["2021-02-01"]
    after = storage.partition_file_counts("zr")
    assert set(after) == set(counts)


def test_storage_options_reach_hadoop_conf(spark, tmp_path):
    """Per-namespace storage_options must reach the reader/writer conf
    (reference: fsspec pass-through at every read/write)."""
    from bytehub_spark import FeatureStore

    store = FeatureStore(":memory:", spark=spark)
    store.create_namespace(
        "s3ns",
        url="s3a://my-bucket/prefix",
        description="remote",
        storage_options={
            "key": "AKIDEXAMPLE",
            "secret": "sekrit",
            "endpoint_url": "http://minio:9000",
            "fs.s3a.path.style.access": "true",
        },
    )
    st = store._storage("s3ns")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert st.applied_conf["fs.s3a.bucket.my-bucket.access.key"] == "AKIDEXAMPLE"
    assert hconf.get("fs.s3a.bucket.my-bucket.access.key") == "AKIDEXAMPLE"
    assert hconf.get("fs.s3a.bucket.my-bucket.secret.key") == "sekrit"
    assert hconf.get("fs.s3a.bucket.my-bucket.endpoint") == "http://minio:9000"
    # explicit full Hadoop keys pass through unscoped
    assert hconf.get("fs.s3a.path.style.access") == "true"

    # local namespaces with no options apply nothing
    store.create_namespace("loc", url=str(tmp_path / "loc"), description="l")
    assert store._storage("loc").applied_conf == {}
