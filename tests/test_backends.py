"""Backend seam: parquet default, delta opt-in via namespace meta.

Delta jars are absent in this container (verified in bytehub_spark/
backends.py docstring), so the delta round-trip tests skip; the seam
itself — routing, and the loud no-jars error — is always tested.
"""

import pandas as pd
import pytest

from bytehub_spark import FeatureStore
from bytehub_spark.backends import DeltaStorage, delta_available, make_storage
from bytehub_spark.exceptions import StorageError, ValidationError
from bytehub_spark.storage import SparkStorage


def test_default_backend_is_parquet(spark, tmp_path):
    st = make_storage(spark, str(tmp_path / "p"))
    assert type(st) is SparkStorage


def test_unknown_backend_rejected(spark, tmp_path):
    with pytest.raises(ValidationError):
        make_storage(spark, str(tmp_path / "x"), backend="orc")


def test_namespace_meta_selects_backend(spark, tmp_path):
    fs = FeatureStore(":memory:", spark=spark)
    fs.create_namespace(
        "d", url=str(tmp_path / "d"), description="", meta={"backend": "delta"}
    )
    if delta_available(spark):
        assert type(fs._storage("d")) is DeltaStorage
    else:
        with pytest.raises(StorageError, match="delta"):
            fs._storage("d")


@pytest.mark.skipif(
    "not __import__('bytehub_spark.backends', fromlist=['delta_available'])"
    ".delta_available(__import__('bytehub_spark.session', fromlist=['get_spark'])"
    ".get_spark())",
    reason="Delta Lake jars not on the classpath",
)
def test_delta_roundtrip_and_compact(spark, tmp_path):
    fs = FeatureStore(":memory:", spark=spark)
    fs.create_namespace(
        "d", url=str(tmp_path / "d"), description="", meta={"backend": "delta"}
    )
    fs.create_feature("d/f")
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
            "d/f",
        )
    before = fs.load_pandas("d/f")
    stats = fs.compact_feature("d/f")
    assert stats["files_after"] <= stats["files_before"]
    pd.testing.assert_frame_equal(before, fs.load_pandas("d/f"))
