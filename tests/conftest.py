import os
import shutil

import pytest

from bytehub_spark import FeatureStore
from bytehub_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="bytehub_spark_tests")
    yield s


@pytest.fixture()
def fs(spark, tmp_path):
    """Fresh store: in-memory catalog + tmp data dir with one namespace."""
    store = FeatureStore(":memory:", spark=spark)
    store.create_namespace("test", url=str(tmp_path / "featurestore"), description="t")
    yield store
    shutil.rmtree(tmp_path / "featurestore", ignore_errors=True)


@pytest.fixture()
def fs_factory(spark, tmp_path):
    """Factory of fresh stores — for hypothesis tests, where each example
    needs its own catalog/data dir (a plain fixture would leak state
    across shrink attempts)."""
    import itertools

    counter = itertools.count()

    def make():
        i = next(counter)
        store = FeatureStore(":memory:", spark=spark)
        store.create_namespace("test", url=str(tmp_path / f"fsf_{i}"), description="t")
        return store

    return make
