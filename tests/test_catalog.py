"""Catalog CRUD semantics — mirrors reference scenarios
tests/test_featurestore.py:104-271 (namespaces, features, meta merge,
version bump, constraints) with a fresh implementation and pandas checks."""

import pytest

from bytehub_spark import (
    AlreadyExistsException,
    FeatureStore,
    MissingFeatureException,
    ValidationError,
)
from bytehub_spark.utils import parse_freq, split_name, unpack_feature_list


def make_fs():
    return FeatureStore(":memory:")


def test_name_parsing():
    assert split_name("ns/feat") == ("ns", "feat")
    assert split_name("ns/fe/at") == ("ns", "fe/at")  # split on FIRST slash
    assert split_name("feat", "ns") == ("ns", "feat")
    assert unpack_feature_list("a/b") == [("a", "b")]
    assert unpack_feature_list(["a/b", {"namespace": "c", "name": "d"}]) == [
        ("a", "b"),
        ("c", "d"),
    ]
    with pytest.raises(ValidationError):
        unpack_feature_list("noslash")


def test_freq_parsing():
    assert parse_freq("2d") == (2, "day", 172800)
    assert parse_freq("10min") == (10, "minute", 600)
    assert parse_freq("60min") == (60, "minute", 3600)
    assert parse_freq("1h") == (1, "hour", 3600)
    with pytest.raises(ValidationError):
        parse_freq("3fortnights")


def test_namespace_crud():
    fs = make_fs()
    fs.create_namespace("ns1", url="/tmp/x1", description="d1")
    with pytest.raises(AlreadyExistsException):
        fs.create_namespace("ns1", url="/tmp/other")
    with pytest.raises(AlreadyExistsException):  # unique url
        fs.create_namespace("ns2", url="/tmp/x1")
    with pytest.raises(ValidationError):  # bad name
        fs.create_namespace("bad name!", url="/tmp/x3")

    df = fs.list_namespaces()
    assert list(df["name"]) == ["ns1"]
    assert df.iloc[0]["version"] == 1

    fs.update_namespace("ns1", description="d2", meta={"a": 1})
    row = fs.list_namespaces(name="ns1").iloc[0]
    assert row["description"] == "d2"
    assert row["meta"] == {"a": 1}
    assert row["version"] == 2

    # meta merge + None deletes a key
    fs.update_namespace("ns1", meta={"b": 2, "a": None})
    row = fs.list_namespaces(name="ns1").iloc[0]
    assert row["meta"] == {"b": 2}
    assert row["version"] == 3

    with pytest.raises(MissingFeatureException):
        fs.update_namespace("nope", description="x")

    fs.delete_namespace("ns1")
    assert len(fs.list_namespaces()) == 0


def test_feature_crud():
    fs = make_fs()
    fs.create_namespace("ns1", url="/tmp/y1")
    with pytest.raises(MissingFeatureException):  # namespace must exist
        fs.create_feature("missing/f1")
    fs.create_feature("ns1/f1", description="one")
    fs.create_feature("f2", namespace="ns1", partition="year")
    with pytest.raises(AlreadyExistsException):
        fs.create_feature("ns1/f1")
    with pytest.raises(ValidationError):
        fs.create_feature("ns1/f3", partition="month")

    df = fs.list_features(namespace="ns1")
    assert sorted(df["name"]) == ["f1", "f2"]
    assert fs.list_features(regex="f1$")["name"].tolist() == ["f1"]

    fs.update_feature("ns1/f1", description="uno", meta={"k": "v"})
    row = fs.list_features(name="ns1/f1").iloc[0]
    assert row["description"] == "uno" and row["version"] == 2

    # namespace with features cannot be deleted
    with pytest.raises(ValidationError):
        fs.delete_namespace("ns1")

    fs.delete_feature("ns1/f1")
    fs.delete_feature("ns1/f2")
    with pytest.raises(MissingFeatureException):
        fs.delete_feature("ns1/f2")
    fs.delete_namespace("ns1")
