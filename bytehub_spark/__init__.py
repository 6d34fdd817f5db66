"""bytehub_spark — a PySpark-native timeseries feature store.

A from-scratch rebuild of the capabilities of bytehub-ai/bytehub
(/root/reference, studied for behavior only): bitemporal feature storage on
Hive-partitioned Parquet, as-of/LOCF retrieval, resampling, time travel,
transform DAGs — plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis) the reference does not have.

Entry point mirrors the reference factory (bytehub/__init__.py:33-50):
connection strings dispatch to the core (local catalog) client; http(s)
cloud mode is intentionally out of scope (control-plane transport only).
"""

from .core import FeatureStore


def connect(connection_string: str = "sqlite:///bytehub.db", **kwargs) -> FeatureStore:
    """Factory with the reference's dispatch shape (bytehub/__init__.py:33-50):
    http(s) URLs select the hosted control plane (out of scope here — raise
    with a pointer), anything else is a local catalog path/URI."""
    if connection_string.startswith(("http://", "https://")):
        raise NotImplementedError(
            "Cloud/REST control plane is out of scope for bytehub_spark; "
            "use a local catalog path (see README 'Known deltas')"
        )
    path = connection_string
    for prefix in ("sqlite:///", "sqlite://"):
        if path.startswith(prefix):
            path = path[len(prefix):] or ":memory:"
            break
    return FeatureStore(path, **kwargs)


from .exceptions import (
    AlreadyExistsException,
    FeatureStoreException,
    MissingFeatureException,
    StorageError,
    TransformError,
    ValidationError,
)
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "FeatureStore",
    "connect",
    "get_spark",
    "FeatureStoreException",
    "MissingFeatureException",
    "AlreadyExistsException",
    "ValidationError",
    "StorageError",
    "TransformError",
    "__version__",
]
