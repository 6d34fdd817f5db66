"""Exception hierarchy for bytehub_spark.

Mirrors the reference's error surface (/root/reference/bytehub/exceptions.py)
without copying code: callers need to distinguish "missing object" from
"bad argument" from "storage failure".
"""


class FeatureStoreException(Exception):
    """Base class for all bytehub_spark errors."""


class MissingFeatureException(FeatureStoreException):
    """Namespace or feature does not exist in the catalog."""


class AlreadyExistsException(FeatureStoreException):
    """Namespace/feature with this name (or unique url) already exists."""


class ValidationError(FeatureStoreException, ValueError):
    """Bad name, bad schema, bad argument."""


class StorageError(FeatureStoreException):
    """Data-plane (filesystem / parquet) failure."""


class TransformError(FeatureStoreException):
    """Transform registration or execution failure (incl. cycles)."""
