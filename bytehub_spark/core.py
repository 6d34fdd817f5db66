"""FeatureStore facade: the reference's public API re-expressed on Spark.

API parity target: /root/reference/bytehub/_base.py:61-260 (method names &
semantics) and core.py (CoreFeatureStore behavior). The read path builds ONE
lazy DataFrame plan — scan (Catalyst pushdown + Hive partition pruning) →
time-travel predicate → bitemporal dedup window → resample/align LOCF —
executed only at the caller's action.

Query lifecycle parity map (SURVEY.md §3.1):
  seed lookup        core._load_feature           [dask.py:142-148]
  pushdown scan      storage.scan                 [dask.py:85-106]
  default range      core._load_feature           [dask.py:150-155]
  time travel        timeseries.time_travel       [dask.py:119-122]
  dedup              timeseries.dedup_latest      [dask.py:156-165]
  resample/slice     timeseries.resample          [dask.py:169-191]
  alias + align      core.load_dataframe          [core.py:275-276]
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator, Sequence

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import timeseries as ts
from .catalog import Catalog
from .exceptions import (
    MissingFeatureException,
    TransformError,
    ValidationError,
)
from .storage import SparkStorage
from .utils import (
    deserialize_fn,
    join_name,
    serialize_fn,
    split_name,
    unpack_feature_list,
)

ENVELOPE_COLS = {ts.TIME_COL, ts.CREATED_COL}


def _value_type(meta: dict | None) -> T.DataType | None:
    """Catalog-recorded Spark type of a feature's stored value column
    (written by the save path); None when never saved / pre-migration."""
    if not meta or not meta.get("value_schema"):
        return None
    try:
        return T._parse_datatype_json_string(meta["value_schema"])
    except Exception:
        return None


def _qcol(name: str):
    """Column ref safe for names containing '.' (valid in feature names)."""
    return F.col(f"`{name}`")


class FeatureStore:
    """Spark-native feature store (core/local mode).

    ``connection_string`` is a sqlite path (or ':memory:') holding the
    metadata catalog; the data plane lives at each namespace's ``url``.
    """

    def __init__(
        self,
        connection_string: str = "bytehub.db",
        spark: SparkSession | None = None,
        enable_transforms: bool = True,
    ):
        if connection_string.startswith("sqlite:///"):
            connection_string = connection_string[len("sqlite:///"):]
        self.catalog = Catalog(connection_string)
        self._spark = spark
        self.enable_transforms = enable_transforms
        self._storages: dict[str, SparkStorage] = {}

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            from .session import get_spark

            self._spark = get_spark()
        return self._spark

    # ------------------------------------------------------------------
    # Namespace CRUD (§2.11)
    # ------------------------------------------------------------------

    def create_namespace(self, name: str, url: str, **kwargs) -> None:
        self.catalog.create_namespace(name, url, **kwargs)

    def list_namespaces(self, **kwargs) -> pd.DataFrame:
        rows = self.catalog.list_namespaces(
            name=kwargs.get("name"), regex=kwargs.get("regex")
        )
        cols = ["name", "description", "url", "storage_options", "meta", "version"]
        return pd.DataFrame(rows, columns=cols)

    def update_namespace(self, name: str, **kwargs) -> None:
        self.catalog.update_namespace(name, **kwargs)

    def delete_namespace(self, name: str) -> None:
        self.catalog.delete_namespace(name)

    def clean_namespace(self, name: str) -> list[str]:
        """GC: delete stored datasets with no catalog entry (anti-join J4)."""
        storage = self._storage(name)
        in_catalog = {f["name"] for f in self.catalog.list_features(namespace=name)}
        orphans = [d for d in storage.ls() if d not in in_catalog]
        for d in orphans:
            storage.delete(d)
        return orphans

    # ------------------------------------------------------------------
    # Feature CRUD (§2.11)
    # ------------------------------------------------------------------

    def create_feature(
        self, name: str, namespace: str | None = None, **kwargs
    ) -> None:
        nsp, nm = split_name(name, namespace)
        if nsp is None:
            raise ValidationError("create_feature requires a namespace")
        self.catalog.create_feature(nsp, nm, **kwargs)

    def list_features(self, **kwargs) -> pd.DataFrame:
        nsp, nm = (None, None)
        if kwargs.get("name"):
            nsp, nm = split_name(kwargs["name"], kwargs.get("namespace"))
        else:
            nsp = kwargs.get("namespace")
        rows = self.catalog.list_features(
            namespace=nsp, name=nm, regex=kwargs.get("regex")
        )
        if kwargs.get("friendly", True):
            for r in rows:
                r["transform"] = bool(r["transform"])
        cols = [
            "namespace", "name", "description", "partition",
            "serialized", "transform", "meta", "version",
        ]
        return pd.DataFrame(rows, columns=cols)

    def update_feature(self, name: str, namespace: str | None = None, **kwargs) -> None:
        nsp, nm = split_name(name, namespace)
        self.catalog.update_feature(nsp, nm, **kwargs)

    def delete_feature(
        self, name: str, namespace: str | None = None, delete_data: bool = False
    ) -> None:
        nsp, nm = split_name(name, namespace)
        self.catalog.delete_feature(nsp, nm)
        if delete_data:
            self._storage(nsp).delete(nm)

    def clone_feature(
        self, name: str, namespace: str | None = None, from_name: str | None = None,
        from_namespace: str | None = None,
    ) -> None:
        """Metadata clone + data copy (unless transform) — core.py:194-208."""
        src_ns, src_nm = split_name(from_name, from_namespace)
        dst_ns, dst_nm = split_name(name, namespace)
        src = self.catalog.clone_feature(src_ns, src_nm, dst_ns, dst_nm)
        if not src["transform"]:
            self._storage(src_ns).copy(src_nm, dst_nm, self._storage(dst_ns))

    # ------------------------------------------------------------------
    # Read path
    # ------------------------------------------------------------------

    def load_dataframe(
        self,
        features: Any,
        from_date=None,
        to_date=None,
        freq: str | None = None,
        time_travel: str | None = None,
    ) -> DataFrame:
        """Wide frame: `time` + one column per feature named "ns/name".

        Returns a LAZY Spark DataFrame ordered by time.
        """
        pairs = unpack_feature_list(features)
        # ONE Spark job for all per-feature scalar lookups (default-range
        # time bounds + LOCF seed timestamps) instead of up to 2 jobs per
        # feature: a k-branch union collected once. Each branch is a
        # partial-agg over that feature's pruned scan, so the batched job
        # does the same executor work as the k separate jobs minus the
        # per-job scheduling latency (~100 ms each on a loaded driver).
        hints = self._scalar_prepass(pairs, from_date, to_date, time_travel)

        fast = self._load_long_format(
            pairs, hints, from_date, to_date, freq, time_travel
        )
        if fast is not None:
            return fast

        def one(pair) -> DataFrame:
            nsp, nm = pair
            sdf = self._load_feature(
                nsp, nm, from_date, to_date, freq, time_travel, callers=[],
                hint=hints.get(pair),
            )
            return sdf.select(
                ts.TIME_COL, F.col(ts.VALUE_COL).alias(join_name(nsp, nm))
            )

        if len(pairs) > 1:
            # remaining per-feature plan construction (e.g. transform DAG
            # loads) still runs its own driver work; overlap it — k
            # features cost ~max not ~sum. The catalog is lock-backed.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(pairs))) as ex:
                frames = list(ex.map(one, pairs))
        else:
            frames = [one(pairs[0])]
        out = ts.align(
            frames,
            ffill=len(frames) > 1,
            range_hint=self._range_hint(from_date, to_date, hints),
        )
        return out.orderBy(ts.TIME_COL)

    def _load_long_format(
        self, pairs, hints, from_date, to_date, freq, time_travel
    ) -> DataFrame | None:
        """Multi-feature ranged resample as ONE long-format plan.

        The generic path builds k independent pipelines (scan → dedup
        window → two-pass LOCF each) and aligns them — correct for every
        argument shape, but plan construction is O(k) driver work (~0.6s/
        feature) and execution runs ~4 stages per feature. When every
        feature is a stored series of the SAME value type and the caller
        gave an explicit [from, to] + freq (the training-retrieval hot
        path), the whole load collapses to:

            union of k slim scans (tagged with the series name)
              → one time-travel predicate
              → one dedup window  partitionBy(series, time)
              → one LOCF resample partitionBy(series)   [per-key window]
              → one pivot on time

        Three shuffles TOTAL regardless of k, and the LOCF is an ordinary
        per-key window (parallel across features — no two-pass bucketing
        needed).

        Measured at 13 features × 35d hourly grid on local[32]: 2.1s vs
        7.5s for the generic path (plan construction alone drops 6.5→1.6s).
        The no-freq shapes are NOT routed here: align() already pivots at
        k>=8, and its per-feature dedup windows execute small parallel
        shuffles that beat one big union dedup at bench scale — measured
        wash-or-worse, so the generic path keeps them.

        Returns None when preconditions don't hold (no freq, open-ended
        range, transforms, mixed/unknown value types) — caller falls back
        to the generic per-feature path.
        """
        if len(pairs) < 2 or freq is None:
            return None
        if from_date is None or to_date is None:
            # per-feature default grids (each its own min/max) — generic path
            return None
        metas = {p: self.catalog.get_feature(*p) for p in pairs}
        if any(m is None or m["transform"] for m in metas.values()):
            return None
        vts = {(_value_type(m) or T.DataType()).json() for m in metas.values()}
        if len(vts) != 1 or _value_type(next(iter(metas.values()))) is None:
            return None

        if pd.Timestamp(to_date) < pd.Timestamp(from_date):
            to_date = from_date  # clamp (dask.py:154-155)

        names = [join_name(*p) for p in pairs]
        branches = []
        for (nsp, nm), full in zip(pairs, names):
            meta = metas[nsp, nm]
            storage = self._storage(nsp)
            vt = _value_type(meta)
            # seed row: last point at/before from, carried onto the grid
            seed = (hints.get((nsp, nm)) or {}).get("seed")
            scan_from = seed if seed is not None else from_date
            sdf = storage.scan(
                nm,
                from_date=scan_from,
                to_date=to_date,
                scheme=meta["partition"],
                base=storage.open(nm, value_type=vt),
                value_type=vt,
            )
            branches.append(
                sdf.select(
                    F.lit(full).alias("__series"),
                    F.col(ts.TIME_COL),
                    F.col(ts.CREATED_COL),
                    F.col(ts.VALUE_COL),
                )
            )
        unioned = branches[0]
        for b in branches[1:]:
            unioned = unioned.unionByName(b)
        if time_travel:
            unioned = ts.time_travel(unioned, time_travel)
        deduped = ts.dedup_latest(
            unioned, partition_by=["__series"]
        ).drop(ts.CREATED_COL)

        # keys_df = ALL requested series (an empty feature still gets
        # grid rows with null values — reference semantics for empty+freq)
        keys = self.spark.createDataFrame(
            [(n,) for n in names],
            T.StructType([T.StructField("__series", T.StringType())]),
        )
        long_df = ts.resample(
            deduped,
            from_date,
            to_date,
            freq,
            value_cols=[ts.VALUE_COL],
            partition_by=["__series"],
            keys_df=keys,
        )
        out = (
            long_df.groupBy(ts.TIME_COL)
            .pivot("__series", names)
            .agg(F.first(ts.VALUE_COL))
        )
        return out.orderBy(ts.TIME_COL)

    @staticmethod
    def _range_hint(from_date, to_date, hints: dict[tuple, dict]):
        """Overall (lo, hi) time span of a load, from explicit args and/or
        the prepass bounds — lets align()'s LOCF derive bucket bounds
        arithmetically instead of running an eager approxQuantile job that
        executes the whole join plan during construction. None when the
        span is unknown (e.g. all-transform loads with omitted range)."""
        if from_date is not None and to_date is not None:
            return (from_date, to_date)
        bs = [h["bounds"] for h in hints.values() if "bounds" in h]
        mns = [b[0] for b in bs if b[0] is not None]
        mxs = [b[1] for b in bs if b[1] is not None]
        lo = from_date if from_date is not None else (min(mns) if mns else None)
        hi = to_date if to_date is not None else (max(mxs) if mxs else None)
        if lo is None or hi is None:
            return None
        if pd.Timestamp(hi) < pd.Timestamp(lo):
            hi = lo  # clamp, mirroring the per-feature to<from clamp
        return (lo, hi)

    def load_pandas(self, features: Any, **kwargs) -> pd.DataFrame:
        """Reference-shaped result: pandas frame indexed by time; serialized
        feature values decoded back to Python objects."""
        pairs = unpack_feature_list(features)
        sdf = self.load_dataframe(features, **kwargs)
        pdf = sdf.toPandas()
        if len(pdf):
            pdf = pdf.set_index(ts.TIME_COL)
        else:
            pdf = pdf.set_index(ts.TIME_COL)
        pdf.index.name = ts.TIME_COL
        for nsp, nm in pairs:
            meta = self.catalog.get_feature(nsp, nm)
            if meta and meta["serialized"]:
                col = join_name(nsp, nm)
                pdf[col] = pdf[col].map(
                    lambda s: json.loads(s) if isinstance(s, str) else s
                )
        return pdf

    def materialize(
        self,
        source: str,
        dest: str,
        freq: str,
        from_date=None,
        to_date=None,
        partition: str = "date",
    ) -> None:
        """Persist a resampled rollup of ``source`` as feature ``dest`` —
        the hypertable/materialized-view pattern: downstream reads hit the
        small regular-grid rollup instead of re-running grid+LOCF over raw
        history. dest is created if missing; rows append bitemporally, so
        re-materializing is an ordinary versioned update."""
        nsp, nm = split_name(dest)
        if self.catalog.get_feature(nsp, nm) is None:
            self.create_feature(dest, partition=partition)
        rolled = self.load_dataframe(
            source, from_date=from_date, to_date=to_date, freq=freq
        )
        src_col = [c for c in rolled.columns if c != ts.TIME_COL][0]
        self.save_dataframe(
            rolled.select(ts.TIME_COL, F.col(src_col).alias(ts.VALUE_COL)), dest
        )

    def compact_feature(self, name: str, max_files_per_partition: int = 1) -> dict:
        """Rewrite a feature's fragmented partitions into target-sized
        files (storage.compact). Pure reorganization — bitemporal reads
        are byte-identical before/after; run it off the write path like
        a Delta OPTIMIZE."""
        nsp, nm = split_name(name)
        if self.catalog.get_feature(nsp, nm) is None:
            raise MissingFeatureException(f"No such feature {name!r}")
        return self._storage(nsp).compact(nm, max_files_per_partition)

    def sql(
        self,
        query: str,
        features: Any,
        from_date=None,
        to_date=None,
        freq: str | None = None,
        time_travel: str | None = None,
    ) -> DataFrame:
        """Run Spark SQL over features registered as temp views.

        Each feature's (deduped, optionally resampled/time-traveled) series
        becomes a view named from "ns/name" with non-identifier characters
        mapped to "_" (prod/price -> prod_price), columns (time, value).
        A Spark-native capability with no reference equivalent: ad-hoc
        SQL over bitemporally-resolved series, still one lazy plan.
        """
        import re as _re

        for nsp, nm in unpack_feature_list(features):
            sdf = self._load_feature(
                nsp, nm, from_date, to_date, freq, time_travel, callers=[]
            )
            view = _re.sub(r"[^A-Za-z0-9_]", "_", join_name(nsp, nm))
            sdf.createOrReplaceTempView(view)
        return self.spark.sql(query)

    def last(self, features: Any) -> dict[str, Any]:
        """Latest value per feature (None when empty) — core.py:315-331.

        Each feature's lookup is one tiny job (last-partition scan + dedup
        + limit 1); k features submit concurrently so wall time is ~max,
        not ~sum (value types differ per feature, so a single unioned job
        would force casts — concurrency gets the same latency win without
        touching types)."""
        pairs = unpack_feature_list(features)

        def one(pair):
            nsp, nm = pair
            sdf = self._load_feature(
                nsp, nm, None, None, None, None, callers=[], last_only=True
            )
            rows = ts.last_row(sdf).collect()
            if not rows:
                return None
            val = rows[0][ts.VALUE_COL]
            meta = self.catalog.get_feature(nsp, nm)
            if meta and meta["serialized"] and isinstance(val, str):
                val = json.loads(val)
            return val

        if len(pairs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(pairs))) as ex:
                vals = list(ex.map(one, pairs))
        else:
            vals = [one(pairs[0])]
        return {join_name(*p): v for p, v in zip(pairs, vals)}

    # -- internal ------------------------------------------------------

    def _open_recorded(self, nsp: str, nm: str, meta: dict):
        """open() with the catalog-recorded value type; when the catalog
        predates the dataset (rebuilt catalog over existing data), record
        the inferred type so every later read skips inference and the
        long-format fast path can engage — self-healing bookkeeping."""
        storage = self._storage(nsp)
        vt = _value_type(meta)
        base = storage.open(nm, value_type=vt)
        if vt is None and base is not None and ts.VALUE_COL in base.columns:
            self.catalog.set_value_schema(
                nsp, nm, base.schema[ts.VALUE_COL].dataType.json()
            )
        return base

    def _storage(self, namespace: str) -> SparkStorage:
        # setdefault keeps one SparkStorage per namespace even under the
        # threaded multi-feature load (two would split the open() memo)
        st = self._storages.get(namespace)
        if st is None:
            nsrow = self.catalog.get_namespace(namespace)
            if nsrow is None:
                raise MissingFeatureException(f"Namespace {namespace!r} does not exist")
            from .backends import make_storage

            st = self._storages.setdefault(
                namespace,
                make_storage(
                    self.spark,
                    nsrow["url"],
                    nsrow.get("storage_options") or {},
                    (nsrow.get("meta") or {}).get("backend"),
                ),
            )
        return st

    def _scalar_prepass(
        self, pairs, from_date, to_date, time_travel
    ) -> dict[tuple, dict]:
        """Batch every per-feature scalar lookup of a multi-feature load
        into one Spark job.

        Two scalar kinds feed plan construction: default-range time bounds
        (needed when from/to omitted) and the LOCF seed timestamp (the last
        point at/before ``from_date`` — only meaningful when ``from_date``
        is explicit: with it omitted the range starts at the data minimum,
        which no seed can precede). Each feature contributes ONE pruned
        scan of slim `(i, time, created_time)` rows; the scans union
        (narrow — no per-branch query stage) into a single `groupBy(i)`
        computing min/max/conditional-seed, so the whole prepass is one
        shuffle and 2-3 scheduler jobs under AQE regardless of k.
        Transform features are skipped (their leaves load recursively with
        their own ranges).
        """
        from .utils import parse_timedelta_interval

        hints: dict[tuple, dict] = {}
        branches = []
        need: dict[int, tuple[bool, bool]] = {}
        need_bounds = from_date is None or to_date is None
        need_seed = from_date is not None
        metas = {p: self.catalog.get_feature(*p) for p in pairs}
        stored = [p for p in pairs if metas[p] is not None and not metas[p]["transform"]]
        # open() builds a fresh parquet file index per feature (~0.5s of
        # driver+listing latency each); warm all memos concurrently so k
        # features pay ~max not ~sum. Spark handles concurrent job
        # submission; _storage() is idempotent under races (setdefault).
        if len(stored) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(stored))) as ex:
                list(
                    ex.map(lambda p: self._open_recorded(*p, metas[p]), stored)
                )
            # pick up any value types recorded by the warm pass
            metas.update({p: self.catalog.get_feature(*p) for p in stored})
        for i, (nsp, nm) in enumerate(pairs):
            meta = metas[nsp, nm]
            if meta is None or meta["transform"]:
                continue  # _load_feature raises / dispatches later
            storage = self._storage(nsp)
            base = storage.open(nm, value_type=_value_type(meta))
            scheme = meta["partition"]
            hint: dict = {}
            hints[(nsp, nm)] = hint
            if base is None:
                # empty dataset: bounds and seed are definitionally null
                if need_bounds:
                    hint["bounds"] = (None, None)
                if need_seed:
                    hint["seed"] = None
                continue
            if need_bounds:
                sdf = storage.scan(nm, scheme=scheme, base=base)
            else:
                # seed-only: prune the scan to time <= from_date
                sdf = storage.scan(nm, to_date=from_date, scheme=scheme, base=base)
            branches.append(
                sdf.select(
                    F.lit(i).alias("__i"),
                    F.col(ts.TIME_COL),
                    F.col(ts.CREATED_COL),
                )
            )
            need[i] = (need_bounds, need_seed)
        if branches:
            allrows = branches[0]
            for b in branches[1:]:
                allrows = allrows.unionByName(b)
            aggs = [
                F.min(ts.TIME_COL).alias("mn"),
                F.max(ts.TIME_COL).alias("mx"),
            ]
            if need_seed:
                seed_pred = F.col(ts.TIME_COL) <= F.lit(
                    pd.Timestamp(from_date)
                ).cast("timestamp")
                if time_travel:
                    seed_pred = seed_pred & (
                        F.col(ts.CREATED_COL)
                        <= F.col(ts.TIME_COL)
                        + F.expr(parse_timedelta_interval(time_travel))
                    )
                aggs.append(
                    F.max(F.when(seed_pred, F.col(ts.TIME_COL))).alias("seed")
                )
            for row in allrows.groupBy("__i").agg(*aggs).collect():
                hint = hints[pairs[row["__i"]]]
                if need_bounds:
                    hint["bounds"] = (row["mn"], row["mx"])
                if need_seed:
                    hint["seed"] = row["seed"]
            # features whose scan matched no rows produce no group — their
            # scalars are null
            for i in need:
                hint = hints[pairs[i]]
                if need_bounds:
                    hint.setdefault("bounds", (None, None))
                if need_seed:
                    hint.setdefault("seed", None)
        return hints

    def _load_feature(
        self,
        namespace: str,
        name: str,
        from_date,
        to_date,
        freq: str | None,
        time_travel: str | None,
        callers: list[str],
        last_only: bool = False,
        hint: dict | None = None,
    ) -> DataFrame:
        """Single feature -> DataFrame(time, value). Dispatches transforms."""
        meta = self.catalog.get_feature(namespace, name)
        if meta is None:
            raise MissingFeatureException(f"Feature {namespace}/{name} does not exist")
        full = join_name(namespace, name)
        if full in callers:  # U3 cycle detection (_model.py:194-197)
            raise TransformError(f"Recursive transform: cycle at {full}")
        if meta["transform"]:
            return self._load_transform(
                meta, from_date, to_date, freq, time_travel,
                callers=[*callers, full], last_only=last_only,
            )

        storage = self._storage(namespace)
        scheme = meta["partition"]
        vt = _value_type(meta)
        # ONE partition-discovery pass per load: every scan below filters
        # this shared frame (a fresh spark.read per scan re-lists the whole
        # dataset — multi-second on a daily-partitioned multi-year feature)
        base = self._open_recorded(namespace, name, meta)

        if last_only:
            parts = storage.list_partitions(name, reverse=True)
            if not parts or base is None:
                # canonical empty frame
                return storage.scan(name, base=base, value_type=vt)
            df = base.where(F.col("partition") == parts[0]).drop("partition")
            return ts.dedup_latest(df)

        # default range = data min/max (dask.py:150-155)
        eff_from, eff_to = from_date, to_date
        if eff_from is None or eff_to is None:
            if hint is not None and "bounds" in hint:
                mn, mx = hint["bounds"]
            else:
                mn, mx = ts.time_bounds(
                    storage.scan(name, scheme=scheme, base=base, value_type=vt)
                )
            if eff_from is None:
                eff_from = mn
            if eff_to is None:
                eff_to = mx
        if eff_from is None and eff_to is None:
            # feature has no data at all
            empty = storage.scan(name, scheme=scheme, base=base, value_type=vt)
            if freq is not None and from_date is not None and to_date is not None:
                return ts.resample(empty, from_date, to_date, freq)
            return empty
        if eff_to is not None and eff_from is not None:
            if pd.Timestamp(eff_to) < pd.Timestamp(eff_from):
                eff_to = eff_from  # clamp (dask.py:154-155)

        # seed lookup (J3, dask.py:142-148): extend scan to the last point
        # at/before from so LOCF has a value at the range boundary. Only
        # when from_date is EXPLICIT: an omitted from_date defaults to the
        # data minimum, which no seed row can precede — the lookup would
        # be a guaranteed-no-op Spark job.
        scan_from = eff_from
        if from_date is not None:
            if hint is not None and "seed" in hint:
                seed_t = hint["seed"]
            else:
                seed_df = storage.scan(
                    name, to_date=from_date, scheme=scheme, base=base, value_type=vt
                )
                if time_travel:
                    seed_df = ts.time_travel(seed_df, time_travel)
                seed_t = seed_df.agg(F.max(ts.TIME_COL).alias("t")).collect()[0]["t"]
            if seed_t is not None:
                scan_from = seed_t

        df = storage.scan(
            name, from_date=scan_from, to_date=eff_to, scheme=scheme, base=base,
            value_type=vt,
        )
        if time_travel:
            df = ts.time_travel(df, time_travel)
        df = ts.dedup_latest(df)
        df = df.drop(ts.CREATED_COL)

        if freq is not None:
            return ts.resample(df, eff_from, eff_to, freq)
        if from_date is not None:
            df = df.where(
                F.col(ts.TIME_COL) >= F.lit(pd.Timestamp(eff_from)).cast("timestamp")
            )
        if to_date is not None:
            df = df.where(
                F.col(ts.TIME_COL) <= F.lit(pd.Timestamp(eff_to)).cast("timestamp")
            )
        return df

    # ------------------------------------------------------------------
    # Transforms (U1–U4)
    # ------------------------------------------------------------------

    def transform(
        self, name: str, namespace: str | None = None,
        from_features: Sequence[str] = (), **kwargs
    ) -> Callable:
        """Decorator registering a virtual feature (core.py:220-244)."""
        def decorator(fn: Callable) -> Callable:
            payload = {
                "format": "cloudpickle",
                "function": serialize_fn(fn),
                "args": list(from_features),
            }
            nsp, nm = split_name(name, namespace)
            existing = self.catalog.get_feature(nsp, nm)
            if existing is None:
                self.catalog.create_feature(
                    nsp, nm, transform=payload, **kwargs
                )
            else:
                self.catalog.update_feature(nsp, nm, transform=payload)
            return fn

        return decorator

    def _load_transform(
        self, meta: dict, from_date, to_date, freq, time_travel,
        callers: list[str], last_only: bool = False,
    ) -> DataFrame:
        if not self.enable_transforms:
            raise TransformError(
                "Transforms are disabled on this store (enable_transforms=False)"
            )
        payload = meta["transform"]
        fn = deserialize_fn(payload["function"])
        args: list[str] = payload["args"]

        inputs: list[DataFrame] = []
        for full in args:
            nsp, nm = split_name(full)
            sdf = self._load_feature(
                nsp, nm, from_date, to_date, freq, time_travel,
                callers=callers, last_only=last_only,
            )
            inputs.append(
                sdf.select(ts.TIME_COL, F.col(ts.VALUE_COL).alias(full))
            )
        wide = ts.align(
            inputs,
            ffill=len(inputs) > 1,
            range_hint=(from_date, to_date)
            if from_date is not None and to_date is not None
            else None,
        )

        # Infer output type by applying fn to a small driver-side sample
        sample = wide.limit(100).toPandas().set_index(ts.TIME_COL)
        sample = sample[args] if args else sample
        try:
            sample_out = fn(sample)
        except Exception as e:
            raise TransformError(f"Transform function failed on sample: {e}") from e
        if isinstance(sample_out, pd.DataFrame):
            if sample_out.shape[1] != 1:
                raise TransformError(
                    "Transform must return a single column "
                    f"(got {sample_out.shape[1]})"
                )
            out_dtype = sample_out.iloc[:, 0]
        elif isinstance(sample_out, pd.Series):
            out_dtype = sample_out
        else:
            raise TransformError(
                "Transform must return a pandas DataFrame or Series"
            )
        value_type = _pandas_dtype_to_spark(out_dtype)

        out_schema = T.StructType(
            [
                T.StructField(ts.TIME_COL, T.TimestampType()),
                T.StructField(ts.VALUE_COL, value_type),
            ]
        )

        arg_list = list(args)

        def apply_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if len(pdf) == 0:
                    continue
                frame = pdf.set_index(ts.TIME_COL)[arg_list]
                res = fn(frame)
                if isinstance(res, pd.Series):
                    res = res.to_frame(ts.VALUE_COL)
                res.columns = [ts.VALUE_COL]
                res = res.reset_index()
                res.columns = [ts.TIME_COL, ts.VALUE_COL]
                yield res

        # Transforms run per-batch (parity with the reference's dask
        # map_partitions contract: elementwise / same-index functions).
        return wide.mapInPandas(apply_fn, schema=out_schema)

    # ------------------------------------------------------------------
    # Write path
    # ------------------------------------------------------------------

    def save_dataframe(
        self, df: Any, name: str | None = None, namespace: str | None = None
    ) -> None:
        """Save a pandas or Spark frame (core.py:278-313).

        Single-feature form: columns {time?, created_time?, value} + explicit
        name; or the payload column itself named "ns/name". Wide form: k
        feature-named columns → split into per-feature saves (unpivot).
        """
        if isinstance(df, pd.DataFrame):
            self._save_pandas(df, name, namespace)
        elif isinstance(df, DataFrame):
            self._save_spark(df, name, namespace)
        else:
            raise ValidationError(
                f"save_dataframe expects a pandas or Spark DataFrame, got {type(df)}"
            )

    def _save_pandas(self, pdf: pd.DataFrame, name, namespace) -> None:
        pdf = pdf.copy()
        if isinstance(pdf.index, pd.DatetimeIndex):
            if ts.TIME_COL in pdf.columns:
                raise ValidationError(
                    "Ambiguous time: both DatetimeIndex and 'time' column present"
                )
            pdf = pdf.reset_index().rename(columns={pdf.index.name or "index": ts.TIME_COL})
        if ts.TIME_COL not in pdf.columns:
            raise ValidationError("save requires a 'time' column or DatetimeIndex")

        payload_cols = [c for c in pdf.columns if c not in ENVELOPE_COLS and c != ts.TIME_COL]
        if not payload_cols:
            raise ValidationError("No value column to save")
        if len(payload_cols) > 1 or (payload_cols[0] != ts.VALUE_COL and "/" in payload_cols[0]):
            # wide form: each column is a feature
            for col in payload_cols:
                sub_cols = [ts.TIME_COL] + ([ts.CREATED_COL] if ts.CREATED_COL in pdf.columns else [])
                sub = pdf[sub_cols + [col]].rename(columns={col: ts.VALUE_COL})
                nsp, nm = split_name(col, namespace if "/" not in col else None)
                self._save_pandas(sub, nm, nsp)
            return

        col = payload_cols[0]
        if col != ts.VALUE_COL:
            nsp, nm = split_name(col, namespace)
            pdf = pdf.rename(columns={col: ts.VALUE_COL})
        else:
            if name is None:
                raise ValidationError(
                    "Column named 'value' requires an explicit feature name"
                )
            nsp, nm = split_name(name, namespace)
        meta = self.catalog.get_feature(nsp, nm)
        if meta is None:
            raise MissingFeatureException(f"Feature {nsp}/{nm} does not exist")

        if ts.CREATED_COL not in pdf.columns:
            pdf[ts.CREATED_COL] = pd.Timestamp.now()
        pdf[ts.TIME_COL] = pd.to_datetime(pdf[ts.TIME_COL])
        pdf[ts.CREATED_COL] = pd.to_datetime(pdf[ts.CREATED_COL])
        pdf = pdf[[ts.TIME_COL, ts.CREATED_COL, ts.VALUE_COL]]

        if meta["serialized"]:
            pdf[ts.VALUE_COL] = pdf[ts.VALUE_COL].map(json.dumps)

        # pyarrow inference mirrors the reference's schema derivation
        # (dask.py:66-69): dict payloads become structs, not strings.
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        sdf = self.spark.createDataFrame(table)
        sdf = sdf.withColumn(ts.TIME_COL, F.col(ts.TIME_COL).cast("timestamp"))
        sdf = sdf.withColumn(ts.CREATED_COL, F.col(ts.CREATED_COL).cast("timestamp"))
        self._write_feature(nsp, nm, meta, sdf)

    def _save_spark(self, sdf: DataFrame, name, namespace) -> None:
        payload_cols = [c for c in sdf.columns if c not in ENVELOPE_COLS and c != ts.TIME_COL]
        if ts.TIME_COL not in sdf.columns:
            raise ValidationError("save requires a 'time' column")
        if not payload_cols:
            raise ValidationError("No value column to save")
        if len(payload_cols) > 1 or (payload_cols[0] != ts.VALUE_COL and "/" in payload_cols[0]):
            for col in payload_cols:
                keep = [ts.TIME_COL] + ([ts.CREATED_COL] if ts.CREATED_COL in sdf.columns else [])
                sub = sdf.select(*keep, _qcol(col).alias(ts.VALUE_COL))
                nsp, nm = split_name(col, namespace if "/" not in col else None)
                self._save_spark(sub, nm, nsp)
            return

        col = payload_cols[0]
        if col != ts.VALUE_COL:
            nsp, nm = split_name(col, namespace)
            sdf = sdf.withColumnRenamed(col, ts.VALUE_COL)
        else:
            if name is None:
                raise ValidationError(
                    "Column named 'value' requires an explicit feature name"
                )
            nsp, nm = split_name(name, namespace)
        meta = self.catalog.get_feature(nsp, nm)
        if meta is None:
            raise MissingFeatureException(f"Feature {nsp}/{nm} does not exist")

        if ts.CREATED_COL not in sdf.columns:
            sdf = sdf.withColumn(ts.CREATED_COL, F.current_timestamp())
        sdf = sdf.withColumn(ts.TIME_COL, F.col(ts.TIME_COL).cast("timestamp"))
        sdf = sdf.withColumn(ts.CREATED_COL, F.col(ts.CREATED_COL).cast("timestamp"))

        if meta["serialized"]:
            vt = sdf.schema[ts.VALUE_COL].dataType
            if isinstance(vt, (T.StructType, T.ArrayType, T.MapType)):
                sdf = sdf.withColumn(ts.VALUE_COL, F.to_json(ts.VALUE_COL))
            else:
                enc = F.pandas_udf(
                    lambda s: s.map(lambda v: json.dumps(v) if v is not None else None),
                    T.StringType(),
                )
                sdf = sdf.withColumn(ts.VALUE_COL, enc(F.col(ts.VALUE_COL)))

        self._write_feature(
            nsp, nm, meta, sdf.select(*[ts.TIME_COL, ts.CREATED_COL, ts.VALUE_COL])
        )

    def _write_feature(self, nsp: str, nm: str, meta: dict, sdf: DataFrame) -> None:
        """Append + catalog bookkeeping: the first successful save records
        the stored value type so later reads use an explicit schema (no
        parquet inference job) and later appends guard against evolution
        without opening the dataset."""
        vt = _value_type(meta)
        self._storage(nsp).write(
            nm, sdf, scheme=meta["partition"], known_value_type=vt
        )
        if vt is None:
            self.catalog.set_value_schema(
                nsp, nm, sdf.schema[ts.VALUE_COL].dataType.json()
            )


def _pandas_dtype_to_spark(series: pd.Series) -> T.DataType:
    """Infer a Spark type for a transform's output column."""
    import numpy as np

    dt = series.dtype
    if pd.api.types.is_float_dtype(dt):
        return T.DoubleType()
    if pd.api.types.is_integer_dtype(dt):
        return T.LongType()
    if pd.api.types.is_bool_dtype(dt):
        return T.BooleanType()
    if pd.api.types.is_datetime64_any_dtype(dt):
        return T.TimestampType()
    if dt == object and len(series):
        v = series.dropna()
        if len(v):
            first = v.iloc[0]
            if isinstance(first, str):
                return T.StringType()
            if isinstance(first, (int, np.integer)):
                return T.LongType()
            if isinstance(first, (float, np.floating)):
                return T.DoubleType()
    return T.DoubleType()


def _not_implemented_tasks(self, *a, **kw):
    """Scheduled tasks are a reference roadmap item that raises
    NotImplementedError there too (_base.py:250-260) — kept for API parity."""
    raise NotImplementedError("Tasks are not available in bytehub_spark")


FeatureStore.create_task = _not_implemented_tasks
FeatureStore.update_task = _not_implemented_tasks
FeatureStore.delete_task = _not_implemented_tasks
FeatureStore.list_tasks = _not_implemented_tasks
