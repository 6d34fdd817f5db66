"""Round-13 tests: ADVICE-r12 fixes (HLL m BIGINT bound, pickleable
QgramBudgetExceeded, GroupedHllMonitor n_batches ordering, persisted
hll_overlap register frames) and the VERDICT-r12 embedding_cosine_dups
probe-then-collect cap guard.
"""

import pickle

import pytest
from pyspark.sql import functions as F

from bytehub_spark.operators import dedup
from bytehub_spark.operators import sketches as S
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"


# --------------------------- HLL m bound (ADVICE r12 #1)


def test_hll_estimate_rejects_bigint_unsafe_m(spark):
    """709*m^2*2^31 overflows BIGINT at m=4096 (2.55e19 > 2^63-1); the
    estimator must refuse rather than return NULL/overflowed est on the
    harmonic branch."""
    regs = spark.createDataFrame([(0, 1)], "bucket int, rho int")
    for fn in (S.hll_estimate, S.hll_estimate_corrected):
        with pytest.raises(ValueError, match="2048"):
            fn(regs, m=4096)
        with pytest.raises(ValueError):
            fn(regs, m=96)  # not a power of two


def test_hll_estimate_m2048_is_bigint_safe(spark):
    """m=2048 is the documented safe max: numerator 709*2048^2*2^31 ~
    6.4e18 < 2^63-1. A single occupied register must produce a sane
    positive estimate (not NULL, not negative-overflow)."""
    assert 709 * 2048 * 2048 * (1 << 31) < 2**63 - 1
    assert 709 * 4096 * 4096 * (1 << 31) > 2**63 - 1
    regs = spark.createDataFrame([(0, 1)], "bucket int, rho int")
    row = S.hll_estimate_corrected(regs, m=2048).collect()[0]
    assert row["est_raw"] is not None and row["est_raw"] > 0
    # sparse -> LC branch: occ=1 of 2048 -> round(2048*ln(2048/2047)) = 1
    assert row["est_distinct"] == 1


def test_hll_lc_values_bound_matches_estimator():
    """The LC literal-table bound now equals hll_estimate's BIGINT-safe
    bound — a CASE table the finisher can't legally consume is a trap."""
    assert len(S.hll_lc_values(2048)) == 2048
    with pytest.raises(ValueError, match="2048"):
        S.hll_lc_values(4096)


# --------------------------- QgramBudgetExceeded pickle (ADVICE r12 #2)


def test_qgram_budget_exceeded_pickle_roundtrip():
    """super().__init__(msg) sets args=(msg,), so the default
    BaseException reduce re-calls the 3-arg __init__ with one arg —
    any cross-process re-raise (pytest-xdist, multiprocessing) died
    with TypeError instead of the original error. __reduce__ fixes it."""
    e = dedup.QgramBudgetExceeded(
        "over budget", {"volume": 10}, {"volume": 7}
    )
    e2 = pickle.loads(pickle.dumps(e))
    assert isinstance(e2, dedup.QgramBudgetExceeded)
    assert str(e2) == "over budget"
    assert e2.plan_direct == {"volume": 10}
    assert e2.plan_collapsed == {"volume": 7}


# --------------------------- GroupedHllMonitor ordering (ADVICE r12 #3)


def test_grouped_hll_monitor_failed_batch_not_counted(spark, monkeypatch):
    """n_batches must increment only AFTER the collect succeeds (the
    hardened CountMinMonitor ordering): a failed-then-replayed batch
    must not double-count — register state is already idempotent, this
    keeps throughput logs and the result() guard honest."""
    from bytehub_spark.operators import sketches as sk_mod
    from bytehub_spark.streaming import GroupedHllMonitor

    ev = load_table(spark, SF, "events").limit(50)
    mon = GroupedHllMonitor()

    real = sk_mod.hll_registers

    def boom(*a, **kw):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(sk_mod, "hll_registers", boom)
    with pytest.raises(RuntimeError):
        mon.process_batch(ev, epoch_id=5)
    assert mon.n_batches == 0  # NOT counted
    assert mon.regs == {}
    with pytest.raises(RuntimeError):
        mon.result()  # guard still sees zero batches

    monkeypatch.setattr(sk_mod, "hll_registers", real)
    mon.process_batch(ev, epoch_id=5)  # re-delivery: processed + counted
    assert mon.n_batches == 1
    state = dict(mon.regs)
    assert state
    mon.process_batch(ev, epoch_id=5)  # re-delivery again: idempotent
    assert mon.n_batches == 2
    assert mon.regs == state


def test_grouped_hll_monitor_empty_batch_counts(spark):
    """An empty micro-batch IS fully processed (max-merge identity) —
    it counts toward n_batches and unblocks result()."""
    from bytehub_spark.streaming import GroupedHllMonitor

    ev = load_table(spark, SF, "events").limit(0)
    mon = GroupedHllMonitor()
    mon.process_batch(ev, epoch_id=0)
    assert mon.n_batches == 1
    assert mon.result().count() == 0


# --------------------------- hll_overlap persists registers (ADVICE r12 #4)


def test_hll_overlap_persists_both_register_frames(spark):
    """Each register frame feeds two consumers (own estimate + union
    max-merge); the no-double-scan property must not ride on exchange
    reuse, which AQE can defeat — both frames get scratch_persist'd."""
    from bytehub_spark.plans import scratch as scratch_mod

    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(100, 300).select(F.col("id").alias("k"))
    before = len(scratch_mod._scratch)
    row = S.hll_overlap(a, b, "k", 64).collect()[0]
    registered = scratch_mod._scratch[before:]
    assert len(registered) == 2
    assert all(df.storageLevel.useMemory for df in registered)
    # values unchanged by the persist
    assert row["est_inter"] == row["est_a"] + row["est_b"] - row["est_union"]
    assert row["occupied_union"] >= max(row["occupied_a"], row["occupied_b"])
    scratch_mod.release_scratch()


# --------------------------- embedding_cosine_dups probe (VERDICT r12 #1)


def test_embedding_cosine_dups_cap_probe_raises_cleanly(spark, monkeypatch):
    """The exact path must probe with limit(cap+1) BEFORE materializing
    — at 100x scale the old order's refusal was a driver OOM, not a
    ValueError. With the cap monkeypatched below a small corpus the
    guard must fire (and the probe pulls at most cap+1 rows)."""
    emb = load_table(spark, SF, "embeddings")
    assert emb.count() > 3
    monkeypatch.setattr(dedup, "MAX_BROADCAST_VECTORS", 3)
    with pytest.raises(ValueError, match="more than 3"):
        dedup.embedding_cosine_dups(emb, 0.4)

    # spy: the frame that reaches toPandas is the LIMITED probe, never
    # the full table
    cls = type(emb)  # the concrete (classic) DataFrame class — pyspark 4
    real_toPandas = cls.toPandas
    seen: list[int] = []

    def spy(self):
        out = real_toPandas(self)
        seen.append(len(out))
        return out

    monkeypatch.setattr(cls, "toPandas", spy)
    with pytest.raises(ValueError):
        dedup.embedding_cosine_dups(emb, 0.4)
    assert seen == [4]  # cap+1, not the full corpus


def test_embedding_cosine_dups_under_cap_unchanged(spark):
    """The probe IS the side table when under cap — exact results are
    byte-identical to the pre-fix path (pins the limit() refactor)."""
    emb = load_table(spark, SF, "embeddings").limit(40)
    got = dedup.embedding_cosine_dups(emb, 0.4).toPandas()
    assert (got["id_a"] < got["id_b"]).all()
    assert (got["cosine_sim"] >= 0.4).all()
