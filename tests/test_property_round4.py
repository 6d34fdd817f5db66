"""Property sweeps for the round-4 operators: KMV estimator laws vs a
pure-python reference, bucket-balance accounting, margin identity, and
the domain-reweight normalization contract."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from bytehub_spark.operators.hashing import fnv1a_cp, MINHASH_PRIME


# ---------------------------------------------------------------- KMV laws


def _py_kmv_est(values, k):
    """Pure-python KMV distinct estimate over fingerprint ints."""
    s = sorted(set(values))[:k]
    m = len(s)
    if m < k:
        return m, (s[-1] if s else 0), m
    u = s[-1]
    return m, u, (k - 1) * MINHASH_PRIME // u


@given(
    st.lists(
        st.integers(min_value=1, max_value=MINHASH_PRIME - 1),
        min_size=0,
        max_size=400,
    ),
    st.integers(min_value=2, max_value=32),
)
@settings(max_examples=200, deadline=None)
def test_kmv_estimator_laws(values, k):
    m, u, est = _py_kmv_est(values, k)
    n_true = len(set(values))
    if n_true < k:
        # complete sketch: estimate IS the truth
        assert est == n_true
    else:
        assert m == k
        assert est >= 1
        # scale sanity: (k-1)*P/u with u the k-th smallest of a set drawn
        # from [1, P) — the estimate can't exceed P
        assert est <= MINHASH_PRIME


@given(
    st.lists(
        st.integers(min_value=1, max_value=MINHASH_PRIME - 1),
        min_size=0,
        max_size=300,
    ),
    st.lists(
        st.integers(min_value=1, max_value=MINHASH_PRIME - 1),
        min_size=0,
        max_size=300,
    ),
    st.integers(min_value=2, max_value=32),
)
@settings(max_examples=200, deadline=None)
def test_kmv_merge_equals_one_shot(a, b, k):
    """Mergeability — the streaming monitor's correctness contract:
    bottom_k(bottom_k(A) ∪ bottom_k(B)) == bottom_k(A ∪ B)."""
    bk = lambda vs: sorted(set(vs))[:k]
    assert bk(bk(a) + bk(b)) == bk(a + b)


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_fnv_fingerprint_stable(s):
    """The scalar reference and the vectorized batch hash agree (the
    Spark path uses the numpy variant, the oracle replays the fold)."""
    from bytehub_spark.operators.hashing import fnv1a_cp_np

    assert fnv1a_cp_np([s])[0] == np.uint64(fnv1a_cp(s))


# ------------------------------------------------- margin identity


@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=-10000, max_value=10000),
    st.lists(st.integers(min_value=-10000, max_value=10000), min_size=1, max_size=4),
    st.lists(st.integers(min_value=-10000, max_value=10000), min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_generalized_margin_reduces_to_exact(k, cos_u, tops_a, tops_b):
    """When both candidate lists are full (ca = cb = k) the generalized
    margin equals the exact-mode formula."""
    tops_a = (tops_a * k)[:k]
    tops_b = (tops_b * k)[:k]
    sa, sb = sum(tops_a), sum(tops_b)
    ca = cb = k
    denom_g = cb * sa + ca * sb
    denom_e = sa + sb
    if denom_e <= 0:
        return
    g = (2 * ca * cb * cos_u * 1_000_000) // denom_g
    e = (2 * k * cos_u * 1_000_000) // denom_e
    assert g == e


# ------------------------------------------------- balance accounting


@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=500)
)
@settings(max_examples=100, deadline=None)
def test_candidate_pair_accounting(buckets):
    """cand_pairs = sum over buckets of c*(c-1)/2 equals the number of
    unordered same-bucket pairs counted directly."""
    from collections import Counter

    cs = Counter(buckets)
    formula = sum(c * (c - 1) // 2 for c in cs.values())
    direct = sum(
        1
        for i in range(len(buckets))
        for j in range(i + 1, len(buckets))
        if buckets[i] == buckets[j]
    )
    assert formula == direct


# ------------------------------------------------- reweight contract


def _py_reweight(means, step=100_000, cap=6):
    floor = min(means.values())
    lev = {d: min((m - floor) // step, cap) for d, m in means.items()}
    wr = {d: 1 << l for d, l in lev.items()}
    tot = sum(wr.values())
    return {d: w * 1_000_000 // tot for d, w in wr.items()}


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=0, max_value=2_000_000),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_reweight_normalization_laws(means):
    w = _py_reweight(means)
    total = sum(w.values())
    assert total <= 1_000_000
    assert total > 1_000_000 - len(w)  # floor-div loses < 1 ppm per domain
    # harder domains never get less weight
    for d1, m1 in means.items():
        for d2, m2 in means.items():
            if m1 >= m2:
                assert w[d1] >= w[d2]
