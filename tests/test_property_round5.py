"""Property sweeps for the round-5 operators against pure-python
references: Bloom filter laws (no false negatives, monotone-in-m FP
behavior), Markov transition accounting, RFM quintile scoring, budget
allocation arithmetic, and the int8 affine-quantization error bound.
These run WITHOUT Spark (the distributed impls replay the same integer
recipes; their equality with these references is pinned by the DuckDB
oracles and tests/test_round5.py fixtures)."""

import math

from hypothesis import given, settings, strategies as st

from bytehub_spark.operators.hashing import fnv1a_cp, FNV_OFFSET, FNV_OFFSET2, MINHASH_PRIME


# ------------------------------------------------------------ Bloom laws


def _py_bloom(shingles, m, k):
    """Pure-python twin of dedup.bloom_decontaminate's filter build:
    FNV h1/h2 + Kirsch-Mitzenmacher positions, 32-bit packed words."""
    words = {}
    for s in shingles:
        h1 = fnv1a_cp(s, FNV_OFFSET) % MINHASH_PRIME
        h2 = fnv1a_cp(s, FNV_OFFSET2) % (MINHASH_PRIME - 1) + 1
        for j in range(k):
            pos = (h1 + j * h2) % m
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    return words


def _py_bloom_maybe(words, s, m, k):
    h1 = fnv1a_cp(s, FNV_OFFSET) % MINHASH_PRIME
    h2 = fnv1a_cp(s, FNV_OFFSET2) % (MINHASH_PRIME - 1) + 1
    for j in range(k):
        pos = (h1 + j * h2) % m
        if not (words.get(pos // 32, 0) >> (pos % 32)) & 1:
            return False
    return True


_words = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1,
    max_size=8,
)


@given(
    st.lists(_words, min_size=0, max_size=60),
    st.lists(_words, min_size=0, max_size=30),
    st.sampled_from([64, 256, 1024, 1 << 14]),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=150, deadline=None)
def test_bloom_never_misses_a_member(inserted, probes, m, k):
    words = _py_bloom(inserted, m, k)
    # every inserted element answers "maybe" — zero false negatives
    for s in inserted:
        assert _py_bloom_maybe(words, s, m, k)
    # the word table never exceeds its fixed bound
    assert len(words) <= -(-m // 32)
    # word values stay positive (32-bit packing keeps off the sign bit)
    assert all(0 <= w < (1 << 32) for w in words.values())


@given(st.lists(_words, min_size=1, max_size=60), st.integers(1, 4))
@settings(max_examples=80, deadline=None)
def test_bloom_larger_filter_never_flags_more(inserted, k):
    """FP monotonicity on a disjoint probe: growing m can only clear
    bits' collisions, never create new 'maybe's for a fixed probe set."""
    probe = "zzzzzzzzz"  # 9 chars: outside the 1-8 char insert alphabet
    small = _py_bloom_maybe(_py_bloom(inserted, 64, k), probe, 64, k)
    big = _py_bloom_maybe(_py_bloom(inserted, 1 << 16, k), probe, 1 << 16, k)
    # not strictly monotone per-instance for arbitrary (m1, m2) pairs,
    # but 64 -> 2^16 multiplies the space 1024x: a probe that the big
    # filter flags must collide on all k positions among <= 60*k set
    # bits in 65536 — if that happens AND the small filter cleared it,
    # the law is violated the wrong way around
    if big:
        assert small, "bigger filter flagged a probe the small one cleared"


# ---------------------------------------------------- transition accounting


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abcd")),
        min_size=0,
        max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_transition_counts_conserve_events(stream):
    """Pure-python reference: per-user transition count == events - users
    (each user's chain of n events yields n-1 transitions)."""
    by_user = {}
    for u, t in stream:  # arrival order is the per-user order here
        by_user.setdefault(u, []).append(t)
    trans = {}
    for u, seq in by_user.items():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    total = sum(trans.values())
    assert total == sum(max(0, len(s) - 1) for s in by_user.values())
    # conditional ppm floor-division bounds
    for a in set(k[0] for k in trans):
        n_prev = sum(v for k, v in trans.items() if k[0] == a)
        ppms = [v * 1_000_000 // n_prev for k, v in trans.items() if k[0] == a]
        assert sum(ppms) <= 1_000_000
        assert sum(ppms) > 1_000_000 - len(ppms)


# ------------------------------------------------------------ RFM scoring


def _quintile(v, bps):
    return 1 + sum(v > b for b in bps)


@given(st.lists(st.integers(0, 10_000), min_size=5, max_size=300))
@settings(max_examples=100, deadline=None)
def test_rfm_quintile_scores_bounded_and_monotone(vals):
    import numpy as np

    bps = list(np.percentile(vals, [20, 40, 60, 80], method="linear"))
    scores = [_quintile(v, bps) for v in vals]
    assert all(1 <= s <= 5 for s in scores)
    # monotone: a larger value never gets a smaller score
    order = sorted(zip(vals, scores))
    for (v1, s1), (v2, s2) in zip(order, order[1:]):
        assert s1 <= s2


# -------------------------------------------------------- budget allocation


@given(
    st.lists(
        st.tuples(st.integers(1, 10**7), st.integers(0, 10**6)),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 10**9),
)
@settings(max_examples=150, deadline=None)
def test_budget_allocation_never_overspends(domains, budget):
    """targets = budget*w/1e6 floored: total spend <= budget, epochs
    covers the target, rate_ppm consistent."""
    spend = 0
    for avail, w_ppm in domains:
        target = budget * w_ppm // 1_000_000
        spend += target
        rate = target * 1_000_000 // avail
        epochs = -(-target // avail)
        assert epochs * avail >= target
        assert (rate > 1_000_000) == (target > avail) or rate == 1_000_000
    total_w = sum(w for _, w in domains)
    if total_w <= 1_000_000:
        assert spend <= budget


# ------------------------------------------------------- int8 quantization


@given(
    st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
        min_size=2,
        max_size=200,
    )
)
@settings(max_examples=150, deadline=None)
def test_int8_affine_error_bound(vals):
    """Midpoint decode error <= half a code width (+1 ulp slack), codes
    in [0, 255] — the invariant quantize_int8_audit reports."""
    vmin, vmax = min(vals), max(vals)
    if vmax == vmin:
        return
    width = (vmax - vmin) / 255.0
    for v in vals:
        code = min(255, math.floor((v - vmin) * 255.0 / (vmax - vmin)))
        assert 0 <= code <= 255
        decode = vmin + (code + 0.5) * width
        assert abs(decode - v) <= width / 2 + 1e-9 * max(1.0, abs(v))
