"""Property sweeps for the round-11 operators against pure-python
references (no Spark — the distributed impls replay the same integer
recipes; equality with the DuckDB oracles is pinned by the driver gate
and tests/test_round11.py):

- EDIT-JOIN CHAIN LOSSLESSNESS: the full dedup.qgram_edit_pairs
  pruning chain — pigeonhole segment candidates (PassJoin: k+1
  segments, partner lengths m±k, start positions ±k), the Gravano
  count bound shared(gram, occ) ≥ max(n_a, n_b) − k·q, exact DP — must
  emit EXACTLY the brute-force all-pairs Levenshtein≤k result for
  random corpora (the standing lesson: an engine-consistent formula
  bug is invisible to the oracle gate; only a reference-semantics
  sweep catches a filter that silently drops a qualifying pair).
- TEETH: the same sweep with a deliberately narrowed position window
  (±(k−1)) or count bound (+1) must find a counterexample — proof the
  sweep can actually fail.
"""

import random

from hypothesis import given, settings, strategies as st


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _seg_start_len(l: int, i: int, k: int):
    """Segment i's (start, length) under an l-length split: first
    k+1−(l mod (k+1)) segments get ⌊l/(k+1)⌋ chars, the rest one extra
    — the exact arithmetic of the operator's lam/sig SQL."""
    k1 = k + 1
    b, r = divmod(l, k1)
    lam = b + (1 if i >= k1 - r else 0)
    sig = i * b + max(0, i - (k1 - r))
    return sig, lam


def _elements(s: str, q: int):
    """(gram, occ) set elements of s's positional q-grams."""
    seen: dict[str, int] = {}
    out = []
    for i in range(len(s) - q + 1):
        g = s[i : i + q]
        seen[g] = seen.get(g, 0) + 1
        out.append((g, seen[g]))
    return out


def _brute_pairs(strs, k):
    out = set()
    ids = sorted(strs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if _lev(strs[ids[x]], strs[ids[y]]) <= k:
                out.add((ids[x], ids[y]))
    return out


def _qgram_pairs(strs, k, q, window=None, bound_slack=0):
    """Pure-python twin of dedup.qgram_edit_pairs. window/bound_slack
    exist only for the teeth tests (defaults = the operator's lossless
    values)."""
    window = k if window is None else window
    min_len = q * (k + 1)
    pop = {d: s for d, s in strs.items() if len(s) >= min_len}
    ids = sorted(pop)
    cand = set()
    for x in ids:
        sx, lx = pop[x], len(pop[x])
        for y in ids:
            if y == x:
                continue
            sy, m = pop[y], len(pop[y])
            if not (m - k <= lx <= m + k):
                continue  # probe generates partner lengths in [m-k, m+k]
            hit = False
            for i in range(k + 1):
                sig, lam = _seg_start_len(lx, i, k)
                seg = sx[sig : sig + lam]
                lo, hi = max(0, sig - window), min(m - lam, sig + window)
                if any(
                    sy[p : p + lam] == seg for p in range(lo, hi + 1)
                ):
                    hit = True
                    break
            if hit:
                cand.add((min(x, y), max(x, y)))
    out = set()
    for a, b in cand:
        ea, eb = _elements(pop[a], q), _elements(pop[b], q)
        shared = len(set(ea) & set(eb))
        if shared < max(len(ea), len(eb)) - k * q + bound_slack:
            continue
        if _lev(pop[a], pop[b]) <= k:
            out.add((a, b))
    return out


_word = st.text(alphabet="ab ", min_size=0, max_size=18)


@given(
    st.lists(_word, min_size=2, max_size=8),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=2, max_value=3),
)
@settings(max_examples=300, deadline=None)
def test_qgram_chain_lossless_vs_bruteforce(words, k, q):
    strs = {i: w for i, w in enumerate(words)}
    min_len = q * (k + 1)
    pop = {d: s for d, s in strs.items() if len(s) >= min_len}
    assert _qgram_pairs(strs, k, q) == _brute_pairs(pop, k)


def _find_counterexample(variant_kwargs, k=2, q=2, tries=4000):
    """Random search for a corpus where the weakened chain loses a
    pair the brute force finds."""
    rng = random.Random(11)
    for _ in range(tries):
        n = rng.randint(2, 5)
        strs = {
            i: "".join(rng.choice("ab") for _ in range(rng.randint(6, 12)))
            for i in range(n)
        }
        pop = {d: s for d, s in strs.items() if len(s) >= q * (k + 1)}
        if _qgram_pairs(strs, k, q, **variant_kwargs) != _brute_pairs(
            pop, k
        ):
            return True
    return False


def test_qgram_sweep_has_teeth_window():
    """A ±(k−1) probe window (one short of the pigeonhole drift bound)
    must drop a real pair on some corpus — the sweep can fail."""
    assert _find_counterexample({"window": 1})


def test_qgram_sweep_has_teeth_count_bound():
    """Count bound tightened by +1 past Gravano's max(n)−k·q must drop
    a real pair on some corpus."""
    assert _find_counterexample({"bound_slack": 1})


# --- round-11b: sketch-family portable-hash property sweep ------------
# (Spark parity for the same SQL is pinned on hostile fixed keys in
# tests/test_round11b.py::test_int_mix_three_way; here hypothesis
# drives RANDOM 64-bit keys through Python ref vs DuckDB — the cheap
# per-example engine.)


@given(
    st.lists(
        st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=60, deadline=None)
def test_int_mix_rho_duckdb_matches_python_ref(keys):
    import duckdb

    from bytehub_spark.operators import hashing as H

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"(CAST({k} AS BIGINT))" for k in keys)
        + ") v(k)"
    )
    got = con.execute(
        f"SELECT k, {H.int_h1_sql('k')}, {H.int_h2_sql('k')}, "
        f"{H.rho_sql(H.int_h2_sql('k'))} FROM t ORDER BY k"
    ).fetchall()
    for k, h1, h2, rho in got:
        eh1, eh2 = H.int_h1_h2(k)
        assert (int(h1), int(h2)) == (eh1, eh2), k
        assert int(rho) == H.rho_py(eh2), k
        assert 1 <= int(rho) <= 31
