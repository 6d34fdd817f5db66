"""Property sweeps for the round-10 operators against pure-python
references (no Spark — the distributed impls replay the same integer
recipes; equality with the fixtures and DuckDB oracles is pinned in
tests/test_round10.py):

- PREFIX-FILTER LOSSLESSNESS: the full lemma chain of
  dedup.prefix_filter_pairs — df-ordered prefix, integer ppm prefix
  length, length filter, PPJoin positional filter, any-row candidate
  rule — must emit EXACTLY the brute-force all-pairs Jaccard result
  for random corpora and random thresholds, with unbounded Python
  ints (the r07 lesson: an engine-consistent formula bug is invisible
  to the oracle gate; only a reference-semantics sweep catches a
  filter that silently drops a qualifying pair).
- SCD2 STITCH: Scd2Monitor's merge/offset arithmetic (open-run carry,
  null-safe cross-batch merge, version offsets, valid_to tiling)
  replayed in python over random event streams and random time-ordered
  batch splits must equal the one-shot batch recipe.
"""

from hypothesis import given, settings, strategies as st


# ------------------------------------------------ prefix filter lemma


def _shingles(words, n=3):
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _brute_pairs(sets, tau):
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            i = len(a & b)
            if i * 1_000_000 >= tau * (len(a) + len(b) - i):
                out.add((ids[x], ids[y]))
    return out


def _prefix_pairs(sets, tau):
    """Pure-python twin of dedup.prefix_filter_pairs: canonical order
    (df asc, shingle asc), prefix len n - ceil(tau*n/1e6) + 1, length +
    positional filters inside candidate generation (pair kept if ANY
    matching prefix row passes), exact verify."""
    df = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    rank = {}  # (doc, shingle) -> 1-based rank in canonical order
    plen = {}
    for d, s in sets.items():
        ordered = sorted(s, key=lambda sh: (df[sh], sh))
        n = len(s)
        plen[d] = n - -(-tau * n // 1_000_000) + 1
        for r, sh in enumerate(ordered, 1):
            rank[(d, sh)] = r
    cand = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            na, nb = len(sets[a]), len(sets[b])
            if na * 1_000_000 < tau * nb or nb * 1_000_000 < tau * na:
                continue
            o_min = -(-tau * (na + nb) // (1_000_000 + tau))
            for sh in sets[a] & sets[b]:
                ra, rb = rank[(a, sh)], rank[(b, sh)]
                if ra <= plen[a] and rb <= plen[b]:
                    if 1 + min(na - ra, nb - rb) >= o_min:
                        cand.add((a, b))
                        break
    out = set()
    for a, b in cand:
        i = len(sets[a] & sets[b])
        if i * 1_000_000 >= tau * (len(sets[a]) + len(sets[b]) - i):
            out.add((a, b))
    return out


_doc = st.lists(
    st.sampled_from(["w0", "w1", "w2", "w3"]), min_size=3, max_size=12
)


@given(
    st.lists(_doc, min_size=2, max_size=7),
    st.integers(min_value=1, max_value=1_000_000),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_lossless_vs_bruteforce(docs, tau):
    sets = {i: _shingles(w) for i, w in enumerate(docs)}
    sets = {i: s for i, s in sets.items() if s}  # <n words: no shingles
    assert _prefix_pairs(sets, tau) == _brute_pairs(sets, tau)


# ------------------------------------------------ SCD2 stitch arithmetic


def _runs(events):
    """Per-user consecutive same-type runs over (ts, eid)-ordered
    events: [(user, [(type, valid_from, n_events), ...])]."""
    byu = {}
    for ts, eid, u, typ in sorted(events):
        byu.setdefault(u, []).append((ts, typ))
    out = {}
    for u, evs in byu.items():
        runs = []
        for ts, typ in evs:
            if runs and runs[-1][0] == typ:  # None == None merges
                runs[-1][2] += 1
            else:
                runs.append([typ, ts, 1])
        out[u] = runs
    return out


def _batch_scd2(events):
    """(user, version, type, valid_from, valid_to, n) rows, one shot."""
    rows = set()
    for u, runs in _runs(events).items():
        for v, (typ, vf, n) in enumerate(runs, 1):
            vt = runs[v][1] if v < len(runs) else None
            rows.add((u, v, typ, vf, vt, n))
    return rows


def _monitor_replay(events, cuts):
    """Replay Scd2Monitor's stitch over time-ordered batches: state =
    open run per user (version, type, valid_from, n); a batch whose
    first run matches the open type (None-safe) merges; otherwise the
    open run closes at the batch's first valid_from."""
    ordered = sorted(events)
    bounds = [0, *sorted(cuts), len(ordered)]
    closed, open_ = set(), {}
    for i in range(len(bounds) - 1):
        batch = ordered[bounds[i] : bounds[i + 1]]
        if not batch:
            continue
        for u, runs in _runs(batch).items():
            if u in open_:
                ov, otyp, ofrom, on = open_[u]
                if otyp == runs[0][0]:  # merge into the open run
                    adj = [[otyp, ofrom, on + runs[0][2]]] + runs[1:]
                    off = ov - 1
                else:  # close the open run at the batch's first start
                    closed.add((u, ov, otyp, ofrom, runs[0][1], on))
                    adj = runs
                    off = ov
            else:
                adj = runs
                off = 0
            for k, (typ, vf, n) in enumerate(adj, 1):
                if k < len(adj):
                    closed.add((u, k + off, typ, vf, adj[k][1], n))
                else:
                    open_[u] = (k + off, typ, vf, n)
    return closed | {
        (u, v, typ, vf, None, n) for u, (v, typ, vf, n) in open_.items()
    }


_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # ts
        st.integers(min_value=0, max_value=10_000),  # event_id (tiebreak)
        st.integers(min_value=1, max_value=3),  # user
        st.sampled_from(["a", "b", None]),  # event_type
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda e: e[1],
)


@given(_events, st.sets(st.integers(min_value=1, max_value=24), max_size=4))
@settings(max_examples=300, deadline=None)
def test_scd2_stitch_equals_batch_for_any_time_ordered_split(events, cuts):
    cuts = {c for c in cuts if c < len(events)}
    assert _monitor_replay(events, cuts) == _batch_scd2(events)


# ------------------------------------------------ deletion-neighborhood lemma


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _del_neighborhood(s, k):
    out = {s}
    frontier = {s}
    for _ in range(k):
        frontier = {
            v[:i] + v[i + 1:] for v in frontier for i in range(len(v))
        }
        out |= frontier
    return out


_short = st.text(alphabet="abc", min_size=0, max_size=8)


@given(_short, _short, st.integers(min_value=1, max_value=2))
@settings(max_examples=400, deadline=None)
def test_deletion_neighborhood_candidates_are_lossless(a, b, k):
    """The SymSpell lemma behind dedup.edit_distance_pairs: any pair
    within Levenshtein distance k shares a <=k-deletions variant, so
    the candidate equi-join cannot miss a qualifying pair (false
    positives are fine — the exact verify removes them)."""
    if _lev(a, b) <= k:
        assert _del_neighborhood(a, k) & _del_neighborhood(b, k)
