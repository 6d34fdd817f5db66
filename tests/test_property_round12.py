"""Property sweeps for the round-12 routing arithmetic:

- ISLAND-COLLAPSE LOSSLESSNESS (pure python, many random corpora): the
  routed identity — brute pairs over all docs == island dist-0 pairs
  ∪ expansion of brute pairs over one representative per distinct
  lowercased prefix — must hold for corpora with case-variant islands,
  shared prefixes, and singleton islands. This is the math
  qgram_edit_pairs_routed's expansion implements; an engine-consistent
  expansion bug (e.g. the len-swap) is invisible to the oracle gate
  only if BOTH sides make it, so the reference sweep is the backstop.
- SPARK ROUTED == DIRECT (seeded randomized corpora, both budget
  regimes): the actual operator, collapse-forced and direct-routed,
  against qgram_edit_pairs on the same frame; a refusal must be
  honest (collapsed volume really over budget).
"""

import random

from hypothesis import given, settings, strategies as st

from tests.test_property_round11 import _brute_pairs, _lev


def _routed_reference(strs: dict, k: int):
    """Pure-python twin of the collapse → brute-on-reps → expand
    arithmetic over {doc_id: lowercased-prefix}."""
    islands: dict[str, list] = {}
    for i, s in strs.items():
        islands.setdefault(s, []).append(i)
    out = set()
    # island-internal dist-0 pairs
    for mem in islands.values():
        mem = sorted(mem)
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                out.add((mem[x], mem[y]))
    # cross-island: one rep per prefix, expand each qualifying rep pair
    prefixes = sorted(islands)
    for a in range(len(prefixes)):
        for b in range(a + 1, len(prefixes)):
            if _lev(prefixes[a], prefixes[b]) <= k:
                for ia in islands[prefixes[a]]:
                    for ib in islands[prefixes[b]]:
                        out.add((min(ia, ib), max(ia, ib)))
    return out


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_island_collapse_identity(data):
    """brute(all docs) == islands ∪ expand(brute(reps)) on random
    corpora — including copy-heavy islands and near-miss prefixes."""
    k = data.draw(st.integers(1, 3))
    n = data.draw(st.integers(2, 14))
    base = [
        data.draw(
            st.text(alphabet="ab ", min_size=2 * (k + 1), max_size=18)
        )
        for _ in range(n)
    ]
    strs = {}
    nid = 0
    for s in base:
        for _ in range(data.draw(st.integers(1, 3))):
            strs[nid] = s
            nid += 1
    assert _brute_pairs(strs, k) == _routed_reference(strs, k)


def test_spark_routed_case_variant_islands(spark):
    """The collapse key is the LOWERCASED prefix: docs whose raw
    prefixes differ only by case belong to one island (dist 0 after
    the operator's lowercasing) and must reconstruct exactly — the
    regression the full-text-exact_dedup routing bug would have hidden
    (normalized fingerprints vs the operator's own measurement key)."""
    from bytehub_spark.operators import dedup

    rows = [
        (1, "The Quick Brown Fox Jumps Over It"),
        (2, "the quick brown fox jumps over it"),  # case-variant twin
        (3, "THE QUICK BROWN FOX JUMPS OVER IT"),
        (4, "the quick brawn fox jumps over it"),  # 1 edit away
        (5, "completely unrelated text body here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    direct = sorted(
        map(tuple, dedup.qgram_edit_pairs(docs, k=3, q=2).collect())
    )
    plan = dedup.qgram_plan(docs, k=3, q=2).collect()[0]
    routed = sorted(
        map(
            tuple,
            dedup.qgram_edit_pairs_routed(
                docs, int(plan["seg_join_tuples"]) // 2, k=3, q=2
            ).collect(),
        )
    )
    assert routed == direct
    pair_ids = {(a, b) for a, b, *_ in direct}
    # the case island {1,2,3} is fully paired at dist 0, and doc 4
    # cross-pairs with every island member
    assert {(1, 2), (1, 3), (2, 3)} <= pair_ids
    assert {(1, 4), (2, 4), (3, 4)} <= pair_ids


def test_spark_routed_equals_direct_randomized(spark):
    """The Spark operator across both routes on seeded random corpora:
    collapse-forced output == direct output; refusals are honest."""
    from bytehub_spark.operators import dedup

    rng = random.Random(1202)
    for trial in range(3):
        base = [
            "".join(rng.choice("abcd ") for _ in range(rng.randint(8, 36)))
            for _ in range(rng.randint(8, 20))
        ]
        rows = []
        nid = 0
        for s in base:
            for _ in range(rng.randint(1, 4)):
                rows.append((nid, s))
                nid += 1
        rng.shuffle(rows)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        direct = sorted(
            map(tuple, dedup.qgram_edit_pairs(docs, k=3, q=2).collect())
        )
        plan = dedup.qgram_plan(docs, k=3, q=2).collect()[0]
        vol = int(plan["seg_join_tuples"])
        for budget in (vol, max(0, vol // 2)):
            try:
                routed = sorted(
                    map(
                        tuple,
                        dedup.qgram_edit_pairs_routed(
                            docs, budget, k=3, q=2
                        ).collect(),
                    )
                )
            except dedup.QgramBudgetExceeded as e:
                assert int(e.plan_collapsed["seg_join_tuples"]) > budget
                continue
            assert routed == direct, f"trial {trial} budget {budget}"
