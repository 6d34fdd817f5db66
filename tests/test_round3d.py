"""Round-3 (fourth pass) operators: BPE encode, linear quality-classifier
inference, and perceptual aHash near-dup pairs."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from bytehub_spark.operators.multimodal import (
    ahash64,
    ahash_pairs,
    media_from_documents,
    media_with_twins,
)
from bytehub_spark.operators.text import (
    bpe_encode,
    bpe_train,
    hash_embed,
    quality_classifier,
)
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark, texts, ids=None, source="s"):
    ids = list(range(len(texts))) if ids is None else ids
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "text": texts, "source": source})
    )


# ------------------------------------------------------------- bpe encode
def test_bpe_encode_known_corpus(spark):
    # corpus: "low low low lower" -> top pair ('l','o') then ('lo','w');
    # third merge is deterministic by tie-break. After round 2 the word
    # "low" is the single token 'low'.
    docs = _docs(spark, ["low low low", "lower low lowest"])
    merges = bpe_train(docs, n_merges=2).toPandas()
    assert list(merges["merged"]) == ["lo", "low"]
    enc = bpe_encode(docs, n_merges=2).toPandas().set_index("token")
    # 'low' appears as a standalone word 4x and as a prefix of lower/lowest
    assert enc.loc["low", "n_tokens"] == 6
    assert enc.loc["low", "n_word_forms"] == 3
    # residual characters stay unmerged symbols
    assert enc.loc["e", "n_tokens"] == 2


def test_bpe_encode_conserves_characters(spark):
    # total characters = sum over tokens of n_tokens * len(token), since
    # merging never drops or duplicates a symbol.
    docs = load_table(spark, SF, "documents").limit(80)
    enc = bpe_encode(docs, n_merges=3).toPandas()
    total_from_tokens = int(
        (enc["n_tokens"] * enc["token"].str.len()).sum()
    )
    total_chars = docs.select(
        F.sum(F.length(F.regexp_replace(F.col("text"), " ", "")))
    ).collect()[0][0]
    assert total_from_tokens == int(total_chars)


# ---------------------------------------------------- quality classifier
def test_quality_classifier_matches_manual_dot(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    out = quality_classifier(docs).toPandas().set_index("doc_id")
    sparse = hash_embed(docs).toPandas()
    sparse["w"] = ((sparse["bucket"] * 1000003 + 99991) % 2003) - 1001
    manual = (
        (sparse["cnt"] * sparse["w"]).groupby(sparse["doc_id"]).sum()
    )
    for did, score in manual.items():
        assert out.loc[did, "score"] == score
        assert out.loc[did, "label"] == ("keep" if score > 0 else "drop")


def test_quality_classifier_scores_every_doc(spark):
    # zero-token docs (empty text) still get a scored row with score 0
    docs = _docs(spark, ["", "the quick fox", "   "], ids=[7, 8, 9])
    out = quality_classifier(docs).toPandas().set_index("doc_id")
    assert sorted(out.index) == [7, 8, 9]
    assert out.loc[7, "score"] == 0 and out.loc[7, "label"] == "drop"


# ------------------------------------------------------------ aHash pairs
def test_ahash_twins_are_hamming_zero(spark):
    docs = load_table(spark, SF, "documents")
    pairs = ahash_pairs(docs, fake=True).toPandas()
    long_twins = (
        docs.where(
            (F.col("doc_id") % 97 == 0)
            & (F.length(F.encode(F.col("text"), "UTF-8")) >= 64)
        )
        .select("doc_id")
        .toPandas()["doc_id"]
        .tolist()
    )
    assert long_twins, "fixture should contain at least one long twin"
    got = pairs.set_index(["id_a", "id_b"])["hamming"]
    for did in long_twins:
        assert got.loc[(did, did + 1000000000)] == 0


def test_ahash_banded_equals_bruteforce(spark):
    # the banded join must return exactly the pairs a brute-force popcount
    # over the signature table finds at hamming <= 3
    docs = load_table(spark, SF, "documents").limit(120)
    sigs = (
        ahash64(media_with_twins(docs), fake=True)
        .toPandas()
        .sort_values("media_id")
    )
    ids = sigs["media_id"].to_numpy()
    h = sigs["ahash"].to_numpy().astype(np.uint64)
    brute = set()
    for i in range(len(ids)):
        x = np.bitwise_xor(h[i], h[i + 1 :])
        cnt = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(cnt <= 3)[0]:
            brute.add((int(ids[i]), int(ids[i + 1 + j])))
    got = set(
        map(
            tuple,
            ahash_pairs(docs, fake=True).select("id_a", "id_b").toPandas()
            .to_numpy(),
        )
    )
    assert got == brute


def test_ahash_plan_has_no_cartesian(spark):
    docs = load_table(spark, SF, "documents").limit(30)
    plan = ahash_pairs(docs, fake=True)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ahash_signature_spec(spark):
    # signature follows the documented byte spec: first 64 bytes zero-
    # padded, strict > integer-floor mean, bit k from byte k
    text = "".join(chr(97 + (i * 7) % 26) for i in range(100))
    docs = _docs(spark, [text], ids=[1])
    sig = int(
        ahash64(media_from_documents(docs), fake=True).toPandas()["ahash"][0]
    )
    raw = text.encode()[:64]
    mean = sum(raw) // 64
    expect = 0
    for k, bv in enumerate(raw):
        if bv > mean:
            expect |= 1 << k
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert sig == expect


# --------------------------------------------------------- semantic dedup
def _emb(spark, vecs, ids=None):
    ids = list(range(len(vecs))) if ids is None else ids
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": ids,
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            }
        )
    )


def test_semantic_dedup_drops_exact_twin_keeps_low_id(spark):
    from bytehub_spark.operators.similarity import semantic_dedup

    rng2 = np.random.default_rng(5)
    base = rng2.normal(size=(10, 16))
    vecs = list(base) + [base[3]]  # id 10 duplicates id 3
    out = (
        semantic_dedup(_emb(spark, vecs), threshold=0.95, n_cells=2)
        .toPandas()
        .set_index("vec_id")
    )
    assert len(out) == 11
    assert bool(out.loc[3, "keep"])
    assert not bool(out.loc[10, "keep"])
    assert out.loc[10, "max_dup_ppm"] >= 999999


def test_semantic_dedup_orthogonal_all_kept(spark):
    from bytehub_spark.operators.similarity import semantic_dedup

    vecs = list(np.eye(8))
    out = semantic_dedup(
        _emb(spark, vecs), threshold=0.5, n_cells=2
    ).toPandas()
    assert out["keep"].all()


def test_semantic_dedup_blocking_invariant(spark):
    # row-blocked GEMM must give identical results for any block size
    from bytehub_spark.operators.similarity import semantic_dedup

    rng2 = np.random.default_rng(9)
    vecs = list(rng2.normal(size=(40, 8)))
    a = (
        semantic_dedup(_emb(spark, vecs), threshold=0.6, n_cells=1, block=3)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semantic_dedup(
            _emb(spark, vecs), threshold=0.6, n_cells=1, block=1024
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_semantic_dedup_conserves_rows_on_fixture(spark):
    from bytehub_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF, "embeddings")
    out = semantic_dedup(emb).toPandas()
    assert len(out) == emb.count()
    assert out["vec_id"].is_unique


# ---------------------------------------------------------- shard manifest
def test_shard_manifest_contract(spark):
    from bytehub_spark.operators.multimodal import (
        media_from_documents,
        shard_manifest,
        token_budget,
    )

    docs = load_table(spark, SF, "documents").limit(200)
    media = media_from_documents(docs)
    out = shard_manifest(media, docs, n_shards=8, max_seq=4096).toPandas()
    budget = token_budget(media, docs).toPandas().set_index("media_id")
    assert len(out) == 200 and out["media_id"].is_unique
    # shard is the documented hash, fits matches the budget
    expect_shard = ((out["media_id"] * 1000003 + 12345) % 2147483647) % 8
    assert (out["shard"] == expect_shard).all()
    for _, r in out.head(20).iterrows():
        assert r["total_tokens"] == budget.loc[r["media_id"], "total_tokens"]
        assert r["fits"] == (r["total_tokens"] <= 4096)
    # per-shard resume positions are 1..n_shard contiguous in media_id order
    for s, grp in out.sort_values("media_id").groupby("shard"):
        assert grp["seq_in_shard"].tolist() == list(
            range(1, len(grp) + 1)
        )


# ----------------------------------------------------------- url blocklist
def test_url_blocklist_subdomain_semantics(spark):
    from bytehub_spark.operators.text import url_blocklist_flags

    docs = _docs(
        spark,
        [
            "x https://www.site1.example.com/a y",      # exact (www stripped)
            "x https://cdn.site3.example.com/b y",      # subdomain
            "x https://site2.example.com/c y",          # not blocked
            "x https://evilsite1.example.com/d y",      # NOT a subdomain match
            "no urls here",
            "https://ads.example.org/e https://site1.example.com/f",
        ],
    )
    out = url_blocklist_flags(docs).toPandas().set_index("doc_id")
    assert bool(out.loc[0, "blocked"]) and out.loc[0, "n_blocked"] == 1
    assert bool(out.loc[1, "blocked"])
    assert not bool(out.loc[2, "blocked"])
    assert not bool(out.loc[3, "blocked"])
    assert out.loc[4, "n_urls"] == 0 and not bool(out.loc[4, "blocked"])
    assert out.loc[5, "n_blocked"] == 2


# ----------------------------------------------------------- lsh eval
def test_lsh_dedup_eval_counts_consistent(spark):
    from bytehub_spark.operators.dedup import (
        lsh_dedup_eval,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, SF, "documents").limit(200)
    row = lsh_dedup_eval(docs).toPandas().iloc[0]
    n_cand = minhash_lsh_pairs(docs).count()
    n_truth = ngram_jaccard_pairs(docs, 0.2).count()
    assert row["n_candidates"] == n_cand
    assert row["n_truth"] == n_truth
    assert row["n_hits"] <= min(n_cand, n_truth)
    assert 0 <= row["precision_ppm"] <= 1_000_000
    assert 0 <= row["recall_ppm"] <= 1_000_000
    # at b=32/r=2 the detection threshold ~0.18 sits below the 0.2 truth
    # cut, so recall on real near-dups should be high
    assert row["recall_ppm"] >= 900_000


# ------------------------------------------------------------- interleave
def test_interleave_stride_schedule(spark):
    from bytehub_spark.operators.curation import interleave_sources

    # weight 2 source 'aa' vs weight 1 source 'b': in any prefix of the
    # schedule, 'aa' count >= 'b' count, and overall evenly interleaved
    docs = _docs(spark, [f"t{i}" for i in range(9)])
    docs = docs.withColumn(
        "source", F.when(F.col("doc_id") % 3 < 2, "aa").otherwise("b")
    )
    out = interleave_sources(
        docs, weights={"aa": 2, "b": 1}
    ).toPandas()
    order = out.sort_values(["vt_u", "source", "doc_id"])["source"].tolist()
    na = nb = 0
    for s in order:
        na, nb = na + (s == "aa"), nb + (s == "b")
        assert na >= nb  # stride keeps the heavy source ahead
    assert na == 6 and nb == 3
    # vt formula check
    r0 = out[(out.source == "aa") & (out.src_rank == 0)].iloc[0]
    assert r0["vt_u"] == 1000000 // 4


def test_interleave_default_weights_deterministic(spark):
    from bytehub_spark.operators.curation import interleave_sources

    docs = load_table(spark, SF, "documents").limit(60)
    a = interleave_sources(docs).toPandas()
    b = interleave_sources(docs).toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["weight"] == (a["source"].str.len() % 3) + 1).all()


# --------------------------------------------------------- embedding health
def test_embedding_health_detects_collapse_and_dead(spark):
    from bytehub_spark.operators.similarity import embedding_health

    # ids 0..5: five copies of one direction (collapse) + one dead vector
    v = [0.5] * 8
    vecs = [v] * 5 + [[0.0] * 8]
    out = embedding_health(_emb(spark, vecs)).toPandas().iloc[0]
    assert out["n_vecs"] == 6
    assert out["n_near_zero"] == 1
    # adjacent pairs among ids 0..4 are identical -> qcos ~ 1e6 each;
    # the (4,5) pair is excluded (zero norm)
    assert out["n_pairs"] == 4
    assert out["min_qcos"] >= 999999
    # healthy-looking orthogonal corpus: mean cosine 0
    eye = list(np.eye(6))
    out2 = embedding_health(_emb(spark, eye)).toPandas().iloc[0]
    assert out2["n_pairs"] == 5 and out2["sum_qcos"] == 0


def test_embedding_health_fixture_sane(spark):
    from bytehub_spark.operators.similarity import embedding_health

    emb = load_table(spark, SF, "embeddings")
    out = embedding_health(emb).toPandas().iloc[0]
    assert out["n_vecs"] == emb.count()
    assert out["n_pairs"] <= out["n_vecs"] - 1
    assert -1_000_000 <= out["min_qcos"] <= out["max_qcos"] <= 1_000_000


# ------------------------------------------------------ end-to-end chain
def test_new_ops_compose_end_to_end(spark):
    """Realistic curation chain over the fixture corpus: classifier
    keep-filter -> blocklist drop -> shard manifest over survivors.
    Checks the stages compose lazily (one action at the end) and row
    accounting is consistent at every step."""
    from bytehub_spark.operators.multimodal import (
        media_from_documents,
        shard_manifest,
    )
    from bytehub_spark.operators.text import (
        quality_classifier,
        url_blocklist_flags,
    )

    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    kept = quality_classifier(docs).where("label = 'keep'").select("doc_id")
    clean = (
        url_blocklist_flags(docs)
        .where(~F.col("blocked"))
        .select("doc_id")
        .join(kept, "doc_id")
    )
    survivors = docs.join(clean, "doc_id")
    manifest = shard_manifest(
        media_from_documents(survivors), survivors, n_shards=4
    )
    out = manifest.toPandas()
    n_kept = kept.count()
    assert 0 < len(out) <= n_kept <= n_docs
    assert out["media_id"].is_unique
    assert set(out["shard"].unique()) <= {0, 1, 2, 3}
    # every surviving doc has exactly one manifest row
    assert len(out) == survivors.count()
