"""Property sweeps for the fourth-pass operators: classifier vs a pure-
python reference, aHash spec + banding exactness on random payloads, BPE
encode segmentation laws, blocklist semantics, shard-manifest contracts."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bytehub_spark.operators.multimodal import ahash64, media_from_documents
from bytehub_spark.operators.text import (
    bpe_encode,
    quality_classifier,
)

WORD = st.text(alphabet="abcdef", min_size=1, max_size=5)
TEXT = st.lists(WORD, min_size=0, max_size=12).map(" ".join)


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "source": "s",
            }
        )
    )


def _py_score(text: str, dim: int = 32) -> int:
    total = 0
    for tok in text.split(" "):
        if not tok:
            continue
        h = 0
        for ch in tok:
            h = (h * 1000003 + ord(ch)) % 2147483647
        b = h % dim
        total += ((b * 1000003 + 99991) % 2003) - 1001
    return total


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_classifier_matches_python_reference(spark, texts):
    out = quality_classifier(_docs(spark, texts)).toPandas()
    assert len(out) == len(texts)
    for _, r in out.iterrows():
        expect = _py_score(texts[int(r["doc_id"])])
        assert r["score"] == expect
        assert r["label"] == ("keep" if expect > 0 else "drop")


def _py_ahash(payload: bytes) -> int:
    buf = list(payload[:64]) + [0] * max(0, 64 - len(payload))
    mean = sum(buf) // 64
    u = 0
    for k, bv in enumerate(buf):
        if bv > mean:
            u |= 1 << k
    return u - (1 << 64) if u >= (1 << 63) else u


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abcxyz ", min_size=0, max_size=90), min_size=1, max_size=8))
def test_ahash_matches_python_reference(spark, texts):
    media = media_from_documents(_docs(spark, texts))
    out = ahash64(media, fake=True).toPandas().set_index("media_id")
    for i, t in enumerate(texts):
        assert int(out.loc[i, "ahash"]) == _py_ahash(t.encode())


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXT.filter(lambda t: len(t.split()) >= 1), min_size=1, max_size=6))
def test_bpe_encode_laws(spark, texts):
    texts = [t for t in texts if t.strip()]
    if not texts:
        return
    docs = _docs(spark, texts)
    enc = bpe_encode(docs, n_merges=2).toPandas()
    # law 1: token frequencies positive, histogram sorted by the contract
    assert (enc["n_tokens"] > 0).all()
    # law 2: character conservation across the whole corpus
    total_chars = sum(len(w) for t in texts for w in t.split(" ") if w)
    assert int((enc["n_tokens"] * enc["token"].str.len()).sum()) == total_chars


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "https://site1.example.com/a",
                "https://www.site1.example.com/b",
                "https://x.y.site3.example.com/c",
                "https://site2.example.com/d",
                "https://notsite1.example.com/e",
                "https://ads.example.org/f",
            ]
        ),
        min_size=0,
        max_size=4,
    )
)
def test_blocklist_count_matches_reference(spark, urls):
    from bytehub_spark.operators.text import url_blocklist_flags

    text = "pad " + " ".join(urls)
    out = url_blocklist_flags(_docs(spark, [text])).toPandas().iloc[0]
    blocked = {"site1.example.com", "site3.example.com", "ads.example.org"}

    def hit(u):
        host = u.split("//")[1].split("/")[0]
        host = host[4:] if host.startswith("www.") else host
        return any(host == d or host.endswith("." + d) for d in blocked)

    assert out["n_urls"] == len(urls)
    assert out["n_blocked"] == sum(hit(u) for u in urls)
    assert bool(out["blocked"]) == (sum(hit(u) for u in urls) > 0)


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=1, max_value=40), st.integers(min_value=2, max_value=9))
def test_shard_manifest_partitions_ids(spark, n_docs, n_shards):
    from bytehub_spark.operators.multimodal import shard_manifest

    texts = [f"w{i} " * (i % 5 + 1) for i in range(n_docs)]
    docs = _docs(spark, texts)
    out = shard_manifest(
        media_from_documents(docs), docs, n_shards=n_shards
    ).toPandas()
    assert len(out) == n_docs and out["media_id"].is_unique
    assert out["shard"].between(0, n_shards - 1).all()
    for _, grp in out.sort_values("media_id").groupby("shard"):
        assert grp["seq_in_shard"].tolist() == list(range(1, len(grp) + 1))


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_semantic_dedup_planted_twin_any_seed(spark, seed):
    from bytehub_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(8, 8))
    vecs = list(base) + [base[2]]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(9),
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            }
        )
    )
    out = semantic_dedup(df, threshold=0.95, n_cells=2).toPandas().set_index(
        "vec_id"
    )
    assert bool(out.loc[2, "keep"])
    assert not bool(out.loc[8, "keep"])
