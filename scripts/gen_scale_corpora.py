"""Deterministic scale-corpus generators for the NEXT.md datapoints —
committed so every recorded 100x/250x run is reproducible from the
repo (the corpora themselves live under /tmp and die with the host).

  python scripts/gen_scale_corpora.py emb500k   # /tmp/sf100_emb
  python scripts/gen_scale_corpora.py ev10m     # /tmp/sf100_stream
  python scripts/gen_scale_corpora.py all

- emb500k: 500k vectors, 64 dims — 10k pseudo-bases (the 2000 sf0.1
  embeddings + deterministic rolls) x 50 unit-normalized noisy copies
  at within-group cos ~0.93 (eps=0.27), labels inherited. Fixed seed.
- ev10m: 10M events — 100 copies of sf0.1 events; copy c shifts ts by
  +35d*c, re-keys event_id by +100k*c, rotates user_id by +17*c mod
  |users| so cohorts spread.

- docs500k: the 500k-doc dedup corpus (/tmp/sf100_docs) — originally a
  round-6 /tmp one-off; reconstructed here in round 11 after a host
  reset wiped it (100 copies of sf0.1 documents, ids offset 1e6/copy).
- docs10m: the same recipe at 20x (/tmp/sf100_docs10m, round 12) for
  the monitor-scale datapoints; opt-in (~6 GB), not part of "all".
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"


def gen_emb500k(out_dir: str = "/tmp/sf100_emb") -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{SF01}/embeddings.parquet")
    seeds = np.array(
        [list(x) for x in t.column("embedding").to_pylist()], dtype=np.float64
    )
    labels = np.array(t.column("label").to_pylist(), dtype=np.int32)
    n_seed, dim = seeds.shape
    norm = np.linalg.norm(seeds, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    seeds = seeds / norm

    groups, copies, eps = 10_000, 50, 0.27
    rng = np.random.default_rng(20260814)
    bases = np.empty((groups, dim))
    for j in range(groups):
        bases[j] = np.roll(seeds[j % n_seed], j // n_seed)
    base_labels = labels[np.arange(groups) % n_seed]

    out = np.empty((groups * copies, dim), dtype=np.float64)
    for j in range(groups):
        g = rng.standard_normal((copies, dim)) / np.sqrt(dim)
        v = bases[j][None, :] + eps * g
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        out[j * copies:(j + 1) * copies] = v

    tbl = pa.table({
        "vec_id": np.arange(groups * copies, dtype=np.int64),
        "embedding": pa.array(
            [row for row in out.astype(np.float32)],
            type=pa.list_(pa.float32()),
        ),
        "label": np.repeat(base_labels, copies).astype(np.int32),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet", row_group_size=50_000)
    print(f"emb500k: wrote {tbl.num_rows} rows -> {out_dir}")


def gen_ev10m(out_dir: str = "/tmp/sf100_stream") -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{SF01}/events.parquet")
    n = t.num_rows
    ev = t.column("event_id").to_numpy()
    ts = t.column("ts").to_numpy()
    uid = t.column("user_id").to_numpy()
    et, props = t.column("event_type"), t.column("props")
    val = t.column("value").to_numpy()
    umax = int(uid.max()) + 1
    shift = np.timedelta64(35, "D").astype("timedelta64[us]")
    writer = None
    for c in range(100):
        tbl = pa.table({
            "event_id": pa.array(ev + c * n, type=pa.int64()),
            "ts": pa.array(ts + c * shift),
            "user_id": pa.array((uid + 17 * c) % umax, type=pa.int64()),
            "event_type": et,
            "value": pa.array(val, type=pa.float64()),
            "props": props,
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{out_dir}/events.parquet", tbl.schema)
        writer.write_table(tbl, row_group_size=250_000)
    writer.close()
    meta = pq.read_metadata(f"{out_dir}/events.parquet")
    print(f"ev10m: wrote {meta.num_rows} rows -> {out_dir}")


def gen_ev100m(out_dir: str = "/tmp/sf100_stream100m") -> None:
    """100M events (round 12): the ev10m recipe at 10x — 1,000 copies
    of sf0.1 events with the same id/ts/user shifting scheme. The
    bounded-state monitor datapoints' 10x scale-up proof; opt-in
    (~4 GB), not part of "all"."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{SF01}/events.parquet")
    n = t.num_rows
    ev = t.column("event_id").to_numpy()
    ts = t.column("ts").to_numpy()
    uid = t.column("user_id").to_numpy()
    et, props = t.column("event_type"), t.column("props")
    val = t.column("value").to_numpy()
    umax = int(uid.max()) + 1
    shift = np.timedelta64(35, "D").astype("timedelta64[us]")
    writer = None
    for block in range(100):
        parts = []
        for c in range(block * 10, (block + 1) * 10):
            parts.append(pa.table({
                "event_id": pa.array(ev + c * n, type=pa.int64()),
                "ts": pa.array(ts + c * shift),
                "user_id": pa.array((uid + 17 * c) % umax, type=pa.int64()),
                "event_type": et,
                "value": pa.array(val, type=pa.float64()),
                "props": props,
            }))
        tbl = pa.concat_tables(parts)
        if writer is None:
            writer = pq.ParquetWriter(f"{out_dir}/events.parquet", tbl.schema)
        writer.write_table(tbl, row_group_size=500_000)
    writer.close()
    meta = pq.read_metadata(f"{out_dir}/events.parquet")
    print(f"ev100m: wrote {meta.num_rows} rows -> {out_dir}")


def gen_docs500k(out_dir: str = "/tmp/sf100_docs") -> None:
    """Reconstruction of the round-6 500k-doc dedup corpus (the
    original /tmp generator predates this script and died with the
    host): 100 copies of sf0.1 documents, doc_id offset by 1e6 per
    copy, text/lang/source/n_chars verbatim — duplicate-heavy by
    construction (every doc has 99 exact twins), which is what the
    dedup-family datapoints are supposed to stress."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{SF01}/documents.parquet")
    ids = t.column("doc_id").to_numpy()
    writer = None
    for c in range(100):
        tbl = pa.table({
            "doc_id": pa.array(ids + c * 1_000_000, type=pa.int64()),
            "text": t.column("text"),
            "lang": t.column("lang"),
            "source": t.column("source"),
            "n_chars": t.column("n_chars"),
        })
        if writer is None:
            writer = pq.ParquetWriter(
                f"{out_dir}/documents.parquet", tbl.schema
            )
        writer.write_table(tbl, row_group_size=100_000)
    writer.close()
    meta = pq.read_metadata(f"{out_dir}/documents.parquet")
    print(f"docs500k: wrote {meta.num_rows} rows -> {out_dir}")


def gen_docs10m(out_dir: str = "/tmp/sf100_docs10m") -> None:
    """10M-doc corpus for the monitor-scale datapoints (round 12):
    the docs500k recipe at 20x — 2,000 copies of sf0.1 documents,
    doc_id offset by 1e6 per copy. Same duplicate-heavy shape (every
    doc has 1,999 exact twins), so funnel cost tracks survivors, not
    input — the property the 10M run is meant to prove holds."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{SF01}/documents.parquet")
    ids = t.column("doc_id").to_numpy()
    writer = None
    # 100 copies per row group (~510k rows) — per-copy groups would be
    # 5k-row confetti
    for block in range(20):
        parts = []
        for c in range(block * 100, (block + 1) * 100):
            parts.append(pa.table({
                "doc_id": pa.array(ids + c * 1_000_000, type=pa.int64()),
                "text": t.column("text"),
                "lang": t.column("lang"),
                "source": t.column("source"),
                "n_chars": t.column("n_chars"),
            }))
        tbl = pa.concat_tables(parts)
        if writer is None:
            writer = pq.ParquetWriter(
                f"{out_dir}/documents.parquet", tbl.schema
            )
        writer.write_table(tbl, row_group_size=510_000)
    writer.close()
    meta = pq.read_metadata(f"{out_dir}/documents.parquet")
    print(f"docs10m: wrote {meta.num_rows} rows -> {out_dir}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "docs10m":  # opt-in: ~6 GB on /tmp, not part of "all"
        gen_docs10m()
    if which == "ev100m":  # opt-in: ~4 GB on /tmp, not part of "all"
        gen_ev100m()
    if which in ("docs500k", "all"):
        gen_docs500k()
    if which in ("emb500k", "all"):
        gen_emb500k()
    if which in ("ev10m", "all"):
        gen_ev10m()
