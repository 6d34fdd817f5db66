from .ingest import (
    attribution_join_batch,
    dedup_lsh_batch,
    sessionize,
    sessionize_batch,
    stream_attribution_join,
    stream_dedup,
    stream_dedup_lsh,
    stream_documents,
    stream_events,
    stream_into_feature,
    stream_online_features,
    windowed_event_stats,
)

__all__ = [
    "stream_attribution_join",
    "attribution_join_batch",
    "stream_documents",
    "stream_dedup_lsh",
    "dedup_lsh_batch",
    "stream_events",
    "stream_dedup",
    "stream_into_feature",
    "stream_online_features",
    "windowed_event_stats",
    "sessionize",
    "sessionize_batch",
]
