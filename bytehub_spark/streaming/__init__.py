from .ingest import (
    attribution_join_batch,
    stream_attribution_join,
    sessionize,
    sessionize_batch,
    stream_dedup,
    stream_events,
    stream_into_feature,
    windowed_event_stats,
)

__all__ = [
    "stream_attribution_join",
    "attribution_join_batch",
    "stream_events",
    "stream_dedup",
    "stream_into_feature",
    "windowed_event_stats",
    "sessionize",
    "sessionize_batch",
]
