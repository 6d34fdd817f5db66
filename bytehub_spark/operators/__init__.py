from . import asof, dedup, events_ops, ivf, multimodal, profile, similarity, text, tpch

__all__ = [
    "asof", "dedup", "events_ops", "ivf", "multimodal", "profile", "similarity", "text", "tpch",
]
