from . import dedup, events_ops, ivf, multimodal, similarity, text, tpch

__all__ = ["dedup", "events_ops", "ivf", "multimodal", "similarity", "text", "tpch"]
