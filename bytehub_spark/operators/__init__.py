from . import dedup, events_ops, similarity, text, tpch

__all__ = ["dedup", "events_ops", "similarity", "text", "tpch"]
