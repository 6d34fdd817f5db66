from .jsonl import DOCUMENTS_DDL, read_jsonl, write_jsonl
from .tables import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_jsonl",
    "write_jsonl",
    "DOCUMENTS_DDL",
]
