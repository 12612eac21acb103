from .builder import build_index
from .compaction import compact_deletes
from .dvupdates import update_numeric_doc_values
from .reader import IndexReader

__all__ = [
    "build_index",
    "compact_deletes",
    "update_numeric_doc_values",
    "IndexReader",
]
