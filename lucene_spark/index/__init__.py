from .builder import build_index
from .compaction import compact_deletes
from .reader import IndexReader

__all__ = ["build_index", "compact_deletes", "IndexReader"]
