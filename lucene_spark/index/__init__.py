from .builder import build_index
from .reader import IndexReader

__all__ = ["build_index", "IndexReader"]
