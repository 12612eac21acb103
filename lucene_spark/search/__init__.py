from .query import parse_query, rewrite
from .searcher import Searcher

__all__ = ["Searcher", "parse_query", "rewrite"]
