from .join import join_search
from .query import parse_query, rewrite
from .searcher import Searcher

__all__ = ["Searcher", "join_search", "parse_query", "rewrite"]
