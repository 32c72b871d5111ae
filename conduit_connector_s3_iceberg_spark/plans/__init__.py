"""Declarative query plans: the engine's SQL/DataFrame operator surface."""

from .registry import QUERIES, Query, query

__all__ = ["QUERIES", "Query", "query"]
