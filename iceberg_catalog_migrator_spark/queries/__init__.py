from .registry import REGISTRY, QueryDef, all_queries, register_query

__all__ = ["REGISTRY", "QueryDef", "all_queries", "register_query"]
