from .analytics import QUERY_REGISTRY, QuerySpec, oracle_sql, queries

__all__ = ["QUERY_REGISTRY", "QuerySpec", "oracle_sql", "queries"]
