from .tag_db import TagDatabase, QueryResult

__all__ = ["TagDatabase", "QueryResult"]
