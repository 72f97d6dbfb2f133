from .dialect import rewrite_query

__all__ = ["rewrite_query"]
