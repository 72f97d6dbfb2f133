from .raw_query import execute_raw_query
from .transform import execute_transform

__all__ = ["execute_raw_query", "execute_transform"]
