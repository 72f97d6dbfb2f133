from .parquet import read_parquet_slices, read_table, table_schema

__all__ = ["read_parquet_slices", "read_table", "table_schema"]
