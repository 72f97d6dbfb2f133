from .parquet import write_single_parquet

__all__ = ["write_single_parquet"]
