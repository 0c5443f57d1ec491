"""Sources & sinks (SURVEY.md §2.1)."""

from .tables import TABLES, load_table, load_tables, register_views
from .readers import (
    read_binary_files,
    read_csv_table,
    read_parquet_table,
    write_partitioned_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_binary_files",
    "read_csv_table",
    "read_parquet_table",
    "write_partitioned_parquet",
]
