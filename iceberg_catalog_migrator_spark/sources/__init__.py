from .formats import (
    compact_parquet,
    read_as,
    roundtrip,
    shard_expr,
    write_as,
    write_clustered,
    write_sharded,
)
from .tables import TABLES, load_table, load_tables, register_temp_views

__all__ = [
    "TABLES",
    "compact_parquet",
    "load_table",
    "load_tables",
    "read_as",
    "register_temp_views",
    "roundtrip",
    "shard_expr",
    "write_as",
    "write_clustered",
    "write_sharded",
]
