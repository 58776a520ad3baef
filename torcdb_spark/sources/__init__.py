from torcdb_spark.sources.ingest import ingest_documents, read_any
from torcdb_spark.sources.maintenance import (
    compact_files,
    merge_upsert,
    table_file_stats,
)
from torcdb_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "ingest_documents",
    "read_any",
    "compact_files",
    "merge_upsert",
    "table_file_stats",
]
