"""IO layer (Iceberg-first, Parquet fallback) + synthetic corpus sources."""
