"""Sources & sinks: parquet fixtures, JDBC read/write, catalog, sync."""
