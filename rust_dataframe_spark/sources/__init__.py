"""Sources and sinks (SURVEY §2.1): csv/json/parquet + JDBC."""
