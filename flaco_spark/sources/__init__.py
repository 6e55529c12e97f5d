"""Sources & sinks: JDBC/PostgreSQL, Parquet, Arrow-IPC/Feather."""
