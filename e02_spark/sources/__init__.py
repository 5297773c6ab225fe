"""Custom data sources (Spark 4 Python DataSource API)."""
