from temporal_retriever_spark.sources.parquet import load_tables, read_table

__all__ = ["load_tables", "read_table"]
