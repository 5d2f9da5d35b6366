from temporal_retriever_spark.sources.layout import (
    column_ranges,
    hilbert_expr,
    hilbert_write,
    with_hilbert,
    zorder_write,
    zvalue_expr,
)
from temporal_retriever_spark.sources.parquet import load_tables, read_table
from temporal_retriever_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    split_http_payload,
)

__all__ = [
    "column_ranges",
    "load_tables",
    "read_table",
    "iter_warc_records",
    "read_warc",
    "split_http_payload",
    "zorder_write",
    "zvalue_expr",
]
