from temporal_retriever_spark.api.models import (
    AnalyzeRequest,
    Cap,
    Correlation,
    ForecastOptions,
    parse_analyze_request,
)

__all__ = [
    "AnalyzeRequest",
    "Cap",
    "Correlation",
    "ForecastOptions",
    "parse_analyze_request",
]
