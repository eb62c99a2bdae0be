from elasticsearch_assets_spark.analysis.extract import EXTRACT_VERSION, extract_text, extract_text_series
from elasticsearch_assets_spark.analysis.tokenizer import (
    TOKENIZER_VERSION,
    tokenize,
    tokenize_series,
)

__all__ = [
    "EXTRACT_VERSION",
    "TOKENIZER_VERSION",
    "extract_text",
    "extract_text_series",
    "tokenize",
    "tokenize_series",
]
