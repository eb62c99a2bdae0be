from elasticsearch_assets_spark.index.codec import (
    decode_varint,
    encode_varint,
    decode_postings,
    encode_postings,
)
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.index.stats import IndexMeta, load_meta

__all__ = [
    "decode_varint",
    "encode_varint",
    "decode_postings",
    "encode_postings",
    "build_index",
    "IndexMeta",
    "load_meta",
]
