from elasticsearch_assets_spark.query.bm25 import bm25_oracle, idf, tf_norm
from elasticsearch_assets_spark.query.engine import InvertedIndex

__all__ = ["bm25_oracle", "idf", "tf_norm", "InvertedIndex"]
