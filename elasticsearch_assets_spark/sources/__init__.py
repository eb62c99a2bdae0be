from elasticsearch_assets_spark.sources.tables import load_sf_table, load_table, write_table

__all__ = ["load_sf_table", "load_table", "write_table"]
