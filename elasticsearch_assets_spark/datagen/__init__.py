from elasticsearch_assets_spark.datagen.pages import pages_df, pages_pandas
from elasticsearch_assets_spark.datagen.events import events_df, events_pandas

__all__ = ["pages_df", "pages_pandas", "events_df", "events_pandas"]
