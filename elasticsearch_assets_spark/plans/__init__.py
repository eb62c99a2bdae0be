from elasticsearch_assets_spark.plans.date_slicer import (
    DateSlice,
    DateSlicePlan,
    plan_date_slices,
    slice_predicate,
)
from elasticsearch_assets_spark.plans.id_slicer import KeySlice, plan_key_slices
from elasticsearch_assets_spark.plans.datemath import parse_date_math

__all__ = [
    "DateSlice",
    "DateSlicePlan",
    "plan_date_slices",
    "slice_predicate",
    "KeySlice",
    "plan_key_slices",
    "parse_date_math",
]
