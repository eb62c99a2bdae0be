"""U2: user-supplied generator schema tests."""

from __future__ import annotations

import numpy as np
import pandas as pd

from elasticsearch_assets_spark.datagen.custom import generator_df


def test_dict_schema_deterministic(spark):
    schema = {
        "doc_id": lambda ids: ids,
        "score": lambda ids: (ids * 0.5),
        "label": lambda ids: np.where(ids % 2 == 0, "even", "odd"),
    }
    ddl = "doc_id long, score double, label string"
    a = generator_df(spark, 100, schema, ddl).orderBy("doc_id").collect()
    b = generator_df(spark, 100, schema, ddl, partitions=3).orderBy("doc_id").collect()
    assert a == b  # partitioning-invariant determinism (C7)
    assert len(a) == 100
    assert a[3]["score"] == 1.5 and a[4]["label"] == "even"


def test_callable_schema(spark):
    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": pdf["id"], "sq": pdf["id"] ** 2})

    out = generator_df(spark, 10, make, "k long, sq long").orderBy("k").collect()
    assert [r["sq"] for r in out] == [i * i for i in range(10)]
