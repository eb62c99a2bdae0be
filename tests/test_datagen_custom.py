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


def test_set_id_alphabets_and_start_key(spark):
    """Reference generator id knobs (default_schema.js:50-64,
    ops_reference.md:169-170): set_id picks the alphabet, id_start_key pins
    or constrains the first character — deterministic here (C7)."""
    import re

    from elasticsearch_assets_spark.datagen.events import events_pandas, make_doc_ids

    ids = np.arange(200, dtype=np.int64)
    hex_ids = make_doc_ids(ids, set_id="hexadecimal")
    assert all(re.fullmatch(r"[0-9a-f]{8}", s) for s in hex_ids)
    up = make_doc_ids(ids, set_id="HEXADECIMAL")
    assert up == [s.upper() for s in hex_ids]
    b64 = make_doc_ids(ids, set_id="base64url")
    assert all(re.fullmatch(r"[A-Za-z0-9\-_]{9}", s) for s in b64)
    assert len(set(hex_ids)) == len(ids) and len(set(b64)) == len(ids)

    # pinned first char (reference: "if you set it to 'a', the first
    # character of the id will be 'a'")
    pinned = make_doc_ids(ids, set_id="hexadecimal", id_start_key="a")
    assert all(s[0] == "a" for s in pinned)
    assert [s[1:] for s in pinned] == [s[1:] for s in hex_ids]
    # class/range forms
    ranged = make_doc_ids(ids, set_id="hexadecimal", id_start_key="[a-f]")
    assert all(s[0] in "abcdef" for s in ranged)
    either = make_doc_ids(ids, set_id="base64url", id_start_key="[ab]")
    assert all(s[0] in "ab" for s in either)
    assert len({s[0] for s in either}) == 2  # actually alternates

    # end-to-end: generated events carry the constrained ids; the id-prefix
    # planner's depth-1 scan over them is exact (id_slicer-spec.js shape)
    pdf = events_pandas(100, set_id="hexadecimal", id_start_key="[ab]")
    assert set(pdf["id"].str[0].unique()) <= {"a", "b"}


def test_date_format_and_date_key_knobs(spark):
    """format/date_key knobs (ops_reference.md:164-183): dateNow/utcDate
    stamp a constant injected now; date_key renames the date column."""
    import pytest

    from elasticsearch_assets_spark.datagen.events import events_df, events_pandas

    pdf = events_pandas(
        50, date_format="utcDate", date_key="timestamp", now_ms=1700000000000
    )
    assert "timestamp" in pdf.columns and "created" not in pdf.columns
    assert pdf["timestamp"].nunique() == 1
    assert int(pdf["timestamp"].iloc[0].value // 10**6) == 1700000000000

    with pytest.raises(ValueError):
        events_pandas(5, date_format="dateNow")  # needs now_ms
    with pytest.raises(ValueError):
        events_pandas(5, date_format="nope")

    df = events_df(
        spark, 40, partitions=4, date_key="timestamp", date_format="isoBetween"
    )
    assert "timestamp" in df.columns
    assert df.count() == 40
