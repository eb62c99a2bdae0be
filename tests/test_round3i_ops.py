"""Round-3 batch 17: exact-substring dup removal (apply step), text
normalization, stemmed search, sequence packing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators.dedup import remove_duplicate_spans
from elasticsearch_assets_spark.operators.packing import pack_documents
from elasticsearch_assets_spark.operators.textstats import normalize_text
from elasticsearch_assets_spark.query.expand import s_stem

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# dup-span removal
# ---------------------------------------------------------------------------


def test_remove_duplicate_spans_handmade(spark):
    dup = " ".join(f"w{i}" for i in range(8))  # the duplicated 8-gram
    docs = spark.createDataFrame(
        [
            (1, f"alpha {dup} beta"),
            (2, f"gamma delta {dup}"),
            (3, "epsilon zeta " + " ".join(f"u{i}" for i in range(8))),
            (4, dup),  # fully duplicated -> everything removed
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_fp"])
        for r in remove_duplicate_spans(docs, L=8).collect()
    }
    assert out[1] == (10, 8, _md5("alpha beta"))
    assert out[2] == (10, 8, _md5("gamma delta"))
    assert out[3] == (10, 0, _md5("epsilon zeta " + " ".join(f"u{i}" for i in range(8))))
    assert out[4] == (8, 8, _md5(""))


def test_remove_duplicate_spans_overlap_merge(spark):
    # two docs share a 9-token run -> two overlapping 8-windows merge
    run = " ".join(f"r{i}" for i in range(9))
    docs = spark.createDataFrame(
        [(1, f"x {run} y"), (2, run)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_fp"])
        for r in remove_duplicate_spans(docs, L=8).collect()
    }
    assert out[1] == (11, 9, _md5("x y"))
    assert out[2] == (9, 9, _md5(""))


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def test_normalize_text_rules(spark):
    raw = "  Hello\tworld​ \x07 twice  spaced \n"
    df = spark.createDataFrame([(1, raw), (2, "clean text")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    norm1 = "Hello world twice spaced"
    assert out[1]["n_chars_raw"] == len(raw)
    assert out[1]["n_chars_norm"] == len(norm1)
    assert out[1]["norm_fp"] == _md5(norm1)
    assert out[2]["norm_fp"] == _md5("clean text")
    low = {r["doc_id"]: r for r in normalize_text(df, lowercase=True).collect()}
    assert low[1]["norm_fp"] == _md5(norm1.lower())


# ---------------------------------------------------------------------------
# stemmed search
# ---------------------------------------------------------------------------


def test_s_stem_rules():
    assert s_stem("queries") == "query"
    assert s_stem("tables") == "table"
    assert s_stem("class") == "class"
    assert s_stem("status") == "status"
    assert s_stem("merge") == "merge"


def test_search_stemmed_matches_surface_classes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    import tempfile

    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    d = tempfile.mkdtemp(prefix="idx_stem_")
    build_index(spark, docs, f"{d}/i", num_segments=4, num_chunks=1)
    idx = InvertedIndex(spark, f"{d}/i")
    # plural query terms absent from the dictionary resolve via stems
    got = [
        (r["doc_id"], r["score"])
        for r in idx.search_stemmed(["joins", "tables"], k=None).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in idx.search(["join", "table"], k=None, mode="and").collect()
    ]
    assert got == want and len(got) > 0
    # plain search on the surface forms finds nothing
    assert idx.search(["joins", "tables"], k=None, mode="and").count() == 0
    # unknown stem -> empty AND
    assert idx.search_stemmed(["zzzqs", "tables"], k=None).count() == 0
    # OR mode flattens
    o = [
        (r["doc_id"], r["score"])
        for r in idx.search_stemmed(["joins"], k=None, mode="or").collect()
    ]
    p = [
        (r["doc_id"], r["score"])
        for r in idx.search(["join"], k=None, mode="or").collect()
    ]
    assert o == p
    with pytest.raises(ValueError, match="at least one term"):
        idx.search_stemmed([])


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def test_pack_documents_prefix_sum(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sorted(
        (
            r["doc_id"], r["n_tokens"], r["global_offset"], r["bin"],
            r["bin_offset"],
        )
        for r in pack_documents(docs, 512, bucket_width=37).collect()
    )
    acc = 0
    for doc_id, n, off, b, bo in out:
        assert off == acc
        assert b == off // 512 and bo == off % 512
        acc += n
    # bucket width must not change the result (distributed prefix sum
    # is exact at any bucketing)
    out2 = sorted(
        (
            r["doc_id"], r["n_tokens"], r["global_offset"], r["bin"],
            r["bin_offset"],
        )
        for r in pack_documents(docs, 512, bucket_width=100_000).collect()
    )
    assert out == out2
    with pytest.raises(ValueError, match="window"):
        pack_documents(docs, 0)
    with pytest.raises(ValueError, match="bucket_width"):
        pack_documents(docs, 512, bucket_width=0)
