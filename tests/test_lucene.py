"""Lucene-subset parser + compiler tests — query strings taken from the
reference's HTTP-contract tests (/root/reference/test/simple_api_reader-spec.js)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.query.lucene import (
    And, Cmp, Not, Or, Phrase, Prefix, Range, Term,
    compile_filter, parse_lucene, text_terms,
)


class TestParse:
    def test_field_term(self):
        assert parse_lucene("foo:bar") == Term("foo", "bar")

    def test_phrase(self):
        assert parse_lucene('foo:"bar+baz"') == Phrase("foo", "bar+baz")

    def test_bool_precedence(self):
        # test:query OR other:thing AND bytes:>=2000  → OR(test, AND(other, bytes))
        ast = parse_lucene("test:query OR other:thing AND bytes:>=2000")
        assert ast == Or(
            (Term("test", "query"), And((Term("other", "thing"), Cmp("bytes", ">=", "2000"))))
        )

    def test_range_mixed_brackets(self):
        ast = parse_lucene("created:[2015-01-01 TO 2015-01-02}")
        assert ast == Range("created", "2015-01-01", "2015-01-02", True, False)

    def test_prefix_wildcard(self):
        assert parse_lucene("doc_key:ba*") == Prefix("doc_key", "ba")

    def test_bare_terms_implicit_and(self):
        assert parse_lucene("spark join") == And((Term(None, "spark"), Term(None, "join")))

    def test_not_and_parens(self):
        ast = parse_lucene("NOT lang:en AND (spark OR join)")
        assert ast == And(
            (Not(Term("lang", "en")), Or((Term(None, "spark"), Term(None, "join"))))
        )

    def test_bad_query(self):
        with pytest.raises(ValueError):
            parse_lucene("(unbalanced")


class TestCompile:
    @pytest.fixture(scope="class")
    def df(self, spark):
        rows = [
            (0, "spark join query", "en", 1500),
            (1, "spark filter", "en", 2500),
            (2, "join merge", "de", 2000),
            (3, "bar baz word", "fr", 3000),
            (4, "bar other baz", "fr", 100),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string, bytes long")

    def _ids(self, df, q, **kw):
        pred = compile_filter(parse_lucene(q), **kw)
        return sorted(r["doc_id"] for r in df.where(pred).collect())

    def test_free_text_and(self, df):
        assert self._ids(df, "spark join") == [0]

    def test_field_eq(self, df):
        assert self._ids(df, "lang:de") == [2]

    def test_numeric_comparator(self, df):
        assert self._ids(df, "bytes:>=2000") == [1, 2, 3]
        assert self._ids(df, "bytes:<200") == [4]

    def test_bool_mix(self, df):
        assert self._ids(df, "lang:fr OR spark AND bytes:>=2000") == [1, 3, 4]

    def test_phrase_adjacency(self, df):
        assert self._ids(df, '"bar baz"') == [3]  # doc 4 has bar..baz non-adjacent

    def test_range(self, df):
        assert self._ids(df, "bytes:[1500 TO 2500}") == [0, 2]
        assert self._ids(df, "bytes:[1500 TO 2500]") == [0, 1, 2]

    def test_not(self, df):
        assert self._ids(df, "NOT lang:en") == [2, 3, 4]

    def test_text_terms_extraction(self):
        ast = parse_lucene('spark AND lang:en OR "big data" NOT bad')
        assert text_terms(ast) == ["spark", "big", "data"]


def test_analyzed_prefix_query(spark):
    from pyspark.sql import Row

    from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene

    df = spark.createDataFrame(
        [Row(doc_id=0, text="sparkling water"), Row(doc_id=1, text="flat water"),
         Row(doc_id=2, text="Sparse data")],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in df.where(compile_filter(parse_lucene("spar*"))).collect()
    )
    assert got == [0, 2]  # sparkling + Sparse (lowercased), not flat
    # non-analyzed field prefix stays a raw startswith
    df2 = df.withColumn("tag", df.text)
    got2 = [
        r["doc_id"]
        for r in df2.where(compile_filter(parse_lucene("tag:flat*"))).collect()
    ]
    assert got2 == [1]


# ---------------------------------------------------------------------------
# parser fuzz: never crash, booleans compose
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_field = st.sampled_from(["foo", "bar", "bytes", "created"])
_value = st.text(
    alphabet=st.characters(codec="ascii", categories=["L", "N"]), min_size=1, max_size=8
)


@st.composite
def _clause(draw):
    kind = draw(st.sampled_from(["term", "fterm", "cmp", "range", "phrase"]))
    f, v = draw(_field), draw(_value)
    if kind == "term":
        return v
    if kind == "fterm":
        return f"{f}:{v}"
    if kind == "cmp":
        op = draw(st.sampled_from([">=", "<=", ">", "<"]))
        return f"{f}:{op}{draw(st.integers(0, 9999))}"
    if kind == "range":
        lo, hi = sorted((draw(st.integers(0, 99)), draw(st.integers(100, 999))))
        lb = draw(st.sampled_from(["[", "{"]))
        rb = draw(st.sampled_from(["]", "}"]))
        return f"{f}:{lb}{lo} TO {hi}{rb}"
    return f'{f}:"{v} {draw(_value)}"'


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_parser_fuzz_composed_queries(data):
    from elasticsearch_assets_spark.query.lucene import parse_lucene, text_terms

    n = data.draw(st.integers(1, 4))
    clauses = [data.draw(_clause()) for _ in range(n)]
    ops = [data.draw(st.sampled_from([" AND ", " OR "])) for _ in range(n - 1)]
    q = clauses[0]
    for op, c in zip(ops, clauses[1:]):
        neg = data.draw(st.booleans())
        q += op + ("NOT " if neg else "") + c
    ast = parse_lucene(q)  # must not raise
    assert ast is not None
    text_terms(ast)  # must not raise either


def test_non_ascii_filter_matches_tokenizer_contract(spark):
    """P4 parity on non-ASCII text: compile_filter membership must agree
    with the normative analysis.tokenizer contract — the JVM mirror uses
    the same [^\\p{L}\\p{N}]+ class, so `text:café` filters exactly what
    the index analyzes (mixed scripts, accents, CJK, digits)."""
    from pyspark.sql import Row

    from elasticsearch_assets_spark.analysis.tokenizer import tokenize
    from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene

    texts = [
        "Café au lait, s'il vous plaît",
        "CAFÉ-BAR öffnet früh",
        "日本語のテキストとspark",
        "naïve approach №42 über_alles",
        "Ωμέγα και άλφα",
        "cafe without accent",
        "ᾯ ancient greek ligature",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    for probe in ["café", "öffnet", "日本語のテキストとspark", "über", "ωμέγα", "42"]:
        want = sorted(i for i, t in enumerate(texts) if probe in tokenize(t))
        got = sorted(
            r["doc_id"]
            for r in df.where(
                compile_filter(parse_lucene(f"text:{probe}"))
            ).collect()
        )
        assert got == want, (probe, got, want)

    # phrase adjacency across non-ASCII separators
    got = sorted(
        r["doc_id"]
        for r in df.where(compile_filter(parse_lucene('"café au"'))).collect()
    )
    assert got == [0]


class TestLuceneExtras:
    """Escapes, field:(...) grouping, ? wildcard — Lucene-surface extras."""

    def test_escaped_specials_parse_as_literals(self):
        from elasticsearch_assets_spark.query.lucene import Term, parse_lucene

        assert parse_lucene(r"foo\:bar") == Term(None, "foo:bar")
        assert parse_lucene(r"tag:a\(b\)") == Term("tag", "a(b)")
        assert parse_lucene(r"path:a\*b") == Term("path", "a*b")

    def test_field_group_distributes(self):
        from elasticsearch_assets_spark.query.lucene import (
            Cmp, Or, Range, Term, parse_lucene,
        )

        ast = parse_lucene("lang:(en OR de)")
        assert ast == Or((Term("lang", "en"), Term("lang", "de")))
        # explicit fields inside the group win; non-term clauses untouched
        ast2 = parse_lucene("lang:(en OR other:x AND bytes:>=5)")
        assert Term("other", "x") in ast2.children[1].children
        assert Cmp("bytes", ">=", "5") in ast2.children[1].children
        # comparators and ranges inherit the group field (legal Lucene)
        ast3 = parse_lucene("count:(>10 AND <20)")
        assert ast3.children == (Cmp("count", ">", "10"), Cmp("count", "<", "20"))
        ast4 = parse_lucene("created:([2019 TO 2020])")
        assert ast4 == Range("created", "2019", "2020", True, True)

    def test_question_wildcard(self, spark):
        from pyspark.sql import Row

        from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene

        df = spark.createDataFrame(
            [Row(doc_id=0, text="bat cave"), Row(doc_id=1, text="bit rot"),
             Row(doc_id=2, text="boat house"), Row(doc_id=3, text="bt short")],
            "doc_id long, text string",
        )

        def ids(q):
            return sorted(
                r["doc_id"] for r in df.where(compile_filter(parse_lucene(q))).collect()
            )

        assert ids("b?t") == [0, 1]          # exactly one char
        assert ids("b*t") == [0, 1, 2, 3]    # any run incl. empty
        assert ids("b?at") == [2]
        assert ids("text:b??t") == [2]

    def test_wildcard_on_raw_field(self, spark):
        from pyspark.sql import Row

        from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene

        df = spark.createDataFrame(
            [Row(doc_id=0, key="a1-x"), Row(doc_id=1, key="a2-y"), Row(doc_id=2, key="b1-x")],
            "doc_id long, key string",
        )
        got = sorted(
            r["doc_id"]
            for r in df.where(
                compile_filter(parse_lucene("key:a?-*"), analyzed_fields=set())
            ).collect()
        )
        assert got == [0, 1]

    def test_escaped_wildcard_is_literal(self, spark):
        from pyspark.sql import Row

        from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene

        df = spark.createDataFrame(
            [Row(doc_id=0, key="a*b"), Row(doc_id=1, key="axb")],
            "doc_id long, key string",
        )
        got = sorted(
            r["doc_id"]
            for r in df.where(
                compile_filter(parse_lucene(r"key:a\*b"), analyzed_fields=set())
            ).collect()
        )
        assert got == [0]


class TestEscapedColon:
    r"""Field-ness is decided by backslash-run parity before the colon
    (ADVICE round 2): `foo\:` = term "foo:", `foo\\:` = field "foo\"."""

    def test_single_escape_is_term(self):
        assert parse_lucene(r"foo\:bar") == Term(None, "foo:bar")

    def test_double_escape_is_field(self):
        # \\ escapes the backslash; the colon is a real separator
        assert parse_lucene(r"foo\\:bar") == Term("foo\\", "bar")

    def test_triple_escape_is_term(self):
        # \\ + \: -> literal backslash + literal colon inside one term
        assert parse_lucene(r"foo\\\:bar") == Term(None, "foo\\:bar")

    def test_plain_field_unaffected(self):
        assert parse_lucene("foo:bar") == Term("foo", "bar")
