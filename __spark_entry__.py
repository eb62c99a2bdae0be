"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the inverted index over the sf0.001
``documents`` corpus and answer a conjunctive BM25 top-k query.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each runnable at any sf_dir and checked against DuckDB.

Floating-point protocol for oracle comparison: every float column is rounded
to 4 decimals on BOTH sides, and any top-k cut is taken on the exact score
with (score DESC, doc_id ASC) tie-break in both engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.index.stats import B, K1
from elasticsearch_assets_spark.operators import dedup as OD
from elasticsearch_assets_spark.operators import similarity as OS
from elasticsearch_assets_spark.operators import textstats as OT
from elasticsearch_assets_spark.operators import multimodal as OM
from elasticsearch_assets_spark.operators.texthash import (
    MH_PRIME,
    MINHASH_PERMS,
    hash60_sql,
    shingles_sql,
    simhash_sql,
    token_hashes_sql,
    tokens_sql,
)
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.sources.tables import load_sf_table

# ---------------------------------------------------------------------------
# index cache: build once per (sf_dir) per process
# ---------------------------------------------------------------------------
_INDEX_CACHE: dict[str, InvertedIndex] = {}


def _idx_dir(sf_dir: str, suffix: str = "_documents") -> str:
    key = os.path.abspath(sf_dir)
    return os.path.join(
        "/tmp", "esa_indexes", key.strip("/").replace("/", "_") + suffix
    )


def _docs_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        idx_dir = _idx_dir(sf_dir)
        import json

        from elasticsearch_assets_spark.analysis.tokenizer import TOKENIZER_VERSION
        from elasticsearch_assets_spark.index.codec import CODEC_VERSION

        meta_path = os.path.join(idx_dir, "meta.json")
        stale = True
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                m = json.load(fh)
            stale = (
                m.get("codec_version") != CODEC_VERSION
                or m.get("tokenizer_version") != TOKENIZER_VERSION
                # pre-round-2 caches lack the doc->segment mapping meta the
                # cogrouped filtered-search path needs — rebuild those too
                or m.get("partitioning") != "doc_hash"
            )
        if stale:
            docs = load_sf_table(spark, sf_dir, "documents")
            build_index(
                spark, docs, idx_dir, id_col="doc_id", text_col="text",
                num_segments=8, num_chunks=1,
            )
        _INDEX_CACHE[key] = InvertedIndex(spark, idx_dir)
    return _INDEX_CACHE[key]


def _docs_index_pos(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """Positional variant of the documents index (build_index(
    positions=True)) — backs the index-assisted phrase contract row.
    Separate cache dir: the positional stream is opt-in, so the plain
    index stays position-free (and its build bench unchanged)."""
    key = os.path.abspath(sf_dir) + "#pos"
    if key not in _INDEX_CACHE:
        idx_dir = _idx_dir(sf_dir, "_documents_pos")
        import json

        from elasticsearch_assets_spark.analysis.tokenizer import TOKENIZER_VERSION
        from elasticsearch_assets_spark.index.codec import CODEC_VERSION

        meta_path = os.path.join(idx_dir, "meta.json")
        stale = True
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                m = json.load(fh)
            stale = (
                m.get("codec_version") != CODEC_VERSION
                or m.get("tokenizer_version") != TOKENIZER_VERSION
                or not m.get("positions", False)
            )
        if stale:
            docs = load_sf_table(spark, sf_dir, "documents")
            build_index(
                spark, docs, idx_dir, id_col="doc_id", text_col="text",
                num_segments=8, num_chunks=1, positions=True,
            )
        _INDEX_CACHE[key] = InvertedIndex(spark, idx_dir)
    return _INDEX_CACHE[key]


_TITLE_TOKENS = 8  # derived title field = first 8 tokens of text


def _docs_index_title(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """Second-field index backing the multi_match contract rows: 'title' =
    the first `_TITLE_TOKENS` tokens of each document (the corpus ships one
    text field; a deterministic derived field exercises the real multi-field
    machinery — each field's index carries its own df/avgdl stats, the ES
    per-field scoring contract)."""
    key = os.path.abspath(sf_dir) + "#title"
    if key not in _INDEX_CACHE:
        idx_dir = _idx_dir(sf_dir, "_documents_title")
        import json

        from elasticsearch_assets_spark.analysis.tokenizer import TOKENIZER_VERSION
        from elasticsearch_assets_spark.index.codec import CODEC_VERSION

        meta_path = os.path.join(idx_dir, "meta.json")
        stale = True
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                m = json.load(fh)
            stale = (
                m.get("codec_version") != CODEC_VERSION
                or m.get("tokenizer_version") != TOKENIZER_VERSION
                # positional since the multi_match type=phrase row —
                # positions are a pruned-away extra column for the
                # non-phrase rows, so one index serves both
                or not m.get("positions", False)
            )
        if stale:
            docs = load_sf_table(spark, sf_dir, "documents").select(
                "doc_id",
                F.concat_ws(
                    " ", F.slice(F.split(F.col("text"), " "), 1, _TITLE_TOKENS)
                ).alias("title"),
            )
            build_index(
                spark, docs, idx_dir, id_col="doc_id", text_col="title",
                num_segments=8, num_chunks=1, positions=True,
            )
        _INDEX_CACHE[key] = InvertedIndex(spark, idx_dir)
    return _INDEX_CACHE[key]


# deterministic deletion set for the tombstone contract row: doc_id % 7 == 0
_DELETE_PRED_SQL = "doc_id % 7 <> 0"  # survivors


def _docs_index_tombstoned(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """A copy of the documents index with `doc_id % 7 == 0` tombstoned —
    exercises the real delete path (tombstone files + exclusion before
    ranking, stats untouched until compaction)."""
    key = os.path.abspath(sf_dir) + "#tomb"
    if key not in _INDEX_CACHE:
        import shutil

        from elasticsearch_assets_spark.index.tombstones import add_tombstones

        base = _docs_index(spark, sf_dir)  # ensures the base index is fresh
        tomb_dir = _idx_dir(sf_dir, "_documents_tomb")
        shutil.rmtree(tomb_dir, ignore_errors=True)
        shutil.copytree(base.index_dir, tomb_dir)
        docs = load_sf_table(spark, sf_dir, "documents")
        ids = [
            r["doc_id"]
            for r in docs.where(F.col("doc_id") % 7 == 0).select("doc_id").collect()
        ]
        add_tombstones(tomb_dir, ids)
        _INDEX_CACHE[key] = InvertedIndex(spark, tomb_dir)
    return _INDEX_CACHE[key]


# ---------------------------------------------------------------------------
# BM25 oracle SQL template (DuckDB) — same formula as query/bm25.py
# ---------------------------------------------------------------------------


def _bm25_sql(
    terms: list[str],
    mode: str,
    k: int | None,
    where: str | None = None,
    offset: int | None = None,
    term_cond: str | None = None,
    min_match: int | None = None,
    boost_case: str | None = None,
    corpus_where: str | None = None,
) -> str:
    """`where` restricts RANKING to matching docs — collection stats (df, N,
    avgdl) stay global, exactly the engine's search_filtered / tombstone
    contract (restriction before the top-k cut, stats untouched).
    `offset` models keyset pagination (the engine's search_after cursor ==
    OFFSET under the deterministic (s DESC, doc_id ASC) order).
    `term_cond` replaces the IN-list with a dictionary predicate — the
    oracle twin of the engine's prefix/wildcard/fuzzy expansion.
    `min_match` (mode="or") keeps only docs matching >= that many distinct
    query terms — the minimum_should_match oracle. `boost_case` is a SQL
    expression over `tf.term` multiplying each term's idf — the `term^boost`
    oracle (Lucene folds boosts into the scorer exactly there)."""
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    nterms = len(set(terms))
    having = f"HAVING count(*) = {nterms}" if mode == "and" else ""
    if min_match is not None:
        having = f"HAVING count(*) >= {min_match}"
    boost = f" * ({boost_case})" if boost_case else ""
    final_where = f"WHERE {where}" if where else ""
    limit = (
        f"ORDER BY s DESC, doc_id ASC LIMIT {k}" if k is not None else ""
    )
    if offset is not None:
        limit += f" OFFSET {offset}"
    body = _bm25_body(
        term_cond or f"term IN ({tlist})", having, boost, corpus_where
    )
    return f"""
WITH {body}
SELECT doc_id, round(s, 4) AS score FROM scored {final_where} {limit}
"""


def _bm25_body(
    term_cond: str,
    having: str = "",
    boost: str = "",
    corpus_where: str | None = None,
    k1: float = K1,
    b: float = B,
    source: str = "documents",
) -> str:
    """The shared BM25 CTE chain (toks → dl → stats → tf → df → scored)
    so composite oracles (pinned ranks, feature boosts) can attach their
    own final SELECT over the EXACT score column `s` — rounding only at
    the very end, like the Spark side. `corpus_where` filters the corpus
    BEFORE stats — the reindex oracle (a fresh index's N/df/avgdl are the
    subset's), as opposed to `where` in _bm25_sql which restricts ranking
    under GLOBAL stats (filtered search / aliases / tombstones)."""
    cw = f" WHERE {corpus_where}" if corpus_where else ""
    return f"""toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {source}{cw}
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE {term_cond} GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)){boost}
              * tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
  {having}
)"""


_PHRASE_TERMS = ["table", "hash"]


def _bm25_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-assisted phrase query (round-2 verdict item #4): positional
    postings, no text scan — doc matches iff the token sequence contains
    the phrase consecutively; score = BM25 AND-score of the constituent
    terms restricted to matching docs (query/phrase.py)."""
    idx = _docs_index_pos(spark, sf_dir)
    res = idx.search_phrase(_PHRASE_TERMS, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_phrase_sql(phrase: list[str]) -> str:
    """DuckDB twin: positional tokenization (zipped unnest) + an n-way
    self-join asserting consecutive positions, then the standard BM25
    template restricted to phrase-matching docs."""
    distinct = sorted(set(phrase))
    tlist = ", ".join(f"'{t}'" for t in distinct)
    joins = " ".join(
        f"JOIN ptoks t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(phrase))
    )
    conds = " AND ".join(
        f"t{i}.term = '{t}'" for i, t in enumerate(phrase)
    )
    return f"""
WITH ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
toks AS (SELECT doc_id, term FROM ptoks),
phrase AS (
  SELECT DISTINCT t0.doc_id FROM ptoks t0 {joins} WHERE {conds}
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
  HAVING count(*) = {len(distinct)}
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM phrase)
"""


def _bm25_phrase_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase + scoring-clause composition (`"table hash" AND jo*`, the
    Lucene BooleanQuery-with-a-PhraseQuery shape): a doc matches iff it
    contains the phrase consecutively AND >= 1 dictionary term with the
    jo prefix; the score sums every matched term — search(groups=...)'s
    scoring_boolean contract restricted to phrase-matching docs
    (engine.search_phrase(groups=...))."""
    idx = _docs_index_pos(spark, sf_dir)
    groups = [idx.expand_prefix("jo")]
    res = idx.search_phrase(_PHRASE_TERMS, k=None, groups=groups)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_phrase_groups_sql(phrase: list[str], like: str) -> str:
    """DuckDB twin of the composition: the positional adjacency self-join
    restricted further by the group's dictionary predicate, scored over
    phrase terms + matched group terms."""
    distinct = sorted(set(phrase))
    tlist = ", ".join(f"'{t}'" for t in distinct)
    joins = " ".join(
        f"JOIN ptoks t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(phrase))
    )
    conds = " AND ".join(f"t{i}.term = '{t}'" for i, t in enumerate(phrase))
    phrase_flags = " AND ".join(
        f"max(CASE WHEN tf.term = '{t}' THEN 1 ELSE 0 END) = 1"
        for t in distinct
    )
    return f"""
WITH ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
toks AS (SELECT doc_id, term FROM ptoks),
phrase AS (
  SELECT DISTINCT t0.doc_id FROM ptoks t0 {joins} WHERE {conds}
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) OR term LIKE '{like}' GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
  HAVING {phrase_flags}
     AND max(CASE WHEN tf.term LIKE '{like}' THEN 1 ELSE 0 END) = 1
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM phrase)
"""


def _bm25_query(terms: list[str], mode: str, k: int | None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = _docs_index(spark, sf_dir)
        res = idx.search(terms, k=k, mode=mode)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    return run


# ES bool optional-should (must + should in one body): must decides
# matching, each should clause ADDS weight × its BM25 sum; a term in BOTH
# sides scores twice (Lucene sums independent clause scores). The msm row
# additionally requires ≥ 2 matched should CLAUSES.
_OPT_MUST = ["spark", "join"]
_OPT_CLAUSES = [(["table"], 1.0), (["hash", "merge"], 2.0), (["join"], 1.0)]
_OPTM_MUST = ["spark"]
_OPTM_CLAUSES = [(["join"], 1.0), (["table"], 1.0), (["hash"], 1.0)]


def _bm25_opt_should_query(must, clauses, msm: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = _docs_index(spark, sf_dir)
        res = idx.search_optional_should(
            must, clauses, k=None, minimum_should_match=msm
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    return run


def _bm25_opt_should_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed optional-should (session 12): a match_phrase SHOULD clause
    next to a must — the phrase clause's positional kernel produces its
    own scored frame, LEFT-JOINed onto the must set (dsl._run_opt_composed;
    phrase membership is adjacency-exact, never a bag-of-words
    approximation). Score = must BM25 + 2 × phrase-clause BM25 where the
    phrase occurs."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index_pos(spark, sf_dir)
    body = {
        "query": {"bool": {
            "must": [{"term": {"text": "spark"}}],
            "should": [{"match_phrase": {"text": {
                "query": " ".join(_PHRASE_TERMS), "boost": 2.0}}}],
        }},
        "size": None,
    }
    res = search_dsl(idx, body)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_opt_should_phrase_sql() -> str:
    """DuckDB twin: the adjacency self-join defines phrase membership;
    the clause sum (phrase terms' BM25, weighted) LEFT-JOINs onto the
    must aggregate."""
    distinct = sorted(set(_PHRASE_TERMS))
    plist = ", ".join(f"'{t}'" for t in distinct)
    all_terms = sorted(set(["spark"]) | set(distinct))
    tlist = ", ".join(f"'{t}'" for t in all_terms)
    joins = " ".join(
        f"JOIN ptoks t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(_PHRASE_TERMS))
    )
    conds = " AND ".join(
        f"t{i}.term = '{t}'" for i, t in enumerate(_PHRASE_TERMS)
    )
    return f"""
WITH ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
toks AS (SELECT doc_id, term FROM ptoks),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS w
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
),
m AS (
  SELECT doc_id, sum(w) AS s FROM contrib WHERE term = 'spark'
  GROUP BY doc_id
),
phrase AS (
  SELECT DISTINCT t0.doc_id FROM ptoks t0 {joins} WHERE {conds}
),
cl0 AS (
  SELECT c.doc_id, 2.0 * sum(c.w) AS s
  FROM contrib c JOIN phrase p ON c.doc_id = p.doc_id
  WHERE c.term IN ({plist})
  GROUP BY c.doc_id
)
SELECT m.doc_id, round(m.s + coalesce(cl0.s, 0), 4) AS score
FROM m LEFT JOIN cl0 USING (doc_id)
ORDER BY m.s + coalesce(cl0.s, 0) DESC, m.doc_id ASC
"""


def _dsl_filter_should_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool{filter, should} with NO explicit minimum_should_match — the ES
    default next to a filter is 0: every filter survivor matches; docs
    matching a should clause score its BM25 sum, the rest score 0 and sort
    after every positive (doc_id tiebreak). The DSL unions the zero rows
    in (query/dsl.py zero_should); should-only bools keep the default of
    1 (`bm25_or_all` pins that contract)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    body = {
        "query": {"bool": {
            "should": [{"term": {"text": "dup"}}],
            "filter": [{"range": {"n_chars": {"gte": 400}}}],
        }},
        "size": None,
    }
    res = search_dsl(idx, body, docs)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_DSL_FILTER_SHOULD_SQL = f"""
WITH {_bm25_body("term IN ('dup')")},
f AS (SELECT doc_id FROM documents WHERE n_chars >= 400)
SELECT f.doc_id, round(coalesce(s.s, 0), 4) AS score
FROM f LEFT JOIN scored s USING (doc_id)
ORDER BY coalesce(s.s, 0) DESC, f.doc_id ASC
"""


def _bm25_opt_should_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optional-should UNDER a structured filter (bool must+should+filter):
    must∩filter decides matching, clauses add score; clause membership and
    the must intersection are filter-independent per-doc properties, so
    all three search_filtered strategies are rank-identical — forced
    cogroup here (the scale path: filter ids shuffle by segment, clause
    postings ride the same pushed `term IN` scan)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.search_filtered(
        _OPT_MUST, docs.where(F.col("doc_id") % 3 == 0), k=None,
        strategy="cogroup", opt_should=_OPT_CLAUSES, opt_msm=1,
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_opt_should_sql(
    must, clauses, msm: int = 0, k: int | None = None,
    where: str | None = None,
) -> str:
    """DuckDB twin of search_optional_should: a per-(doc, term) BM25
    contribution CTE; the must side is the AND-having aggregate, each
    should clause its own weighted sum LEFT-JOINed on — absent clause =
    0 (never required), msm = count of non-NULL clause joins. `where`
    restricts RANKING to matching docs under GLOBAL collection stats —
    the search_filtered(opt_should=...) composition."""
    all_terms = sorted(set(must) | {t for ts, _ in clauses for t in ts})
    tlist = ", ".join(f"'{t}'" for t in all_terms)
    mlist = ", ".join(f"'{t}'" for t in sorted(set(must)))
    cl_ctes, joins, score_parts, flags = [], [], ["m.s"], []
    for i, (ts, w) in enumerate(clauses):
        clist = ", ".join(f"'{t}'" for t in sorted(set(ts)))
        cl_ctes.append(
            f"cl{i} AS (SELECT doc_id, {float(w)} * sum(w) AS s "
            f"FROM contrib WHERE term IN ({clist}) GROUP BY doc_id)"
        )
        joins.append(f"LEFT JOIN cl{i} USING (doc_id)")
        score_parts.append(f"coalesce(cl{i}.s, 0)")
        flags.append(f"(CASE WHEN cl{i}.s IS NOT NULL THEN 1 ELSE 0 END)")
    total = " + ".join(score_parts)
    conds = []
    if msm:
        conds.append(f"{' + '.join(flags)} >= {msm}")
    if where:
        conds.append(f"({where})")
    where_clause = f"WHERE {' AND '.join(conds)}" if conds else ""
    limit = f"LIMIT {k}" if k is not None else ""
    cl_block = ",\n".join(cl_ctes)
    join_block = " ".join(joins)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS w
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
),
m AS (
  SELECT doc_id, sum(w) AS s FROM contrib WHERE term IN ({mlist})
  GROUP BY doc_id HAVING count(*) = {len(set(must))}
),
{cl_block}
SELECT m.doc_id, round({total}, 4) AS score
FROM m {join_block}
{where_clause}
ORDER BY {total} DESC, m.doc_id ASC
{limit}
"""


# ---------------------------------------------------------------------------
# Half A reader-semantics queries (SURVEY.md §2.2, §2.5, §2.7)
# ---------------------------------------------------------------------------


def _date_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: [start inclusive, end exclusive) date-range slice + projection (P1)."""
    ev = load_sf_table(spark, sf_dir, "events")
    return ev.where(
        (F.col("ts") >= F.lit("2024-01-03 00:00:00")) & (F.col("ts") < F.lit("2024-01-05 00:00:00"))
    ).select("event_id", "ts", "event_type")


def _minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: earliest/latest date probe (reference sort+size-1, ours is an agg)."""
    ev = load_sf_table(spark, sf_dir, "events")
    return ev.agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))


def _slice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: count per candidate interval — the planner's one aggregate."""
    ev = load_sf_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("cnt")
    )


def _id_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A2: keyspace prefix predicate over a hex key (id_slicer semantics)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    return docs.withColumn("doc_key", key).where(
        F.col("doc_key").startswith("a")
    ).select("doc_id", "doc_key")


def _id_prefix_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: count per key prefix (depth 1) — id-slicer planning aggregate."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("prefix")
    ).agg(F.count("*").alias("cnt"))


def _term_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: count-without-fetch from the stats table (no corpus scan)."""
    idx = _docs_index(spark, sf_dir)
    return spark.createDataFrame([(idx.count_term("spark"),)], "cnt long")


def _date_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: date sort + result window (reference sort:created + size)."""
    ev = load_sf_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(25)
        .select("event_id", "ts")
    )


def _bm25_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: top-k winners joined back to their documents (broadcast join of
    the k ids against the corpus scan)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    topk = idx.search(["spark", "join"], k=10, mode="and")
    out = idx.materialize(topk, docs)
    return out.select(
        "doc_id", F.round("score", 4).alias("score"), "lang", "n_chars"
    )


def _bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core composition `range AND (query)` (simple_api_
    reader/index.js:67-84): BM25 top-k AMONG docs matching a structured
    filter. Runs the distributed cogrouped path (doc_hash index: the filter
    ids shuffle by derived segment, no driver materialization)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    filtered = docs.where(F.col("doc_id") % 3 == 0)
    res = idx.search_filtered(["spark", "table"], filtered, k=10, mode="or")
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-delete contract: docs with doc_id % 7 == 0 deleted, then a
    disjunctive all-matches query — deleted docs are excluded from ranking
    while df/N/avgdl still count them until compaction (the ES/Lucene
    deleted-docs contract, mirrored exactly by the oracle's global stats +
    restricted final select)."""
    idx = _docs_index_tombstoned(spark, sf_dir)
    res = idx.search(["spark", "join"], k=None, mode="or")
    return res.select("doc_id", F.round("score", 4).alias("score"))


# ---------------------------------------------------------------------------
# round 3: multi-term rewrites, keyset pagination, proximity, MLT, facets
# ---------------------------------------------------------------------------


def _bm25_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES prefix query: dictionary expansion (pushed StartsWith over the
    stats table) run as a scored OR — Lucene scoring_boolean rewrite
    (query/expand.py)."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_prefix("s", k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES wildcard query `s?a*`: leading-literal prefix pushed to the
    dictionary scan, anchored regex verifies, scored OR over the result."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_wildcard("s?a*", k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzzy query: Levenshtein ≤ 2 expansion of the (non-dictionary)
    typo 'grow' — JVM levenshtein over the distributed stats table, then a
    scored OR over the matched terms."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_fuzzy("grow", max_edits=2, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_fuzzy_osa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzzy query under the DEFAULT metric (transpositions=true, OSA —
    an adjacent swap costs one edit, Lucene's restricted Damerau): the
    typo 'spakr' reaches 'spark' at distance 1 where plain Levenshtein
    needs 2. Candidate band enumerated by a pushed JVM pre-filter
    (length band + lev <= 2e), exact OSA on the collected band
    (query/expand.py expand_fuzzy_osa). max_edits=1 because DuckDB's
    damerau_levenshtein is the UNRESTRICTED variant — the two metrics
    provably coincide at distance <= 1 (a single op is a single op in
    both), diverge only at >= 2 ('ca'->'abc'), so the oracle is exact
    here and the >= 2 behavior is pinned by the kernel's brute-force
    unit tests instead."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_fuzzy("spakr", max_edits=1, k=None, transpositions=True)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_fuzzy_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzziness=AUTO: the edit budget resolves from the QUERY term's
    length (0 below 3 chars, 1 below 6, else 2 — expand.parse_fuzziness).
    'queryy' is 6 chars -> 2 edits, so the expansion reaches 'query'
    (distance 1) plus any distance-2 dictionary terms."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_fuzzy("queryy", max_edits="AUTO", k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_AFTER_TERMS = ["spark", "table"]


def _search_after_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination (ES search_after, the reference's scroll paging):
    page 1's last (score, doc_id) becomes the cursor; page 2 re-runs the
    query with the cursor filtering per segment BEFORE the top-k cut. The
    oracle is OFFSET under the same deterministic order — equal results
    prove cursor == offset semantics."""
    idx = _docs_index(spark, sf_dir)
    page1 = idx.search(_AFTER_TERMS, k=10, mode="or").collect()
    if len(page1) < 10:  # corpus too small for a second page
        return spark.createDataFrame([], "doc_id long, score double")
    last = page1[-1]
    res = idx.search(
        _AFTER_TERMS, k=10, mode="or", after=(last["score"], last["doc_id"])
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


_NEAR_T1, _NEAR_T2, _NEAR_SLOP = "spark", "join", 3


def _bm25_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-term proximity (ES span_near / match_phrase slop), index-assisted
    via positional postings: |pos(spark) - pos(join)| <= 3, unordered;
    scores are the two-term AND scores restricted to matching docs."""
    idx = _docs_index_pos(spark, sf_dir)
    res = idx.search_near(_NEAR_T1, _NEAR_T2, slop=_NEAR_SLOP, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_near_sql(t1: str, t2: str, slop: int) -> str:
    distinct = sorted({t1, t2})
    tlist = ", ".join(f"'{t}'" for t in distinct)
    return f"""
WITH ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
toks AS (SELECT doc_id, term FROM ptoks),
near AS (
  SELECT DISTINCT p1.doc_id
  FROM ptoks p1 JOIN ptoks p2 ON p1.doc_id = p2.doc_id
  WHERE p1.term = '{t1}' AND p2.term = '{t2}'
    AND abs(p1.pos - p2.pos) <= {slop}
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
  HAVING count(*) = {len(distinct)}
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM near)
"""


_MLT_DOC, _MLT_TERMS, _MLT_K = 7, 5, 10


def _more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this: the source doc's top terms by (tf DESC, df ASC,
    term ASC) run as a scored OR, source doc excluded."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.more_like_this(
        _MLT_DOC, docs, max_terms=_MLT_TERMS, k=_MLT_K
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _more_like_this_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
src AS (
  SELECT term, count(*)::BIGINT AS tf FROM toks
  WHERE doc_id = {_MLT_DOC} GROUP BY term
),
gdf AS (
  SELECT t.term, count(DISTINCT t.doc_id)::BIGINT AS df
  FROM toks t JOIN src USING (term) GROUP BY t.term
),
sel AS (
  SELECT s.term FROM src s JOIN gdf g USING (term)
  ORDER BY s.tf DESC, g.df ASC, s.term ASC LIMIT {_MLT_TERMS}
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id <> {_MLT_DOC}
ORDER BY s DESC, doc_id ASC LIMIT {_MLT_K}
"""


_MLT_UNLIKE_DOC = 12


def _mlt_unlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this with `unlike`: the negative example's terms are
    subtracted from the candidate set BEFORE the top-max_terms cut
    ("similar to A but not like B") — one extra single-row planning
    fetch, unchanged query plan."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.more_like_this(
        _MLT_DOC, docs, max_terms=_MLT_TERMS, k=_MLT_K,
        unlike=_MLT_UNLIKE_DOC,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _mlt_unlike_sql() -> str:
    base = _more_like_this_sql()
    return base.replace(
        "sel AS (\n  SELECT s.term FROM src s JOIN gdf g USING (term)\n",
        "sel AS (\n  SELECT s.term FROM src s JOIN gdf g USING (term)\n"
        "  WHERE s.term NOT IN (SELECT term FROM toks "
        f"WHERE doc_id = {_MLT_UNLIKE_DOC})\n",
    )


def _facet_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms aggregation over a query's match set (operators/facets.py):
    doc counts per `source` bucket, (count DESC, bucket ASC) order."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_counts(matches, docs, "source")


_FACET_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.source AS bucket, count(*)::BIGINT AS doc_count
FROM documents d JOIN m USING (doc_id)
GROUP BY 1 ORDER BY doc_count DESC, bucket ASC
"""


def _facet_terms_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg response envelope: top-2 lang buckets +
    sum_other_doc_count as the trailing `_other_` row — the mass the page
    missed, emitted even when zero (facets.facet_counts_with_other; error
    bound is 0 by construction, the exactness upgrade over ES's per-shard
    approximation)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_counts_with_other(matches, docs, "lang", 2)


_FACET_TERMS_OTHER_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
b AS (
  SELECT d.lang AS bucket, count(*)::BIGINT AS doc_count
  FROM documents d JOIN m USING (doc_id) GROUP BY 1
),
r AS (
  SELECT *, row_number() OVER (ORDER BY doc_count DESC, bucket ASC) AS rk
  FROM b
)
SELECT bucket, doc_count FROM r WHERE rk <= 2
UNION ALL
SELECT '_other_',
       CAST(coalesce((SELECT sum(doc_count) FROM r WHERE rk > 2), 0) AS BIGINT)
"""


def _facet_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation: fixed-width n_chars buckets (width 200)
    over the match set; bucket key = floor(v / w) * w (the ES formula)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_histogram(matches, docs, "n_chars", 200.0)


_FACET_HIST_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT (floor(d.n_chars / 200.0) * 200.0)::DOUBLE AS bucket,
       count(*)::BIGINT AS doc_count
FROM documents d JOIN m USING (doc_id)
GROUP BY 1 ORDER BY bucket ASC
"""


def _facet_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_hits aggregation: the 2 best-scored docs per `source` bucket
    for a conjunctive query — the grouped-top-k window plan."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    scored = idx.search(["spark", "join"], k=None, mode="and")
    out = OFA.facet_top_hits(scored, docs, "source", per_bucket=2)
    return out.select(
        "bucket", "doc_id", F.round("score", 4).alias("score"), "rank"
    )


def _facet_top_hits_sql() -> str:
    base = _bm25_sql(["spark", "join"], "and", None)
    # re-derive the EXACT score for the window order (rounding only at
    # output, same protocol as the engine side)
    exact = base.replace("SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s")
    return f"""
WITH scored_x AS ({exact}),
ranked AS (
  SELECT d.source AS bucket, s.doc_id, s.s,
         row_number() OVER (
           PARTITION BY d.source ORDER BY s.s DESC, s.doc_id ASC
         ) AS rank
  FROM scored_x s JOIN documents d USING (doc_id)
)
SELECT bucket, doc_id, round(s, 4) AS score, rank::BIGINT AS rank
FROM ranked WHERE rank <= 2 ORDER BY bucket ASC, rank ASC
"""


def _f4(col: str):
    """floor(x*1e4+0.5)/1e4 — the cross-engine rounding protocol (engines'
    round() differ at representation boundaries, CLAUDE.md)."""
    return F.floor(F.col(col) * 10000.0 + 0.5) / 10000.0


_MSM_TERMS, _MSM_M = ["spark", "join", "merge"], 2


def _bm25_msm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene BooleanQuery minimum_should_match: OR scoring restricted to
    docs matching >= 2 of the 3 query terms (wand.topk_min_should_match —
    one counting pass over docID streams, exact-score only the survivors)."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search(_MSM_TERMS, k=None, mode="or", min_should_match=_MSM_M)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_msm_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match UNDER a structured filter (the ES bool
    should+msm+filter composition): membership (>= 2 distinct terms) is
    filter-independent, so the filtered kernels count matched terms before
    the allowed-set cut — rank-identical across all three strategies
    (engine.search_filtered min_should_match; forced cogroup here, the
    scale path)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.search_filtered(
        _MSM_TERMS, docs.where(F.col("doc_id") % 3 == 0), k=None,
        mode="or", min_should_match=_MSM_M, strategy="cogroup",
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


_BOOST_TERMS, _BOOSTS = ["spark", "join"], {"spark": 2.5}


def _bm25_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene `term^boost`: the boost multiplies the term's idf (exactly
    where Lucene folds boosts into the scorer), so every kernel picks it
    up through the idfs dict unchanged."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search(_BOOST_TERMS, k=None, mode="or", boosts=_BOOSTS)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_REGEXP_PAT = ".*(ow|up)"


def _bm25_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES regexp query (Lucene RegexpQuery, whole-term anchored): the
    pattern — deliberately prefix-less, exercising the pure rlike
    dictionary scan — expands against the distributed term dictionary and
    scores as an OR."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_regexp(_REGEXP_PAT, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_RESCORE_Q, _RESCORE_RQ = ["spark", "join"], ["table"]
_RESCORE_W, _RESCORE_K, _RESCORE_QW, _RESCORE_RW = 20, 10, 1.0, 0.5


def _bm25_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rescore: the global top-20 AND hits re-ranked by a secondary OR
    query scored ONLY over the window (`allowed` restriction — never a
    second corpus-wide scan); combine = 1.0*primary + 0.5*secondary,
    missing secondary keeps the weighted primary (ES `total` mode)."""
    idx = _docs_index(spark, sf_dir)
    res = idx.rescore(
        _RESCORE_Q, _RESCORE_RQ, window_size=_RESCORE_W, k=_RESCORE_K,
        mode="and", query_weight=_RESCORE_QW,
        rescore_query_weight=_RESCORE_RW, score_mode="total",
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_rescore_sql() -> str:
    exact_p = _bm25_sql(_RESCORE_Q, "and", _RESCORE_W).replace(
        "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
    )
    exact_s = _bm25_sql(_RESCORE_RQ, "or", None).replace(
        "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
    )
    return f"""
WITH prim AS ({exact_p}),
sec AS ({exact_s}),
comb AS (
  SELECT p.doc_id,
         p.s * {_RESCORE_QW} + coalesce(c.s, 0) * {_RESCORE_RW} AS c
  FROM prim p LEFT JOIN sec c USING (doc_id)
)
SELECT doc_id, round(c, 4) AS score FROM comb
ORDER BY c DESC, doc_id ASC LIMIT {_RESCORE_K}
"""


def _bm25_must_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bool must_not: docs containing 'join' are excluded before
    ranking, index-assisted (the not-term's postings ride the same pushed
    `term IN` scan and feed the kernels' excluded set — never a corpus
    scan); scores and collection stats are untouched."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search(["spark"], k=None, mode="and", must_not=["join"])
    return res.select("doc_id", F.round("score", 4).alias("score"))


_DISMAX_SUBS, _DISMAX_TIE = [["spark", "join"], ["table", "merge"]], 0.3


def _bm25_dismax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES dis_max: per doc, best subquery score + 0.3 * (sum of the other
    matching subqueries) — Lucene DisjunctionMaxQuery. One hash agg on
    doc_id over the subquery union; no driver materialization."""
    idx = _docs_index(spark, sf_dir)
    res = idx.dis_max(_DISMAX_SUBS, tie_breaker=_DISMAX_TIE, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_dismax_sql() -> str:
    subs = []
    for terms in _DISMAX_SUBS:
        subs.append(
            _bm25_sql(terms, "or", None).replace(
                "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
            )
        )
    return f"""
WITH s1 AS ({subs[0]}),
s2 AS ({subs[1]}),
u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
c AS (
  SELECT doc_id, max(s) + {_DISMAX_TIE} * (sum(s) - max(s)) AS c
  FROM u GROUP BY doc_id
)
SELECT doc_id, round(c, 4) AS score FROM c
"""


def _constant_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES constant_score (filter context): every doc matching
    `spark OR table` gets exactly boost=1.5."""
    idx = _docs_index(spark, sf_dir)
    return idx.constant_score(["spark", "table"], boost=1.5, k=None)


_CONSTANT_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT DISTINCT doc_id, 1.5::DOUBLE AS score FROM toks
WHERE term IN ('spark', 'table')
ORDER BY doc_id ASC
"""


def _function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score + field_value_factor: BM25('spark') *
    log1p(n_chars * 0.1) — the factor is a pure JVM column expression
    joined on doc_id (enrich-join shape)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.function_score(
        ["spark"], docs, "n_chars", factor=0.1, modifier="log1p",
        boost_mode="multiply", k=None, mode="and",
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _function_score_sql() -> str:
    exact = _bm25_sql(["spark"], "and", None).replace(
        "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
    )
    return f"""
WITH base AS ({exact})
SELECT b.doc_id, round(b.s * ln(1 + d.n_chars * 0.1), 4) AS score
FROM base b JOIN documents d USING (doc_id)
"""


_SUGGEST_TEXT = "grow"  # not a dictionary term: exercises correction


def _term_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term suggester: nearest dictionary terms to the typo 'grow',
    (distance ASC, df DESC, term ASC), top-5 — one pushed-down stats-table
    scan + TakeOrderedAndProject."""
    idx = _docs_index(spark, sf_dir)
    return idx.suggest(_SUGGEST_TEXT, max_edits=2, size=5)


_TERM_SUGGEST_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
d AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term)
SELECT term AS suggestion, df,
       levenshtein(term, '{_SUGGEST_TEXT}')::INTEGER AS distance
FROM d
WHERE levenshtein(term, '{_SUGGEST_TEXT}') <= 2
ORDER BY distance ASC, df DESC, suggestion ASC LIMIT 5
"""


def _facet_terms_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg with nested metric sub-aggs: per-source doc count +
    sum/avg of n_chars over the 'spark' match set, one grouped pass."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_terms_metrics(matches, docs, "source", "n_chars")
    return out.select(
        "bucket", "doc_count", _f4("sum").alias("sum"), _f4("avg").alias("avg")
    )


_FACET_TERMS_METRICS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.source AS bucket, count(*)::BIGINT AS doc_count,
       floor(sum(d.n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS "sum",
       floor(avg(d.n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS "avg"
FROM documents d JOIN m USING (doc_id)
GROUP BY 1 ORDER BY doc_count DESC, bucket ASC
"""


def _match_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sort-by-field on a search: docs matching 'spark' ordered by
    n_chars DESC (doc_id ASC ties), top-15 — field sort replaces _score."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    return idx.search_sorted(["spark"], docs, "n_chars", ascending=False, k=15)


_MATCH_SORTED_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.doc_id, d.n_chars
FROM documents d JOIN m USING (doc_id)
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 15
"""


def _match_sorted_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search_after under a FIELD sort: page 2 of the n_chars-DESC
    'spark' match — the cursor is page 1's last (n_chars, doc_id),
    filtered BEFORE the top-k cut (== OFFSET under the deterministic
    order, the oracle contract)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    last = idx.search_sorted(
        ["spark"], docs, "n_chars", ascending=False, k=15
    ).collect()[-1]
    return idx.search_sorted(
        ["spark"], docs, "n_chars", ascending=False, k=15,
        after=(last["n_chars"], last["doc_id"]),
    )


_MATCH_SORTED_PAGE2_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.doc_id, d.n_chars
FROM documents d JOIN m USING (doc_id)
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 15 OFFSET 15
"""


_COMPOSITE_AFTER, _COMPOSITE_SIZE = ("en", "src3"), 10


def _facet_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite agg page after after_key ('en','src3'): (lang, source)
    buckets in key order, keyset-filtered BEFORE the grouped shuffle."""
    from elasticsearch_assets_spark.operators import facets as OFA

    docs = load_sf_table(spark, sf_dir, "documents")
    return OFA.facet_composite(
        docs, ["lang", "source"], size=_COMPOSITE_SIZE, after=_COMPOSITE_AFTER
    )


_FACET_COMPOSITE_SQL = f"""
SELECT lang, source, count(*)::BIGINT AS doc_count
FROM documents
WHERE lang > '{_COMPOSITE_AFTER[0]}'
   OR (lang = '{_COMPOSITE_AFTER[0]}' AND source > '{_COMPOSITE_AFTER[1]}')
GROUP BY lang, source
ORDER BY lang ASC, source ASC LIMIT {_COMPOSITE_SIZE}
"""


def _facet_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters agg over the 'spark' match set: three named predicate
    buckets counted in ONE pass (overlapping membership allowed)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_filters(
        docs,
        {
            "english": F.col("lang") == "en",
            "long": F.col("n_chars") >= 200,
            "short": F.col("n_chars") < 200,
        },
        matches=matches,
    )


_FACET_FILTERS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.* FROM documents d JOIN m USING (doc_id))
SELECT * FROM (
  SELECT 'english' AS bucket, count(*) FILTER (lang = 'en')::BIGINT AS doc_count FROM mt
  UNION ALL
  SELECT 'long', count(*) FILTER (n_chars >= 200)::BIGINT FROM mt
  UNION ALL
  SELECT 'short', count(*) FILTER (n_chars < 200)::BIGINT FROM mt
) ORDER BY bucket ASC
"""


def _facet_terms_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested terms-in-terms agg over the 'spark' match set: (lang →
    source) buckets with parent totals, one grouped pass + bucket-level
    window."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_terms_nested(matches, docs, "lang", "source")


_FACET_TERMS_NESTED_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.* FROM documents d JOIN m USING (doc_id)),
leaves AS (
  SELECT lang AS bucket, source AS sub_bucket, count(*)::BIGINT AS doc_count
  FROM mt GROUP BY 1, 2
)
SELECT bucket, sum(doc_count) OVER (PARTITION BY bucket)::BIGINT AS outer_count,
       sub_bucket, doc_count
FROM leaves
ORDER BY outer_count DESC, bucket ASC, doc_count DESC, sub_bucket ASC
"""


def _facet_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggs (cumulative_sum + derivative + moving_fn avg,
    window 3) over the daily click histogram — window pass runs over
    bucket cardinality only."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_pipeline(
        matches, ev, "ts", "day", moving_window=3, id_col="event_id"
    )
    return out.select(
        "bucket", "doc_count", "cum_count", "derivative",
        _f4("moving_avg").alias("moving_avg"),
    )


_FACET_PIPELINE_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS bucket, count(*)::BIGINT AS doc_count
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT bucket, doc_count,
       sum(doc_count) OVER (ORDER BY bucket)::BIGINT AS cum_count,
       (doc_count - lag(doc_count) OVER (ORDER BY bucket))::BIGINT AS derivative,
       floor(avg(doc_count) OVER (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             * 10000.0 + 0.5) / 10000.0 AS moving_avg
FROM h ORDER BY bucket ASC
"""


_COMPLETION_PREFIX = "sp"


def _suggest_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester: dictionary terms starting with 'sp' by
    (df DESC, term ASC), top-5 — sargable prefix on the stats scan."""
    idx = _docs_index(spark, sf_dir)
    return idx.suggest_completion(_COMPLETION_PREFIX, size=5)


_SUGGEST_COMPLETION_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
d AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term)
SELECT term AS suggestion, df FROM d
WHERE term LIKE '{_COMPLETION_PREFIX}%'
ORDER BY df DESC, suggestion ASC LIMIT 5
"""


_MM_TERMS = ["spark", "join"]
_MM_TIE, _MM_TITLE_BOOST, _MM_K = 0.3, 2.0, 15


def _multi_match(spark, sf_dir, match_type):
    from elasticsearch_assets_spark.query.engine import multi_match as MM

    fields = {
        "title": (_docs_index_title(spark, sf_dir), _MM_TITLE_BOOST),
        "text": (_docs_index(spark, sf_dir), 1.0),
    }
    out = MM(fields, _MM_TERMS, match_type=match_type,
             tie_breaker=_MM_TIE, k=_MM_K, mode="or")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _multi_match_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match best_fields (dis_max across title^2.0 and text, tie
    0.3): per-field BM25 with per-field collection stats, one hash-agg
    combine."""
    return _multi_match(spark, sf_dir, "best_fields")


def _multi_match_most(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match most_fields: per-field scores summed."""
    return _multi_match(spark, sf_dir, "most_fields")


def _mm_field_chain(pfx: str, toks_select: str, terms: list[str] | None = None) -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms or _MM_TERMS)))
    return f"""
{pfx}toks AS ({toks_select}),
{pfx}dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM {pfx}toks GROUP BY doc_id),
{pfx}stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM {pfx}dl),
{pfx}tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM {pfx}toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
{pfx}df AS (SELECT term, count(*)::DOUBLE AS df FROM {pfx}tf GROUP BY term),
{pfx}scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS s
  FROM {pfx}stats s, {pfx}tf tf
  JOIN {pfx}df df USING (term) JOIN {pfx}dl dl USING (doc_id)
  GROUP BY tf.doc_id
)"""


def _multi_match_sql(match_type: str) -> str:
    combine = (
        f"max(s) + {_MM_TIE} * (sum(s) - max(s))"
        if match_type == "best_fields" else "sum(s)"
    )
    title = _mm_field_chain(
        "t",
        "SELECT doc_id, unnest(string_split(text, ' ')"
        f"[1:{_TITLE_TOKENS}]) AS term FROM documents",
    )
    body = _mm_field_chain(
        "b", "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents"
    )
    return f"""
WITH {title},
{body},
u AS (
  SELECT doc_id, s * {_MM_TITLE_BOOST} AS s FROM tscored
  UNION ALL
  SELECT doc_id, s FROM bscored
)
SELECT doc_id, round({combine}, 4) AS score
FROM u GROUP BY doc_id
ORDER BY {combine} DESC, doc_id ASC LIMIT {_MM_K}
"""


def _multi_match_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match type=cross_fields: TERM-centric blending (Lucene
    BlendedTermQuery) — per term the field dfs blend to max_f df_f, each
    field scores with its own norms but the blended idf, per-term field
    scores combine dis_max (tie 0.3), doc score sums terms
    (engine.cross_fields: per-field pushed posting decode carrying doc
    lengths, two narrow hash aggs)."""
    from elasticsearch_assets_spark.query.engine import cross_fields

    fields = {
        "title": (_docs_index_title(spark, sf_dir), _MM_TITLE_BOOST),
        "text": (_docs_index(spark, sf_dir), 1.0),
    }
    out = cross_fields(fields, _MM_TERMS, tie_breaker=_MM_TIE, k=_MM_K, mode="or")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _mm_cross_base(pfx: str, toks_select: str) -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(set(_MM_TERMS)))
    return f"""
{pfx}toks AS ({toks_select}),
{pfx}dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM {pfx}toks GROUP BY doc_id),
{pfx}stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM {pfx}dl),
{pfx}tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM {pfx}toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
{pfx}df AS (SELECT term, count(*)::DOUBLE AS df FROM {pfx}tf GROUP BY term)"""


def _mm_cross_ts(pfx: str, boost: float) -> str:
    return f"""
{pfx}ts AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n - bl.df + 0.5) / (bl.df + 0.5))
           * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))
           * {boost} AS s
  FROM {pfx}stats s, {pfx}tf tf
  JOIN blend bl USING (term) JOIN {pfx}dl dl USING (doc_id)
)"""


def _multi_match_cross_sql() -> str:
    title_toks = (
        "SELECT doc_id, unnest(string_split(text, ' ')"
        f"[1:{_TITLE_TOKENS}]) AS term FROM documents"
    )
    body_toks = (
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents"
    )
    return f"""
WITH {_mm_cross_base('t', title_toks)},
{_mm_cross_base('b', body_toks)},
blend AS (
  SELECT term, max(df) AS df
  FROM (SELECT * FROM tdf UNION ALL SELECT * FROM bdf) GROUP BY term
),
{_mm_cross_ts('t', _MM_TITLE_BOOST)},
{_mm_cross_ts('b', 1.0)},
u AS (SELECT * FROM tts UNION ALL SELECT * FROM bts),
pt AS (
  SELECT doc_id, term, max(s) + {_MM_TIE} * (sum(s) - max(s)) AS ts
  FROM u GROUP BY doc_id, term
),
sc AS (SELECT doc_id, sum(ts) AS sc FROM pt GROUP BY doc_id)
SELECT doc_id, round(sc, 4) AS score
FROM sc ORDER BY sc DESC, doc_id ASC LIMIT {_MM_K}
"""


def _multi_match_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match type=phrase: match_phrase per field over the
    positional indexes (title^2.0 + text), a doc matches when the phrase
    occurs in ANY field, per-field scores combined dis_max-style with
    tie 0.3 — the same one-hash-agg combine as best_fields."""
    from elasticsearch_assets_spark.query.engine import multi_match as MM

    tidx = _docs_index_title(spark, sf_dir)
    pidx = _docs_index_pos(spark, sf_dir)
    out = MM(
        {"title": (tidx, _MM_TITLE_BOOST), "text": (pidx, 1.0)},
        _PHRASE_TERMS, match_type="phrase", tie_breaker=_MM_TIE, k=_MM_K,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _multi_match_phrase_sql() -> str:
    w1, w2 = _PHRASE_TERMS
    combine = f"max(s) + {_MM_TIE} * (sum(s) - max(s))"
    title = _mm_field_chain(
        "t",
        "SELECT doc_id, unnest(string_split(text, ' ')"
        f"[1:{_TITLE_TOKENS}]) AS term FROM documents",
        terms=_PHRASE_TERMS,
    )
    body = _mm_field_chain(
        "b",
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term"
        " FROM documents",
        terms=_PHRASE_TERMS,
    )
    return f"""
WITH {title},
{body},
tpos AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:{_TITLE_TOKENS}]) AS term,
         generate_subscripts(string_split(text, ' ')[1:{_TITLE_TOKENS}], 1)
           AS pos
  FROM documents
),
tpm AS (
  SELECT DISTINCT a.doc_id FROM tpos a JOIN tpos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
   AND a.term = '{w1}' AND b.term = '{w2}'
),
bpos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
bpm AS (
  SELECT DISTINCT a.doc_id FROM bpos a JOIN bpos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
   AND a.term = '{w1}' AND b.term = '{w2}'
),
u AS (
  SELECT doc_id, s * {_MM_TITLE_BOOST} AS s FROM tscored
  WHERE doc_id IN (SELECT doc_id FROM tpm)
  UNION ALL
  SELECT doc_id, s FROM bscored
  WHERE doc_id IN (SELECT doc_id FROM bpm)
)
SELECT doc_id, round({combine}, 4) AS score
FROM u GROUP BY doc_id
ORDER BY {combine} DESC, doc_id ASC LIMIT {_MM_K}
"""


_SCRIPT = "_score * (1 + ln(1 + n_chars))"


def _script_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script_score: arbitrary expression over _score and doc fields —
    compiled to a JVM column expression, joined on doc_id."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.script_score(["spark"], docs, _SCRIPT, k=15, mode="and")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _script_score_sql() -> str:
    chain = _mm_field_chain(
        "b",
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents",
        terms=["spark"],
    )
    return f"""
WITH {chain}
SELECT s.doc_id, round(s.s * (1 + ln(1 + d.n_chars)), 4) AS score
FROM bscored s JOIN documents d USING (doc_id)
ORDER BY s.s * (1 + ln(1 + d.n_chars)) DESC, s.doc_id ASC LIMIT 15
"""


_RS_SEED = 7


def _random_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES random_score with a seed: deterministic md5-based uniform score
    per (seed, doc_id) — reproducible match-set sampling, engine-portable."""
    idx = _docs_index(spark, sf_dir)
    out = idx.random_score(["spark"], seed=_RS_SEED, k=20, mode="and")
    return out.select("doc_id", F.round("score", 4).alias("score"))


_RANDOM_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
r AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5('{_RS_SEED}:' || doc_id::VARCHAR), 1, 8)) AS BIGINT)
           / 4294967296.0 AS s
  FROM m
)
SELECT doc_id, round(s, 4) AS score FROM r
ORDER BY s DESC, doc_id ASC LIMIT 20
"""


_PASSAGE_N = 4


def _dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/Gopher passage-level dedup: disjoint 4-token passages, first
    corpus-wide occurrence kept, documents rebuilt from survivors."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.dedup_passages(docs, n=_PASSAGE_N).orderBy("doc_id")


_DEDUP_PASSAGES_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql("text")} AS t FROM documents
),
chunks AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[i:i+{_PASSAGE_N - 1}], ' ') AS chunk
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1, {_PASSAGE_N})) AS i)
  WHERE array_to_string(t[i:i+{_PASSAGE_N - 1}], ' ') <> ''
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM chunks
)
SELECT doc_id,
       count(*)::BIGINT AS total_chunks,
       (count(*) FILTER (rn = 1))::BIGINT AS kept_chunks,
       string_agg(chunk, ' ' ORDER BY pos) FILTER (rn = 1) AS cleaned_text
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


_DECON_N, _DECON_MOD = 8, 101


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3-style n-gram overlap): docs sharing
    any 8-gram with the synthetic eval set (doc_id % 101 == 0), with
    distinct-overlap counts; benchmark side broadcast."""
    docs = load_sf_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % _DECON_MOD == 0)
    return OD.decontaminate(docs, bench, n=_DECON_N).orderBy("doc_id")


_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql("text")} AS t FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct({shingles_sql('t', _DECON_N)})) AS sh FROM toks
),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {_DECON_MOD} = 0)
SELECT s.doc_id, count(*)::BIGINT AS overlap
FROM sh s JOIN bench USING (sh)
GROUP BY s.doc_id ORDER BY s.doc_id
"""


_RRF_K, _RRF_N, _RRF_CONST = 10, 20, 60


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8 hybrid search (`rrf` retriever): BM25 top-20 for 'spark' fused
    with cosine-kNN top-20 (query = vec 0) by reciprocal rank fusion,
    rank_constant 60 — each retriever's window is bounded by its own k."""
    idx = _docs_index(spark, sf_dir)
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    bm = idx.search(["spark"], k=_RRF_N, mode="and")
    knn = OS.cosine_topk(emb, qv, k=_RRF_N).select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    out = OS.rrf_fuse([bm, knn], k_const=_RRF_CONST, k=_RRF_K)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _hybrid_rrf_sql() -> str:
    chain = _mm_field_chain(
        "b",
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents",
        terms=["spark"],
    )
    return f"""
WITH {chain},
bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
  FROM bscored QUALIFY r <= {_RRF_N}
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
knn AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS r
  FROM (SELECT a.vec_id, {_COS_AB} AS cos FROM embeddings a, q b)
  QUALIFY r <= {_RRF_N}
),
u AS (
  SELECT doc_id, 1.0 / ({_RRF_CONST} + r) AS contrib FROM bm
  UNION ALL
  SELECT doc_id, 1.0 / ({_RRF_CONST} + r) AS contrib FROM knn
)
SELECT doc_id, round(sum(contrib), 4) AS score
FROM u GROUP BY doc_id
ORDER BY sum(contrib) DESC, doc_id ASC LIMIT {_RRF_K}
"""


def _retriever_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.18 retriever TREE: rescorer( rrf(standard-bm25, knn) ) — the
    inner rrf fuses BM25 top-20 for 'spark' with cosine-kNN top-20, the
    wrapping rescorer re-ranks that 10-doc window by score + 0.01 *
    ln(1 + n_chars) (operators/similarity.rescore_with). The window side
    broadcasts; the corpus-sized feature table is window-restricted
    before the join."""
    idx = _docs_index(spark, sf_dir)
    emb = load_sf_table(spark, sf_dir, "embeddings")
    docs = load_sf_table(spark, sf_dir, "documents")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    bm = idx.search(["spark"], k=_RRF_N, mode="and")
    knn = OS.cosine_topk(emb, qv, k=_RRF_N).select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    fused = OS.rrf_fuse([bm, knn], k_const=_RRF_CONST, k=_RRF_K)
    out = OS.rescore_with(
        fused, docs, "log(1 + n_chars)", k=5, feature_weight=0.01
    )
    return out.select("doc_id", _f4("score").alias("score"))


def _retriever_tree_sql() -> str:
    chain = _mm_field_chain(
        "b",
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents",
        terms=["spark"],
    )
    return f"""
WITH {chain},
bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
  FROM bscored QUALIFY r <= {_RRF_N}
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
knn AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS r
  FROM (SELECT a.vec_id, {_COS_AB} AS cos FROM embeddings a, q b)
  QUALIFY r <= {_RRF_N}
),
u AS (
  SELECT doc_id, 1.0 / ({_RRF_CONST} + r) AS contrib FROM bm
  UNION ALL
  SELECT doc_id, 1.0 / ({_RRF_CONST} + r) AS contrib FROM knn
),
fused AS (
  SELECT doc_id, sum(contrib) AS score
  FROM u GROUP BY doc_id
  ORDER BY sum(contrib) DESC, doc_id ASC LIMIT {_RRF_K}
)
SELECT doc_id,
       floor((f.score + 0.01 * ln(1 + d.n_chars)) * 1e4 + 0.5) / 1e4 AS score
FROM fused f JOIN documents d USING (doc_id)
ORDER BY (f.score + 0.01 * ln(1 + d.n_chars)) DESC, doc_id ASC LIMIT 5
"""


_SCROLL_SIZE = 100


def _scroll_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES scroll API: third 100-row batch of the lang='en' export in
    (n_chars, doc_id) order — each batch is a pushed keyset filter +
    TakeOrderedAndProject (sources/scroll.py), page N costing the same
    scan as page 1 (never OFFSET's skip-and-discard)."""
    from elasticsearch_assets_spark.sources.scroll import (
        scroll_page, scroll_pages,
    )

    docs = load_sf_table(spark, sf_dir, "documents").where(
        F.col("lang") == "en"
    ).select("doc_id", "n_chars")
    pages = scroll_pages(docs, ["n_chars", "doc_id"], _SCROLL_SIZE)
    next(pages)
    p2 = next(pages)
    cursor = (p2[-1]["n_chars"], p2[-1]["doc_id"])
    return scroll_page(
        docs, ["n_chars", "doc_id"], _SCROLL_SIZE, after=cursor
    )


_SCROLL_PAGE3_SQL = f"""
SELECT doc_id, n_chars FROM documents WHERE lang = 'en'
ORDER BY n_chars, doc_id LIMIT {_SCROLL_SIZE} OFFSET {2 * _SCROLL_SIZE}
"""


_LIN_N, _LIN_K, _LIN_W = 20, 10, 2.0


def _hybrid_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.16 `linear` retriever: BM25 top-20 for 'spark' and cosine-kNN
    top-20 minmax-normalized, summed with weights (1.0, 2.0)."""
    idx = _docs_index(spark, sf_dir)
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    bm = idx.search(["spark"], k=_LIN_N, mode="and")
    knn = OS.cosine_topk(emb, qv, k=_LIN_N).select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    out = OS.linear_fuse(
        [bm, knn], weights=[1.0, _LIN_W], normalizer="minmax", k=_LIN_K
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _hybrid_linear_sql() -> str:
    chain = _mm_field_chain(
        "b",
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents",
        terms=["spark"],
    )
    return f"""
WITH {chain},
bm0 AS (
  SELECT doc_id, s FROM bscored ORDER BY s DESC, doc_id ASC LIMIT {_LIN_N}
),
bmn AS (
  SELECT doc_id,
         CASE WHEN max(s) OVER () = min(s) OVER () THEN 1.0
              ELSE (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
         END AS contrib
  FROM bm0
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
knn0 AS (
  SELECT vec_id AS doc_id, cos FROM (
    SELECT a.vec_id, {_COS_AB} AS cos FROM embeddings a, q b
  ) ORDER BY cos DESC, doc_id ASC LIMIT {_LIN_N}
),
knnn AS (
  SELECT doc_id,
         {_LIN_W} * CASE WHEN max(cos) OVER () = min(cos) OVER () THEN 1.0
              ELSE (cos - min(cos) OVER ())
                   / (max(cos) OVER () - min(cos) OVER ())
         END AS contrib
  FROM knn0
),
u AS (SELECT * FROM bmn UNION ALL SELECT * FROM knnn)
SELECT doc_id, round(sum(contrib), 4) AS score
FROM u GROUP BY doc_id
ORDER BY sum(contrib) DESC, doc_id ASC LIMIT {_LIN_K}
"""


_ANN_FILTER_LABEL = 3


def _ann_topk_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filtered kNN (`knn` with `filter`), pre-filter composition: exact
    cosine top-k restricted to label == 3 — the predicate composes BEFORE
    the scorer, pushed to the vector scan (pre-filtering, ES's semantics:
    the k results all satisfy the filter). The during-search variant is
    `ann_topk_filtered` (similarity.knn_filtered)."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.cosine_topk(emb.where(F.col("label") == _ANN_FILTER_LABEL), qv, k=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


_PS_TEXT, _PS_EDITS, _PS_PER, _PS_SIZE = "spork jion", 2, 3, 5


def _phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester: per-token top-3 corrections (edit<=2, original
    kept), cross product scored by unigram LM minus an edit penalty."""
    idx = _docs_index(spark, sf_dir)
    out = idx.suggest_phrase(
        _PS_TEXT, max_edits=_PS_EDITS, per_token=_PS_PER, size=_PS_SIZE
    )
    return out.select("suggestion", F.round("score", 4).alias("score"))


def _phrase_suggest_sql() -> str:
    def cand(i: int, tok: str) -> str:
        return f"""
c{i} AS (
  SELECT term, max(df) AS df, min(d) AS d FROM (
    SELECT term, df, levenshtein(term, '{tok}') AS d FROM dict
    WHERE levenshtein(term, '{tok}') <= {_PS_EDITS}
    UNION ALL SELECT '{tok}' AS term, 0::BIGINT AS df, 0 AS d
  ) GROUP BY term
  ORDER BY d ASC, df DESC, term ASC LIMIT {_PS_PER}
)"""

    toks = _PS_TEXT.split()
    cands = ",".join(cand(i, t) for i, t in enumerate(toks))
    contrib = " + ".join(
        f"(ln((c{i}.df + 1) / n.n) - c{i}.d * ln(10))" for i in range(len(toks))
    )
    phrase = " || ' ' || ".join(f"c{i}.term" for i in range(len(toks)))
    froms = ", ".join(f"c{i}" for i in range(len(toks)))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
{cands},
x AS (SELECT {phrase} AS suggestion, {contrib} AS s FROM {froms}, n)
SELECT suggestion, round(s, 4) AS score FROM x
ORDER BY s DESC, suggestion ASC LIMIT {_PS_SIZE}
"""


def _phrase_suggest_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester with collate (prune=true): every candidate
    phrase carries collate_match = do all its terms co-occur in at least
    one live document — ONE posting decode over the union of candidate
    terms + a grouped co-occurrence check instead of ES's
    query-per-candidate loop."""
    idx = _docs_index(spark, sf_dir)
    out = idx.suggest_phrase(
        _PS_TEXT, max_edits=_PS_EDITS, per_token=_PS_PER, size=_PS_SIZE,
        collate=True, collate_prune=True,
    )
    return out.select(
        "suggestion", F.round("score", 4).alias("score"), "collate_match"
    )


def _phrase_suggest_collate_sql() -> str:
    base = _phrase_suggest_sql()
    head, tail = base.split("SELECT suggestion, round(s, 4) AS score", 1)
    # re-derive the candidate pair columns + the co-occurrence EXISTS
    head = head.replace(
        "x AS (SELECT", "x AS (SELECT c0.term AS t0, c1.term AS t1,", 1
    )
    return f"""{head}SELECT suggestion, round(s, 4) AS score,
       CASE WHEN t0 = t1 THEN
            EXISTS (SELECT 1 FROM toks WHERE term = x.t0)
       ELSE EXISTS (SELECT 1 FROM toks a JOIN toks b USING (doc_id)
                    WHERE a.term = x.t0 AND b.term = x.t1)
       END AS collate_match
FROM x
{tail.split("FROM x", 1)[1]}"""


def _index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _stats/_cat surface: collection-level doc/term/token counts and
    avgdl from the distributed stats table (the BM25 scorer's constants)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.index_stats()
    return out.select("n_docs", "n_terms", "n_tokens", _f4("avgdl").alias("avgdl"))


_INDEX_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS n_tokens,
       floor(count(*)::DOUBLE / (SELECT count(*) FROM documents)
             * 10000.0 + 0.5) / 10000.0 AS avgdl
FROM toks
"""


def _ann_filtered_sql() -> str:
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM embeddings a, q b WHERE a.label = {_ANN_FILTER_LABEL}
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


_PP_FIXED, _PP_PREFIX = ["table"], "s"


def _bm25_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_phrase_prefix: 'table' immediately followed by any
    dictionary term starting with 's' — positional intersection with the
    last slot a UNION of the expansions' occurrence keys
    (query/phrase.py phrase_prefix_match); scores are the scoring_boolean
    BM25 sum over every matched term, restricted to phrase-matching docs."""
    idx = _docs_index_pos(spark, sf_dir)
    res = idx.search_phrase_prefix([*_PP_FIXED, _PP_PREFIX], k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_phrase_prefix_sql() -> str:
    return f"""
WITH ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
toks AS (SELECT doc_id, term FROM ptoks),
pmatch AS (
  SELECT DISTINCT t0.doc_id
  FROM ptoks t0 JOIN ptoks t1
    ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.term = '{_PP_FIXED[0]}' AND t1.term LIKE '{_PP_PREFIX}%'
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term = '{_PP_FIXED[0]}' OR term LIKE '{_PP_PREFIX}%'
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM pmatch)
"""


def _facet_date_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram (calendar interval 'day') over a match set — here
    the click events; buckets snap to calendar boundaries via date_trunc,
    the same truncation DuckDB applies."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_date_histogram(matches, ev, "ts", "day", id_col="event_id")


_FACET_DATE_HIST_SQL = """
SELECT date_trunc('day', ts) AS bucket, count(*)::BIGINT AS doc_count
FROM events WHERE event_type = 'click'
GROUP BY 1 ORDER BY bucket ASC
"""

_RANGE_EDGES = [150.0, 300.0, 450.0]


def _facet_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range aggregation over the 'spark' match set: half-open buckets
    from the edge list with open ends; empty buckets kept (the ES
    contract)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_range(matches, docs, "n_chars", _RANGE_EDGES)


_FACET_RANGE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id)),
ranges(bucket_lo, bucket_hi) AS (VALUES
  (NULL::DOUBLE, 150.0), (150.0, 300.0), (300.0, 450.0), (450.0, NULL::DOUBLE)
)
SELECT r.bucket_lo, r.bucket_hi,
       (SELECT count(*) FROM mt
        WHERE (r.bucket_lo IS NULL OR mt.v >= r.bucket_lo)
          AND (r.bucket_hi IS NULL OR mt.v < r.bucket_hi))::BIGINT AS doc_count
FROM ranges r ORDER BY bucket_lo ASC NULLS FIRST
"""


def _facet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stats aggregation (count/min/max/sum/avg) over the 'spark' match
    set — one partial-aggregated pass."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_stats(matches, docs, "n_chars")
    return out.select(
        "count", "min", "max",
        _f4("sum").alias("sum"), _f4("avg").alias("avg"),
    )


_FACET_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id))
SELECT count(v)::BIGINT AS "count", min(v) AS "min", max(v) AS "max",
       floor(sum(v) * 10000.0 + 0.5) / 10000.0 AS "sum",
       floor(avg(v) * 10000.0 + 0.5) / 10000.0 AS "avg"
FROM mt
"""

_PCTS = [25.0, 50.0, 75.0, 95.0]


def _facet_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles aggregation, exact linear-interpolation variant
    (Spark `percentile` == DuckDB `quantile_cont`); the 100 TB swap-in is
    percentile_approx with an identical plan shape (operators/facets.py)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_percentiles(matches, docs, "n_chars", _PCTS)
    return out.select("percent", _f4("value").alias("value"))


def _facet_percentiles_sql() -> str:
    parts = [
        f"SELECT {p}::DOUBLE AS percent, "
        f"floor(quantile_cont(v, {p / 100.0}) * 10000.0 + 0.5) / 10000.0 AS value "
        f"FROM mt"
        for p in _PCTS
    ]
    union = " UNION ALL ".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id))
{union}
ORDER BY percent ASC
"""


def _facet_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality aggregation, exact distinct-count variant (the 100 TB
    swap-in is approx_count_distinct / HLL++ with the same plan)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_cardinality(matches, docs, "source")


_FACET_CARD_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT count(DISTINCT d.source)::BIGINT AS value
FROM documents d JOIN m USING (doc_id)
"""

_COLLAPSE_K = 5


def _collapse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field collapsing: best-scored doc per `source` represents its
    group, then the global (score DESC, doc_id ASC) top-5 over the
    representatives (grouped-top-k window + TakeOrderedAndProject)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    scored = idx.search(["spark", "table"], k=None, mode="or")
    out = OFA.collapse_topk(scored, docs, "source", k=_COLLAPSE_K)
    return out.select(
        "doc_id", F.round("score", 4).alias("score"),
        F.col("ckey").alias("bucket"),
    )


def _collapse_topk_sql() -> str:
    exact = _bm25_sql(["spark", "table"], "or", None).replace(
        "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
    )
    return f"""
WITH scored_x AS ({exact}),
ranked AS (
  SELECT s.doc_id, s.s, d.source,
         row_number() OVER (
           PARTITION BY d.source ORDER BY s.s DESC, s.doc_id ASC
         ) AS rn
  FROM scored_x s JOIN documents d USING (doc_id)
)
SELECT doc_id, round(s, 4) AS score, source AS bucket
FROM ranked WHERE rn = 1
ORDER BY s DESC, doc_id ASC LIMIT {_COLLAPSE_K}
"""


def _querystring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-assisted Lucene query string (the reference's `q=` surface
    with ES semantics): `spark AND jo* AND n_chars:>=400` — a term clause,
    a dictionary-rewritten prefix clause (clause-level AND: any jo*-term
    counts), and a structured filter restricting ranking through the
    distributed search_filtered machinery. Collection stats stay global."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.search_querystring("spark AND jo* AND n_chars:>=400", docs, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_QS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term = 'spark' OR term LIKE 'jo%' GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
  HAVING max(CASE WHEN tf.term = 'spark' THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN tf.term LIKE 'jo%' THEN 1 ELSE 0 END) = 1
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM documents WHERE n_chars >= 400)
"""


def _querystring_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clause-level OR of two dictionary rewrites: `qu* OR spark~1`."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.search_querystring("qu* OR spark~1", docs, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_QS_OR_SQL = _bm25_sql(
    [], "or", None,
    term_cond="term LIKE 'qu%' OR levenshtein(term, 'spark') <= 1",
)


def _significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms aggregation: terms over-represented in the
    match set (docs containing 'spark') vs the background corpus, scored
    by the percentage heuristic (fg rate / bg rate), min_doc_count=3."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.significant_terms(matches, docs, n=10)
    return out.select(
        "term", "fg_df", "bg_df",
        (F.floor(F.col("score") * 10000.0 + 0.5) / 10000.0).alias("score"),
    )


_SIGTERMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM documents),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  GROUP BY term HAVING count(*) >= 3
),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY term)
SELECT term, fg_df, bg_df,
       floor((fg_df / fg_total.n) / (bg_df / bg_total.n) * 10000.0 + 0.5)
         / 10000.0 AS score
FROM fg JOIN bg USING (term), fg_total, bg_total
ORDER BY (fg_df / fg_total.n) / (bg_df / bg_total.n) DESC, term ASC
LIMIT 10
"""


def _sigterms_bgfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms with background_filter: the background
    statistics come from corpus ∩ filter (here English docs) instead of
    the whole corpus — compare against a peer group, the ES docs'
    motivating case. Same two-agg plan, one extra semi join on the
    background side."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.significant_terms(
        matches, docs, n=10, background=docs.where("lang = 'en'")
    )
    return out.select(
        "term", "fg_df", "bg_df",
        (F.floor(F.col("score") * 10000.0 + 0.5) / 10000.0).alias("score"),
    )


_SIGTERMS_BGFILTER_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
bgd AS (SELECT doc_id FROM documents WHERE lang = 'en'),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM bgd),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  GROUP BY term HAVING count(*) >= 3
),
bg AS (
  SELECT term, count(*)::BIGINT AS bg_df
  FROM dt JOIN bgd USING (doc_id) GROUP BY term
)
SELECT term, fg_df, bg_df,
       floor((fg_df / fg_total.n) / (bg_df / bg_total.n) * 10000.0 + 0.5)
         / 10000.0 AS score
FROM fg JOIN bg USING (term), fg_total, bg_total
ORDER BY (fg_df / fg_total.n) / (bg_df / bg_total.n) DESC, term ASC
LIMIT 10
"""


_HL_TERMS = ["spark", "join"]


def _highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlight (fragment) shape: snippet window around the first
    query-term occurrence for the top-10 docs of a conjunctive query —
    broadcast top-k join + one JVM projection (operators/highlight.py)."""
    from elasticsearch_assets_spark.operators.highlight import highlight_first

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    topk = idx.search(_HL_TERMS, k=10, mode="and")
    return highlight_first(topk, docs, _HL_TERMS, before=30, width=80)


def _highlight_sql() -> str:
    from elasticsearch_assets_spark.operators.highlight import highlight_sql

    return highlight_sql(
        _HL_TERMS, before=30, width=80,
        match_sql=_bm25_sql(_HL_TERMS, "and", 10),
    )


def _highlight_frags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlight with number_of_fragments=2: one fragment per matched
    term (first occurrence), position-ordered, capped — the fragment set
    is an array expression sorted/sliced/exploded JVM-side on the same
    broadcast top-k join (zero extra shuffle)."""
    from elasticsearch_assets_spark.operators.highlight import (
        highlight_fragments,
    )

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    topk = idx.search(_HL_TERMS, k=10, mode="and")
    return highlight_fragments(
        topk, docs, _HL_TERMS, n_fragments=2, before=10, width=40
    )


def _highlight_frags_sql() -> str:
    from elasticsearch_assets_spark.operators.highlight import (
        highlight_fragments_sql,
    )

    return highlight_fragments_sql(
        _HL_TERMS, n_fragments=2, before=10, width=40,
        match_sql=_bm25_sql(_HL_TERMS, "and", 10),
    )


_DISSECT2_PAT = "%{et->} %{?uid} %{v}"


def _esql_dissect3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL DISSECT append modifier `%{+code}` with APPEND_SEPARATOR
    (repeated captures join in pattern order), plus MV_CONCAT (multivalue
    -> one joined string, array_join passthrough). The oracle runs the
    SAME compiled dissect regex text."""
    from elasticsearch_assets_spark.query.esql import esql

    return esql(
        "FROM events | WHERE event_id % 31 == 0"
        " | EVAL line = CONCAT(event_type, ' ', TO_STRING(event_id % 7),"
        " '-', TO_STRING(user_id % 5))"
        ' | DISSECT line "%{kind} %{+code}-%{+code}" APPEND_SEPARATOR=":"'
        " | EVAL mv = MV_CONCAT(SPLIT(line, ' '), '_')"
        " | KEEP event_id, kind, code, mv"
        " | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )


_ESQL_DISSECT3_SQL = r"""
WITH b AS (
  SELECT event_id,
         event_type || ' ' || (event_id % 7)::VARCHAR || '-'
           || (user_id % 5)::VARCHAR AS line
  FROM events WHERE event_id % 31 = 0
)
SELECT event_id,
       regexp_extract(line, '^(.*?) (.*?)-(.*)$', 1) AS kind,
       regexp_extract(line, '^(.*?) (.*?)-(.*)$', 2) || ':'
         || regexp_extract(line, '^(.*?) (.*?)-(.*)$', 3) AS code,
       array_to_string(string_split(line, ' '), '_') AS mv
FROM b ORDER BY event_id
"""


def _esql_dissect2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL DISSECT modifiers: `%{et->}` right-padding (the delimiter
    after the hole may repeat — variable-width space padding), `%{?uid}`
    named skip (matched, not extracted). The oracle runs the SAME
    compiled regex text."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 41 == 0"
        " | EVAL line = CONCAT(event_type, ' ',"
        "   REPEAT(' ', CAST(event_id % 3 AS INT)),"
        "   'u', TO_STRING(user_id % 100), ' ', TO_STRING(event_id % 50))"
        f" | DISSECT line '{_DISSECT2_PAT}'"
        " | KEEP event_id, et, v | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out


def _esql_dissect2_sql() -> str:
    from elasticsearch_assets_spark.query.esql import dissect_compile

    regex, names = dissect_compile(_DISSECT2_PAT)
    assert names == ["et", "v"], names
    return f"""
SELECT event_id,
       nullif(regexp_extract(line, '{regex}', 1), '') AS et,
       nullif(regexp_extract(line, '{regex}', 2), '') AS v
FROM (
  SELECT event_id,
         event_type || ' ' || repeat(' ', (event_id % 3)::INT)
           || 'u' || (user_id % 100)::VARCHAR || ' '
           || (event_id % 50)::VARCHAR AS line
  FROM events WHERE event_id % 41 = 0
) ORDER BY event_id
"""


def _esql_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL RLIKE: FULL-STRING regex match (Lucene RegExp is implicitly
    anchored; Spark's RLIKE is substring search — the rewrite anchors
    it), double-quoted pattern, NOT RLIKE negation."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        'FROM documents | WHERE source RLIKE "src1.?"'
        ' | WHERE lang NOT RLIKE "z."'
        " | STATS n = COUNT(*) BY source | SORT source",
        spark=spark, sf_dir=sf_dir,
    )
    return out


_ESQL_RLIKE_SQL = """
SELECT count(*)::BIGINT AS n, source
FROM documents
WHERE regexp_matches(source, '^(?:src1.?)$')
  AND NOT regexp_matches(lang, '^(?:z.)$')
GROUP BY source ORDER BY source
"""


def _repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition signals (duplicate-bigram
    fraction, top-bigram share) — one O(n) JVM aggregate pass per doc,
    zero shuffle (operators/textstats.py)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.repetition_stats(docs)
    # floor(x*1e4+0.5)/1e4: engines' round() differ at representation
    # boundaries (ratios with power-of-two denominators hit them)
    return out.select(
        "doc_id",
        "n_bigrams",
        "n_unique_bigrams",
        (F.floor(F.col("dup_bigram_frac") * 10000.0 + 0.5) / 10000.0).alias(
            "dup_bigram_frac"
        ),
        (F.floor(F.col("top_bigram_share") * 10000.0 + 0.5) / 10000.0).alias(
            "top_bigram_share"
        ),
    )


def _repetition_stats_sql() -> str:
    inner = OT.repetition_stats_sql()
    return f"""
SELECT doc_id, n_bigrams, n_unique_bigrams,
       floor(dup_bigram_frac * 10000.0 + 0.5) / 10000.0 AS dup_bigram_frac,
       floor(top_bigram_share * 10000.0 + 0.5) / 10000.0 AS top_bigram_share
FROM ({inner})
"""


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis /
# multimodal) — each Spark query paired with an exactly-equivalent DuckDB SQL
# ---------------------------------------------------------------------------

_TOKS = tokens_sql("text")
_UNIGRAMS = f"list_distinct({_TOKS})"


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.exact_dedup(docs)


def _dedup_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OD.ngram_jaccard_pairs(docs, n=1, threshold=0.8)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


_NGRAM_PAIRS_SQL = f"""
WITH t AS (SELECT doc_id, {_UNIGRAMS} AS s FROM documents),
sh AS (SELECT doc_id, unnest(s) AS g FROM t),
sz AS (SELECT doc_id, len(s) AS sz FROM t),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, round(c::DOUBLE / (x.sz + y.sz - c), 4) AS jaccard
FROM common JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
WHERE c::DOUBLE / (x.sz + y.sz - c) >= 0.8
"""


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    sigs = OD.minhash_signatures(docs, n=1, k=8)
    return sigs.select(
        F.col("id").alias("doc_id"),
        *[F.col("sig")[i].alias(f"h{i}") for i in range(8)],
    )


def _minhash_sql_cols() -> str:
    cols = []
    for j in range(8):
        a, b = MINHASH_PERMS[j]
        cols.append(
            f"coalesce(list_min(list_apply(s, "
            f"x -> ({a} * ({hash60_sql('x')} % {MH_PRIME}) + {b}) % {MH_PRIME})), {MH_PRIME}) AS h{j}"
        )
    return ", ".join(cols)


_MINHASH_SQL = f"""
SELECT doc_id, {_minhash_sql_cols()}
FROM (SELECT doc_id, {_UNIGRAMS} AS s FROM documents)
"""


def _lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.lsh_candidate_pairs(docs, n=1, k=8, bands=4)


_LSH_SQL = f"""
WITH sig AS ({_MINHASH_SQL}),
banded AS (
  SELECT doc_id, band, md5(bucket_key) AS bucket FROM (
    SELECT doc_id, 0 AS band, h0 || ',' || h1 AS bucket_key FROM sig
    UNION ALL SELECT doc_id, 1, h2 || ',' || h3 FROM sig
    UNION ALL SELECT doc_id, 2, h4 || ',' || h5 FROM sig
    UNION ALL SELECT doc_id, 3, h6 || ',' || h7 FROM sig
  )
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b USING (band, bucket)
WHERE a.doc_id < b.doc_id
"""


def _lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates + candidate-local exact-Jaccard verification (the
    scale path: Jaccard is computed ONLY for candidate pairs, never via a
    corpus-wide all-pairs join)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OD.lsh_candidate_pairs(docs, n=1, k=8, bands=4, threshold=0.8)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


# oracle mirrors the candidate-local shape: candidates from the banded join,
# Jaccard from per-doc distinct-shingle list intersection per candidate pair
def _lsh_verified_sql() -> str:
    return f"""
WITH sig AS ({_MINHASH_SQL}),
banded AS (
  SELECT doc_id, band, md5(bucket_key) AS bucket FROM (
    SELECT doc_id, 0 AS band, h0 || ',' || h1 AS bucket_key FROM sig
    UNION ALL SELECT doc_id, 1, h2 || ',' || h3 FROM sig
    UNION ALL SELECT doc_id, 2, h4 || ',' || h5 FROM sig
    UNION ALL SELECT doc_id, 3, h6 || ',' || h7 FROM sig
  )
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
),
t AS (SELECT doc_id, {_UNIGRAMS} AS s FROM documents)
SELECT id_a, id_b, round(jac, 4) AS jaccard FROM (
  SELECT id_a, id_b,
         len(list_intersect(x.s, y.s))::DOUBLE
           / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jac
  FROM cand JOIN t x ON x.doc_id = id_a JOIN t y ON y.doc_id = id_b
) WHERE jac >= 0.8
"""


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    pairs = OD.ngram_jaccard_pairs(docs, n=1, threshold=0.8)
    return OD.dedup_clusters(docs.select("doc_id"), pairs, max_iter=50)


# min-label connected components as a recursive CTE; `c.r < e.b` prunes the
# reachability expansion to shrinking labels only (still derives the
# component min along any path from the min node)
_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
comp(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, c.r FROM comp c JOIN edges e ON e.a = c.id WHERE c.r < e.b
)
SELECT id AS doc_id, min(r) AS rep FROM comp GROUP BY id
"""


def _simhash_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.simhash_fingerprints(docs, n_bits=32).select(
        F.col("id").alias("doc_id"), "simhash"
    )


_SIMHASH_SQL = f"""
SELECT doc_id, {simhash_sql('hs', 32)} AS simhash
FROM (SELECT doc_id, {token_hashes_sql(_TOKS)} AS hs FROM documents)
"""


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.simhash_pairs(docs, n_bits=32, max_hamming=3, n_blocks=4)


# oracle is the O(n^2) brute force — deliberately a DIFFERENT algorithm than
# the pigeonhole block join it checks
_SIMHASH_PAIRS_SQL = f"""
WITH fp AS ({_SIMHASH_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _simhash_pairs60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-default SimHash shape: 60-bit fingerprints (Manku-style
    wide, capped at hash60's informative bits), 15-bit pigeonhole blocks."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.simhash_pairs(docs, n_bits=60, max_hamming=3, n_blocks=4)


_SIMHASH60_SQL = f"""
SELECT doc_id, {simhash_sql('hs', 60)} AS simhash
FROM (SELECT doc_id, {token_hashes_sql(_TOKS)} AS hs FROM documents)
"""

_SIMHASH_PAIRS60_SQL = f"""
WITH fp AS ({_SIMHASH60_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_sf_table(spark, sf_dir, "embeddings")
    out = OD.embedding_neardup_pairs(emb, threshold=0.45)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


_COS_AB = (
    "(SELECT sum(a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE) FROM range(1,65) r(i)) / "
    "(sqrt((SELECT sum(a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE) FROM range(1,65) r(i))) * "
    "sqrt((SELECT sum(b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE) FROM range(1,65) r(i))))"
)

_EMB_NEARDUP_SQL = f"""
SELECT id_a, id_b, round(cos, 4) AS cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_AB} AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE cos >= 0.45
"""


def _ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.cosine_topk(emb, qv, k=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


_ANN_TOPK_SQL = f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM embeddings a, q b
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def _ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.ann_topk_lsh(emb, qv, k=10, n_planes=8, multiprobe=1)
    return out.select("vec_id", F.round("score", 4).alias("score"))


def _bucket_sql(vec: str, n_planes: int = 8, seed_offset: int = 0) -> str:
    """Sign-LSH bucket code in SQL with the same deterministic hyperplanes.
    (float() before repr: numpy >= 2 scalar repr is 'np.float64(x)'.)"""
    planes = OS._planes(n_planes, 64, seed_offset)
    terms = []
    for i in range(n_planes):
        dot = " + ".join(
            f"{vec}[{d + 1}]::DOUBLE * {float(planes[i][d])!r}" for d in range(64)
        )
        terms.append(f"CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


_ANN_LSH_SQL = f"""
WITH coded AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT embedding, bucket FROM coded WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM coded a, q b
  WHERE bit_count(xor(a.bucket, b.bucket)) <= 1
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


_IVF_N_CENTROIDS = 8
_IVF_SAMPLE = 2000
_IVF_NPROBE = 3


def _ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN. The k-means quantizer is trained on a deterministically
    ORDERED sample (orderBy(vec_id).limit(n), fixed seed), so the trained
    centroid constants can be re-derived outside Spark and embedded in the
    DuckDB oracle twin (_ann_ivf_sql) — same pattern as the LSH hyperplane
    SQL twin."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    cents = OS.train_ivf_centroids(
        emb, n_centroids=_IVF_N_CENTROIDS, sample=_IVF_SAMPLE
    )
    out = OS.ann_topk_ivf(emb, qv, k=10, centroids=cents, nprobe=_IVF_NPROBE)
    return out.select("vec_id", F.round("score", 4).alias("score"))


# the driver's correctness gate runs oracle SQL against sf0.01 tables
_ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _ann_ivf_sql() -> str | None:
    """DuckDB twin of _ann_topk_ivf: re-trains the quantizer with the SAME
    numpy kmeans on the SAME ordered sample (read via DuckDB instead of
    Spark — identical float32 parquet values), then emits the centroid
    constants. Cell assignment is argmax over sequential-order float64 dot
    chains in BOTH engines (Spark centroid_assign_expr <-> the `+`-chain +
    list_position SQL below), so assignments are bit-identical."""
    import duckdb
    import numpy as np

    path = os.path.join(_ORACLE_SF_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT embedding FROM read_parquet('{path}') "
        f"ORDER BY vec_id LIMIT {_IVF_SAMPLE}"
    ).df()
    x = np.stack(pdf["embedding"].to_numpy())
    cents = OS.kmeans_fit(x, n_centroids=_IVF_N_CENTROIDS, iters=10)
    q = np.asarray(
        con.execute(
            f"SELECT embedding FROM read_parquet('{path}') WHERE vec_id = 0"
        ).fetchone()[0],
        dtype=np.float64,
    )
    q /= max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cents @ q), kind="stable")[:_IVF_NPROBE].tolist()
    dim = cents.shape[1]

    def dot_chain(vec: str, c: np.ndarray) -> str:
        # float() first: repr of a raw numpy scalar is 'np.float64(x)' on
        # numpy >= 2, which would break the SQL; repr(float) round-trips
        return "(0.0 + " + " + ".join(
            f"{vec}[{d + 1}]::DOUBLE * {float(c[d])!r}" for d in range(dim)
        ) + ")"

    dots = "[" + ", ".join(dot_chain("embedding", cents[i]) for i in range(len(cents))) + "]"
    plist = ", ".join(str(p) for p in sorted(probes))
    return f"""
WITH assigned AS (
  SELECT vec_id, embedding,
         list_position(dots, list_max(dots)) - 1 AS centroid
  FROM (SELECT vec_id, embedding, {dots} AS dots FROM embeddings)
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM (SELECT vec_id, embedding FROM assigned WHERE centroid IN ({plist})) a, q b
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def _token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    s = OT.token_stats(docs)
    return s.select(
        "doc_id", "n_tokens", "n_unique",
        F.round("avg_token_len", 4).alias("avg_token_len"),
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
    )


_TOKEN_STATS_SQL = f"""
SELECT doc_id, n_tokens, n_unique,
       round(avg_token_len, 4) AS avg_token_len,
       round(stopword_ratio, 4) AS stopword_ratio
FROM ({OT.token_stats_sql()})
"""


def _quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # floor(x*1e4+0.5)/1e4 instead of round(): engines' round() differ on
    # representation boundaries; this spelling is bit-identical in both
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.quality_score(docs).select(
        "doc_id",
        (F.floor(F.col("quality") * 10000.0 + 0.5) / 10000.0).alias("quality"),
    )


_QUALITY_SQL = (
    "SELECT doc_id, floor(quality * 10000.0 + 0.5) / 10000.0 AS quality "
    f"FROM ({OT.quality_score_sql()})"
)


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.lang_id(docs)


def _fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.doc_fingerprint(docs)


# ---------------------------------------------------------------------------
# geo + lucene-filter queries (SURVEY.md §2.2 P4-P6, §2.3 F6) over events
# with a deterministic synthetic location derived from event_id the same way
# in both engines
# ---------------------------------------------------------------------------

_LAT_SQL = "(event_id * 7) % 160 - 80"
_LON_SQL = "(event_id * 13) % 340 - 170"


def _geo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_sf_table(spark, sf_dir, "events")
    lat = ((F.col("event_id") * 7) % 160 - 80).cast("double")
    lon = ((F.col("event_id") * 13) % 340 - 170).cast("double")
    return ev.withColumn("lat", lat).withColumn("lon", lon)


def _geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elasticsearch_assets_spark.operators.geo import bbox_predicate

    ev = _geo_events(spark, sf_dir)
    return ev.where(
        bbox_predicate(F.col("lat"), F.col("lon"), "40,-100", "-10,50")
    ).select("event_id", "lat", "lon")


_GEO_BBOX_SQL = f"""
SELECT event_id, ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
FROM events
WHERE ({_LAT_SQL}) BETWEEN -10 AND 40 AND ({_LON_SQL}) BETWEEN -100 AND 50
"""

_HAVERSINE_SQL = (
    "2.0 * 6371008.8 * asin(sqrt("
    "sin((radians(lat) - radians({plat})) / 2) ^ 2"
    " + cos(radians(lat)) * cos(radians({plat}))"
    " * sin((radians(lon) - radians({plon})) / 2) ^ 2))"
)


def _geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elasticsearch_assets_spark.operators.geo import distance_predicate, haversine_m

    ev = _geo_events(spark, sf_dir)
    return (
        ev.where(distance_predicate(F.col("lat"), F.col("lon"), "10,20", "2000km"))
        .select(
            "event_id",
            F.round(haversine_m(F.col("lat"), F.col("lon"), 10.0, 20.0) / 1000.0, 2).alias(
                "dist_km"
            ),
        )
    )


_GEO_DIST_SQL = f"""
SELECT event_id, round(d / 1000.0, 2) AS dist_km FROM (
  SELECT event_id, {_HAVERSINE_SQL.format(plat='10.0', plon='20.0')} AS d
  FROM (SELECT event_id, ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon FROM events)
) WHERE d <= 2000000.0
"""


def _geo_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elasticsearch_assets_spark.operators.geo import haversine_m

    ev = _geo_events(spark, sf_dir)
    d = haversine_m(F.col("lat"), F.col("lon"), 0.0, 0.0)
    return (
        ev.select("event_id", d.alias("d"))
        .orderBy(F.col("d").asc(), F.col("event_id").asc())
        .limit(20)
        .select("event_id", F.round((F.col("d") / 1000.0), 2).alias("dist_km"))
    )


_GEO_SORT_SQL = f"""
SELECT event_id, round(d / 1000.0, 2) AS dist_km FROM (
  SELECT event_id, {_HAVERSINE_SQL.format(plat='0.0', plon='0.0')} AS d
  FROM (SELECT event_id, ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon FROM events)
) ORDER BY d ASC, event_id ASC LIMIT 20
"""


def _timeseries_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/C4: weekly + daily time-series index naming (pinned epoch-week
    semantics, reference index_selector-spec.js:82-106)."""
    from elasticsearch_assets_spark.sinks.index_selector import timeseries_index_expr

    ev = load_sf_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    return ev.select(
        "event_id",
        timeseries_index_expr(ts, "weekly", "w").alias("weekly_index"),
        timeseries_index_expr(ts, "daily", "d").alias("daily_index"),
    )


_TIMESERIES_SQL = """
SELECT event_id,
       'w-' || floor(epoch_ms(ts) / 604800000)::BIGINT AS weekly_index,
       'd-' || strftime(ts, '%Y.%m.%d') AS daily_index
FROM events
"""


def _bulk_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: multisend routing by first char of the doc key with '*' fallback."""
    from elasticsearch_assets_spark.sinks.bulk import route_by_key

    docs = load_sf_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("_id")
    )
    routed = route_by_key(
        keyed, {"a,b,c": "conn1", "d,e,f": "conn2", "*": "fallback"}
    )
    return routed.select("doc_id", "_connection")


def _scripted_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: the reference's Painless-script bulk cases
    (index_selector-spec.js:245-290 — `ctx._source.count += add` with
    script_params) as MERGE update-expressions on the keyed table: matched
    keys run `t.count + s.add`, unmatched source keys insert their doc."""
    import tempfile

    from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable

    docs = load_sf_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="esa_scripted_"), "tbl")
    table = KeyedParquetTable(spark, path, key="_id", num_buckets=8)
    table.append(
        docs.select(
            F.col("doc_id").alias("_id"),
            (F.col("doc_id") % 10).cast("long").alias("count"),
        )
    )
    matched = docs.where(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("_id"),
        F.lit(5).cast("long").alias("add"),
        F.lit(100).cast("long").alias("count"),
    )
    fresh = docs.where(F.col("doc_id") % 101 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("_id"),
        F.lit(7).cast("long").alias("add"),
        F.lit(50).cast("long").alias("count"),
    )
    table.upsert(
        matched.unionByName(fresh), update_exprs={"count": "t.count + s.add"}
    )
    return table.read().select(F.col("_id").alias("key_id"), "count")


_SCRIPTED_UPSERT_SQL = """
SELECT doc_id AS key_id, ((doc_id % 10) + 5)::BIGINT AS count
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, (doc_id % 10)::BIGINT FROM documents WHERE doc_id % 3 <> 0
UNION ALL
SELECT doc_id + 10000000, 50::BIGINT FROM documents WHERE doc_id % 101 = 0
"""


_BULK_ROUTE_SQL = """
SELECT doc_id,
       CASE substr(md5(doc_id::VARCHAR), 1, 1)
         WHEN 'a' THEN 'conn1' WHEN 'b' THEN 'conn1' WHEN 'c' THEN 'conn1'
         WHEN 'd' THEN 'conn2' WHEN 'e' THEN 'conn2' WHEN 'f' THEN 'conn2'
         ELSE 'fallback' END AS _connection
FROM documents
"""


def _lucene_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: the reader's Lucene-subset query compiled to Column predicates
    (AND binds tighter than OR, numeric comparator, field terms)."""
    from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene

    ev = load_sf_table(spark, sf_dir, "events")
    ast = parse_lucene("event_type:click AND value:>=30.5 OR event_type:error")
    pred = compile_filter(ast, analyzed_fields=set())
    return ev.where(pred).select("event_id", "event_type", "value")


_LUCENE_SQL = (
    "SELECT event_id, event_type, value FROM events "
    "WHERE (event_type = 'click' AND value >= 30.5) OR event_type = 'error'"
)


def _staged_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file stream: FileStreamSource needs a
    directory, events.parquet is a single file — stage a symlink dir (no
    data copy). Watermarks need TIMESTAMP (ltz); the session tz is UTC so
    the ntz->ltz cast is value-preserving and windows stay epoch-aligned
    like the batch oracles."""
    import tempfile

    from elasticsearch_assets_spark.streaming import persistent as P

    schema = load_sf_table(spark, sf_dir, "events").schema.simpleString()[7:-1].replace(
        ":", " "
    )
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        stream_dir = src
    else:
        stream_dir = tempfile.mkdtemp(prefix="esa_stream_src_")
        os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = P.file_stream(spark, stream_dir, schema)
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def _stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: persistent-mode tumbling-window counts, driven with
    trigger(availableNow) over the static events table — the streaming plan
    is the real one (watermark + window agg); epoch-aligned 1h windows make
    it oracle-equal to a batch date_trunc rollup."""
    import tempfile
    import uuid as _uuid

    from elasticsearch_assets_spark.streaming import persistent as P

    stream = _staged_events_stream(spark, sf_dir)
    counts = P.windowed_counts(stream, "ts", "1h", delay="1m")
    name = "wc_" + _uuid.uuid4().hex[:8]
    out = P.run_to_table(
        counts,
        checkpoint_dir=tempfile.mkdtemp(prefix="esa_ckpt_"),
        output_mode="complete",
        queryName=name,
    )
    return out.select("win_start", "cnt")


def _enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/S9/A5: keyed state storage enrichment — mset (MERGE upsert) of a
    deterministic state table, then the broadcast-keyed enrich join of an
    events batch against it (the reference's cache-enrichment pattern,
    elasticsearch_state_storage/api.js:6-33)."""
    import tempfile

    from elasticsearch_assets_spark.state.storage import CachedStateStorage

    ev = load_sf_table(spark, sf_dir, "events")
    path = os.path.join(tempfile.mkdtemp(prefix="esa_state_"), "tbl")
    store = CachedStateStorage(spark, path, key="_key", num_buckets=8)
    state = (
        ev.select(F.col("event_type").alias("_key"))
        .distinct()
        .withColumn("weight", F.length("_key").cast("long"))
    )
    store.mset(state)
    batch = ev.select("event_id", F.col("event_type").alias("_key"))
    return store.enrich(batch).select("event_id", "_key", "weight")


_ENRICH_SQL = """
SELECT event_id, event_type AS _key, length(event_type)::BIGINT AS weight
FROM events
"""


def _stream_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/S9-persist: custom stateful streaming op (applyInPandasWithState
    running per-key stats) draining the events table with availableNow;
    each micro-batch's updated states upsert into a keyed table (the
    persist-through pattern), so the final table is the last state per key
    — equal to the batch aggregate regardless of batch boundaries."""
    import tempfile

    from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable
    from elasticsearch_assets_spark.streaming.stateful import keyed_running_stats

    stream = _staged_events_stream(spark, sf_dir)
    stats = keyed_running_stats(
        stream, key_col="event_type", ts_col="ts", value_col="value"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="esa_runstats_"), "tbl")
    table = KeyedParquetTable(spark, path, key="key", num_buckets=4)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.upsert(batch_df)

    q = (
        stats.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="esa_ckpt2_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # floor-spelling per CLAUDE.md: engines' round() differ at
    # representation boundaries, and the sums accumulate in different orders
    return table.read().select(
        "key", "cnt",
        (F.floor(F.col("total") * 10000.0 + 0.5) / 10000.0).alias("total"),
        "last_ts",
    )


_STREAM_STATS_SQL = """
SELECT event_type AS key, count(*) AS cnt,
       floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS total, max(ts) AS last_ts
FROM events GROUP BY 1
"""


def _media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_sf_table(spark, sf_dir, "documents")
    return OM.media_stats(OM.attach_fake_media(docs))


_MEDIA_STATS_SQL = (
    "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, "
    "sha256(text) AS sha FROM documents"
)


# ---------------------------------------------------------------------------
# Round-3 batch 4: boosting / span queries / inspection APIs / remaining aggs
# ---------------------------------------------------------------------------

_BM25_CORE_CTES = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl)
"""

_PTOKS_CTE = """
ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
toks AS (SELECT doc_id, term FROM ptoks)
"""


def _bm25_scored_cte(terms: list[str], mode: str = "or") -> str:
    """The tf/df/scored CTE tail of the standard BM25 template (assumes
    toks/dl/stats are already defined)."""
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    having = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    return f"""
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
  {having}
)
"""


_BOOSTING_POS, _BOOSTING_NEG, _BOOSTING_NB = ["spark", "join"], ["merge"], 0.3


def _bm25_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boosting query: 'spark join' (OR) demoted ×0.3 for docs that also
    contain 'merge' — negative side is filter-context (demotes, never
    scores)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.boosting(_BOOSTING_POS, _BOOSTING_NEG, _BOOSTING_NB, k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_boosting_sql() -> str:
    return f"""
WITH {_BM25_CORE_CTES.strip()},
{_bm25_scored_cte(_BOOSTING_POS).strip()},
neg AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{_BOOSTING_NEG[0]}'),
adj AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (SELECT doc_id FROM neg)
              THEN s * {_BOOSTING_NB} ELSE s END AS s2
  FROM scored
)
SELECT doc_id, round(s2, 4) AS score FROM adj
ORDER BY s2 DESC, doc_id ASC LIMIT 10
"""


_SPAN_FIRST_TERM, _SPAN_FIRST_END = "spark", 3


def _bm25_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_first: 'spark' within the first 3 token positions,
    index-assisted over positional postings; single-term BM25 restricted
    to matching docs."""
    idx = _docs_index_pos(spark, sf_dir)
    out = idx.search_span_first(_SPAN_FIRST_TERM, _SPAN_FIRST_END, k=None)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_span_first_sql() -> str:
    return f"""
WITH {_PTOKS_CTE.strip()},
m AS (
  SELECT DISTINCT doc_id FROM ptoks
  WHERE term = '{_SPAN_FIRST_TERM}' AND pos < {_SPAN_FIRST_END}
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
{_bm25_scored_cte([_SPAN_FIRST_TERM]).strip()}
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM m)
"""


_SPAN_NOT_INC, _SPAN_NOT_EXC, _SPAN_NOT_WIN = "spark", "join", 2


def _bm25_span_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_not: an occurrence of 'spark' with NO 'join' within ±2
    positions — index-assisted over positional postings."""
    idx = _docs_index_pos(spark, sf_dir)
    out = idx.search_span_not(
        _SPAN_NOT_INC, _SPAN_NOT_EXC,
        pre=_SPAN_NOT_WIN, post=_SPAN_NOT_WIN, k=None,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_span_not_sql() -> str:
    w = _SPAN_NOT_WIN
    return f"""
WITH {_PTOKS_CTE.strip()},
m AS (
  SELECT DISTINCT p.doc_id FROM ptoks p
  WHERE p.term = '{_SPAN_NOT_INC}' AND NOT EXISTS (
    SELECT 1 FROM ptoks q
    WHERE q.doc_id = p.doc_id AND q.term = '{_SPAN_NOT_EXC}'
      AND q.pos BETWEEN p.pos - {w} AND p.pos + {w}
  )
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
{_bm25_scored_cte([_SPAN_NOT_INC]).strip()}
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM m)
"""


_EXPLAIN_QUERY, _EXPLAIN_DOC = ["join", "spark"], 1


def _explain_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _explain API: per-term BM25 breakdown for ('spark join', doc 1);
    the weights sum to the engine's search() score (tested)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.explain(_EXPLAIN_QUERY, _EXPLAIN_DOC)
    return out.select(
        "term", "tf", "dl", "df",
        F.round("idf", 4).alias("idf"),
        F.round("weight", 4).alias("weight"),
    )


def _explain_doc_sql() -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(_EXPLAIN_QUERY))
    idf = "ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))"
    return f"""
WITH {_BM25_CORE_CTES.strip()},
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) AND doc_id = {_EXPLAIN_DOC}
  GROUP BY doc_id, term
),
dfx AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
  WHERE term IN ({tlist}) GROUP BY term
)
SELECT tf.term, tf.tf::BIGINT AS tf, dl.dl::BIGINT AS dl,
       dfx.df::BIGINT AS df,
       round({idf}, 4) AS idf,
       round({idf} * tf.tf * ({K1} + 1)
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)), 4)
         AS weight
FROM stats, tf
JOIN dfx USING (term) JOIN dl USING (doc_id)
ORDER BY tf.term ASC
"""


_TV_DOC = 1


def _termvectors_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _termvectors API: every term of doc 1 with within-doc tf and
    collection df; the posting scan prunes to the doc's segment via the
    durable seg_map."""
    idx = _docs_index(spark, sf_dir)
    return idx.termvectors(_TV_DOC)


_TERMVECTORS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tv AS (
  SELECT term, count(*)::BIGINT AS tf FROM toks
  WHERE doc_id = {_TV_DOC} GROUP BY term
),
dfx AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
  WHERE term IN (SELECT term FROM tv) GROUP BY term
)
SELECT tv.term, tv.tf, dfx.df FROM tv JOIN dfx USING (term)
ORDER BY tv.term ASC
"""


def _facet_ext_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats over the 'spark' match set: stats + sum_of_squares
    + population variance/std + sigma bounds, one partial-aggregated
    pass."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_extended_stats(matches, docs, "n_chars", sigma=2.0)
    return out.select(
        "count", "min", "max", _f4("sum").alias("sum"),
        _f4("avg").alias("avg"),
        _f4("sum_of_squares").alias("sum_of_squares"),
        _f4("variance").alias("variance"),
        _f4("std_deviation").alias("std_deviation"),
        _f4("std_upper").alias("std_upper"),
        _f4("std_lower").alias("std_lower"),
    )


_FACET_EXT_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id))
SELECT count(v)::BIGINT AS "count", min(v) AS "min", max(v) AS "max",
       floor(sum(v) * 10000.0 + 0.5) / 10000.0 AS "sum",
       floor(avg(v) * 10000.0 + 0.5) / 10000.0 AS "avg",
       floor(sum(v * v) * 10000.0 + 0.5) / 10000.0 AS sum_of_squares,
       floor(var_pop(v) * 10000.0 + 0.5) / 10000.0 AS variance,
       floor(stddev_pop(v) * 10000.0 + 0.5) / 10000.0 AS std_deviation,
       floor((avg(v) + 2.0 * stddev_pop(v)) * 10000.0 + 0.5) / 10000.0 AS std_upper,
       floor((avg(v) - 2.0 * stddev_pop(v)) * 10000.0 + 0.5) / 10000.0 AS std_lower
FROM mt
"""

_PCT_RANK_VALUES = [150.0, 300.0, 450.0]


def _facet_pct_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks (exact cumulative-frequency variant) at n_chars
    150/300/450 over the 'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_percentile_ranks(matches, docs, "n_chars", _PCT_RANK_VALUES)
    return out.select("value", _f4("percent").alias("percent"))


def _facet_pct_ranks_sql() -> str:
    parts = " UNION ALL ".join(
        f"SELECT {v}::DOUBLE AS value, "
        f"floor(100.0 * (SELECT count(*) FROM mt WHERE v <= {v}) "
        f"/ (SELECT count(*) FROM mt) * 10000.0 + 0.5) / 10000.0 AS percent"
        for v in _PCT_RANK_VALUES
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id))
{parts}
ORDER BY value ASC
"""


def _facet_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg: n_chars weighted by (doc_id % 10 + 1) over the
    'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "w", (F.col("doc_id") % 10 + 1).cast("double")
    )
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_weighted_avg(matches, docs, "n_chars", "w")
    return out.select(_f4("value").alias("value"))


_FACET_WAVG_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (
  SELECT d.n_chars::DOUBLE AS v, (d.doc_id % 10 + 1)::DOUBLE AS w
  FROM documents d JOIN m USING (doc_id)
)
SELECT floor(sum(v * w) / sum(w) * 10000.0 + 0.5) / 10000.0 AS value
FROM mt
"""


def _facet_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms (max_doc_count=1): the n_chars values held by exactly
    one matching doc — the long-tail buckets, rare-first order."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_rare_terms(matches, docs, "n_chars", max_doc_count=1)


_FACET_RARE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.n_chars AS bucket, count(*)::BIGINT AS doc_count
FROM documents d JOIN m USING (doc_id)
GROUP BY 1 HAVING count(*) <= 1
ORDER BY doc_count ASC, bucket ASC
"""


def _facet_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix over the 'spark' match set: named filters en /
    long / src with pairwise intersections, one array-expression pass."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_adjacency_matrix(
        matches,
        docs,
        {
            "en": F.col("lang") == "en",
            "long": F.col("n_chars") >= 300,
            "src": F.col("source").isin("src0", "src1", "src2", "src3"),
        },
    )


_FACET_ADJ_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
md AS (
  SELECT lang = 'en' AS f_en, n_chars >= 300 AS f_long,
         source IN ('src0', 'src1', 'src2', 'src3') AS f_src
  FROM documents d JOIN m USING (doc_id)
),
b AS (
  SELECT 'en' AS key, count(*)::BIGINT AS doc_count FROM md WHERE f_en
  UNION ALL SELECT 'long', count(*)::BIGINT FROM md WHERE f_long
  UNION ALL SELECT 'src', count(*)::BIGINT FROM md WHERE f_src
  UNION ALL SELECT 'en&long', count(*)::BIGINT FROM md WHERE f_en AND f_long
  UNION ALL SELECT 'en&src', count(*)::BIGINT FROM md WHERE f_en AND f_src
  UNION ALL SELECT 'long&src', count(*)::BIGINT FROM md WHERE f_long AND f_src
)
SELECT key, doc_count FROM b WHERE doc_count > 0 ORDER BY key ASC
"""

_GEOTILE_ZOOM = 3


def _facet_geotile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geotile_grid at zoom 3 over the click events (slippy-tile keys
    z/x/y, Web-Mercator formula, pure JVM column math)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = _geo_events(spark, sf_dir)
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_geotile_grid(
        matches, ev, "lat", "lon", zoom=_GEOTILE_ZOOM, id_col="event_id"
    )


def _facet_geotile_sql() -> str:
    z2 = float(2 ** _GEOTILE_ZOOM)
    maxi = int(z2) - 1
    return f"""
WITH g AS (
  SELECT ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT radians(greatest(-85.05112878, least(85.05112878, lat))) AS latr,
         lon
  FROM g
),
t AS (
  SELECT
    least(greatest(floor((lon + 180.0) / 360.0 * {z2}), 0), {maxi})::BIGINT AS x,
    least(greatest(
      floor((1.0 - ln(tan(latr) + 1.0 / cos(latr)) / pi()) / 2.0 * {z2}),
      0), {maxi})::BIGINT AS y
  FROM p
)
SELECT concat('{_GEOTILE_ZOOM}', '/', x, '/', y) AS key,
       count(*)::BIGINT AS doc_count
FROM t GROUP BY 1 ORDER BY doc_count DESC, key ASC
"""


_AUTO_DH_TARGET = 12


def _facet_auto_dh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES auto_date_histogram over the click events: smallest calendar
    interval from the minute→year ladder with ≤ 12 non-empty buckets."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_auto_date_histogram(
        matches, ev, "ts", target_buckets=_AUTO_DH_TARGET, id_col="event_id"
    )


def _facet_auto_dh_sql() -> str:
    ladder = ("minute", "hour", "day", "week", "month", "quarter", "year")
    counts = ", ".join(
        f"count(DISTINCT date_trunc('{iv}', ts)) AS c_{iv}" for iv in ladder
    )
    sel = " ".join(
        f"WHEN c_{iv} <= {_AUTO_DH_TARGET} THEN '{iv}'" for iv in ladder[:-1]
    )
    trunc = " ".join(
        f"WHEN '{iv}' THEN date_trunc('{iv}', ts)" for iv in ladder
    )
    return f"""
WITH m AS (SELECT ts FROM events WHERE event_type = 'click'),
c AS (SELECT {counts} FROM m),
sel AS (SELECT CASE {sel} ELSE 'year' END AS iv FROM c)
SELECT (SELECT iv FROM sel) AS interval,
       CASE (SELECT iv FROM sel) {trunc} END AS bucket,
       count(*)::BIGINT AS doc_count
FROM m GROUP BY bucket ORDER BY bucket ASC
"""


# ---------------------------------------------------------------------------
# Round-3 batch 5: terms_set / exists / matrix-stats / remaining agg family
# ---------------------------------------------------------------------------

_TERMS_SET_TERMS = ["spark", "join", "merge"]


def _terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms_set query: docs containing at least (doc_id % 2 + 1)
    distinct terms of {spark, join, merge} — the per-doc
    minimum_should_match_field variant; qualifying docs score as the OR
    query (routed through the cogrouped filtered-search path)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "required", (F.col("doc_id") % 2 + 1).cast("int")
    )
    out = idx.terms_set(_TERMS_SET_TERMS, docs, "required", k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _terms_set_sql() -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(_TERMS_SET_TERMS))
    return f"""
WITH {_BM25_CORE_CTES.strip()},
{_bm25_scored_cte(_TERMS_SET_TERMS).strip()},
mc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id
),
q AS (
  SELECT mc.doc_id FROM mc JOIN documents d USING (doc_id)
  WHERE mc.c >= (d.doc_id % 2 + 1)
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM q)
ORDER BY s DESC, doc_id ASC LIMIT 10
"""


def _lucene_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES exists query via the `_exists_:field` query-string pseudo-field:
    IsNotNull compiled from the Lucene surface, pushable to the scan. The
    nullable column is derived (the testdata has no nulls) — the compile
    path is what's under test."""
    from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene

    ev = load_sf_table(spark, sf_dir, "events").withColumn(
        "maybe", F.when(F.col("value") < 50, None).otherwise(F.col("props"))
    )
    ast = parse_lucene("_exists_:maybe AND event_type:click")
    pred = compile_filter(ast, analyzed_fields=set())
    return ev.where(pred).select("event_id", "value")


_LUCENE_EXISTS_SQL = """
SELECT event_id, value FROM events
WHERE (CASE WHEN value < 50 THEN NULL ELSE props END) IS NOT NULL
  AND event_type = 'click'
"""


def _facet_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats (two-field): moments + population covariance /
    correlation between n_chars and a derived numeric field over the
    'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "y", (F.col("doc_id") % 97).cast("double")
    )
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_matrix_stats(matches, docs, "n_chars", "y")
    return out.select(
        "count",
        _f4("mean_x").alias("mean_x"), _f4("mean_y").alias("mean_y"),
        _f4("var_x").alias("var_x"), _f4("var_y").alias("var_y"),
        _f4("covariance").alias("covariance"),
        _f4("correlation").alias("correlation"),
    )


_FACET_MATRIX_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (
  SELECT d.n_chars::DOUBLE AS x, (d.doc_id % 97)::DOUBLE AS y
  FROM documents d JOIN m USING (doc_id)
)
SELECT count(*)::BIGINT AS "count",
       floor(avg(x) * 10000.0 + 0.5) / 10000.0 AS mean_x,
       floor(avg(y) * 10000.0 + 0.5) / 10000.0 AS mean_y,
       floor(var_pop(x) * 10000.0 + 0.5) / 10000.0 AS var_x,
       floor(var_pop(y) * 10000.0 + 0.5) / 10000.0 AS var_y,
       floor(covar_pop(x, y) * 10000.0 + 0.5) / 10000.0 AS covariance,
       floor(covar_pop(x, y) / sqrt(var_pop(x) * var_pop(y))
             * 10000.0 + 0.5) / 10000.0 AS correlation
FROM mt
"""


def _facet_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES median_absolute_deviation (exact medians) of n_chars over the
    'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_mad(matches, docs, "n_chars")
    return out.select(_f4("value").alias("value"))


_FACET_MAD_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id)),
med AS (SELECT quantile_cont(v, 0.5) AS med FROM mt)
SELECT floor(quantile_cont(abs(v - med.med), 0.5) * 10000.0 + 0.5) / 10000.0
         AS value
FROM mt, med
"""


def _facet_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_terms: buckets keyed by (lang, source) over the 'spark'
    match set, top 10 by (doc_count DESC, keys ASC)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_multi_terms(matches, docs, ["lang", "source"], n=10)


_FACET_MULTI_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.lang AS key_lang, d.source AS key_source,
       count(*)::BIGINT AS doc_count
FROM documents d JOIN m USING (doc_id)
GROUP BY 1, 2
ORDER BY doc_count DESC, key_lang ASC, key_source ASC LIMIT 10
"""


def _facet_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_metrics under a terms agg: per lang bucket, the doc_id of
    the longest doc (sort n_chars DESC, ties doc_id ASC)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_top_metrics(matches, docs, "lang", "n_chars", "doc_id")


_FACET_TOP_METRICS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
r AS (
  SELECT d.lang AS bucket, d.n_chars AS sort_val, d.doc_id AS metric_val,
         row_number() OVER (
           PARTITION BY d.lang ORDER BY d.n_chars DESC, d.doc_id ASC
         ) AS rn
  FROM documents d JOIN m USING (doc_id)
)
SELECT bucket, sort_val, metric_val FROM r WHERE rn = 1
ORDER BY bucket ASC
"""

_GEO_DIST_EDGES_KM = [3000.0, 6000.0, 9000.0]


def _facet_geo_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_distance aggregation: haversine-km ring buckets from
    (10, 20) over the click events, empty buckets kept."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = _geo_events(spark, sf_dir)
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_geo_distance(
        matches, ev, "lat", "lon", "10,20", _GEO_DIST_EDGES_KM,
        id_col="event_id",
    )


def _facet_geo_dist_sql() -> str:
    km = _HAVERSINE_SQL.format(plat=10.0, plon=20.0) + " / 1000.0"
    e = _GEO_DIST_EDGES_KM
    return f"""
WITH g AS (
  SELECT ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events WHERE event_type = 'click'
),
d AS (SELECT ({km}) AS km FROM g),
ranges(bidx, bucket_lo, bucket_hi) AS (VALUES
  (0, NULL::DOUBLE, {e[0]}), (1, {e[0]}, {e[1]}),
  (2, {e[1]}, {e[2]}), (3, {e[2]}, NULL::DOUBLE)
)
SELECT r.bucket_lo, r.bucket_hi,
       (SELECT count(*) FROM d
        WHERE (r.bucket_lo IS NULL OR d.km >= r.bucket_lo)
          AND (r.bucket_hi IS NULL OR d.km < r.bucket_hi))::BIGINT
         AS doc_count
FROM ranges r ORDER BY bucket_lo ASC NULLS FIRST
"""


def _facet_geo_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_centroid: arithmetic mean lat/lon + count of the click
    events."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = _geo_events(spark, sf_dir)
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_geo_centroid(matches, ev, "lat", "lon", id_col="event_id")
    return out.select(
        _f4("lat").alias("lat"), _f4("lon").alias("lon"), "count"
    )


_FACET_GEO_CENTROID_SQL = f"""
SELECT floor(avg(({_LAT_SQL})::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS lat,
       floor(avg(({_LON_SQL})::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS lon,
       count(*)::BIGINT AS "count"
FROM events WHERE event_type = 'click'
"""

_SAMPLER_SIZE = 50


def _facet_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sampler agg (deterministic md5-smallest variant): lang term
    counts over a 50-doc pseudo-random sample of the 'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_sampler(matches, docs, "lang", shard_size=_SAMPLER_SIZE)


_FACET_SAMPLER_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
s AS (
  SELECT doc_id FROM m ORDER BY md5(doc_id::VARCHAR) ASC
  LIMIT {_SAMPLER_SIZE}
)
SELECT d.lang AS bucket, count(*)::BIGINT AS doc_count
FROM documents d JOIN s USING (doc_id)
GROUP BY 1 ORDER BY doc_count DESC, bucket ASC
"""

def _facet_random_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES random_sampler agg (8.2): per-lang doc_count / sum(n_chars)
    scaled by 1/probability over a deterministic p=0.25 hash-cut sample
    (md5-hex-prefix filter — the engine's seeded-sampling contract), avg
    unscaled. The cut is a pure JVM filter on the scan; one hash agg."""
    from elasticsearch_assets_spark.operators import facets as OFA

    docs = load_sf_table(spark, sf_dir, "documents")
    out = OFA.facet_random_sampler(
        docs, 0.25, "lang", "n_chars", seed="rs"
    )
    return out.select(
        "bucket",
        _f4("doc_count").alias("doc_count"),
        _f4("sum_n_chars").alias("sum_n_chars"),
        _f4("avg_n_chars").alias("avg_n_chars"),
    )


_FACET_RANDOM_SAMPLER_SQL = """
WITH s AS (
  SELECT * FROM documents
  WHERE substr(md5(concat('rs', '|', doc_id::VARCHAR)), 1, 8) < '40000000'
)
SELECT lang AS bucket,
       floor(count(*)::DOUBLE / 0.25 * 1e4 + 0.5) / 1e4 AS doc_count,
       floor(sum(n_chars)::DOUBLE / 0.25 * 1e4 + 0.5) / 1e4 AS sum_n_chars,
       floor(avg(n_chars) * 1e4 + 0.5) / 1e4 AS avg_n_chars
FROM s GROUP BY lang ORDER BY bucket
"""

def _facet_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES normalize pipeline agg, full method set (rescale_0_1/0_100,
    percent_of_sum, mean, zscore, softmax) over the daily click
    histogram's avg(value) — one hash agg + one window pass over bucket
    cardinality (facets.facet_normalize)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_normalize(
        matches, ev, "ts", "value", "day", id_col="event_id"
    )
    return out.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("bucket"),
        "doc_count",
        _f4("m").alias("m"),
        _f4("rescale_0_1").alias("rescale_0_1"),
        _f4("rescale_0_100").alias("rescale_0_100"),
        _f4("percent_of_sum").alias("percent_of_sum"),
        _f4("mean_norm").alias("mean_norm"),
        _f4("zscore").alias("zscore"),
        _f4("softmax").alias("softmax"),
    )


_FACET_NORMALIZE_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS bucket, count(*)::BIGINT AS doc_count,
         avg(value) AS m
  FROM events WHERE event_type = 'click' GROUP BY 1
),
w AS (
  SELECT *, min(m) OVER () AS mn, max(m) OVER () AS mx,
         avg(m) OVER () AS av, stddev_pop(m) OVER () AS sd,
         sum(m) OVER () AS tot, sum(exp(m)) OVER () AS etot
  FROM h
)
SELECT strftime(bucket, '%Y-%m-%d') AS bucket, doc_count,
       floor(m * 1e4 + 0.5) / 1e4 AS m,
       floor((m - mn) / (mx - mn) * 1e4 + 0.5) / 1e4 AS rescale_0_1,
       floor(100.0 * (m - mn) / (mx - mn) * 1e4 + 0.5) / 1e4 AS rescale_0_100,
       floor(m / tot * 1e4 + 0.5) / 1e4 AS percent_of_sum,
       floor((m - av) / (mx - mn) * 1e4 + 0.5) / 1e4 AS mean_norm,
       floor((m - av) / sd * 1e4 + 0.5) / 1e4 AS zscore,
       floor(exp(m) / etot * 1e4 + 0.5) / 1e4 AS softmax
FROM w ORDER BY bucket
"""


_BSCRIPT_MIN_COUNT = 70


def _facet_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_script + bucket_selector over a daily date_histogram of
    the click events: ratio = sum(value)/doc_count per bucket, buckets
    with doc_count ≤ 70 dropped."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_bucket_script(
        matches, ev, "ts", "value", "day",
        min_count=_BSCRIPT_MIN_COUNT, id_col="event_id",
    )
    return out.select(
        "bucket", "doc_count",
        _f4("total").alias("total"), _f4("ratio").alias("ratio"),
    )


_FACET_BSCRIPT_SQL = f"""
WITH m AS (SELECT ts, value FROM events WHERE event_type = 'click'),
h AS (
  SELECT date_trunc('day', ts) AS bucket, count(*)::BIGINT AS doc_count,
         sum(value) AS total
  FROM m GROUP BY 1
)
SELECT bucket, doc_count,
       floor(total * 10000.0 + 0.5) / 10000.0 AS total,
       floor(total / doc_count * 10000.0 + 0.5) / 10000.0 AS ratio
FROM h WHERE doc_count > {_BSCRIPT_MIN_COUNT}
ORDER BY bucket ASC
"""


# ---------------------------------------------------------------------------
# round-3 batch 6: ids / pinned / feature boosts / match_bool_prefix /
# percolate (ES query-DSL surface the reference reaches through its ES
# pass-through facade; semantics from the ES/Lucene docs)
# ---------------------------------------------------------------------------

_IDS_LIST = [3, 7, 11, 499, 10**9]  # last one absent at every sf


def _ids_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ids query: filter-context id lookup, every live match scores
    exactly the boost; unknown ids are silently dropped."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    return idx.ids_query(_IDS_LIST, docs, boost=1.5)


_IDS_SQL = f"""
SELECT doc_id, 1.5::DOUBLE AS score FROM documents
WHERE doc_id IN ({", ".join(str(i) for i in _IDS_LIST)})
ORDER BY doc_id ASC
"""

_PIN_IDS = [41, 7]
_PIN_ORGANIC = ["spark", "table"]


def _pinned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pinned query: promoted ids take ranks 1..p in the order given;
    the organic query fills the rest (pinned ids deduped out)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    return idx.pinned(_PIN_IDS, _PIN_ORGANIC, k=10, mode="or", corpus=docs)


def _pinned_sql() -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(set(_PIN_ORGANIC)))
    pins = ", ".join(
        f"({i}::BIGINT, {r + 1}::BIGINT)" for r, i in enumerate(_PIN_IDS)
    )
    plist = ", ".join(str(i) for i in _PIN_IDS)
    return f"""
WITH {_bm25_body(f"term IN ({tlist})")},
organic AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) + {len(_PIN_IDS)}
           AS rank
  FROM scored WHERE doc_id NOT IN ({plist})
),
pins(doc_id, rank) AS (VALUES {pins})
SELECT doc_id, rank FROM (
  SELECT * FROM pins UNION ALL SELECT * FROM organic
) ORDER BY rank ASC LIMIT 10
"""


def _rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_feature (saturation): BM25 + 2·n_chars/(n_chars+500) over
    the 'spark' AND match set."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.rank_feature(
        ["spark"], docs, "n_chars", function="saturation",
        pivot=500.0, boost=2.0, k=None,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_RANK_FEATURE_SQL = f"""
WITH {_bm25_body("term IN ('spark')")}
SELECT s.doc_id,
       round(s.s + 2.0 * (d.n_chars / (d.n_chars + 500.0)), 4) AS score
FROM scored s JOIN documents d USING (doc_id)
"""


def _distance_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES distance_feature: BM25 + 1.5·100/(100+|n_chars−800|) decay
    toward the origin, over the 'spark' AND match set."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.distance_feature(
        ["spark"], docs, "n_chars", origin=800.0, pivot=100.0,
        boost=1.5, k=None,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_DISTANCE_FEATURE_SQL = f"""
WITH {_bm25_body("term IN ('spark')")}
SELECT s.doc_id,
       round(s.s + 1.5 * 100.0 / (100.0 + abs(d.n_chars - 800.0)), 4)
         AS score
FROM scored s JOIN documents d USING (doc_id)
"""


def _match_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_bool_prefix 'spark jo': term clause + trailing prefix,
    OR-combined (the type-ahead query without the positional constraint
    of match_phrase_prefix)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.match_bool_prefix("spark jo", k=None, operator="or")
    return out.select("doc_id", F.round("score", 4).alias("score"))


_MATCH_BOOL_PREFIX_SQL = _bm25_sql(
    [], "or", None, term_cond="(term = 'spark' OR term LIKE 'jo%')"
)

# stored percolator queries: (query_id, terms, msm); msm == len(terms)
# is the AND query, 1 the OR query
_PERC_SPECS = [
    (1, ["spark", "join"], 2),
    (2, ["table", "scan", "filter"], 1),
    (3, ["query", "merge"], 2),
    (4, ["spark"], 1),
]


def _percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolate query: the documents table probed against 4 stored
    queries — (doc_id, query_id) matches, one corpus tokenize pass, the
    query table broadcast."""
    from elasticsearch_assets_spark.operators import percolate as OP

    docs = load_sf_table(spark, sf_dir, "documents")
    qs = OP.make_queries(spark, _PERC_SPECS)
    return OP.percolate(qs, docs)


def _percolate_sql() -> str:
    rows = ", ".join(
        f"({qid}::BIGINT, '{t}', {msm})"
        for qid, terms, msm in _PERC_SPECS
        for t in sorted(set(terms))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
q(query_id, term, msm) AS (VALUES {rows}),
m AS (
  SELECT dt.doc_id, q.query_id, count(*) AS n, min(q.msm) AS msm
  FROM dt JOIN q ON dt.term = q.term GROUP BY 1, 2
)
SELECT doc_id, query_id FROM m WHERE n >= msm
ORDER BY doc_id ASC, query_id ASC
"""


_PERC_F_SPECS = [
    (0, ["spark", "join"], 2, "n_chars >= 300"),
    (1, ["query"], 1, "lang = 'en'"),
    (2, ["data"], 1, None),
    (3, ["merge", "scan"], 1, "n_chars < 250 AND source = 'src0'"),
]


def _percolate_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolator with FULL stored queries (terms + filters): the
    term/msm stage prunes candidates first, surviving pairs join back to
    the doc row once, and all per-query conditions compile into ONE CASE
    chain on query_id (operators/percolate.percolate_filtered)."""
    from elasticsearch_assets_spark.operators import percolate as OP

    docs = load_sf_table(spark, sf_dir, "documents")
    qs = OP.make_filtered_queries(spark, _PERC_F_SPECS)
    return OP.percolate_filtered(qs, docs)


def _percolate_filtered_sql() -> str:
    rows = ", ".join(
        f"({qid}::BIGINT, '{t}', {msm if msm > 0 else len(set(terms))})"
        for qid, terms, msm, _c in _PERC_F_SPECS
        for t in sorted(set(terms))
    )
    case = " ".join(
        f"WHEN m.query_id = {qid} THEN ({cond})"
        for qid, _t, _m, cond in _PERC_F_SPECS
        if cond
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
q(query_id, term, msm) AS (VALUES {rows}),
m AS (
  SELECT dt.doc_id, q.query_id, count(*) AS n, min(q.msm) AS msm
  FROM dt JOIN q ON dt.term = q.term GROUP BY 1, 2
)
SELECT m.doc_id, m.query_id
FROM m JOIN documents d ON m.doc_id = d.doc_id
WHERE m.n >= m.msm AND (CASE {case} ELSE TRUE END)
ORDER BY m.doc_id ASC, m.query_id ASC
"""


# ---------------------------------------------------------------------------
# round-3 batch 7a: remaining ES metric aggregations
# ---------------------------------------------------------------------------


def _facet_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES missing agg: docs in the 'spark' match set whose (derived,
    nullable) field is null. The base table has no nulls, so the field is
    lang masked out on doc_id % 7 == 0 — both engines derive the same
    column."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "maybe_lang", F.when(F.col("doc_id") % 7 != 0, F.col("lang"))
    )
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_missing(matches, docs, "maybe_lang")


_FACET_MISSING_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT count(*) FILTER (WHERE d.doc_id % 7 = 0) AS doc_count
FROM documents d JOIN m USING (doc_id)
"""


def _facet_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES value_count agg over the same masked field (the dual of
    missing)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "maybe_lang", F.when(F.col("doc_id") % 7 != 0, F.col("lang"))
    )
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_value_count(matches, docs, "maybe_lang")


_FACET_VALUE_COUNT_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT count(*) FILTER (WHERE d.doc_id % 7 <> 0) AS value
FROM documents d JOIN m USING (doc_id)
"""


def _facet_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES global agg wrapping a terms agg: lang counts over the WHOLE
    corpus, ignoring any query context."""
    from elasticsearch_assets_spark.operators import facets as OFA

    docs = load_sf_table(spark, sf_dir, "documents")
    return OFA.facet_global_counts(docs, "lang")


_FACET_GLOBAL_SQL = """
SELECT lang AS bucket, count(*)::BIGINT AS doc_count
FROM documents GROUP BY 1 ORDER BY doc_count DESC, bucket ASC
"""


def _facet_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boxplot agg (exact quartiles) of n_chars over the 'spark'
    match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_boxplot(matches, docs, "n_chars")
    return out.select(
        _f4("min").alias("min"), _f4("q1").alias("q1"),
        _f4("q2").alias("q2"), _f4("q3").alias("q3"),
        _f4("max").alias("max"),
    )


_FACET_BOXPLOT_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id))
SELECT floor(min(v) * 10000.0 + 0.5) / 10000.0 AS min,
       floor(quantile_cont(v, 0.25) * 10000.0 + 0.5) / 10000.0 AS q1,
       floor(quantile_cont(v, 0.5) * 10000.0 + 0.5) / 10000.0 AS q2,
       floor(quantile_cont(v, 0.75) * 10000.0 + 0.5) / 10000.0 AS q3,
       floor(max(v) * 10000.0 + 0.5) / 10000.0 AS max
FROM mt
"""


def _facet_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES string_stats agg over the text field of the 'spark' match set
    (count / min / max / avg length + base-2 Shannon entropy of the char
    distribution)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_string_stats(matches, docs, "text")
    return out.select(
        "count", "min_length", "max_length",
        _f4("avg_length").alias("avg_length"),
        _f4("entropy").alias("entropy"),
    )


_FACET_STRING_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.text AS v FROM documents d JOIN m USING (doc_id)),
chars AS (
  SELECT ch, count(*)::DOUBLE AS n
  FROM (SELECT unnest(string_split(v, '')) AS ch FROM mt)
  WHERE length(ch) > 0 GROUP BY ch
),
ent AS (
  SELECT log2(sum(n)) - sum(n * log2(n)) / sum(n) AS entropy FROM chars
)
SELECT count(*)::BIGINT AS count,
       min(length(v))::INT AS min_length,
       max(length(v))::INT AS max_length,
       floor(avg(length(v)) * 10000.0 + 0.5) / 10000.0 AS avg_length,
       floor(ent.entropy * 10000.0 + 0.5) / 10000.0 AS entropy
FROM mt, ent GROUP BY ent.entropy
"""


def _facet_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES t_test agg (Welch's): click vs view event values."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    out = OFA.facet_t_test(
        ev, "value",
        F.col("event_type") == "click", F.col("event_type") == "view",
    )
    return out.select(
        _f4("ma").alias("ma"), _f4("mb").alias("mb"), "na", "nb",
        _f4("t_value").alias("t_value"),
    )


_FACET_TTEST_SQL = """
WITH s AS (
  SELECT avg(value) FILTER (event_type = 'click') AS ma,
         var_samp(value) FILTER (event_type = 'click') AS va,
         count(value) FILTER (event_type = 'click') AS na,
         avg(value) FILTER (event_type = 'view') AS mb,
         var_samp(value) FILTER (event_type = 'view') AS vb,
         count(value) FILTER (event_type = 'view') AS nb
  FROM events
)
SELECT floor(ma * 10000.0 + 0.5) / 10000.0 AS ma,
       floor(mb * 10000.0 + 0.5) / 10000.0 AS mb,
       na, nb,
       floor((ma - mb) / sqrt(va / na + vb / nb) * 10000.0 + 0.5) / 10000.0
         AS t_value
FROM s
"""


def _facet_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rate agg: per calendar month of click events, sum(value)
    rescaled to a per-day rate by that month's actual day count."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_rate(
        matches, ev, "ts", "value", bucket_unit="month", rate_unit="day",
        id_col="event_id",
    )
    return out.select(
        "bucket", _f4("total").alias("total"), _f4("rate").alias("rate")
    )


_FACET_RATE_SQL = """
WITH m AS (SELECT ts, value FROM events WHERE event_type = 'click'),
h AS (
  SELECT date_trunc('month', ts) AS bucket, sum(value) AS total
  FROM m GROUP BY 1
)
SELECT bucket,
       floor(total * 10000.0 + 0.5) / 10000.0 AS total,
       floor(total / date_part('day', last_day(bucket::DATE))
             * 10000.0 + 0.5) / 10000.0 AS rate
FROM h ORDER BY bucket ASC
"""


def _facet_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_bounds agg: the bounding box of the click events'
    points."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = _geo_events(spark, sf_dir)
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_geo_bounds(matches, ev, "lat", "lon", id_col="event_id")
    return out.select(
        _f4("top_left_lat").alias("top_left_lat"),
        _f4("top_left_lon").alias("top_left_lon"),
        _f4("bottom_right_lat").alias("bottom_right_lat"),
        _f4("bottom_right_lon").alias("bottom_right_lon"),
    )


_FACET_GEO_BOUNDS_SQL = f"""
WITH g AS (
  SELECT ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events WHERE event_type = 'click'
)
SELECT floor(max(lat) * 10000.0 + 0.5) / 10000.0 AS top_left_lat,
       floor(min(lon) * 10000.0 + 0.5) / 10000.0 AS top_left_lon,
       floor(min(lat) * 10000.0 + 0.5) / 10000.0 AS bottom_right_lat,
       floor(max(lon) * 10000.0 + 0.5) / 10000.0 AS bottom_right_lon
FROM g
"""


# ---------------------------------------------------------------------------
# round-3 batch 7b: bucketing / sampling / pipeline aggregations
# ---------------------------------------------------------------------------

_DATE_RANGE_EDGES = [
    "2024-01-08 00:00:00", "2024-01-15 00:00:00", "2024-01-22 00:00:00",
]


def _facet_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_range agg: weekly half-open buckets over the click
    events, open ends, empty buckets kept."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_date_range(
        matches, ev, "ts", _DATE_RANGE_EDGES, id_col="event_id"
    )


def _facet_date_range_sql() -> str:
    e = [f"TIMESTAMP '{x}'" for x in _DATE_RANGE_EDGES]
    return f"""
WITH m AS (SELECT ts FROM events WHERE event_type = 'click'),
ranges(bidx, bucket_lo, bucket_hi) AS (VALUES
  (0, NULL::TIMESTAMP, {e[0]}), (1, {e[0]}, {e[1]}),
  (2, {e[1]}, {e[2]}), (3, {e[2]}, NULL::TIMESTAMP)
)
SELECT r.bucket_lo, r.bucket_hi,
       (SELECT count(*) FROM m
        WHERE (r.bucket_lo IS NULL OR m.ts >= r.bucket_lo)
          AND (r.bucket_hi IS NULL OR m.ts < r.bucket_hi))::BIGINT
         AS doc_count
FROM ranges r ORDER BY bucket_lo ASC NULLS FIRST
"""


_IP_SQL = (
    "concat((user_id * 7) % 256, '.', (user_id * 13) % 256, '.', "
    "(user_id * 29) % 256, '.', user_id % 256)"
)
_IP_EDGES = ["64.0.0.0", "128.0.0.0", "192.0.0.0"]


def _facet_ip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ip_range agg over a deterministically derived IPv4 column
    (both engines derive the same dotted quad from user_id)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events").withColumn(
        "ip",
        F.concat_ws(
            ".",
            (F.col("user_id") * 7) % 256,
            (F.col("user_id") * 13) % 256,
            (F.col("user_id") * 29) % 256,
            F.col("user_id") % 256,
        ),
    )
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_ip_range(matches, ev, "ip", _IP_EDGES, id_col="event_id")


def _facet_ip_range_sql() -> str:
    def key(ip: str) -> int:
        a, b, c, d = (int(x) for x in ip.split("."))
        return ((a * 256 + b) * 256 + c) * 256 + d

    e = _IP_EDGES
    return f"""
WITH m AS (
  SELECT (string_split({_IP_SQL}, '.')[1]::BIGINT * 16777216
        + string_split({_IP_SQL}, '.')[2]::BIGINT * 65536
        + string_split({_IP_SQL}, '.')[3]::BIGINT * 256
        + string_split({_IP_SQL}, '.')[4]::BIGINT) AS ipn
  FROM events WHERE event_type = 'click'
),
ranges(bidx, bucket_lo, bucket_hi, lo_n, hi_n) AS (VALUES
  (0, NULL, '{e[0]}', NULL::BIGINT, {key(e[0])}),
  (1, '{e[0]}', '{e[1]}', {key(e[0])}, {key(e[1])}),
  (2, '{e[1]}', '{e[2]}', {key(e[1])}, {key(e[2])}),
  (3, '{e[2]}', NULL, {key(e[2])}, NULL::BIGINT)
)
SELECT r.bucket_lo, r.bucket_hi,
       (SELECT count(*) FROM m
        WHERE (r.lo_n IS NULL OR m.ipn >= r.lo_n)
          AND (r.hi_n IS NULL OR m.ipn < r.hi_n))::BIGINT AS doc_count
FROM ranges r ORDER BY bucket_lo ASC NULLS FIRST
"""


_GEOHASH_PRECISION = 3


def _facet_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geohash_grid agg: click events per geohash cell (precision 3)
    — the cell expression is ONE engine-portable SQL string evaluated by
    both Spark (F.expr) and the DuckDB oracle."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = _geo_events(spark, sf_dir)
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_geohash_grid(
        matches, ev, "lat", "lon", precision=_GEOHASH_PRECISION,
        id_col="event_id",
    )


def _facet_geohash_sql() -> str:
    from elasticsearch_assets_spark.operators.facets import geohash_sql

    cell = geohash_sql("lat", "lon", _GEOHASH_PRECISION)
    return f"""
WITH g AS (
  SELECT ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events WHERE event_type = 'click'
)
SELECT {cell} AS bucket, count(*)::BIGINT AS doc_count
FROM g GROUP BY 1 ORDER BY doc_count DESC, bucket ASC
"""


_DIV_SHARD = 50
_DIV_MAX_PER = 5


def _facet_div_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES diversified_sampler agg (deterministic md5 variant): at most 5
    docs per lang, md5-smallest 50 overall, then source term counts."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return OFA.facet_diversified_sampler(
        matches, docs, "lang", "source",
        shard_size=_DIV_SHARD, max_docs_per_value=_DIV_MAX_PER,
    )


_FACET_DIV_SAMPLER_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
ranked AS (
  SELECT d.doc_id, d.lang, d.source, md5(d.doc_id::VARCHAR) AS h,
         row_number() OVER (
           PARTITION BY d.lang ORDER BY md5(d.doc_id::VARCHAR) ASC
         ) AS rn
  FROM documents d JOIN m USING (doc_id)
),
sample AS (
  SELECT * FROM ranked WHERE rn <= {_DIV_MAX_PER}
  ORDER BY h ASC LIMIT {_DIV_SHARD}
)
SELECT source AS bucket, count(*)::BIGINT AS doc_count
FROM sample GROUP BY 1 ORDER BY doc_count DESC, bucket ASC
"""


def _facet_serial_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES serial_diff + normalize pipeline aggs over a daily
    date_histogram of sum(value) on the click events."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_serial_diff(
        matches, ev, "ts", "value", interval="day", lag=1, id_col="event_id"
    )
    return out.select(
        "bucket", _f4("value").alias("value"), _f4("diff").alias("diff"),
        _f4("pct_of_sum").alias("pct_of_sum"),
    )


_FACET_SERIAL_DIFF_SQL = """
WITH m AS (SELECT ts, value FROM events WHERE event_type = 'click'),
h AS (
  SELECT date_trunc('day', ts) AS bucket, sum(value) AS value
  FROM m GROUP BY 1
)
SELECT bucket,
       floor(value * 10000.0 + 0.5) / 10000.0 AS value,
       floor((value - lag(value, 1) OVER (ORDER BY bucket ASC))
             * 10000.0 + 0.5) / 10000.0 AS diff,
       floor(value * 100.0 / sum(value) OVER () * 10000.0 + 0.5) / 10000.0
         AS pct_of_sum
FROM h ORDER BY bucket ASC
"""


def _facet_cum_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cumulative_cardinality pipeline agg: running count of distinct
    users per day over all events."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    return OFA.facet_cumulative_cardinality(
        ev.select("event_id"), ev, "ts", "user_id", interval="day",
        id_col="event_id",
    )


_FACET_CUM_CARD_SQL = """
WITH firsts AS (
  SELECT user_id, min(date_trunc('day', ts)) AS bucket
  FROM events GROUP BY 1
),
nk AS (SELECT bucket, count(*)::BIGINT AS new_keys FROM firsts GROUP BY 1),
b AS (SELECT DISTINCT date_trunc('day', ts) AS bucket FROM events)
SELECT b.bucket, coalesce(nk.new_keys, 0) AS new_keys,
       sum(coalesce(nk.new_keys, 0))
         OVER (ORDER BY b.bucket ASC)::BIGINT AS cumulative_cardinality
FROM b LEFT JOIN nk USING (bucket)
ORDER BY b.bucket ASC
"""


def _facet_bucket_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_sort pipeline agg: event_type buckets by sum(value),
    page from=1 size=2."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    out = OFA.facet_bucket_sort(
        ev.select("event_id"), ev, "event_type", "value",
        size=2, from_=1, id_col="event_id",
    )
    return out.select("bucket", "doc_count", _f4("total").alias("total"))


_FACET_BUCKET_SORT_SQL = """
WITH h AS (
  SELECT event_type AS bucket, count(*)::BIGINT AS doc_count,
         sum(value) AS total
  FROM events GROUP BY 1
),
r AS (
  SELECT *, row_number() OVER (ORDER BY total DESC, bucket ASC) AS rn
  FROM h
)
SELECT bucket, doc_count,
       floor(total * 10000.0 + 0.5) / 10000.0 AS total
FROM r WHERE rn > 1 AND rn <= 3
ORDER BY total DESC, bucket ASC
"""

_SIG_TEXT_SAMPLE = 100


def _facet_sig_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_text agg: significant terms re-analyzed from a
    deterministic 100-doc sample of the 'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_significant_text(
        matches, docs, n=10, sample_size=_SIG_TEXT_SAMPLE
    )
    return out.select(
        "term", "fg_df", "bg_df", _f4("score").alias("score")
    )


_FACET_SIG_TEXT_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m0 AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
m AS (
  SELECT doc_id FROM m0 ORDER BY md5(doc_id::VARCHAR) ASC
  LIMIT {_SIG_TEXT_SAMPLE}
),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM documents),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  GROUP BY term HAVING count(*) >= 3
),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY term)
SELECT term, fg_df, bg_df,
       floor((fg_df / fg_total.n) / (bg_df / bg_total.n) * 10000.0 + 0.5)
         / 10000.0 AS score
FROM fg JOIN bg USING (term), fg_total, bg_total
ORDER BY (fg_df / fg_total.n) / (bg_df / bg_total.n) DESC, term ASC
LIMIT 10
"""

_VWH_BUCKETS = 4


def _facet_vw_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES variable_width_histogram (deterministic equal-frequency
    variant): 4 quantile-split clusters of n_chars over the 'spark'
    match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_variable_width_histogram(
        matches, docs, "n_chars", _VWH_BUCKETS
    )
    return out.select(
        F.col("bucket").cast("long").alias("bucket"),
        _f4("min").alias("min"), _f4("max").alias("max"),
        _f4("avg").alias("avg"), "doc_count",
    )


_FACET_VWH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
mt AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN m USING (doc_id)),
e AS (
  SELECT quantile_cont(v, 0.25) AS e1, quantile_cont(v, 0.5) AS e2,
         quantile_cont(v, 0.75) AS e3
  FROM mt
)
SELECT ((v >= e.e1)::INT + (v >= e.e2)::INT + (v >= e.e3)::INT)::BIGINT
         AS bucket,
       floor(min(v) * 10000.0 + 0.5) / 10000.0 AS min,
       floor(max(v) * 10000.0 + 0.5) / 10000.0 AS max,
       floor(avg(v) * 10000.0 + 0.5) / 10000.0 AS avg,
       count(*)::BIGINT AS doc_count
FROM mt, e GROUP BY 1 ORDER BY bucket ASC
"""


# ---------------------------------------------------------------------------
# round-3 batch 8: span algebra, intervals query, simple_query_string
# ---------------------------------------------------------------------------

_PTOKS_ONLY_CTE = """ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
)"""


def _bm25_span_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_or: ordered near(table, hash, slop 3) OR term(merge);
    BM25 over the distinct involved terms restricted to matching docs
    (the engine's span-composition contract)."""
    idx = _docs_index_pos(spark, sf_dir)
    out = idx.search_span_or(
        [("near", "table", "hash", 3, True), ("term", "merge")], k=None
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_BM25_SPAN_OR_SQL = f"""
WITH {_PTOKS_ONLY_CTE},
{_bm25_body("term IN ('hash', 'merge', 'table')")},
nearm AS (
  SELECT DISTINCT a.doc_id FROM ptoks a
  JOIN ptoks b ON a.doc_id = b.doc_id
  WHERE a.term = 'table' AND b.term = 'hash'
    AND b.pos > a.pos AND b.pos - a.pos <= 3
),
orm AS (
  SELECT doc_id FROM nearm
  UNION
  SELECT DISTINCT doc_id FROM ptoks WHERE term = 'merge'
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM orm)
"""


def _bm25_span_containing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_containing: an ordered near(table, hash, slop 6) span
    enclosing an occurrence of merge."""
    idx = _docs_index_pos(spark, sf_dir)
    out = idx.search_span_containing(
        ("near", "table", "hash", 6, True), ("term", "merge"), k=None
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_BM25_SPAN_CONTAINING_SQL = f"""
WITH {_PTOKS_ONLY_CTE},
{_bm25_body("term IN ('hash', 'merge', 'table')")},
m AS (
  SELECT DISTINCT a.doc_id FROM ptoks a
  JOIN ptoks b ON a.doc_id = b.doc_id
  JOIN ptoks c ON c.doc_id = a.doc_id
  WHERE a.term = 'table' AND b.term = 'hash' AND c.term = 'merge'
    AND b.pos > a.pos AND b.pos - a.pos <= 6
    AND c.pos >= a.pos AND c.pos <= b.pos
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM m)
"""

_INTERVALS_TERMS = ["spark", "query", "table"]
_INTERVALS_GAPS = 8


def _bm25_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES intervals query (ordered match, max_gaps): spark … query …
    table in order with ≤ 8 interleaved positions."""
    idx = _docs_index_pos(spark, sf_dir)
    out = idx.search_intervals(
        _INTERVALS_TERMS, max_gaps=_INTERVALS_GAPS, k=None
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_intervals_sql() -> str:
    t1, t2, t3 = _INTERVALS_TERMS
    tlist = ", ".join(f"'{t}'" for t in sorted(_INTERVALS_TERMS))
    return f"""
WITH {_PTOKS_ONLY_CTE},
{_bm25_body(f"term IN ({tlist})")},
m AS (
  SELECT DISTINCT a.doc_id FROM ptoks a
  JOIN ptoks b ON b.doc_id = a.doc_id AND b.pos > a.pos
  JOIN ptoks c ON c.doc_id = a.doc_id AND c.pos > b.pos
  WHERE a.term = '{t1}' AND b.term = '{t2}' AND c.term = '{t3}'
    AND c.pos - a.pos - 2 <= {_INTERVALS_GAPS}
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM m)
"""


_SQS_QUERY = "spark tab* jo|scan -merge"


def _sqs_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES simple_query_string, default_operator=and: every clause must
    match (prefix + alternation clauses group-wise), -merge excluded
    index-assisted."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_simple_query_string(
        _SQS_QUERY, k=None, default_operator="and"
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_SQS_SQL = f"""
WITH {_bm25_body(
    "(term IN ('jo', 'scan', 'spark') OR term LIKE 'tab%')"
)},
g1 AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
g2 AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'tab%'),
g3 AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ('jo', 'scan')),
neg AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')
SELECT s.doc_id, round(s.s, 4) AS score
FROM scored s
JOIN g1 USING (doc_id) JOIN g2 USING (doc_id) JOIN g3 USING (doc_id)
WHERE s.doc_id NOT IN (SELECT doc_id FROM neg)
"""


def _sqs_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES simple_query_string, default_operator=or: scored union with a
    negated clause."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_simple_query_string(
        "spark scan -merge", k=None, default_operator="or"
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_SQS_OR_SQL = _bm25_sql(
    ["spark", "scan"], "or", None,
    where=(
        "doc_id NOT IN "
        "(SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')"
    ),
)


# ---------------------------------------------------------------------------
# round-3 batch 9: PII scrubbing (training-data pipeline)
# ---------------------------------------------------------------------------


def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over a salted corpus: both engines append the
    SAME deterministic PII fragments (email on doc_id%3, phone on %2,
    SSN on %5, IP on %7) to the clean synthetic text, then scrub."""
    from elasticsearch_assets_spark.operators.textstats import pii_scrub

    docs = load_sf_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    piece = lambda cond, col: F.when(cond, col).otherwise(F.lit(""))  # noqa: E731
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            piece(
                did % 3 == 0,
                F.concat(F.lit(" u"), did.cast("string"), F.lit("@example.com")),
            ),
            piece(
                did % 2 == 0,
                F.concat(
                    F.lit(" 555-123-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ),
            piece(
                did % 5 == 0,
                F.concat(
                    F.lit(" 123-45-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ),
            piece(
                did % 7 == 0,
                F.concat(
                    F.lit(" 10.0."), (did % 256).cast("string"), F.lit(".1")
                ),
            ),
        ).alias("text"),
    )
    return pii_scrub(salted)


def _pii_scrub_sql() -> str:
    from elasticsearch_assets_spark.operators.textstats import pii_scrub_sql

    inner = pii_scrub_sql("text", "doc_id")
    salted = """
SELECT doc_id,
  text
  || CASE WHEN doc_id % 3 = 0
       THEN ' u' || doc_id || '@example.com' ELSE '' END
  || CASE WHEN doc_id % 2 = 0
       THEN ' 555-123-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
       ELSE '' END
  || CASE WHEN doc_id % 5 = 0
       THEN ' 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
       ELSE '' END
  || CASE WHEN doc_id % 7 = 0
       THEN ' 10.0.' || (doc_id % 256) || '.1' ELSE '' END
  AS text
FROM documents
"""
    return inner.replace("FROM documents", f"FROM ({salted})")


# ---------------------------------------------------------------------------
# round-3 batch 10: combined_fields (BM25F)
# ---------------------------------------------------------------------------

_CF_TERMS = ["spark", "table"]
_CF_TITLE_W = 2.0


def _combined_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES combined_fields (Lucene CombinedFieldQuery / BM25F): text w=1
    and the derived 8-token title w=2 scored as ONE synthetic field —
    tf/dl combine weighted, df is any-field presence."""
    from elasticsearch_assets_spark.query.engine import combined_fields

    idx = _docs_index(spark, sf_dir)
    tidx = _docs_index_title(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "title",
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, _TITLE_TOKENS)),
    )
    out = combined_fields(
        {"text": (idx, 1.0), "title": (tidx, _CF_TITLE_W)},
        docs,
        {"text": "text", "title": "title"},
        _CF_TERMS,
        k=None,
        mode="or",
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _combined_fields_sql() -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(set(_CF_TERMS)))
    w = _CF_TITLE_W
    return f"""
WITH toksA AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
toksB AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:{_TITLE_TOKENS}]) AS term
  FROM documents
),
u AS (
  SELECT term, doc_id, count(*)::DOUBLE * 1.0 AS wtf FROM toksA
  WHERE term IN ({tlist}) GROUP BY term, doc_id
  UNION ALL
  SELECT term, doc_id, count(*)::DOUBLE * {w} AS wtf FROM toksB
  WHERE term IN ({tlist}) GROUP BY term, doc_id
),
tfc AS (SELECT term, doc_id, sum(wtf) AS tfc FROM u GROUP BY 1, 2),
dfc AS (SELECT term, count(*)::DOUBLE AS dfc FROM tfc GROUP BY 1),
lens AS (
  SELECT doc_id,
         len(string_split(text, ' ')) * 1.0
           + least(len(string_split(text, ' ')), {_TITLE_TOKENS}) * {w}
           AS dlc
  FROM documents
),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dlc) AS avgdl FROM lens),
scored AS (
  SELECT tfc.doc_id,
         sum( ln(1 + (stats.n - dfc.dfc + 0.5) / (dfc.dfc + 0.5))
              * tfc.tfc * ({K1} + 1)
              / (tfc.tfc + {K1} * (1 - {B} + {B} * lens.dlc / stats.avgdl)) )
           AS s
  FROM stats, tfc
  JOIN dfc USING (term) JOIN lens USING (doc_id)
  GROUP BY tfc.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored
"""


# ---------------------------------------------------------------------------
# round-3 batch 10b: geo_polygon query
# ---------------------------------------------------------------------------

_POLY = [
    (60.0, -120.0), (70.0, 30.0), (0.0, 150.0), (-60.0, 60.0), (-50.0, -90.0),
]


def _geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_polygon query: events inside a 5-vertex polygon — the
    even-odd ray cast as ONE portable SQL expression shared verbatim
    with the oracle (operators/geo.py point_in_polygon_sql)."""
    from elasticsearch_assets_spark.operators.geo import polygon_predicate

    ev = _geo_events(spark, sf_dir)
    return ev.where(polygon_predicate("lat", "lon", _POLY)).select(
        "event_id", "lat", "lon"
    )


def _geo_polygon_sql() -> str:
    from elasticsearch_assets_spark.operators.geo import point_in_polygon_sql

    pred = point_in_polygon_sql("lat", "lon", _POLY)
    return f"""
WITH g AS (
  SELECT event_id, ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events
)
SELECT event_id, lat, lon FROM g WHERE {pred}
"""


# ---------------------------------------------------------------------------
# round-3 batch 10c: URL canonicalization + URL-level dedup
# ---------------------------------------------------------------------------

# three surface variants of the same logical URL (case/port/fragment/
# trailing slash) — both engines derive the identical strings
_URL_DERIVE_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN "
    "'HTTP://Site' || (doc_id % 100) || '.COM:80/p/' || (doc_id % 20) "
    "|| '#frag' "
    "WHEN doc_id % 3 = 1 THEN "
    "'http://site' || (doc_id % 100) || '.com/p/' || (doc_id % 20) || '/' "
    "ELSE 'http://SITE' || (doc_id % 100) || '.com/p/' || (doc_id % 20) END"
)


_URLQ_DERIVE_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN "
    "'http://spam' || (doc_id % 7) || '.tracker.net/p/' || doc_id "
    "WHEN doc_id % 5 = 1 THEN "
    "'http://site' || (doc_id % 9) || '.com/feed/' || doc_id || '.xml' "
    "WHEN doc_id % 5 = 2 THEN 'http://site.com/a/b/c/d/e/f/g/' || doc_id "
    "WHEN doc_id % 5 = 3 THEN "
    "'http://site.org/p?q=' || repeat('x', CAST(doc_id % 100 AS INT)) "
    "ELSE 'http://ok.org/page/' || doc_id END"
)
_URLQ_BLOCKED = ["tracker.net"]


def _url_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style URL pre-filters (urls.url_quality_flags):
    domain blocklist, extension blocklist, crawler-trap path depth,
    oversized querystring, and the combined keep flag — shared-SQL-text
    expressions, zero shuffle, evaluated before any content fetch."""
    from elasticsearch_assets_spark.operators.urls import url_quality_flags

    docs = load_sf_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URLQ_DERIVE_SQL).alias("url")
    )
    out = url_quality_flags(docs, "url", _URLQ_BLOCKED)
    return out.select(
        "doc_id", "blocked_domain", "bad_ext", "deep_path", "long_query",
        "keep",
    ).orderBy("doc_id")


def _url_quality_sql() -> str:
    from elasticsearch_assets_spark.operators.urls import url_quality_sql

    f = url_quality_sql("url", _URLQ_BLOCKED)
    return f"""
WITH u AS (SELECT doc_id, {_URLQ_DERIVE_SQL} AS url FROM documents)
SELECT doc_id,
       {f['blocked_domain']} AS blocked_domain,
       {f['bad_ext']} AS bad_ext,
       {f['deep_path']} AS deep_path,
       {f['long_query']} AS long_query,
       {f['keep']} AS keep
FROM u ORDER BY doc_id
"""


def _url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup (CCNet/C4 first pass): canonicalize (case,
    default port, fragment, trailing slash) then keep-first per
    canonical URL — one hash agg keyed by the canonical string."""
    from elasticsearch_assets_spark.operators.urls import dedup_by_url

    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_DERIVE_SQL)
    )
    return dedup_by_url(docs, "url")


def _url_dedup_sql() -> str:
    from elasticsearch_assets_spark.operators.urls import canonical_url_sql

    canon = canonical_url_sql("url")
    return f"""
WITH u AS (SELECT doc_id, {_URL_DERIVE_SQL} AS url FROM documents)
SELECT {canon} AS canonical_url, min(doc_id) AS keep_id,
       count(*)::BIGINT AS n_copies
FROM u GROUP BY 1 ORDER BY canonical_url ASC
"""


# ---------------------------------------------------------------------------
# round-3 batch 10d: exact-substring duplicate spans (Lee et al.)
# ---------------------------------------------------------------------------

_DSPAN_L = 8


def _dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate regions: maximal merged spans of 8-token
    windows occurring ≥ 2 times corpus-wide (operators/dedup.py
    duplicate_spans)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.duplicate_spans(docs, L=_DSPAN_L)


_DUP_SPANS_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(tk[i : i + {_DSPAN_L - 1}], ' ')) AS h
  FROM t, unnest(range(1, len(tk) - {_DSPAN_L} + 2)) AS g(i)
  WHERE len(tk) >= {_DSPAN_L}
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS n FROM w
  ) WHERE n >= 2
),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {_DSPAN_L}
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (
    SELECT doc_id, pos,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM marked
  )
)
SELECT doc_id, min(pos)::INT AS span_start,
       (max(pos) + {_DSPAN_L})::INT AS span_end,
       (max(pos) + {_DSPAN_L} - min(pos))::INT AS span_len
FROM isl GROUP BY doc_id, island
ORDER BY doc_id ASC, span_start ASC
"""


# ---------------------------------------------------------------------------
# round-3 batch 10e: update_by_query + significance heuristics
# ---------------------------------------------------------------------------


def _update_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _update_by_query: docs matching 'spark' get n_chars doubled
    and lang rewritten; everyone else untouched — one conditional
    projection over the corpus."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.update_by_query(
        docs, ["spark"], {"n_chars": "n_chars * 2", "lang": "'xx'"}
    )
    return out.select("doc_id", "lang", "n_chars")


_UPDATE_BY_QUERY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT doc_id,
       CASE WHEN doc_id IN (SELECT doc_id FROM m) THEN 'xx' ELSE lang END
         AS lang,
       CASE WHEN doc_id IN (SELECT doc_id FROM m) THEN n_chars * 2
            ELSE n_chars END AS n_chars
FROM documents
"""


def _sigterms_jlh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms with the JLH heuristic ((fgp−bgp)·(fgp/bgp))
    over the 'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.significant_terms(matches, docs, n=10, heuristic="jlh")
    return out.select("term", "fg_df", "bg_df", _f4("score").alias("score"))


_SIGTERMS_JLH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM documents),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  GROUP BY term HAVING count(*) >= 3
),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY term),
s AS (
  SELECT term, fg_df, bg_df,
         (fg_df / fg_total.n - bg_df / bg_total.n)
           * ((fg_df / fg_total.n) / (bg_df / bg_total.n)) AS score
  FROM fg JOIN bg USING (term), fg_total, bg_total
)
SELECT term, fg_df, bg_df,
       floor(score * 10000.0 + 0.5) / 10000.0 AS score
FROM s ORDER BY s.score DESC, term ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# round-3 batch 11: document relations (has_child / has_parent / nested)
# ---------------------------------------------------------------------------


def _has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_child (min_children=3): customers with ≥ 3 orders over
    100k — child side filtered + ONE hash agg on the parent key."""
    from elasticsearch_assets_spark.operators import relations as OR

    cust = load_sf_table(spark, sf_dir, "customer")
    orders = load_sf_table(spark, sf_dir, "orders")
    return OR.has_child(
        cust, orders, "c_custkey", "o_custkey",
        F.col("o_totalprice") > 100000.0, min_children=3,
    )


_HAS_CHILD_SQL = """
SELECT c.c_custkey, count(*)::BIGINT AS n_matching
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 100000.0
GROUP BY 1 HAVING count(*) >= 3
ORDER BY c.c_custkey ASC
"""


def _has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_parent: orders whose customer is in the BUILDING segment
    — semi join against the broadcast-able matching-parent keys."""
    from elasticsearch_assets_spark.operators import relations as OR

    cust = load_sf_table(spark, sf_dir, "customer")
    orders = load_sf_table(spark, sf_dir, "orders")
    return OR.has_parent(
        cust, orders, "c_custkey", "o_custkey",
        F.col("c_mktsegment") == "BUILDING",
        child_cols=["o_orderkey", "o_custkey", "o_totalprice"],
    )


_HAS_PARENT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
"""

_NESTED_TERMS = ["spark", "join"]
_NESTED_N = 10


def _nested_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested query semantics: docs where a single 10-token nested
    object contains BOTH terms (a flattened AND is wrong exactly when
    the terms only co-occur across different objects — the reason the
    nested type exists)."""
    from elasticsearch_assets_spark.operators import relations as OR

    docs = load_sf_table(spark, sf_dir, "documents")
    return docs.where(
        OR.nested_co_match("text", _NESTED_TERMS, n=_NESTED_N)
    ).select("doc_id")


def _nested_match_sql() -> str:
    conds = " AND ".join(
        f"list_contains(tk[i : i + {_NESTED_N - 1}], '{t}')"
        for t in _NESTED_TERMS
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
SELECT DISTINCT doc_id FROM t,
  unnest(range(1, greatest(len(tk), 1) + 1, {_NESTED_N})) AS g(i)
WHERE {conds}
ORDER BY doc_id ASC
"""


def _facet_moving_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_percentiles: trailing-7-day median of daily click value
    sums."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_moving_percentiles(
        matches, ev, "ts", "value", "day", window=7, percent=50.0,
        id_col="event_id",
    )
    return out.select(
        "bucket", _f4("value").alias("value"),
        _f4("moving_pct").alias("moving_pct"),
    )


_FACET_MOVING_PCT_SQL = """
WITH m AS (SELECT ts, value FROM events WHERE event_type = 'click'),
h AS (
  SELECT date_trunc('day', ts) AS bucket, sum(value) AS value
  FROM m GROUP BY 1
)
SELECT bucket,
       floor(value * 10000.0 + 0.5) / 10000.0 AS value,
       floor(quantile_cont(value, 0.5) OVER (
               ORDER BY bucket ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
             ) * 10000.0 + 0.5) / 10000.0 AS moving_pct
FROM h ORDER BY bucket ASC
"""


def _facet_scripted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES scripted_metric: sum of a per-doc script value
    (n_chars * ln(1 + n_chars)) over the 'spark' match set — map script
    as a SQL expression, combine/reduce as the partial aggregation."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_scripted_metric(
        matches, docs, "n_chars * ln(1 + n_chars)", combine="sum"
    )
    return out.select(_f4("value").alias("value"))


_FACET_SCRIPTED_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT floor(sum(d.n_chars * ln(1 + d.n_chars)) * 10000.0 + 0.5) / 10000.0
         AS value
FROM documents d JOIN m USING (doc_id)
"""


_MSEARCH_SPECS = [
    {"query": ["spark", "join"], "mode": "and", "k": 10},
    {"query": ["hash", "merge"], "mode": "or", "k": 8},
    {
        "query": ["table", "scan", "batch"],
        "mode": "or",
        "min_should_match": 2,
        "k": 12,
    },
]


def _msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _msearch: M heterogeneous queries answered by ONE fused segment
    scan — each segment's postings decoded once, every query's kernel run
    against the same dict (engine.msearch; per-query results bit-identical
    to search() alone, tested). At 10^12 docs M queries cost ~1 scan."""
    idx = _docs_index(spark, sf_dir)
    out = idx.msearch(_MSEARCH_SPECS)
    return out.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )


def _msearch_sql() -> str:
    parts = []
    for qid, s in enumerate(_MSEARCH_SPECS):
        sub = _bm25_sql(
            s["query"], s.get("mode", "and"), s["k"],
            min_match=s.get("min_should_match"),
        )
        parts.append(f"SELECT {qid} AS query_id, * FROM ({sub})")
    return " UNION ALL ".join(parts)


def _esql_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL NOW() + date-span arithmetic: `ts >= NOW() - 5 days` with a
    PINNED now (implicit wall clock is rejected — the engine's
    determinism contract); the span compiles to an INTERVAL literal the
    same way in both engines, and the range predicate pushes to the
    scan."""
    import datetime as _dt

    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | WHERE ts >= NOW() - 5 days AND ts < NOW() - 2 days"
        " | STATS n = count(*), v = sum(value)"
        " BY d = DATE_FORMAT('yyyy-MM-dd', ts)"
        " | SORT d",
        spark=spark, sf_dir=sf_dir,
        now=_dt.datetime(2024, 1, 20, 0, 0, 0),
    )
    return out.select("d", "n", _f4("v").alias("v"))


_ESQL_NOW_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS d, count(*)::BIGINT AS n,
       floor(sum(value) * 1e4 + 0.5) / 1e4 AS v
FROM events
WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 5 DAY
  AND ts < TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 2 DAY
GROUP BY 1 ORDER BY d
"""


def _span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span corruption, deterministic blockwise variant: hash-cut
    block masking (no RNG — byte-identical pairs across engines, runs,
    and resumes), <extra_id_k> sentinels in reading order, targets =
    sentinels + masked tokens (textstats.span_corruption; zero
    shuffle)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.span_corruption(docs)


def _curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order (Bengio et al. 2009): deterministic
    md5-cut shard assignment (4 shards) + easy-to-hard (n_chars ASC)
    position within each shard — one JVM shard expression + one window
    per shard, no global sort (sampling.curriculum_order)."""
    from elasticsearch_assets_spark.operators.sampling import (
        curriculum_order,
    )

    docs = load_sf_table(spark, sf_dir, "documents")
    return curriculum_order(docs, "n_chars", 4)


_CURRICULUM_SQL = """
WITH s AS (
  SELECT doc_id, n_chars,
    CASE WHEN substr(md5('cur|' || doc_id::VARCHAR), 1, 8) >= 'c0000000' THEN 3
         WHEN substr(md5('cur|' || doc_id::VARCHAR), 1, 8) >= '80000000' THEN 2
         WHEN substr(md5('cur|' || doc_id::VARCHAR), 1, 8) >= '40000000' THEN 1
         ELSE 0 END AS shard
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard
                          ORDER BY n_chars ASC, doc_id ASC) AS position
FROM s
"""


def _fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al. 2022):
    deterministic multiplicative-hash cut points + md5-cut PSM/SPM mode
    (50/50 joint training) — byte-identical across engines/runs/resumes,
    zero shuffle (textstats.fim_transform)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.fim_transform(docs)


_HN_QUERIES = [(0, ["spark", "join"]), (1, ["query", "scan"]), (2, ["data", "web"])]
_HN_K, _HN_DEPTH = 5, 20


def _hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training (DPR): per query, the
    top-k BM25 docs that are NOT its labeled positives (here: the
    query's own top-2, so the anti-join removes genuinely high-ranked
    docs). All queries ride ONE fused msearch scan at depth 20; the
    positives remove by broadcast left-anti; one window re-ranks
    (operators/mining.mine_hard_negatives)."""
    from elasticsearch_assets_spark.operators.mining import (
        mine_hard_negatives,
    )

    idx = _docs_index(spark, sf_dir)
    positives = idx.msearch(
        [{"query": t, "mode": "or", "k": 2} for _, t in _HN_QUERIES]
    ).select("query_id", "doc_id")
    out = mine_hard_negatives(
        idx, _HN_QUERIES, positives, k=_HN_K, depth=_HN_DEPTH, mode="or"
    )
    return out.select(
        "query_id", "doc_id", F.round("score", 4).alias("score"), "rank"
    )


def _hard_negatives_sql() -> str:
    parts = []
    for i, (qid, terms) in enumerate(_HN_QUERIES):
        tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
        body = _bm25_body(f"term IN ({tlist})")
        parts.append(
            f"q{i} AS (\n  WITH {body}\n"
            f"  SELECT {qid} AS query_id, doc_id, s FROM scored\n"
            f"  ORDER BY s DESC, doc_id ASC LIMIT {_HN_DEPTH}\n)"
        )
    blocks = ",\n".join(parts)
    union = " UNION ALL ".join(
        f"SELECT * FROM q{i}" for i in range(len(_HN_QUERIES))
    )
    return f"""
WITH {blocks},
u AS ({union}),
pos AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, doc_id ASC) AS r
    FROM u
  ) WHERE r <= 2
),
neg AS (
  SELECT u.query_id, u.doc_id, u.s
  FROM u LEFT JOIN pos
    ON u.query_id = pos.query_id AND u.doc_id = pos.doc_id
  WHERE pos.doc_id IS NULL
)
SELECT query_id, doc_id, round(s, 4) AS score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY s DESC, doc_id ASC) AS rank
FROM neg QUALIFY rank <= {_HN_K} ORDER BY query_id, rank
"""


_MGET_IDS = [2, 7, 14, 21, 33, 999999]  # 7/14/21 tombstoned, 999999 absent


def _mget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _mget over the tombstoned index: deleted docs and unknown ids
    don't appear (the found=false rows); surviving ids broadcast into a
    semi join — the corpus side never shuffles (engine.mget)."""
    idx = _docs_index_tombstoned(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    return idx.mget(_MGET_IDS, docs).select(
        "doc_id", "lang", "source", "n_chars"
    )


_MGET_SQL = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id IN ({', '.join(str(i) for i in _MGET_IDS)}) AND {_DELETE_PRED_SQL}
"""


def _terms_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms-lookup query: the filter values are fetched from ONE
    stored document at query time (customer 42's market segment), then
    applied as a literal IN pushed to the corpus scan
    (operators/relations.py terms_lookup)."""
    from elasticsearch_assets_spark.operators.relations import terms_lookup

    cust = load_sf_table(spark, sf_dir, "customer")
    out = terms_lookup(
        cust, "c_mktsegment", cust, F.col("c_custkey") == 42, "c_mktsegment"
    )
    return out.select("c_custkey", "c_mktsegment")


_TERMS_LOOKUP_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_mktsegment IN (SELECT c_mktsegment FROM customer WHERE c_custkey = 42)
"""


def _script_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script query (filter context) composed with ranking: BM25 among
    docs where the script — a Catalyst-compiled SQL expression, the
    engine's one script contract — evaluates true (engine.script_query →
    search_filtered; collection stats stay global)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.script_query(
        docs, "n_chars % 3 = 0", query=["spark", "table"], k=None, mode="or"
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_SCRIPT_FILTER_SQL = _bm25_sql(
    ["spark", "table"], "or", None,
    where="doc_id IN (SELECT doc_id FROM documents WHERE n_chars % 3 = 0)",
)


_WRAPPER_Q = "spark AND jo* AND n_chars:>=400"  # == the querystring row


def _wrapper_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES wrapper query: a base64-encoded query decoded server-side then
    executed through the string surface — transport, not semantics
    (engine.search_wrapper; oracle shared with querystring_search)."""
    import base64

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    b64 = base64.b64encode(_WRAPPER_Q.encode()).decode()
    res = idx.search_wrapper(b64, docs, k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_RE_QUERIES = [["spark", "join"], ["hash", "merge"]]
_RE_K = 10


def _rank_eval_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _rank_eval: precision@k / recall@k / MRR / NDCG@k per query over
    msearch's ranked results and a graded judgment set (deterministic
    rule: even doc_ids judged, grade = #query-terms present). All window +
    hash-agg math over ≤ M×k result rows (operators/rankeval.py)."""
    from elasticsearch_assets_spark.operators.rankeval import rank_eval

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    results = idx.msearch(
        [{"query": q, "mode": "or", "k": _RE_K} for q in _RE_QUERIES]
    )
    toks = F.split(F.col("text"), " ")
    parts = []
    for qid, q in enumerate(_RE_QUERIES):
        grade = sum(F.array_contains(toks, t).cast("int") for t in q)
        parts.append(
            docs.where(F.col("doc_id") % 2 == 0)
            .select(
                F.lit(qid).alias("query_id"),
                "doc_id",
                grade.alias("grade"),
            )
            .where(F.col("grade") > 0)
        )
    judgments = parts[0].unionByName(parts[1])
    out = rank_eval(results, judgments, k=_RE_K)
    return out.select(
        "query_id",
        _f4("precision_k").alias("precision_k"),
        _f4("recall_k").alias("recall_k"),
        _f4("mrr").alias("mrr"),
        _f4("ndcg").alias("ndcg"),
    )


def _rank_eval_sql() -> str:
    union_terms = sorted({t for q in _RE_QUERIES for t in q})
    tlist = ", ".join(f"'{t}'" for t in union_terms)
    res_parts, jud_parts = [], []
    for qid, q in enumerate(_RE_QUERIES):
        ql = ", ".join(f"'{t}'" for t in q)
        res_parts.append(f"""
  SELECT {qid} AS query_id, tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf JOIN df USING (term) JOIN dl USING (doc_id)
  WHERE tf.term IN ({ql})
  GROUP BY tf.doc_id""")
        grade_sum = " + ".join(
            f"max(CASE WHEN term = '{t}' THEN 1 ELSE 0 END)" for t in q
        )
        jud_parts.append(f"""
  SELECT {qid} AS query_id, doc_id, {grade_sum} AS grade
  FROM toks WHERE doc_id % 2 = 0 GROUP BY doc_id
  HAVING ({grade_sum}) > 0""")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
res AS ({" UNION ALL ".join(res_parts)}),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
  FROM res
),
topk AS (SELECT * FROM ranked WHERE rank <= {_RE_K}),
jud AS ({" UNION ALL ".join(jud_parts)}),
jt AS (
  SELECT t.query_id, t.rank, coalesce(j.grade, 0) AS grade
  FROM topk t LEFT JOIN jud j ON t.query_id = j.query_id AND t.doc_id = j.doc_id
),
met AS (
  SELECT query_id,
         sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) / {_RE_K}.0 AS precision_k,
         sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END)::DOUBLE AS hits,
         coalesce(max(CASE WHEN grade > 0 THEN 1.0 / rank END), 0) AS mrr,
         sum((pow(2, grade) - 1) / log2(rank + 1)) AS dcg
  FROM jt GROUP BY query_id
),
nrel AS (SELECT query_id, count(*)::DOUBLE AS n_rel FROM jud GROUP BY query_id),
ideal AS (
  SELECT query_id, sum((pow(2, grade) - 1) / log2(irank + 1)) AS idcg
  FROM (
    SELECT query_id, grade,
           row_number() OVER (PARTITION BY query_id ORDER BY grade DESC, doc_id ASC) AS irank
    FROM jud
  ) WHERE irank <= {_RE_K} GROUP BY query_id
)
SELECT m.query_id,
       floor(m.precision_k * 10000.0 + 0.5) / 10000.0 AS precision_k,
       floor(coalesce(m.hits / n.n_rel, 0) * 10000.0 + 0.5) / 10000.0 AS recall_k,
       floor(m.mrr * 10000.0 + 0.5) / 10000.0 AS mrr,
       floor(coalesce(m.dcg / i.idcg, 0) * 10000.0 + 0.5) / 10000.0 AS ndcg
FROM met m
LEFT JOIN nrel n USING (query_id) LEFT JOIN ideal i USING (query_id)
"""


_SPARSE_W = {"spark": 1.0, "join": 0.5, "merge": 0.25}


def _sparse_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sparse_vector / text_expansion (learned sparse retrieval): query
    = {token: weight}, doc side = tf·idf stand-in weights; score = sparse
    dot product over matching tokens. One pushed scan + one hash agg on
    doc_id (engine.search_sparse); absent query tokens contribute 0."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_sparse({**_SPARSE_W, "zzabsenttoken": 2.0}, k=None)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _sparse_vector_sql() -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(_SPARSE_W))
    qw = " ".join(
        f"WHEN '{t}' THEN {w}" for t, w in sorted(_SPARSE_W.items())
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       round(sum( (CASE tf.term {qw} END)
                  * tf.tf * ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5)) ), 4) AS score
FROM n, tf JOIN df USING (term)
GROUP BY tf.doc_id
"""


_SPARSE_PRUNE_W = {"dup": 1.0, "spark": 0.8, "the": 0.1}


def _sparse_vector_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.13 sparse_vector token pruning: 'the' (df 382 > 1.2 × the
    matched tokens' avg df ~264, weight 0.1 < 0.4 × best 1.0) is pruned;
    'spark' is equally frequent but keeps its strong weight (the ES
    both-conditions rule). The oracle scores the KEPT set {dup, spark} —
    the pruned plan's exact semantics; the pruning decision itself is
    planning math over the same stats probe (unit-tested)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_sparse(
        _SPARSE_PRUNE_W, k=None, prune=True,
        tokens_freq_ratio_threshold=1.2,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _sparse_vector_pruned_sql() -> str:
    kept = {t: w for t, w in _SPARSE_PRUNE_W.items() if t != "the"}
    tlist = ", ".join(f"'{t}'" for t in sorted(kept))
    qw = " ".join(f"WHEN '{t}' THEN {w}" for t, w in sorted(kept.items()))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       round(sum( (CASE tf.term {qw} END)
                  * tf.tf * ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5)) ), 4) AS score
FROM n, tf JOIN df USING (term)
GROUP BY tf.doc_id
"""


def _sparse_rescore_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.13 weighted_tokens / sparse_vector `only_score_pruned_tokens`
    (the rescore contract): the SAME pruning rule as sparse_vector_pruned
    drops 'the' — this pass scores ONLY the dropped token, the complement
    a rescore block adds back onto the pruned main query. kept-set scores
    + this frame == the unpruned scores per doc (unit-tested identity).
    Reached through the DSL weighted_tokens body (pruning_config)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    body = {
        "query": {"weighted_tokens": {"text": {
            "tokens": dict(_SPARSE_PRUNE_W),
            "pruning_config": {
                "tokens_freq_ratio_threshold": 1.2,
                "only_score_pruned_tokens": True,
            },
        }}},
        "size": None,
    }
    out = search_dsl(idx, body)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _sparse_rescore_pruned_sql() -> str:
    dropped = {"the": _SPARSE_PRUNE_W["the"]}
    tlist = ", ".join(f"'{t}'" for t in sorted(dropped))
    qw = " ".join(f"WHEN '{t}' THEN {w}" for t, w in sorted(dropped.items()))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       round(sum( (CASE tf.term {qw} END)
                  * tf.tf * ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5)) ), 4) AS score
FROM n, tf JOIN df USING (term)
GROUP BY tf.doc_id
"""


def _dsl_script_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The search body's `script_fields` section: computed hit columns in
    the engine's ONE script dialect (Spark SQL — the ingest `script` /
    script_score boundary), evaluated on the k surviving rows after the
    broadcast hit-list join, never on the full stored scan."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    body = {
        "query": {"match": {"text": "spark table"}},
        "script_fields": {
            "twice_chars": {"script": {"source": "n_chars * 2"}},
            "loud_lang": {"script": "upper(lang)"},
        },
        "size": 10,
    }
    res = search_dsl(idx, body, docs)
    return res.select(
        "doc_id", F.round("score", 4).alias("score"),
        "twice_chars", "loud_lang",
    )


def _dsl_script_fields_sql() -> str:
    body = _bm25_body("term IN ('spark', 'table')")
    return f"""
WITH {body},
hits AS (
  SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id ASC LIMIT 10
)
SELECT h.doc_id, round(h.s, 4) AS score,
       d.n_chars * 2 AS twice_chars, upper(d.lang) AS loud_lang
FROM hits h JOIN documents d USING (doc_id)
ORDER BY h.s DESC, h.doc_id ASC
"""


_NP_TOKENS = 20    # tokens per passage (nested object)
_NP_BASE = 16      # slot base; documents cap at 100 tokens -> <= 5 slots


def _passage_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """CHILD index over disjoint 20-token passages of documents (child id
    = doc_id*16 + slot — relations.passage_corpus, the explicit Lucene
    nested-block encoding). Backs the ES nested-query contract row;
    version-stale caches rebuild like the other derived indexes."""
    key = os.path.abspath(sf_dir) + "#passages"
    if key not in _INDEX_CACHE:
        idx_dir = _idx_dir(sf_dir, "_passages")
        import json

        from elasticsearch_assets_spark.analysis.tokenizer import TOKENIZER_VERSION
        from elasticsearch_assets_spark.index.codec import CODEC_VERSION

        meta_path = os.path.join(idx_dir, "meta.json")
        stale = True
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                m = json.load(fh)
            stale = (
                m.get("codec_version") != CODEC_VERSION
                or m.get("tokenizer_version") != TOKENIZER_VERSION
            )
        if stale:
            from elasticsearch_assets_spark.operators.relations import (
                passage_corpus,
            )

            docs = load_sf_table(spark, sf_dir, "documents")
            build_index(
                spark,
                passage_corpus(docs, n=_NP_TOKENS, slot_base=_NP_BASE),
                idx_dir, id_col="doc_id", text_col="text",
                num_segments=8, num_chunks=1,
            )
        _INDEX_CACHE[key] = InvertedIndex(spark, idx_dir)
    return _INDEX_CACHE[key]


def _nested_maxp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `nested` query with score_mode=max — per-PASSAGE BM25 rolled up
    to parents (MaxP passage retrieval): nested objects are a child index
    (relations.passage_corpus), the inner match recurses through the DSL
    against it, engine.nested_topk combines the matching children. A doc
    whose query terms sit in one dense passage outranks one that spreads
    them — the ranking flat BM25 cannot express (and the reason ES nested
    exists)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    parent_idx = _docs_index(spark, sf_dir)
    child_idx = _passage_index(spark, sf_dir)
    body = {
        "query": {"nested": {
            "path": "passages",
            "query": {"match": {"text": "spark table"}},
            "score_mode": "max",
        }},
        "size": None,
    }
    out = search_dsl(
        parent_idx, body,
        nested_paths={"passages": (child_idx, _NP_BASE)},
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _nested_maxp_sql() -> str:
    body = _bm25_body("term IN ('spark', 'table')", source="passages")
    return f"""
WITH ptoks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
passages AS (
  SELECT doc_id * {_NP_BASE} + start // {_NP_TOKENS} AS doc_id,
         array_to_string(toks[start + 1 : start + {_NP_TOKENS}], ' ') AS text
  FROM (
    SELECT doc_id, toks,
           unnest(range(0, greatest(len(toks), 1), {_NP_TOKENS})) AS start
    FROM ptoks
  )
),
{body}
SELECT doc_id, round(s, 4) AS score FROM (
  SELECT doc_id // {_NP_BASE} AS doc_id, max(s) AS s
  FROM scored GROUP BY 1
)
"""


def _nested_inner_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested `inner_hits`: the top-2 MATCHING passages per parent in
    child-score order — which nested objects made the parent match (one
    grouped-top-k window over the posting-bounded child hit frame)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    parent_idx = _docs_index(spark, sf_dir)
    child_idx = _passage_index(spark, sf_dir)
    body = {
        "query": {"nested": {
            "path": "passages",
            "query": {"match": {"text": "spark table"}},
            "inner_hits": {"size": 2},
        }},
        "size": None,
    }
    out = search_dsl(
        parent_idx, body,
        nested_paths={"passages": (child_idx, _NP_BASE)},
    )
    return out.select(
        "doc_id", "slot", F.round("child_score", 4).alias("child_score"),
        "child_rank",
    )


def _nested_inner_hits_sql() -> str:
    body = _bm25_body("term IN ('spark', 'table')", source="passages")
    return f"""
WITH ptoks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
passages AS (
  SELECT doc_id * {_NP_BASE} + start // {_NP_TOKENS} AS doc_id,
         array_to_string(toks[start + 1 : start + {_NP_TOKENS}], ' ') AS text
  FROM (
    SELECT doc_id, toks,
           unnest(range(0, greatest(len(toks), 1), {_NP_TOKENS})) AS start
    FROM ptoks
  )
),
{body}
SELECT doc_id // {_NP_BASE} AS doc_id,
       doc_id % {_NP_BASE} AS slot,
       round(s, 4) AS child_score,
       row_number() OVER (
         PARTITION BY doc_id // {_NP_BASE}
         ORDER BY s DESC, doc_id % {_NP_BASE} ASC
       )::INT AS child_rank
FROM scored
QUALIFY child_rank <= 2
"""


def _dsl_rank_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.8 `rank: {rrf}` search body (== the 8.14 rrf retriever tree,
    identity-tested): the query and knn result sets — each cut to
    rank_window_size with the (score DESC, id ASC) tie-break — fuse by
    reciprocal rank, score = Σ 1/(rank_constant + rank)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    emb = load_sf_table(spark, sf_dir, "embeddings")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    body = {
        "query": {"match": {"text": "spark"}},
        "knn": {"field": "embedding", "query_vector": qv, "k": 20},
        "rank": {"rrf": {"rank_window_size": 20, "rank_constant": 60}},
        "size": 10,
    }
    res = search_dsl(idx, body, corpus)
    return res.select("doc_id", _f4("score").alias("score"))


def _dsl_rank_rrf_sql() -> str:
    body = _bm25_body("term IN ('spark')")
    return f"""
WITH {body},
bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
  FROM scored ORDER BY s DESC, doc_id ASC LIMIT 20
),
j AS (
  SELECT d.doc_id, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
knn AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r
  FROM (SELECT a.doc_id AS doc_id, {_COS_AB.replace('a.vec_id', 'a.doc_id')} AS cos FROM j a, q b)
  ORDER BY cos DESC, doc_id ASC LIMIT 20
),
u AS (
  SELECT doc_id, 1.0 / (60 + r) AS contrib FROM bm
  UNION ALL
  SELECT doc_id, 1.0 / (60 + r) AS contrib FROM knn
)
SELECT doc_id,
       floor(sum(contrib) * 10000.0 + 0.5) / 10000.0 AS score
FROM u GROUP BY doc_id
ORDER BY sum(contrib) DESC, doc_id ASC LIMIT 10
"""


def _alias_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filtered alias: the alias' stored filter (lang = 'en') applies
    to every search through it; collection stats stay GLOBAL — an alias
    is a view, not a reindex (contrast reindex_search)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    idx.add_alias("english", "lang = 'en'")
    out = idx.search_alias("english", ["spark", "table"], docs, k=None, mode="and")
    return out.select("doc_id", F.round("score", 4).alias("score"))


_ALIAS_SQL = _bm25_sql(
    ["spark", "table"], "and", None,
    where="doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')",
)


def _reindexed_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    key = os.path.abspath(sf_dir) + "#reindex"
    if key not in _INDEX_CACHE:
        import shutil

        from elasticsearch_assets_spark.index.build import reindex

        src = _docs_index_tombstoned(spark, sf_dir)
        docs = load_sf_table(spark, sf_dir, "documents")
        dst = _idx_dir(sf_dir, "_documents_reindex")
        shutil.rmtree(dst, ignore_errors=True)
        reindex(
            spark, src, docs, dst, where="n_chars < 400",
            num_segments=4, num_chunks=1,
        )
        _INDEX_CACHE[key] = InvertedIndex(spark, dst)
    return _INDEX_CACHE[key]


def _reindex_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _reindex: live docs (tombstones excluded, no compaction wait)
    with n_chars < 400 copied into a FRESH index; BM25 over it uses the
    SUBSET's collection stats — the oracle recomputes N/df/avgdl over the
    filtered corpus, which is exactly what distinguishes reindex from a
    filtered alias (index/build.py reindex)."""
    idx = _reindexed_index(spark, sf_dir)
    out = idx.search(["spark", "join"], k=None, mode="or")
    return out.select("doc_id", F.round("score", 4).alias("score"))


_REINDEX_SQL = _bm25_sql(
    ["spark", "join"], "or", None,
    corpus_where=f"({_DELETE_PRED_SQL}) AND n_chars < 400",
)


def _facet_sibling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sibling pipeline aggs (stats_bucket shape: avg/sum/min/max_bucket)
    over the click-events daily histogram — one row, the sibling reduction
    runs over bucket cardinality only."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_sibling_stats(matches, ev, "ts", "day", id_col="event_id")
    return out.select(
        "n_buckets",
        _f4("avg_bucket").alias("avg_bucket"),
        "sum_bucket", "min_bucket", "max_bucket",
    )


_FACET_SIBLING_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS bucket, count(*)::BIGINT AS doc_count
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT count(*)::BIGINT AS n_buckets,
       floor(avg(doc_count) * 10000.0 + 0.5) / 10000.0 AS avg_bucket,
       sum(doc_count)::BIGINT AS sum_bucket,
       min(doc_count)::BIGINT AS min_bucket,
       max(doc_count)::BIGINT AS max_bucket
FROM h
"""


_IP_PREFIX_LEN = 20


def _facet_ip_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ip_prefix agg (/20 IPv4 subnets) over the click events' derived
    ip column — subnet number by integer floor division, display key from
    ONE portable SQL text both engines evaluate (ip_prefix_key_sql)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events").withColumn(
        "ip",
        F.concat_ws(
            ".",
            (F.col("user_id") * 7) % 256,
            (F.col("user_id") * 13) % 256,
            (F.col("user_id") * 29) % 256,
            F.col("user_id") % 256,
        ),
    )
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    return OFA.facet_ip_prefix(
        matches, ev, "ip", _IP_PREFIX_LEN, id_col="event_id"
    )


def _facet_ip_prefix_sql() -> str:
    from elasticsearch_assets_spark.operators.facets import ip_prefix_key_sql

    block = 2 ** (32 - _IP_PREFIX_LEN)
    key = ip_prefix_key_sql("subnet_num", _IP_PREFIX_LEN)
    return f"""
WITH m AS (
  SELECT (string_split({_IP_SQL}, '.')[1]::BIGINT * 16777216
        + string_split({_IP_SQL}, '.')[2]::BIGINT * 65536
        + string_split({_IP_SQL}, '.')[3]::BIGINT * 256
        + string_split({_IP_SQL}, '.')[4]::BIGINT) AS ipn
  FROM events WHERE event_type = 'click'
),
g AS (
  SELECT (floor(ipn / {block}) * {block})::BIGINT AS subnet_num,
         count(*)::BIGINT AS doc_count
  FROM m GROUP BY 1
)
SELECT {key} AS subnet, subnet_num, doc_count FROM g ORDER BY subnet_num ASC
"""


def _facet_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES children agg: market-segment buckets over PARENT customers
    (join-field hop), metrics aggregated over their child orders; the
    parent filter (positive balance) applies before the hop."""
    from elasticsearch_assets_spark.operators import facets as OFA

    cust = load_sf_table(spark, sf_dir, "customer")
    orders = load_sf_table(spark, sf_dir, "orders")
    out = OFA.facet_children(
        cust, orders, "c_custkey", "o_custkey", "c_mktsegment",
        "o_totalprice", parent_pred=F.col("c_acctbal") > 0,
    )
    return out.select(
        "c_mktsegment", "child_count", _f4("sum_value").alias("sum_value")
    )


_FACET_CHILDREN_SQL = """
SELECT c_mktsegment, count(*)::BIGINT AS child_count,
       floor(sum(o_totalprice) * 10000.0 + 0.5) / 10000.0 AS sum_value
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE c_acctbal > 0
GROUP BY 1 ORDER BY 1
"""


def _facet_reverse_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES reverse_nested: return-flag buckets over NESTED lineitems, each
    reporting doc_count (nested docs) and parent_count (distinct parent
    orders owning them)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    li = load_sf_table(spark, sf_dir, "lineitem")
    return OFA.facet_reverse_nested(li, "l_returnflag", "l_orderkey")


_FACET_REVERSE_NESTED_SQL = """
SELECT l_returnflag, count(*)::BIGINT AS doc_count,
       count(DISTINCT l_orderkey)::BIGINT AS parent_count
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def _categorize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES categorize_text (deterministic log-template variant): event_type
    + props messages, digit-bearing tokens collapsed to <num>, keyed by
    the first 4 normalized tokens — one JVM lambda pass + one hash agg."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events").withColumn(
        "msg", F.concat_ws(" ", "event_type", "props")
    )
    return OFA.facet_categorize_text(
        ev.select("event_id"), ev, "msg", 4, id_col="event_id"
    )


_CATEGORIZE_SQL = """
WITH m AS (SELECT concat(event_type, ' ', props) AS msg FROM events)
SELECT array_to_string(
         list_transform(
           string_split(msg, ' ')[1:4],
           x -> CASE WHEN regexp_matches(x, '[0-9]') THEN '<num>' ELSE x END
         ), ' ') AS category,
       count(*)::BIGINT AS doc_count
FROM m GROUP BY 1 ORDER BY doc_count DESC, category ASC
"""


_SWEEP_TS = [0.35, 0.55, 0.75, 0.95]


def _filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter threshold calibration (FineWeb-style ablation
    report): docs/tokens retained at 4 candidate cuts in ONE
    conditional-aggregate pass (textstats.filter_sweep); the cut runs on
    the 4-decimal-quantized score for cross-engine bit stability."""
    from elasticsearch_assets_spark.operators import textstats as OT2

    docs = load_sf_table(spark, sf_dir, "documents")
    return OT2.filter_sweep(docs, _SWEEP_TS)


def _bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-training merge step (Sennrich 2016) over the documents corpus:
    top-20 adjacent character pairs weighted by word frequency — corpus
    reduces to the vocabulary FIRST (the real-BPE-trainer scale trick),
    pairs generated per distinct word as a JVM transform."""
    from elasticsearch_assets_spark.operators import textstats as OT

    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.bpe_pair_counts(docs, n=20)


def _anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ML single-metric anomaly detection (record_score shape):
    per-season robust baseline — hour-of-day median + MAD, score =
    modified z-ratio, flag >= 3.5 (Iglewicz-Hoaglin). Two tiny-key agg
    passes + two broadcast joins (operators/anomaly.py)."""
    from elasticsearch_assets_spark.operators.anomaly import mad_outliers

    ev = load_sf_table(spark, sf_dir, "events")
    out = mad_outliers(ev, "value", F.hour("ts").cast("int"))
    return out.select(
        "event_id", "season",
        _f4("med").alias("med"), _f4("mad").alias("mad"),
        _f4("score").alias("score"),
    )


_ANOMALY_MAD_SQL = """
WITH b AS (
  SELECT event_id, value, date_part('hour', ts)::INT AS season FROM events
),
med AS (SELECT season, quantile_cont(value, 0.5) AS med FROM b GROUP BY season),
d AS (
  SELECT b.event_id, b.season, med, abs(value - med) AS absdev
  FROM b JOIN med USING (season)
),
mad AS (SELECT season, quantile_cont(absdev, 0.5) AS mad FROM d GROUP BY season)
SELECT event_id, season,
       floor(med * 1e4 + 0.5) / 1e4 AS med,
       floor(mad * 1e4 + 0.5) / 1e4 AS mad,
       floor(absdev / mad * 1e4 + 0.5) / 1e4 AS score
FROM d JOIN mad USING (season)
WHERE mad > 0 AND absdev / mad >= 3.5
"""


def _change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES change_point (deterministic step detector): the split of the
    click events' daily value series maximizing |mean(before) −
    mean(after)| — prefix-sum window math over bucket cardinality only."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_change_point(
        matches, ev, "ts", "value", "day", id_col="event_id"
    )
    return out.select(
        "bucket",
        _f4("left_mean").alias("left_mean"),
        _f4("right_mean").alias("right_mean"),
        _f4("delta").alias("delta"),
    )


_CHANGE_POINT_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS bucket, sum(value) AS v,
         count(*)::DOUBLE AS c
  FROM events WHERE event_type = 'click' GROUP BY 1
),
t AS (SELECT sum(v) AS tv, sum(c) AS tc FROM h),
s AS (
  SELECT bucket, v, c,
         sum(v) OVER w AS lv, sum(c) OVER w AS lc
  FROM h
  WINDOW w AS (ORDER BY bucket ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
d AS (
  SELECT bucket, lv / lc AS left_mean,
         (t.tv - lv) / (t.tc - lc) AS right_mean
  FROM s, t WHERE lc IS NOT NULL
)
SELECT bucket,
       floor(left_mean * 10000.0 + 0.5) / 10000.0 AS left_mean,
       floor(right_mean * 10000.0 + 0.5) / 10000.0 AS right_mean,
       floor(abs(right_mean - left_mean) * 10000.0 + 0.5) / 10000.0 AS delta
FROM d
ORDER BY abs(right_mean - left_mean) DESC, bucket ASC LIMIT 1
"""


_GEO_LINE_GROUPS, _GEO_LINE_CAP = 25, 5


def _geo_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_line: per user-group track of (lon lat) points ordered by
    ts, truncated to 5 by that order BEFORE the collect (window rank —
    the agg never materializes unbounded tracks), rendered as WKT."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = _geo_events(spark, sf_dir).withColumn(
        "grp", F.col("user_id") % _GEO_LINE_GROUPS
    )
    return OFA.facet_geo_line(ev, "grp", "lat", "lon", "ts", _GEO_LINE_CAP)


_GEO_LINE_SQL = f"""
WITH g AS (
  SELECT user_id % {_GEO_LINE_GROUPS} AS grp, ts,
         ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events
),
r AS (
  SELECT grp, ts, lat, lon,
         row_number() OVER (PARTITION BY grp ORDER BY ts ASC, lon ASC, lat ASC) AS rn
  FROM g
),
k AS (SELECT * FROM r WHERE rn <= {_GEO_LINE_CAP})
SELECT grp,
       concat('LINESTRING (',
              string_agg(concat(lon::VARCHAR, ' ', lat::VARCHAR), ', '
                         ORDER BY ts ASC, lon ASC, lat ASC),
              ')') AS line,
       count(*)::BIGINT AS n_points
FROM k GROUP BY grp ORDER BY grp ASC
"""


_FREQ_PAIRS_SUPPORT = 150


def _frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES frequent_item_sets at size 2 as exact Apriori: level-1 prune
    (items under min_support can't appear in a frequent pair) bounds the
    per-doc arrays BEFORE the JVM pair expansion; support = docs
    containing both (operators/itemsets.py)."""
    from elasticsearch_assets_spark.operators.itemsets import frequent_pairs

    docs = load_sf_table(spark, sf_dir, "documents")
    return frequent_pairs(
        docs, "doc_id", "split(text, ' ')", _FREQ_PAIRS_SUPPORT
    )


_FREQ_PAIRS_SQL = f"""
WITH it AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS item
  FROM documents
),
freq AS (SELECT item FROM it GROUP BY item HAVING count(*) >= {_FREQ_PAIRS_SUPPORT}),
kept AS (SELECT doc_id, item FROM it WHERE item IN (SELECT item FROM freq))
SELECT a.item AS item1, b.item AS item2, count(*)::BIGINT AS support
FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.item < b.item
GROUP BY 1, 2 HAVING count(*) >= {_FREQ_PAIRS_SUPPORT}
"""


def _frequent_itemsets3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES frequent_item_sets multi-level (sizes 2 and 3) as exact Apriori
    with transaction trimming between levels — minimum_support is ES's
    fraction knob (0.25 of the corpus), so the row scales with sf
    (operators/itemsets.frequent_itemsets)."""
    from elasticsearch_assets_spark.operators.itemsets import (
        frequent_itemsets,
    )

    docs = load_sf_table(spark, sf_dir, "documents")
    return frequent_itemsets(
        docs, "doc_id", "split(text, ' ')", 0.25, max_size=3
    )


_FREQ_ITEMSETS3_SQL = """
WITH it AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS item
  FROM documents
),
n AS (SELECT ceil(0.25 * count(*)) AS ms FROM documents),
f AS (
  SELECT item FROM it GROUP BY item
  HAVING count(*) >= (SELECT ms FROM n)
),
k AS (SELECT doc_id, item FROM it WHERE item IN (SELECT item FROM f)),
p2 AS (
  SELECT a.item AS i1, b.item AS i2, count(*) AS sup
  FROM k a JOIN k b ON a.doc_id = b.doc_id AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= (SELECT ms FROM n)
),
p3 AS (
  SELECT a.item AS i1, b.item AS i2, c.item AS i3, count(*) AS sup
  FROM k a JOIN k b ON a.doc_id = b.doc_id AND a.item < b.item
       JOIN k c ON b.doc_id = c.doc_id AND b.item < c.item
  GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT ms FROM n)
)
SELECT i1 || '|' || i2 AS itemset, 2 AS size, sup::BIGINT AS support FROM p2
UNION ALL
SELECT i1 || '|' || i2 || '|' || i3, 3, sup::BIGINT FROM p3
ORDER BY size, support DESC, itemset
"""


def _dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best dedup: per near-dup cluster keep the HIGHEST-quality
    member (ties → smallest id) — the selection step after clustering
    every production dedup pipeline runs (operators/dedup.dedup_keep_best
    = one join + one window rank partitioned by cluster rep)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    pairs = OD.ngram_jaccard_pairs(docs, n=1, threshold=0.8)
    clusters = OD.dedup_clusters(docs.select("doc_id"), pairs, max_iter=50)
    out = OD.dedup_keep_best(clusters, OT.quality_score(docs))
    return out.select("doc_id", "rep", _f4("quality").alias("quality"))


def _dedup_keep_best_sql() -> str:
    # clusters (recursive CTE) ⋈ quality, QUALIFY the per-rep best
    return f"""
WITH clusters AS ({_DEDUP_CLUSTERS_SQL}),
q AS ({OT.quality_score_sql()})
SELECT c.doc_id, c.rep,
       floor(q.quality * 10000.0 + 0.5) / 10000.0 AS quality
FROM clusters c JOIN q USING (doc_id)
QUALIFY row_number() OVER (
  PARTITION BY c.rep ORDER BY q.quality DESC, c.doc_id ASC
) = 1
ORDER BY c.doc_id ASC
"""


_MIX_RATES = {"en": 0.8, "de": 0.5, "fr": 0.25, "es": 0.1, "zh": 0.0}


def _mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified mixture sampling: per-language keep rates
    decided by a salted md5 hex-prefix cut — reproducible across engines
    and retries, zero shuffle (operators/sampling.stratified_sample);
    the training-mixture weighting step of a corpus pipeline."""
    from elasticsearch_assets_spark.operators.sampling import stratified_sample

    docs = load_sf_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", _MIX_RATES)
    return out.select("doc_id", "lang")


def _mixture_sample_sql() -> str:
    from elasticsearch_assets_spark.operators.sampling import sample_filter_sql

    return (
        "SELECT doc_id, lang FROM documents WHERE "
        + sample_filter_sql("lang", _MIX_RATES)
    )


def _ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized ANN: per-vector max-abs scalar quantization (4×
    smaller vectors), top-k by quantized cosine — integer dot/norm sums
    (engine-exact), scales cancel; the memory-bound scale path next to
    the exact float baseline ann_topk (operators/similarity.py)."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.quantized_cosine_topk(emb, qv, k=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


_ANN_INT8_SQL = """
WITH s AS (
  SELECT vec_id,
         embedding,
         greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 1e-30) AS sc
  FROM embeddings
),
qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(floor(x::DOUBLE / sc * 127.0 + 0.5) AS INTEGER)) AS q
  FROM s
),
b AS (SELECT q FROM qv WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id,
         list_dot_product(a.q, b.q)
         / greatest(sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)), 1e-30) AS cos
  FROM qv a, b
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def _ann_topk_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES knn rescore_vector (8.18): k*3 candidates by int8-quantized
    cosine (quarter-width scan), exact float re-score on the candidates
    only, exact top-k out (similarity.rescore_vector_topk — quantized
    TakeOrderedAndProject, broadcast semi-join, exact cosine on 30
    rows)."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.rescore_vector_topk(emb, qv, k=10, oversample=3.0)
    return out.select("vec_id", F.round("score", 4).alias("score"))


_ANN_RESCORE_SQL = f"""
WITH s AS (
  SELECT vec_id,
         embedding,
         greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 1e-30) AS sc
  FROM embeddings
),
qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(floor(x::DOUBLE / sc * 127.0 + 0.5) AS INTEGER)) AS q
  FROM s
),
bq AS (SELECT q FROM qv WHERE vec_id = 0),
cand AS (
  SELECT a.vec_id
  FROM qv a, bq b
  ORDER BY list_dot_product(a.q, b.q)
           / greatest(sqrt(list_dot_product(a.q, a.q))
                      * sqrt(list_dot_product(b.q, b.q)), 1e-30) DESC,
           a.vec_id ASC
  LIMIT 30
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM embeddings a JOIN cand USING (vec_id), q b
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def _ann_topk_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation (Kusupati et al. 2022): keep the first 16 of
    64 dims, L2-renormalize (similarity.truncate_embeddings — zero
    shuffle), exact cosine top-k over the quarter-width vectors. The
    query vector goes through the SAME truncate+renormalize arithmetic
    driver-side, so both engines' unit vectors are bit-identical."""
    import math as _m

    emb = load_sf_table(spark, sf_dir, "embeddings")
    full = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    tv = full[:16]
    s = sum(x * x for x in tv)
    q = [x / _m.sqrt(s) for x in tv]
    tr = OS.truncate_embeddings(emb, 16)
    out = OS.cosine_topk(tr, q, k=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


_ANN_MRL_SQL = """
WITH t AS (SELECT vec_id, embedding[1:16] AS tv FROM embeddings),
u AS (
  SELECT vec_id,
         list_transform(tv, x -> x::DOUBLE /
           sqrt(list_sum(list_transform(tv, y -> y::DOUBLE * y::DOUBLE))))
           AS v
  FROM t
),
q AS (SELECT v FROM u WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id,
         (SELECT sum(a.v[i] * b.v[i]) FROM range(1, 17) r(i))
         / (sqrt((SELECT sum(a.v[i] * a.v[i]) FROM range(1, 17) r(i)))
            * sqrt((SELECT sum(b.v[i] * b.v[i]) FROM range(1, 17) r(i)))) AS cos
  FROM u a, q b
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


_PIT_CUT = 250


def _pit_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """PIT handle opened between two streaming epochs: epoch 1 commits
    doc_id < _PIT_CUT, the PIT opens, epoch 2 commits the rest."""
    key = os.path.abspath(sf_dir) + "#pit"
    if key not in _INDEX_CACHE:
        import shutil

        from elasticsearch_assets_spark.streaming.index_stream import (
            index_stream,
        )

        base = _idx_dir(sf_dir, "_documents_pitstream")
        src = os.path.join(base, "src")
        idx_dir = os.path.join(base, "idx")
        ckpt = os.path.join(base, "ckpt")
        shutil.rmtree(base, ignore_errors=True)
        docs = load_sf_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        schema = "doc_id long, text string"
        docs.where(f"doc_id < {_PIT_CUT}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q, w = index_stream(
            spark.readStream.schema(schema).parquet(src), idx_dir,
            checkpoint_dir=ckpt, segs_per_batch=4,
            trigger_available_now=True,
        )
        q.awaitTermination()
        w.refresh(spark)
        pit = InvertedIndex(spark, idx_dir).pit()
        docs.where(f"doc_id >= {_PIT_CUT}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q2, w2 = index_stream(
            spark.readStream.schema(schema).parquet(src), idx_dir,
            checkpoint_dir=ckpt, segs_per_batch=4,
            trigger_available_now=True,
        )
        q2.awaitTermination()
        w2.refresh(spark)
        _INDEX_CACHE[key] = pit
    return _INDEX_CACHE[key]


def _pit_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES point-in-time: a search through a PIT opened after streaming
    epoch 1 (doc_id < 250), executed AFTER epoch 2 committed the rest of
    the corpus — the oracle is BM25 over the epoch-1 subset with the
    SUBSET's collection stats, which is exactly snapshot isolation
    (engine.pit; immutable chunk files make the listing a consistent
    snapshot)."""
    idx = _pit_index(spark, sf_dir)
    out = idx.search(["spark", "join"], k=None, mode="or")
    return out.select("doc_id", F.round("score", 4).alias("score"))


_PIT_SQL = _bm25_sql(
    ["spark", "join"], "or", None, corpus_where=f"doc_id < {_PIT_CUT}"
)


def _span_multi_containing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_multi: a prefix multiterm query ('mer*') wrapped as a span
    clause and used as span_containing's little — the dictionary rewrite
    happens once at plan time, occurrences are the union of the
    expansions' positions (engine.span_multi → ("any", terms) expr)."""
    idx = _docs_index_pos(spark, sf_dir)
    little = idx.span_multi("mer", kind="prefix")
    out = idx.search_span_containing(
        ("near", "table", "hash", 6, True), little, k=None
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_SPAN_MULTI_SQL = f"""
WITH {_PTOKS_ONLY_CTE},
{_bm25_body("term IN ('hash', 'table') OR term LIKE 'mer%'")},
m AS (
  SELECT DISTINCT a.doc_id FROM ptoks a
  JOIN ptoks b ON a.doc_id = b.doc_id
  JOIN ptoks c ON c.doc_id = a.doc_id
  WHERE a.term = 'table' AND b.term = 'hash'
    AND b.pos > a.pos AND b.pos - a.pos <= 6
    AND c.term LIKE 'mer%'
    AND c.pos >= a.pos AND c.pos <= b.pos
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM m)
"""


_COLLAPSE_IH_K, _COLLAPSE_IH_N = 5, 3


def _collapse_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field collapsing with inner_hits: top-5 source groups by their
    best 'spark' hit, each expanded to its best 3 members — one window
    pass ranks members, winners take the global cut, inner hits attach by
    a broadcast semi join (operators/facets.collapse_inner_hits)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    scored = idx.search(["spark"], k=None, mode="and")
    out = OFA.collapse_inner_hits(
        scored, docs, "source", k=_COLLAPSE_IH_K, inner_size=_COLLAPSE_IH_N
    )
    return out.select(
        "ckey", "doc_id", F.round("score", 4).alias("score"), "rank"
    )


_COLLAPSE_IH_SQL = f"""
WITH {_bm25_body("term IN ('spark')")},
j AS (
  SELECT s.doc_id, d.source AS ckey, s.s
  FROM scored s JOIN documents d USING (doc_id)
),
r AS (
  SELECT ckey, doc_id, s,
         row_number() OVER (PARTITION BY ckey ORDER BY s DESC, doc_id ASC) AS rank
  FROM j
),
hits AS (SELECT * FROM r WHERE rank <= {_COLLAPSE_IH_N}),
w AS (
  SELECT ckey FROM r WHERE rank = 1
  ORDER BY s DESC, doc_id ASC LIMIT {_COLLAPSE_IH_K}
)
SELECT h.ckey, h.doc_id, round(h.s, 4) AS score, h.rank
FROM hits h JOIN w USING (ckey)
"""


def _terms_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _terms_enum: index-sorted 'jo'-prefixed terms with doc
    frequencies — one pushed StringStartsWith scan over the distributed
    term dictionary (the stats table), bounded ordered cut."""
    idx = _docs_index(spark, sf_dir)
    return idx.terms_enum("jo", size=10)


_TERMS_ENUM_SQL = """
SELECT term, count(DISTINCT doc_id)::BIGINT AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term LIKE 'jo%' GROUP BY term ORDER BY term ASC LIMIT 10
"""


def _search_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search template: {{param}} substitution into a stored template,
    executed through the query-string surface (strict unbound-parameter
    errors); oracle shared with querystring_search."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.search_template(
        "spark AND jo* AND n_chars:>={{min_chars}}", {"min_chars": 400},
        docs, k=None,
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _min_score_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES min_score: hits under the threshold dropped before the global
    cut — a plain Filter over the per-segment candidates (score filters
    can't prune postings; scores aren't known until scored, same as ES)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search(["spark", "table"], k=None, mode="or", min_score=0.9)
    return out.select("doc_id", F.round("score", 4).alias("score"))


_MIN_SCORE_SQL = _bm25_sql(["spark", "table"], "or", None, where="s >= 0.9")


_CHUNK_W, _CHUNK_S = 64, 48


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (64-token windows every 48 — the standard
    pre-embedding segmentation): one JVM sequence→posexplode pass, no
    Python, no shuffle (textstats.chunk_documents). chunk_text is hashed
    so the compared payload stays small; the text itself is what's
    hashed, so parity still proves the chunk contents."""
    from elasticsearch_assets_spark.operators.textstats import chunk_documents

    docs = load_sf_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, window=_CHUNK_W, stride=_CHUNK_S)
    return out.select(
        "doc_id", "chunk_id", "n_tokens", F.md5("chunk_text").alias("chunk_md5")
    )


_DOC_CHUNKS_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks), 1) + 1, {_CHUNK_S})) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) / {_CHUNK_S} AS INT) AS chunk_id,
       len(toks[start : start + {_CHUNK_W} - 1])::INT AS n_tokens,
       md5(array_to_string(toks[start : start + {_CHUNK_W} - 1], ' ')) AS chunk_md5
FROM s
"""


_INCR_CUT = 5  # new = doc_id % 5 == 0, base = the rest


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-corpus near-dup: today's increment (doc_id % 5
    == 0) LSH-banded against the standing corpus, candidates strictly
    NEW × BASE, verified with candidate-local Jaccard >= 0.8
    (dedup.dedup_against — identical bucket keys to lsh_candidates by
    shared banding)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % _INCR_CUT == 0)
    base = docs.where(F.col("doc_id") % _INCR_CUT != 0)
    out = OD.dedup_against(new, base, n=1, k=8, bands=4, threshold=0.8)
    return out.select(
        "new_id", "base_id", F.round("jaccard", 4).alias("jaccard")
    )


def _dedup_incremental_sql() -> str:
    return f"""
WITH sig AS ({_MINHASH_SQL}),
banded AS (
  SELECT doc_id, band, md5(bucket_key) AS bucket FROM (
    SELECT doc_id, 0 AS band, h0 || ',' || h1 AS bucket_key FROM sig
    UNION ALL SELECT doc_id, 1, h2 || ',' || h3 FROM sig
    UNION ALL SELECT doc_id, 2, h4 || ',' || h5 FROM sig
    UNION ALL SELECT doc_id, 3, h6 || ',' || h7 FROM sig
  )
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS base_id
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id % {_INCR_CUT} = 0 AND b.doc_id % {_INCR_CUT} <> 0
),
t AS (SELECT doc_id, {_UNIGRAMS} AS s FROM documents)
SELECT new_id, base_id, round(jac, 4) AS jaccard FROM (
  SELECT new_id, base_id,
         len(list_intersect(x.s, y.s))::DOUBLE
           / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jac
  FROM cand JOIN t x ON x.doc_id = new_id JOIN t y ON y.doc_id = base_id
) WHERE jac >= 0.8
"""


def _facet_pct_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles_bucket: exact interpolated percentiles of the click
    events' daily doc counts — a bucket-cardinality sibling reduction."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_percentiles_bucket(
        matches, ev, "ts", [25.0, 50.0, 90.0], "day", id_col="event_id"
    )
    return out.select("percent", _f4("value").alias("value"))


_FACET_PCT_BUCKET_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS bucket, count(*)::DOUBLE AS doc_count
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT percent, floor(value * 10000.0 + 0.5) / 10000.0 AS value FROM (
  SELECT 25.0 AS percent, quantile_cont(doc_count, 0.25) AS value FROM h
  UNION ALL SELECT 50.0, quantile_cont(doc_count, 0.50) FROM h
  UNION ALL SELECT 90.0, quantile_cont(doc_count, 0.90) FROM h
) ORDER BY percent
"""


_QSMF_TIE, _QSMF_TBOOST = 0.3, 2.0


def _qs_multi_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES query_string with fields=["text", "title^2"]: the string planned
    PER FIELD (each field's dictionary drives its own jo* rewrite, each
    index its own stats), per-field scores × boosts combined dis_max with
    tie 0.3 (engine.querystring_multi_field)."""
    from elasticsearch_assets_spark.query.engine import querystring_multi_field

    idx = _docs_index(spark, sf_dir)
    tidx = _docs_index_title(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = querystring_multi_field(
        {"text": (idx, 1.0), "title": (tidx, _QSMF_TBOOST)},
        "spark AND jo*", docs, k=10, tie_breaker=_QSMF_TIE,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _qs_mf_chain(pfx: str, toks_select: str) -> str:
    return f"""
{pfx}toks AS ({toks_select}),
{pfx}dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM {pfx}toks GROUP BY doc_id),
{pfx}stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM {pfx}dl),
{pfx}tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM {pfx}toks
  WHERE term = 'spark' OR term LIKE 'jo%' GROUP BY doc_id, term
),
{pfx}df AS (SELECT term, count(*)::DOUBLE AS df FROM {pfx}tf GROUP BY term),
{pfx}scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS s
  FROM {pfx}stats s, {pfx}tf tf
  JOIN {pfx}df df USING (term) JOIN {pfx}dl dl USING (doc_id)
  GROUP BY tf.doc_id
  HAVING max(CASE WHEN tf.term = 'spark' THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN tf.term LIKE 'jo%' THEN 1 ELSE 0 END) = 1
)"""


def _qs_multi_field_sql() -> str:
    title = _qs_mf_chain(
        "t",
        "SELECT doc_id, unnest(string_split(text, ' ')"
        f"[1:{_TITLE_TOKENS}]) AS term FROM documents",
    )
    body = _qs_mf_chain(
        "b",
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents",
    )
    combine = f"max(s) + {_QSMF_TIE} * (sum(s) - max(s))"
    return f"""
WITH {title},
{body},
u AS (
  SELECT doc_id, s * {_QSMF_TBOOST} AS s FROM tscored
  UNION ALL
  SELECT doc_id, s FROM bscored
)
SELECT doc_id, round({combine}, 4) AS score
FROM u GROUP BY doc_id
ORDER BY {combine} DESC, doc_id ASC LIMIT 10
"""


def _corpus_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting for mixture design: per (lang, source) — docs,
    tokens, mean quality — the table training-mixture weights are sized
    from before stratified_sample applies them
    (textstats.corpus_accounting: per-doc stats ride the scan, one hash
    agg on the tiny strata key)."""
    from elasticsearch_assets_spark.operators.textstats import (
        corpus_accounting,
    )

    docs = load_sf_table(spark, sf_dir, "documents")
    out = corpus_accounting(docs, ["lang", "source"])
    return out.select(
        "lang", "source", "n_docs", "total_tokens",
        _f4("avg_tokens").alias("avg_tokens"),
        _f4("avg_quality").alias("avg_quality"),
    )


def _corpus_accounting_sql() -> str:
    return f"""
WITH ts AS ({OT.token_stats_sql()}),
q AS ({OT.quality_score_sql()})
SELECT d.lang, d.source,
       count(*)::BIGINT AS n_docs,
       sum(ts.n_tokens)::BIGINT AS total_tokens,
       floor(avg(ts.n_tokens) * 10000.0 + 0.5) / 10000.0 AS avg_tokens,
       floor(avg(q.quality) * 10000.0 + 0.5) / 10000.0 AS avg_quality
FROM documents d JOIN ts USING (doc_id) JOIN q USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _bm25_phrase_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase + structured filter through the cogrouped executor-side
    ladder (forced strategy='cogroup' — no driver id materialization, the
    path that closes the old phrase+filter collect_cap ceiling):
    positional phrase match restricted to doc_id % 3 = 0, global stats."""
    idx = _docs_index_pos(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.search_phrase_filtered(
        _PHRASE_TERMS, docs.where("doc_id % 3 = 0"), k=None,
        strategy="cogroup",
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_phrase_filtered_sql() -> str:
    return f"""
SELECT * FROM ({_bm25_phrase_sql(_PHRASE_TERMS)}) WHERE doc_id % 3 = 0
"""


# ---------------------------------------------------------------------------
# Batch 3f: data-management APIs (sliced scroll, transforms, rollover,
# snapshot/restore)
# ---------------------------------------------------------------------------

_SLICE_ID, _SLICE_MAX = 3, 8


def _sliced_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sliced scroll (`slice: {id: 3, max: 8}`): worker 3 of 8 reads its
    deterministic hash partition of the events scan — disjoint-and-covering
    across workers (tested), zero coordination. The reference's
    multi-worker scroll re-expressed as a pushed hash predicate."""
    from elasticsearch_assets_spark.sources.reader import DateReader, ReaderConfig

    cfg = ReaderConfig(
        path=os.path.join(sf_dir, "events.parquet"),
        date_field_name="ts",
        slice_id=_SLICE_ID,
        slice_max=_SLICE_MAX,
        slice_field="event_id",
        fields=["event_id", "event_type"],
    )
    return DateReader(spark, cfg).dataframe().select("event_id", "event_type")


def _sliced_scan_sql() -> str:
    from elasticsearch_assets_spark.sources.reader import slice_predicate_sql

    return f"""
SELECT event_id, event_type FROM events
WHERE {slice_predicate_sql('event_id', _SLICE_ID, _SLICE_MAX)}
"""


def _transform_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES latest transform: newest event per user (sort ts desc, event_id
    tie-break) — one window rank keyed by user_id, no join."""
    from elasticsearch_assets_spark.operators.transforms import transform_latest

    ev = load_sf_table(spark, sf_dir, "events")
    out = transform_latest(ev, "user_id", "ts", tiebreak="event_id")
    return out.select("user_id", "event_id", "event_type", "value")


_TRANSFORM_LATEST_SQL = """
SELECT user_id, event_id, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def _transform_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pivot transform: group_by event_type with value_count / avg /
    max / cardinality aggregations — one hash agg, map-side partials."""
    from elasticsearch_assets_spark.operators.transforms import transform_pivot

    ev = load_sf_table(spark, sf_dir, "events")
    out = transform_pivot(
        ev,
        "event_type",
        {
            "n": ("value_count", "event_id"),
            "avg_value": ("avg", "value"),
            "max_value": ("max", "value"),
            "n_users": ("cardinality", "user_id"),
        },
    )
    return out.select(
        "event_type", "n", _f4("avg_value").alias("avg_value"),
        _f4("max_value").alias("max_value"), "n_users",
    )


_TRANSFORM_PIVOT_SQL = """
SELECT event_type,
       count(event_id)::BIGINT AS n,
       floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_value,
       floor(max(value) * 10000.0 + 0.5) / 10000.0 AS max_value,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type
"""

_RO_MAX_DOCS, _RO_MAX_AGE = 1000, 5


def _rollover_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _rollover / ILM hot phase: assign every daily batch its write
    index `logs-NNNNNN` under max_docs=1000 OR max_age=5d conditions
    (check-after-write fold over the per-day batch table — planning-level,
    one row per day)."""
    from elasticsearch_assets_spark.operators.transforms import plan_rollover

    ev = load_sf_table(spark, sf_dir, "events")
    out = plan_rollover(
        ev, "ts", "logs", max_docs=_RO_MAX_DOCS, max_age_days=_RO_MAX_AGE
    )
    # day as ISO string: pandas widens DATE to timestamp asymmetrically
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_docs", "generation", "index_name",
    )


_ROLLOVER_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n_docs
  FROM events GROUP BY 1
),
seq AS (
  SELECT day, n_docs, row_number() OVER (ORDER BY day) AS rn FROM daily
),
fold AS (
  SELECT rn, day, n_docs, 1 AS generation, n_docs AS gdocs, day AS gstart
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.rn, s.day, s.n_docs,
         CASE WHEN f.gdocs >= {_RO_MAX_DOCS} OR f.day - f.gstart >= {_RO_MAX_AGE}
              THEN f.generation + 1 ELSE f.generation END,
         CASE WHEN f.gdocs >= {_RO_MAX_DOCS} OR f.day - f.gstart >= {_RO_MAX_AGE}
              THEN s.n_docs ELSE f.gdocs + s.n_docs END,
         CASE WHEN f.gdocs >= {_RO_MAX_DOCS} OR f.day - f.gstart >= {_RO_MAX_AGE}
              THEN s.day ELSE f.gstart END
  FROM fold f JOIN seq s ON s.rn = f.rn + 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_docs, generation::INT AS generation,
       printf('logs-%06d', generation) AS index_name
FROM fold ORDER BY day
"""


def _snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES snapshot + restore: snapshot the committed documents index into
    a repository dir (hard-link clone), restore it as a NEW independent
    index, and search the restored index — results identical to the
    source at snapshot time (isolation from later writes is tested in
    tests/test_round3f_ops.py)."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.query.engine import restore_snapshot

    idx = _docs_index(spark, sf_dir)
    scratch = os.path.join("/tmp", "esa_snap_repo", uuid.uuid4().hex[:12])
    repo = os.path.join(scratch, "repo")
    try:
        idx.snapshot(repo, "snap1")
        restored = restore_snapshot(
            spark, repo, "snap1", os.path.join(scratch, "restored")
        )
        out = restored.search(["vector", "group"], k=None, mode="and")
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


_SNAPSHOT_RESTORE_SQL = _bm25_sql(["vector", "group"], "and", None)


# ---------------------------------------------------------------------------
# Batch 3g: decay scoring, n-term span_near, synonyms, EQL sequences,
# bucket_correlation, kNN outliers
# ---------------------------------------------------------------------------

_DECAY_ORIGIN, _DECAY_SCALE, _DECAY_DECAY = 500.0, 300.0, 0.5
# the exact constant the engine multiplies with (2·sigma²) — embedded into
# the oracle so both engines share ONE float, not two formula spellings
_DECAY_2S2 = repr(-(_DECAY_SCALE**2) / __import__("math").log(_DECAY_DECAY))


def _decay_gauss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score gauss decay on n_chars (origin 500, scale 300,
    decay 0.5) × BM25('spark') — the decay is a pure JVM expression over
    the corpus projection (enrich-join shape, no Python)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.decay_score(
        ["spark"], docs, "n_chars",
        origin=_DECAY_ORIGIN, scale=_DECAY_SCALE, decay=_DECAY_DECAY,
        fn="gauss", boost_mode="multiply", k=None, mode="and",
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _decay_gauss_sql() -> str:
    exact = _bm25_sql(["spark"], "and", None).replace(
        "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
    )
    d = f"greatest(0.0, abs(d.n_chars::DOUBLE - {_DECAY_ORIGIN}))"
    return f"""
WITH base AS ({exact})
SELECT b.doc_id,
       round(b.s * exp(-({d} * {d}) / {_DECAY_2S2}), 4) AS score
FROM base b JOIN documents d USING (doc_id)
"""


_NEAR3_TERMS, _NEAR3_SLOP = ["table", "hash", "row"], 4


def _bm25_span_near3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-clause unordered span_near (slop 4): all three terms inside
    a window of width <= 3 + slop in any order — the minimal-covering-
    window positional kernel (phrase.near_any_match), scored as BM25 AND
    restricted to matching docs."""
    idx = _docs_index_pos(spark, sf_dir)
    out = idx.search_span_near(
        _NEAR3_TERMS, slop=_NEAR3_SLOP, in_order=False, k=None
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_span_near3_sql() -> str:
    t1, t2, t3 = _NEAR3_TERMS
    w = len(_NEAR3_TERMS) + _NEAR3_SLOP
    exact = _bm25_sql(list(_NEAR3_TERMS), "and", None)
    # brute-force positional witness: any (p1, p2, p3) with
    # greatest - least + 1 <= window
    return f"""
WITH ptoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
hits AS (
  SELECT DISTINCT a.doc_id FROM ptoks a
  JOIN ptoks b ON b.doc_id = a.doc_id AND b.term = '{t2}'
  JOIN ptoks c ON c.doc_id = a.doc_id AND c.term = '{t3}'
  WHERE a.term = '{t1}'
    AND greatest(a.pos, b.pos, c.pos) - least(a.pos, b.pos, c.pos) + 1 <= {w}
)
SELECT * FROM ({exact}) WHERE doc_id IN (SELECT doc_id FROM hits)
"""


_SNM_TERMS = ("scan", "slow", "small", "sort", "spark", "stream")


def _span_near_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_near with GENERAL sub-clauses: span_multi(prefix s*) near
    span_near(hash, join, slop 2), outer slop 1 — the two-clause
    enumerated-spans kernel (phrase.near_span_pairs, Lucene cover −
    widths <= slop contract, variable widths on the inner near). The
    same kernel carries field_masking_span (masked clause = the other
    analyzer's term-class spans)."""
    idx = _docs_index_pos(spark, sf_dir)
    clause_a = idx.span_multi("s", kind="prefix")
    assert clause_a == ("any", list(_SNM_TERMS)), clause_a
    out = idx.search_span_near_spans(
        clause_a, ("near", "hash", "join", 2, False), slop=1,
        in_order=False, k=None,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _span_near_multi_sql() -> str:
    tlist = ", ".join(f"'{t}'" for t in _SNM_TERMS)
    return f"""
WITH {_PTOKS_ONLY_CTE},
{_bm25_body(f"term IN ({tlist}, 'hash', 'join')")},
spans_b AS (
  SELECT a.doc_id, least(a.pos, b.pos) AS s, greatest(a.pos, b.pos) + 1 AS e
  FROM ptoks a JOIN ptoks b ON a.doc_id = b.doc_id
  WHERE a.term = 'hash' AND b.term = 'join' AND abs(a.pos - b.pos) <= 2
),
hits AS (
  SELECT DISTINCT sb.doc_id
  FROM ptoks t JOIN spans_b sb ON t.doc_id = sb.doc_id
  WHERE t.term IN ({tlist})
    AND greatest(sb.e, t.pos + 1) - least(sb.s, t.pos)
        - (1 + (sb.e - sb.s)) <= 1
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM hits)
"""


def _span_field_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field_masking_span: span_near(text:fast, mask(title:key),
    slop 3) — the masked clause's positions come from the TITLE field's
    positional index (the derived first-8-tokens field, so positions
    align with the text's — ES's same-source-text use case). Per-doc
    seg_ids align across the two doc_hash indexes, so the union of the
    two pushed scans cogroups per segment with one shuffle
    (engine.search_span_near_masked). Scored over the primary field's
    terms only (documented contract)."""
    text_idx = _docs_index_pos(spark, sf_dir)
    title_idx = _docs_index_title(spark, sf_dir)
    out = text_idx.search_span_near_masked(
        title_idx, ("term", "fast"), ("term", "key"), slop=3,
        in_order=False, k=None,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_SPAN_FIELD_MASKING_SQL = f"""
WITH {_PTOKS_ONLY_CTE},
{_bm25_body("term = 'fast'")},
hits AS (
  SELECT DISTINCT a.doc_id
  FROM ptoks a JOIN ptoks b ON a.doc_id = b.doc_id
  WHERE a.term = 'key' AND a.pos < 8 AND b.term = 'fast'
    AND abs(a.pos - b.pos) <= 4
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM hits)
"""


_SYN_MAP = {"join": ["merge"]}


def _synonym_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time synonym expansion: `spark AND join` with join≡merge —
    clause groups [[spark], [join, merge]] through the group-conjunctive
    kernel; every matched variant scores with its own idf
    (scoring_boolean, the engine's documented SynonymQuery deviation)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_synonyms(["spark", "join"], _SYN_MAP, k=None, mode="and")
    return out.select("doc_id", F.round("score", 4).alias("score"))


_SYNONYM_SQL = f"""
WITH {_bm25_body(
    "term IN ('spark', 'join', 'merge')",
    having=(
        "HAVING max(CASE WHEN tf.term = 'spark' THEN 1 ELSE 0 END) = 1 "
        "AND max(CASE WHEN tf.term IN ('join', 'merge') THEN 1 ELSE 0 END) = 1"
    ),
)}
SELECT doc_id, round(s, 4) AS score FROM scored
"""

_EQL_SPAN_S = 3600
_EQL_UNTIL_SPAN_S = 86400


def _eql_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL `sequence by user_id with maxspan=1h [view] [error]`: per user,
    each view event chained to the EARLIEST following error within the
    span — one window pass (min of a conditional doc-blocked key over the
    following frame), ids decoded from the key, no self-join."""
    from elasticsearch_assets_spark.operators.sequences import eql_sequence

    ev = load_sf_table(spark, sf_dir, "events")
    return eql_sequence(
        ev, "user_id",
        ["event_type = 'view'", "event_type = 'error'"],
        maxspan_seconds=_EQL_SPAN_S,
    )


_EQL_SQL = f"""
WITH keyed AS (
  SELECT user_id, event_type,
         date_diff('millisecond', TIMESTAMP '1970-01-01 00:00:00', ts)
           * 1000000 + event_id AS k
  FROM events
),
nxt AS (
  SELECT user_id, event_type, k,
         min(CASE WHEN event_type = 'error' THEN k END) OVER (
           PARTITION BY user_id ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS n1
  FROM keyed
)
SELECT user_id, (k % 1000000)::BIGINT AS id_0, (n1 % 1000000)::BIGINT AS id_1,
       ((n1 // 1000000) - (k // 1000000))::BIGINT AS span_ms
FROM nxt
WHERE event_type = 'view' AND n1 IS NOT NULL
  AND (n1 // 1000000) - (k // 1000000) <= {_EQL_SPAN_S * 1000}
"""

def _eql_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL `sequence by user_id with maxspan=1h [view] [error] until
    [purchase]`: the view->error chain is DISCARDED when a purchase event
    falls between its two events (the sequence expires — ES EQL until).
    Same single window pass as eql_sequence plus one conditional-min
    column and one filter; no extra shuffle."""
    from elasticsearch_assets_spark.operators.sequences import eql_sequence

    ev = load_sf_table(spark, sf_dir, "events")
    return eql_sequence(
        ev, "user_id",
        ["event_type = 'view'", "event_type = 'error'"],
        maxspan_seconds=_EQL_UNTIL_SPAN_S,
        until="event_type = 'click'",
    )


_EQL_UNTIL_SQL = f"""
WITH keyed AS (
  SELECT user_id, event_type,
         date_diff('millisecond', TIMESTAMP '1970-01-01 00:00:00', ts)
           * 1000000 + event_id AS k
  FROM events
),
nxt AS (
  SELECT user_id, event_type, k,
         min(CASE WHEN event_type = 'error' THEN k END) OVER (
           PARTITION BY user_id ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS n1,
         min(CASE WHEN event_type = 'click' THEN k END) OVER (
           PARTITION BY user_id ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS nu
  FROM keyed
)
SELECT user_id, (k % 1000000)::BIGINT AS id_0, (n1 % 1000000)::BIGINT AS id_1,
       ((n1 // 1000000) - (k // 1000000))::BIGINT AS span_ms
FROM nxt
WHERE event_type = 'view' AND n1 IS NOT NULL
  AND (n1 // 1000000) - (k // 1000000) <= {_EQL_UNTIL_SPAN_S * 1000}
  AND (nu IS NULL OR nu >= n1)
"""


def _eql_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL `sample by user_id [view] [error] [purchase]` — UNORDERED
    correlation: one sample per user having at least one of each event
    type, earliest event per query (deterministic deviation from ES's
    arbitrary pick). One hash agg of conditional mins, no window, no
    join (operators/sequences.eql_sample)."""
    from elasticsearch_assets_spark.operators.sequences import eql_sample

    ev = load_sf_table(spark, sf_dir, "events")
    return eql_sample(
        ev, "user_id",
        ["event_type = 'view'", "event_type = 'error'",
         "event_type = 'purchase'"],
    )


_EQL_SAMPLE_SQL = """
WITH keyed AS (
  SELECT user_id, event_type,
         date_diff('millisecond', TIMESTAMP '1970-01-01 00:00:00', ts)
           * 1000000 + event_id AS k
  FROM events
),
g AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN k END) AS k0,
         min(CASE WHEN event_type = 'error' THEN k END) AS k1,
         min(CASE WHEN event_type = 'purchase' THEN k END) AS k2
  FROM keyed GROUP BY user_id
)
SELECT user_id, (k0 % 1000000)::BIGINT AS id_0,
       (k1 % 1000000)::BIGINT AS id_1, (k2 % 1000000)::BIGINT AS id_2
FROM g WHERE k0 IS NOT NULL AND k1 IS NOT NULL AND k2 IS NOT NULL
"""


def _eql_sequence3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step EQL chain — `sequence by user_id with maxspan=24h
    [view] with runs=2 [error]` (EQL's runs syntax is literal step
    repetition): pins the multi-hop path, where chains longer than two
    steps extend via unique-key equi-joins on the encoded event key
    (the 2-step row decodes from one window pass alone)."""
    from elasticsearch_assets_spark.operators.sequences import eql_sequence

    ev = load_sf_table(spark, sf_dir, "events")
    return eql_sequence(
        ev, "user_id",
        ["event_type = 'view'", "event_type = 'view'",
         "event_type = 'error'"],
        maxspan_seconds=_EQL_UNTIL_SPAN_S,
    )


_EQL_SEQ3_SQL = f"""
WITH keyed AS (
  SELECT user_id, event_type,
         date_diff('millisecond', TIMESTAMP '1970-01-01 00:00:00', ts)
           * 1000000 + event_id AS k
  FROM events
),
nxt AS (
  SELECT user_id, event_type, k,
         min(CASE WHEN event_type = 'view' THEN k END) OVER (
           PARTITION BY user_id ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS nv,
         min(CASE WHEN event_type = 'error' THEN k END) OVER (
           PARTITION BY user_id ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS ne
  FROM keyed
)
SELECT a.user_id,
       (a.k % 1000000)::BIGINT AS id_0,
       (a.nv % 1000000)::BIGINT AS id_1,
       (b.ne % 1000000)::BIGINT AS id_2,
       ((b.ne // 1000000) - (a.k // 1000000))::BIGINT AS span_ms
FROM nxt a JOIN nxt b ON b.k = a.nv
WHERE a.event_type = 'view' AND a.nv IS NOT NULL AND b.ne IS NOT NULL
  AND (b.ne // 1000000) - (a.k // 1000000) <= {_EQL_UNTIL_SPAN_S * 1000}
"""


_BC_INDICATOR = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]


def _bucket_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_correlation pipeline agg: Pearson correlation between the
    'spark' match set's n_chars-histogram bucket counts (interval 200,
    absent buckets 0) and a 10-entry indicator — one semi-joined hash agg
    + a corr over bucket cardinality."""
    from elasticsearch_assets_spark.operators.facets import bucket_correlation

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = bucket_correlation(matches, docs, "n_chars", 200.0, _BC_INDICATOR)
    return out.select(_f4("correlation").alias("correlation"))


_BUCKET_CORR_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
hist AS (
  SELECT floor(d.n_chars / 200.0)::BIGINT AS b, count(*)::DOUBLE AS cnt
  FROM documents d JOIN m USING (doc_id)
  WHERE floor(d.n_chars / 200.0) >= 0 AND floor(d.n_chars / 200.0) < 10
  GROUP BY 1
),
ind AS (
  SELECT i AS b, (i + 1)::DOUBLE AS ind FROM range(0, 10) r(i)
),
dense AS (
  SELECT ind.b, coalesce(hist.cnt, 0.0) AS cnt, ind.ind
  FROM ind LEFT JOIN hist USING (b)
)
SELECT floor(corr(cnt, ind) * 10000.0 + 0.5) / 10000.0 AS correlation FROM dense
"""

_KNN_OUT_K, _KNN_OUT_N = 5, 10


def _knn_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ML outlier detection (distance to the k-th nearest neighbor,
    cosine distance, k=5): top-10 most isolated embeddings — the labeled
    exact O(n²) verification baseline (the scale path probes IVF/LSH
    buckets; see operators/similarity.py)."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    out = OS.knn_outlier_scores(emb, k=_KNN_OUT_K, top_n=_KNN_OUT_N)
    return out.select("vec_id", F.round("score", 4).alias("score"))


_KNN_OUTLIERS_SQL = f"""
SELECT vec_id, round(score, 4) AS score FROM (
  SELECT a_id AS vec_id, dist AS score FROM (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, 1.0 - {_COS_AB} AS dist
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  )
  QUALIFY row_number() OVER (PARTITION BY a_id ORDER BY dist ASC, b_id ASC) = {_KNN_OUT_K}
)
ORDER BY score DESC, vec_id ASC LIMIT {_KNN_OUT_N}
"""


# ---------------------------------------------------------------------------
# Batch 3h: corpus-LM quality, hashed classifier, LSH near-dup pairs,
# parent agg, KS-test agg
# ---------------------------------------------------------------------------


def _unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under the corpus's own unigram LM — the
    order-0 KenLM quality proxy (textstats.unigram_lm_score: one term
    hash agg + one join back + one doc hash agg)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.unigram_lm_score(docs)
    return out.select("doc_id", "n_tokens", _f4("xent").alias("xent"))


def _unigram_lm_sql() -> str:
    return f"""
SELECT doc_id, n_tokens,
       floor(xent * 10000.0 + 0.5) / 10000.0 AS xent
FROM ({OT.unigram_lm_sql()})
"""


def _hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped hashed linear classifier (deterministic stand-in
    weights, declared model boundary): sigmoid of the mean hashed-bucket
    weight — pure JVM fold, zero shuffle."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.hash_classifier_score(docs, n_buckets=4096)
    return out.select("doc_id", "n_tokens", _f4("score").alias("score"))


def _hash_classifier_sql() -> str:
    return f"""
SELECT doc_id, n_tokens,
       floor(score * 10000.0 + 0.5) / 10000.0 AS score
FROM ({OT.hash_classifier_sql(n_buckets=4096)})
"""


_LSH_ND_PLANES, _LSH_ND_TABLES = 4, 8


def _emb_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs THROUGH banded sign-LSH tables (the scale
    path for the exact emb_neardup baseline): candidates agree on all 4
    plane signs in >= 1 of 8 tables (band-OR, ~0.80 expected recall at
    this corpus's pair angles), exact cosine >= 0.45 verify."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    out = OS.lsh_neardup_pairs(
        emb, tau=0.45, n_planes=_LSH_ND_PLANES, n_tables=_LSH_ND_TABLES
    )
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def _emb_lsh_neardup_sql() -> str:
    tables = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, "
        f"{_bucket_sql('embedding', _LSH_ND_PLANES, t)} AS c FROM embeddings"
        for t in range(_LSH_ND_TABLES)
    )
    return f"""
WITH coded AS ({tables}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM coded a JOIN coded b ON a.t = b.t AND a.c = b.c AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 4) AS cosine FROM (
  SELECT id_a, id_b, {_COS_AB.replace('a.embedding', 'va.embedding').replace('b.embedding', 'vb.embedding')} AS cos
  FROM cand JOIN embeddings va ON va.vec_id = id_a
            JOIN embeddings vb ON vb.vec_id = id_b
) WHERE cos >= 0.45
"""


def _facet_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES parent agg (children's inverse hop): return-flag buckets on
    CHILD lineitems, metrics over the DISTINCT parent orders — a parent
    reached via several children counts once."""
    from elasticsearch_assets_spark.operators.facets import facet_parent

    li = load_sf_table(spark, sf_dir, "lineitem")
    orders = load_sf_table(spark, sf_dir, "orders")
    out = facet_parent(
        li, orders, "l_returnflag", "l_orderkey", "o_orderkey", "o_totalprice"
    )
    return out.select(
        "l_returnflag", "parent_count", _f4("sum_value").alias("sum_value")
    )


_FACET_PARENT_SQL = """
WITH uniq AS (
  SELECT DISTINCT l.l_returnflag, o.o_orderkey, o.o_totalprice
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT l_returnflag, count(*)::BIGINT AS parent_count,
       floor(sum(o_totalprice) * 10000.0 + 0.5) / 10000.0 AS sum_value
FROM uniq GROUP BY 1 ORDER BY 1
"""


def _facet_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_count_ks_test: KS statistics (less / greater /
    two_sided) of the 'spark' match set's n_chars histogram against the
    uniform expectation over 10 buckets."""
    from elasticsearch_assets_spark.operators.facets import bucket_count_ks_test

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = bucket_count_ks_test(matches, docs, "n_chars", 200.0, 10)
    return out.select(
        _f4("less").alias("less"),
        _f4("greater").alias("greater"),
        _f4("two_sided").alias("two_sided"),
    )


_FACET_KS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
hist AS (
  SELECT floor(d.n_chars / 200.0)::BIGINT AS b, count(*)::DOUBLE AS cnt
  FROM documents d JOIN m USING (doc_id)
  WHERE floor(d.n_chars / 200.0) >= 0 AND floor(d.n_chars / 200.0) < 10
  GROUP BY 1
),
dense AS (
  SELECT i AS b, coalesce(hist.cnt, 0.0) AS cnt, 0.1 AS frac
  FROM range(0, 10) r(i) LEFT JOIN hist ON hist.b = i
),
diffs AS (
  SELECT (sum(cnt) OVER (ORDER BY b) / sum(cnt) OVER ())
         - sum(frac) OVER (ORDER BY b) AS d
  FROM dense
)
SELECT floor(-min(d) * 10000.0 + 0.5) / 10000.0 AS less,
       floor(max(d) * 10000.0 + 0.5) / 10000.0 AS greater,
       floor(max(abs(d)) * 10000.0 + 0.5) / 10000.0 AS two_sided
FROM diffs
"""


# ---------------------------------------------------------------------------
# Batch 3i: dup-span removal, text normalization, stemmed search,
# sequence packing
# ---------------------------------------------------------------------------


def _dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. exact-substring dedup, APPLY step: tokens covered by
    corpus-duplicated L-windows are dropped and the doc fingerprinted
    from the survivors (dedup.remove_duplicate_spans — the detect step's
    two compact shuffles + one doc-keyed join, text never shuffled)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.remove_duplicate_spans(docs, L=_DSPAN_L)


_DUP_REMOVAL_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(tk[i : i + {_DSPAN_L - 1}], ' ')) AS h
  FROM t, unnest(range(1, len(tk) - {_DSPAN_L} + 2)) AS g(i)
  WHERE len(tk) >= {_DSPAN_L}
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS n FROM w
  ) WHERE n >= 2
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_DSPAN_L} AS e FROM (
    SELECT doc_id, pos,
           sum(CASE WHEN prev IS NULL OR pos - prev > {_DSPAN_L}
               THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM (
      SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM marked
    )
  ) GROUP BY doc_id, island
),
pos AS (
  SELECT doc_id, i AS pos, tk[i] AS term
  FROM t, unnest(range(1, len(tk) + 1)) AS g(i)
),
kept AS (
  SELECT p.* FROM pos p WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = p.doc_id AND p.pos >= s.s AND p.pos < s.e
  )
)
SELECT t.doc_id, len(t.tk)::BIGINT AS n_tokens,
       (len(t.tk) - count(k.pos))::BIGINT AS n_removed,
       md5(coalesce(string_agg(k.term, ' ' ORDER BY k.pos), '')) AS clean_fp
FROM t LEFT JOIN kept k USING (doc_id)
GROUP BY t.doc_id, len(t.tk)
"""


def _normalized_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization pass (control/format strip + whitespace collapse +
    trim) with the md5 identity downstream exact-dedup keys on — one JVM
    regexp chain, zero shuffle."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.normalize_text(docs)


def _bm25_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stemmed matching: `joins AND tables` — neither surface form exists
    in the dictionary, but their S-stems map to dictionary classes
    {join} and {table} (query/expand.py s_stem, the SAME CASE text in
    both engines), scored group-conjunctively."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_stemmed(["joins", "tables"], k=None, mode="and")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_stemmed_sql() -> str:
    from elasticsearch_assets_spark.query.expand import s_stem_sql

    stem = s_stem_sql("tf.term")
    return f"""
WITH {_bm25_body(
    f"{s_stem_sql('term')} IN ('join', 'table')",
    having=(
        "HAVING max(CASE WHEN __STEM__ = 'join' THEN 1 ELSE 0 END) = 1 "
        "AND max(CASE WHEN __STEM__ = 'table' THEN 1 ELSE 0 END) = 1"
    ).replace("__STEM__", stem),
)}
SELECT doc_id, round(s, 4) AS score FROM scored
"""


_PACK_WINDOW = 2048


def _packed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing under a 2048-token context: each doc's
    global token offset via a DISTRIBUTED prefix sum (per-bucket
    subtotals folded planning-level + within-bucket window), bin/offset
    derived with integer div."""
    from elasticsearch_assets_spark.operators.packing import pack_documents

    docs = load_sf_table(spark, sf_dir, "documents")
    return pack_documents(docs, _PACK_WINDOW, bucket_width=100)


_PACKED_SQL = f"""
WITH n AS (
  SELECT doc_id, len({tokens_sql('text')})::BIGINT AS n_tokens FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS global_offset
  FROM n
)
SELECT doc_id, n_tokens, global_offset,
       (global_offset // {_PACK_WINDOW})::BIGINT AS bin,
       (global_offset % {_PACK_WINDOW})::BIGINT AS bin_offset
FROM o
"""


# ---------------------------------------------------------------------------
# Batch 3j: ES|QL pipes
# ---------------------------------------------------------------------------

_ESQL_STATS_Q = (
    "FROM events"
    ' | WHERE event_type == "click" AND value > 5'
    " | EVAL day = date_format(ts, 'yyyy-MM-dd')"
    " | STATS n = count(*), avg_v = avg(value) BY day"
    " | SORT day"
    " | LIMIT 10"
)


def _esql_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL analytics pipe (FROM | WHERE | EVAL | STATS BY | SORT |
    LIMIT) compiled to ONE Catalyst plan — the filter pushes into the
    scan, STATS partial-aggregates, SORT+LIMIT collapses to
    TakeOrderedAndProject (query/esql.py)."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(_ESQL_STATS_Q, spark=spark, sf_dir=sf_dir)
    return out.select("day", "n", _f4("avg_v").alias("avg_v"))


_ESQL_STATS_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       count(*)::BIGINT AS n,
       floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_v
FROM events WHERE event_type = 'click' AND value > 5
GROUP BY 1 ORDER BY day LIMIT 10
"""

_ESQL_ROW_Q = (
    "FROM documents"
    " | WHERE n_chars >= 300"
    " | EVAL ratio = CAST(n_chars AS DOUBLE) / 100.0"
    " | RENAME lang AS language"
    " | KEEP doc_id, language, ratio"
    " | SORT ratio DESC, doc_id ASC"
    " | LIMIT 15"
)


def _esql_rowpipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level ES|QL pipe (EVAL / RENAME / KEEP / multi-key SORT):
    stays one projection + TakeOrderedAndProject, no shuffle beyond the
    top-k merge."""
    from elasticsearch_assets_spark.query.esql import esql

    return esql(_ESQL_ROW_Q, spark=spark, sf_dir=sf_dir)


_ESQL_ROW_SQL = """
SELECT doc_id, lang AS language, n_chars::DOUBLE / 100.0::DOUBLE AS ratio
FROM documents WHERE n_chars >= 300
ORDER BY ratio DESC, doc_id ASC LIMIT 15
"""


# ---------------------------------------------------------------------------
# Batch 3k: GROK/DISSECT, fuzzy completion, _count, indices_boost
# ---------------------------------------------------------------------------

_GROK_PAT = '"k": %{NUMBER:k:int}'


def _esql_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL GROK: typed field extraction from the events props JSON-ish
    string via the compiled pattern regex (one JVM regexp_extract),
    aggregated per event type."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        f"FROM events | GROK props '{_GROK_PAT}'"
        " | STATS n = count(*), mx = max(k), s = sum(k) BY event_type"
        " | SORT event_type",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("event_type", "n", "mx", "s")


def _esql_grok_sql() -> str:
    from elasticsearch_assets_spark.query.esql import grok_compile

    regex, _ = grok_compile(_GROK_PAT)
    return f"""
SELECT event_type, count(*)::BIGINT AS n,
       max(k)::INT AS mx, sum(k)::BIGINT AS s
FROM (
  SELECT event_type,
         nullif(regexp_extract(props, '{regex}', 1), '')::INT AS k
  FROM events
) GROUP BY event_type ORDER BY event_type
"""


_DISSECT_PAT = '{{"k": %{{v}}}}'.replace("{{", "{").replace("}}", "}")


def _esql_dissect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL DISSECT: anchored literal-layout extraction (the whole
    props string must match the template), extracted hole cast and
    summed."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        f"FROM events | DISSECT props '{_DISSECT_PAT}'"
        " | EVAL vi = CAST(v AS INT)"
        " | STATS n_matched = count(vi), total = sum(vi)",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("n_matched", "total")


def _esql_dissect_sql() -> str:
    from elasticsearch_assets_spark.query.esql import dissect_compile

    regex, _ = dissect_compile(_DISSECT_PAT)
    return f"""
SELECT count(vi)::BIGINT AS n_matched, sum(vi)::BIGINT AS total FROM (
  SELECT nullif(regexp_extract(props, '{regex}', 1), '')::INT AS vi
  FROM events
)
"""


_FUZZY_PREFIX = "quary"  # typo of 'query' — no exact dictionary prefix


def _completion_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester with fuzzy=1: typo-tolerant type-ahead —
    dictionary terms whose leading |prefix| chars are within one edit,
    exact prefixes ranked first, then df DESC, term ASC."""
    idx = _docs_index(spark, sf_dir)
    return idx.suggest_completion_fuzzy(_FUZZY_PREFIX, size=5, fuzziness=1)


_COMPLETION_FUZZY_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dict AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
)
SELECT term AS suggestion, df,
       (term LIKE '{_FUZZY_PREFIX}%') AS exact
FROM dict
WHERE length(term) >= {len(_FUZZY_PREFIX) - 1}
  AND levenshtein(substr(term, 1, {len(_FUZZY_PREFIX)}), '{_FUZZY_PREFIX}') <= 1
ORDER BY exact DESC, df DESC, suggestion ASC LIMIT 5
"""


def _count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _count: live-doc count for a query string (filter context —
    the ranking cut disabled, structured clauses pruned at the scan)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    n = idx.count_query("spark AND jo* AND n_chars:>=400", docs)
    return spark.createDataFrame([(n,)], "cnt long")


_COUNT_QUERY_SQL = f"""
SELECT count(*)::BIGINT AS cnt FROM ({_QS_SQL})
"""


def _docs_shards(spark: SparkSession, sf_dir: str):
    """Two-shard split of the documents corpus (doc_id parity), cached
    like _docs_index — backs the indices_boost row and mirrors the
    docs/SCALE.md sharded-serving topology."""
    from elasticsearch_assets_spark.query.sharded import ShardedIndex

    key = os.path.abspath(sf_dir) + "#shards"
    if key not in _INDEX_CACHE:
        import json

        from elasticsearch_assets_spark.analysis.tokenizer import TOKENIZER_VERSION
        from elasticsearch_assets_spark.index.codec import CODEC_VERSION

        dirs = []
        for p in (0, 1):
            d = _idx_dir(sf_dir, f"_shard{p}")
            meta_path = os.path.join(d, "meta.json")
            stale = True
            if os.path.exists(meta_path):
                with open(meta_path) as fh:
                    m = json.load(fh)
                stale = (
                    m.get("codec_version") != CODEC_VERSION
                    or m.get("tokenizer_version") != TOKENIZER_VERSION
                )
            if stale:
                docs = load_sf_table(spark, sf_dir, "documents")
                build_index(
                    spark, docs.where(F.col("doc_id") % 2 == p), d,
                    id_col="doc_id", text_col="text",
                    num_segments=4, num_chunks=1,
                )
            dirs.append(d)
        _INDEX_CACHE[key] = ShardedIndex(spark, dirs)
    return _INDEX_CACHE[key]


_IB_BOOSTS = [1.0, 1.5]


def _indices_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES indices_boost: per-index score multipliers applied before the
    coordinator's global merge (monotone within a shard, so per-shard
    top-k cuts are unchanged). Two parity shards with GLOBAL collection
    stats — scores are the monolithic BM25 × the shard's boost."""
    sharded = _docs_shards(spark, sf_dir)
    out = sharded.search(["spark", "join"], k=None, mode="and",
                         boosts=_IB_BOOSTS)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _indices_boost_sql() -> str:
    exact = _bm25_sql(["spark", "join"], "and", None).replace(
        "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
    )
    return f"""
WITH base AS ({exact})
SELECT doc_id,
       round(s * CASE WHEN doc_id % 2 = 0 THEN {_IB_BOOSTS[0]!r}
                      ELSE {_IB_BOOSTS[1]!r} END, 4) AS score
FROM base
"""


# ---------------------------------------------------------------------------
# Batch 3l: ES|QL joins/expansion/literals, terminate_after, terms
# partitioning
# ---------------------------------------------------------------------------


def _esql_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL LOOKUP JOIN (ES 8.18): broadcast left join against a lookup
    index, then an aggregation — the classic fact-to-dim enrichment as
    one pipe."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM lineitem"
        " | RENAME l_orderkey AS o_orderkey"
        " | LOOKUP JOIN orders ON o_orderkey"
        " | STATS revenue = sum(l_extendedprice), n = count(*) BY o_orderpriority"
        " | SORT o_orderpriority",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        "o_orderpriority", _f4("revenue").alias("revenue"), "n"
    )


_ESQL_LOOKUP_SQL = """
SELECT o.o_orderpriority,
       floor(sum(l.l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS revenue,
       count(*)::BIGINT AS n
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1 ORDER BY 1
"""


def _esql_mv_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL MV_EXPAND: multivalued column to rows (explode_outer), then
    scalar stats over the expanded values."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM embeddings | MV_EXPAND embedding"
        " | STATS n = count(*), mn = min(embedding), mx = max(embedding)",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("n", _f4("mn").alias("mn"), _f4("mx").alias("mx"))


_ESQL_MV_SQL = """
SELECT count(*)::BIGINT AS n,
       floor(min(v)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS mn,
       floor(max(v)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS mx
FROM (SELECT unnest(embedding) AS v FROM embeddings)
"""


def _esql_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ROW: a literal one-row source piped through EVAL."""
    from elasticsearch_assets_spark.query.esql import esql

    return esql("ROW a = 1, b = 'x' | EVAL c = a * 10", spark=spark, sf_dir=sf_dir)


_ESQL_ROW_LIT_SQL = "SELECT 1 AS a, 'x' AS b, 10 AS c"

_TA_N = 50


def _terminate_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terminate_after: rank only the first N collected matches —
    deterministic contract: the N smallest matching doc_ids (a doc-id
    top-N cut, no full sort), then the usual score order."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_terminate_after(["spark"], _TA_N, k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _terminate_after_sql() -> str:
    exact = _bm25_sql(["spark"], "and", None).replace(
        "SELECT doc_id, round(s, 4) AS score", "SELECT doc_id, s"
    )
    return f"""
WITH base AS ({exact}),
firstn AS (SELECT doc_id, s FROM base ORDER BY doc_id ASC LIMIT {_TA_N})
SELECT doc_id, round(s, 4) AS score FROM firstn
ORDER BY s DESC, doc_id ASC LIMIT 10
"""


_FTP_PART, _FTP_NUM = 1, 4


def _facet_terms_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg with include.partition: worker 1 of 4 aggregates only
    its hash partition of the keyspace — P coordinated requests cover
    every term exactly once (pre-shuffle predicate, 1/P of the pairs
    move)."""
    from elasticsearch_assets_spark.operators.facets import (
        facet_terms_partition,
    )

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return facet_terms_partition(
        matches, docs, "text", _FTP_PART, _FTP_NUM, n=10
    )


def _facet_terms_part_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
dt AS (SELECT DISTINCT doc_id, term FROM toks JOIN m USING (doc_id))
SELECT term, count(*)::BIGINT AS doc_count FROM dt
WHERE ({hash60_sql('term')} % {_FTP_NUM}) = {_FTP_PART}
GROUP BY term ORDER BY doc_count DESC, term ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Batch 3m: optimistic concurrency, late interaction, knn similarity,
# ILM retention
# ---------------------------------------------------------------------------


def _occ_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES optimistic concurrency (if_seq_no): a versioned keyed table takes
    a batch where even keys carry the CORRECT expected seq (0) and odd
    keys a stale one (7) — even rows update and bump _seq_no, odd rows
    stay untouched (the conflict report carries them), one brand-new key
    inserts at seq 0."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable

    docs = load_sf_table(spark, sf_dir, "documents")
    scratch = os.path.join("/tmp", "esa_occ", uuid.uuid4().hex[:12])
    try:
        t = KeyedParquetTable(spark, scratch, key="doc_id", num_buckets=8)
        t.create(
            docs.select(
                "doc_id", "n_chars", F.lit(0).cast("long").alias("_seq_no")
            )
        )
        batch = docs.where(F.col("doc_id") < 100).select(
            "doc_id",
            (F.col("n_chars") * 2).alias("n_chars"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(0))
            .otherwise(F.lit(7)).cast("long").alias("_if_seq_no"),
        )
        newrow = spark.createDataFrame(
            [(999999, 42, 0)], "doc_id long, n_chars long, _if_seq_no long"
        )
        conflicts = t.upsert_occ(batch.unionByName(newrow))
        n_conflicts = conflicts.count()
        out = (
            t.read()
            .where((F.col("doc_id") < 100) | (F.col("doc_id") == 999999))
            .withColumn("n_conflicts", F.lit(n_conflicts).cast("long"))
            .select("doc_id", "n_chars", "_seq_no", "n_conflicts")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


_OCC_SQL = """
WITH nconf AS (
  SELECT count(*)::BIGINT AS n FROM documents
  WHERE doc_id < 100 AND doc_id % 2 = 1
)
SELECT d.doc_id,
       CASE WHEN d.doc_id % 2 = 0 THEN d.n_chars * 2 ELSE d.n_chars END AS n_chars,
       CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 0 END::BIGINT AS _seq_no,
       nconf.n AS n_conflicts
FROM documents d, nconf WHERE d.doc_id < 100
UNION ALL
SELECT 999999, 42, 0::BIGINT, nconf.n FROM nconf
"""

_MAXSIM_CHUNKS, _MAXSIM_DIM = 4, 16


def _maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_vectors maxSimDotProduct (late interaction / ColBERT):
    docs are multi-vector (the flat embedding chunked 4×16 — synthetic
    stand-in), score = Σ over query vectors of max over doc vectors of
    the dot product; one scan + TakeOrderedAndProject."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    qvecs = [
        qv[i * _MAXSIM_DIM : (i + 1) * _MAXSIM_DIM]
        for i in range(_MAXSIM_CHUNKS)
    ]
    docs_mv = OS.chunk_vectors(emb, _MAXSIM_CHUNKS)
    out = OS.maxsim_topk(docs_mv, qvecs, k=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


def _maxsim_sql() -> str:
    d = _MAXSIM_DIM

    def dot(qi: int, di: int) -> str:
        return (
            f"(SELECT sum(b.embedding[{d * qi}+i]::DOUBLE * "
            f"a.embedding[{d * di}+i]::DOUBLE) FROM range(1,{d + 1}) r(i))"
        )

    terms = " + ".join(
        "greatest(" + ", ".join(dot(qi, di) for di in range(_MAXSIM_CHUNKS)) + ")"
        for qi in range(_MAXSIM_CHUNKS)
    )
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(s, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {terms} AS s
  FROM embeddings a, q b
) ORDER BY s DESC, vec_id ASC LIMIT 10
"""


_SIM_THRESHOLD = 0.3


def _ann_topk_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES knn `similarity` threshold (8.8): hits below the cosine floor
    are pruned even inside the top k — the filter composes into the scan
    before the top-k cut."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.cosine_topk(emb, qv, k=10, similarity=_SIM_THRESHOLD)
    return out.select("vec_id", F.round("score", 4).alias("score"))


def _ann_topk_sim_sql() -> str:
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM embeddings a, q b
) WHERE cos >= {_SIM_THRESHOLD}
ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


_ILM_RETENTION_DAYS = 10


def _ilm_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ILM delete phase over the rollover plan: indexes whose last written
    day is > 10 days behind the newest day get action 'delete' — the
    retention decision every rollover-managed deployment runs."""
    from elasticsearch_assets_spark.operators.transforms import (
        plan_retention,
        plan_rollover,
    )

    ev = load_sf_table(spark, sf_dir, "events")
    plan = plan_rollover(
        ev, "ts", "logs", max_docs=_RO_MAX_DOCS, max_age_days=_RO_MAX_AGE
    )
    out = plan_retention(plan, _ILM_RETENTION_DAYS)
    return out.select(
        "index_name",
        F.date_format("first_day", "yyyy-MM-dd").alias("first_day"),
        F.date_format("last_day", "yyyy-MM-dd").alias("last_day"),
        "n_docs", "action",
    )


def _ilm_retention_sql() -> str:
    fold = _ROLLOVER_SQL.strip().rstrip()
    # reuse the rollover recursion as a CTE body (strip its final SELECT)
    body = fold[: fold.index("SELECT strftime")].rstrip()
    return f"""{body},
plan AS (
  SELECT day, n_docs, printf('logs-%06d', generation) AS index_name
  FROM fold
),
per_idx AS (
  SELECT index_name, min(day) AS first_day, max(day) AS last_day,
         sum(n_docs)::BIGINT AS n_docs
  FROM plan GROUP BY index_name
),
newest AS (SELECT max(day) AS mx FROM plan)
SELECT index_name,
       strftime(first_day, '%Y-%m-%d') AS first_day,
       strftime(last_day, '%Y-%m-%d') AS last_day,
       n_docs,
       CASE WHEN newest.mx - last_day > {_ILM_RETENTION_DAYS}
            THEN 'delete' ELSE 'keep' END AS action
FROM per_idx, newest ORDER BY index_name
"""


# ---------------------------------------------------------------------------
# Batch 3n: term ranges, parent_id, msearch templates, mixture math
# ---------------------------------------------------------------------------

_TR_LO, _TR_HI = "sl", "sp"


def _bm25_term_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene TermRangeQuery over the analyzed field: dictionary terms in
    [sl, sp] (sargable range on the term-sorted stats scan) scored as an
    OR query."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_term_range(_TR_LO, _TR_HI, k=None)
    return out.select("doc_id", F.round("score", 4).alias("score"))


_TERM_RANGE_SQL = _bm25_sql(
    [], "or", None,
    term_cond=f"term >= '{_TR_LO}' AND term <= '{_TR_HI}'",
)


def _parent_id_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES parent_id query: the child docs of ONE parent — a sargable
    equality on the join field (partition-pruned under ES-style routing;
    the parent key is probed planning-level, one min() agg)."""
    from elasticsearch_assets_spark.operators.relations import parent_id

    li = load_sf_table(spark, sf_dir, "lineitem")
    parent = li.agg(F.min("l_orderkey")).head()[0]
    out = parent_id(li, "l_orderkey", parent)
    return out.select("l_orderkey", "l_linenumber", "l_quantity")


_PARENT_ID_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
"""

_MST_TEMPLATES = [
    ({"query": "spark {{extra}}", "mode": "and", "k": 5}, {"extra": "join"}),
    ({"query": "{{t1}} {{t2}}", "mode": "or", "k": 7},
     {"t1": "hash", "t2": "merge"}),
]


def _msearch_template_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _msearch/template: two parameterized spec templates rendered
    then executed through the FUSED msearch scan (one postings decode
    for both)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.msearch_template(_MST_TEMPLATES)
    return out.select("query_id", "doc_id", F.round("score", 4).alias("score"))


def _msearch_template_sql() -> str:
    rendered = [
        (["spark", "join"], "and", 5),
        (["hash", "merge"], "or", 7),
    ]
    parts = []
    for qid, (terms, mode, k) in enumerate(rendered):
        parts.append(
            f"SELECT {qid} AS query_id, * FROM ({_bm25_sql(terms, mode, k)})"
        )
    return " UNION ALL ".join(parts)


_MT_TAU, _MT_BUDGET = 0.5, 30_000


def _mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture reweighting (tau=0.5 flattens toward uniform):
    per-language sampling weights/rates from the corpus-accounting token
    totals — the numbers stratified_sample/upsample then apply."""
    from elasticsearch_assets_spark.operators.sampling import temperature_rates

    docs = load_sf_table(spark, sf_dir, "documents")
    acct = OT.corpus_accounting(docs, ["lang"]).select("lang", "total_tokens")
    out = temperature_rates(acct, "lang", "total_tokens", _MT_TAU, _MT_BUDGET)
    return out.select(
        "lang", "total_tokens", _f4("weight").alias("weight"),
        _f4("target_tokens").alias("target_tokens"), _f4("rate").alias("rate"),
    )


def _mixture_temperature_sql() -> str:
    return f"""
WITH ts AS ({OT.token_stats_sql()}),
acct AS (
  SELECT d.lang, sum(ts.n_tokens)::BIGINT AS total_tokens
  FROM documents d JOIN ts USING (doc_id) GROUP BY 1
),
w AS (
  SELECT lang, total_tokens,
         pow(total_tokens::DOUBLE, {_MT_TAU})
           / sum(pow(total_tokens::DOUBLE, {_MT_TAU})) OVER () AS weight
  FROM acct
)
SELECT lang, total_tokens,
       floor(weight * 10000.0 + 0.5) / 10000.0 AS weight,
       floor(weight * {float(_MT_BUDGET)!r} * 10000.0 + 0.5) / 10000.0
         AS target_tokens,
       floor(weight * {float(_MT_BUDGET)!r} / total_tokens::DOUBLE
             * 10000.0 + 0.5) / 10000.0 AS rate
FROM w
"""


_UP_RATES = {"en": 2.5, "es": 1.0, "fr": 0.4}
_UP_DEFAULT = 1.0


def _mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional replication (the upsampling half of
    mixture application): en docs emit 2 copies plus an md5-decided
    third half the time, fr docs survive 40%, everything else passes
    through once — expected copies == rate, replayable under retries."""
    from elasticsearch_assets_spark.operators.sampling import upsample

    docs = load_sf_table(spark, sf_dir, "documents")
    out = upsample(docs, "lang", _UP_RATES, default_rate=_UP_DEFAULT)
    return out.select("doc_id", "lang", "copy")


def _mixture_upsample_sql() -> str:
    import math

    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    base_case, thr_case = [], []
    for s, r in _UP_RATES.items():
        b = int(math.floor(r))
        base_case.append(f"WHEN '{s}' THEN {b}")
        thr_case.append(f"WHEN '{s}' THEN '{rate_threshold_hex(r - b)}'")
    dbase = int(math.floor(_UP_DEFAULT))
    dthr = rate_threshold_hex(_UP_DEFAULT - dbase)
    return f"""
WITH r AS (
  SELECT doc_id, lang,
         (CASE lang {' '.join(base_case)} ELSE {dbase} END
          + CASE WHEN substr(md5('up|' || CAST(doc_id AS VARCHAR)), 1, 8)
                      < CASE lang {' '.join(thr_case)} ELSE '{dthr}' END
                 THEN 1 ELSE 0 END) AS n
  FROM documents
)
SELECT doc_id, lang, i::INT AS copy
FROM r, unnest(range(0, n)) g(i) WHERE n >= 1
"""


# ---------------------------------------------------------------------------
# Batch 3o: cross-cluster search, index templates, scripted reindex
# ---------------------------------------------------------------------------

_CCS_TERMS = ["spark", "join"]


def _ccs_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cross-cluster search (default minimize-roundtrips): the 'local'
    cluster's body index and the 'remote' cluster's title index each rank
    with their OWN collection stats, the coordinator merges by score —
    no cross-cluster shuffle (engine.cross_cluster_search)."""
    from elasticsearch_assets_spark.query.engine import cross_cluster_search

    clusters = {
        "local": _docs_index(spark, sf_dir),
        "remote": _docs_index_title(spark, sf_dir),
    }
    out = cross_cluster_search(clusters, _CCS_TERMS, k=15, mode="and")
    return out.select(
        "cluster", "doc_id", F.round("score", 4).alias("score")
    )


def _ccs_sql() -> str:
    title = _mm_field_chain(
        "t",
        "SELECT doc_id, unnest(string_split(text, ' ')"
        f"[1:{_TITLE_TOKENS}]) AS term FROM documents",
        terms=_CCS_TERMS,
    )
    body = _mm_field_chain(
        "b",
        "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents",
        terms=_CCS_TERMS,
    )
    n = len(set(_CCS_TERMS))
    return f"""
WITH {title},
{body},
u AS (
  SELECT 'local' AS cluster, b.doc_id, b.s FROM bscored b
  WHERE (SELECT count(*) FROM btf WHERE btf.doc_id = b.doc_id) = {n}
  UNION ALL
  SELECT 'remote' AS cluster, t.doc_id, t.s FROM tscored t
  WHERE (SELECT count(*) FROM ttf WHERE ttf.doc_id = t.doc_id) = {n}
)
SELECT cluster, doc_id, round(s, 4) AS score FROM u
ORDER BY s DESC, cluster ASC, doc_id ASC LIMIT 15
"""


_TEMPLATES = [("logs-*", 10, "logs_tpl"), ("logs-0000*", 20, "hot_tpl"),
              ("*", 0, "default_tpl")]


def _index_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composable index templates: per rollover-plan index name, the
    highest-priority matching pattern wins (shared CASE text in both
    engines — parity by construction)."""
    from elasticsearch_assets_spark.operators.transforms import plan_rollover
    from elasticsearch_assets_spark.sinks.index_selector import (
        resolve_templates,
    )

    ev = load_sf_table(spark, sf_dir, "events")
    plan = plan_rollover(
        ev, "ts", "logs", max_docs=_RO_MAX_DOCS, max_age_days=_RO_MAX_AGE
    ).select("index_name").distinct()
    extra = spark.createDataFrame(
        [("metrics-000001",), ("other",)], "index_name string"
    )
    out = resolve_templates(plan.unionByName(extra), "index_name", _TEMPLATES)
    return out.orderBy("index_name")


def _index_templates_sql() -> str:
    from elasticsearch_assets_spark.sinks.index_selector import (
        template_match_sql,
    )

    fold = _ROLLOVER_SQL.strip()
    body = fold[: fold.index("SELECT strftime")].rstrip()
    case = template_match_sql(_TEMPLATES, "index_name")
    return f"""{body},
names AS (
  SELECT DISTINCT printf('logs-%06d', generation) AS index_name FROM fold
  UNION ALL SELECT 'metrics-000001' UNION ALL SELECT 'other'
)
SELECT index_name, {case} AS template FROM names ORDER BY index_name
"""


def _reindex_scripted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _reindex with a script: the text field is rewritten (truncated
    to its first 10 tokens) DURING the copy, so the destination's
    postings, doc lengths, and collection stats all reflect the
    transformed corpus — the oracle retokenizes the transformed text
    under subset-free full-corpus stats of the NEW index."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.index.build import reindex

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    scratch = os.path.join("/tmp", "esa_reidx", uuid.uuid4().hex[:12])
    try:
        reindex(
            spark, idx, docs, scratch,
            transform={"text": "array_join(slice(split(text, ' '), 1, 10), ' ')"},
            num_segments=4, num_chunks=1,
        )
        new_idx = InvertedIndex(spark, scratch)
        out = new_idx.search(["spark", "join"], k=None, mode="or")
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


_REINDEX_SCRIPTED_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:10]) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ('join', 'spark') GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored
"""


# ---------------------------------------------------------------------------
# Batch 3p: ES|QL enrich/sample, script sort, bounded histogram
# ---------------------------------------------------------------------------


def _esql_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ENRICH: the enrich policy as a broadcast keyed lookup
    projecting only the policy's enrich_fields, then the classic
    revenue-by-segment aggregation."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM orders"
        " | RENAME o_custkey AS c_custkey"
        " | ENRICH customer ON c_custkey WITH c_mktsegment"
        " | STATS revenue = sum(o_totalprice), n = count(*) BY c_mktsegment"
        " | SORT c_mktsegment",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        "c_mktsegment", _f4("revenue").alias("revenue"), "n"
    )


_ESQL_ENRICH_SQL = """
SELECT c.c_mktsegment,
       floor(sum(o.o_totalprice) * 10000.0 + 0.5) / 10000.0 AS revenue,
       count(*)::BIGINT AS n
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1 ORDER BY 1
"""

def _ingest_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES foreach ingest processor: split → per-element uppercase
    (transform lambda, `_value` addressing) → per-element script
    (suffix each token with its length) → join. One fused projection
    chain, zero shuffle."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    docs = load_sf_table(spark, sf_dir, "documents").where(
        "doc_id % 23 = 0"
    ).select("doc_id", "text")
    out = run_pipeline(docs, [
        {"split": {"field": "text", "separator": " ",
                   "target_field": "toks"}},
        {"script": {"target_field": "toks",
                    "source": "slice(toks, 1, 3)"}},
        {"foreach": {"field": "toks", "processor": {"uppercase": {}}}},
        {"foreach": {"field": "toks", "processor": {"script": {
            "source": "concat(_value, ':', CAST(length(_value) AS STRING))"
        }}}},
        {"join": {"field": "toks", "separator": "|",
                  "target_field": "head3"}},
    ], on_failure="drop")
    return out.select("doc_id", "head3").orderBy("doc_id")


_INGEST_FOREACH_SQL = """
SELECT doc_id,
       array_to_string(
         list_transform(string_split(text, ' ')[1:3],
                        x -> upper(x) || ':' || length(x)::VARCHAR),
         '|') AS head3
FROM documents WHERE doc_id % 23 = 0 ORDER BY doc_id
"""


def _esql_metadata_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL `FROM a,b METADATA _index`: the source index name rides the
    union as the _index column — counts per source index over a
    two-table union (documents + a filtered view registered as a second
    index)."""
    from elasticsearch_assets_spark.query.esql import esql

    docs = load_sf_table(spark, sf_dir, "documents")
    en = docs.where(F.col("lang") == "en")
    out = esql(
        "FROM docs_all, docs_en METADATA _index"
        " | STATS n = COUNT(*), chars = SUM(n_chars) BY _index"
        " | SORT _index",
        tables={"docs_all": docs, "docs_en": en},
    )
    return out


_ESQL_METADATA_INDEX_SQL = """
SELECT count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars, _index
FROM (
  SELECT n_chars, 'docs_all' AS _index FROM documents
  UNION ALL
  SELECT n_chars, 'docs_en' AS _index FROM documents WHERE lang = 'en'
)
GROUP BY _index ORDER BY _index
"""


def _esql_mv_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL multivalue battery 3: MV_MEDIAN_ABSOLUTE_DEVIATION (median
    of |x − median|, sorted-middle helper applied twice) and MV_SORT
    with an order literal."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 53 == 0"
        " | EVAL a = array(value, value * 3, value * 7, value * 2)"
        " | EVAL mad = MV_MEDIAN_ABSOLUTE_DEVIATION(a),"
        "   top1 = MV_FIRST(MV_SORT(a, 'DESC'))"
        " | KEEP event_id, mad, top1 | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("event_id", _f4("mad").alias("mad"),
                      _f4("top1").alias("top1"))


_ESQL_MV_FUNCS3_SQL = """
WITH b AS (
  SELECT event_id, [value, value * 3, value * 7, value * 2] AS a
  FROM events WHERE event_id % 53 = 0
),
m AS (
  SELECT event_id, a,
         (list_sort(a)[2]::DOUBLE + list_sort(a)[3]::DOUBLE) / 2 AS med
  FROM b
),
d AS (
  SELECT event_id, a,
         list_sort(list_transform(a, v -> abs(v::DOUBLE - med))) AS dv
  FROM m
)
SELECT event_id,
       floor((dv[2] + dv[3]) / 2 * 1e4 + 0.5) / 1e4 AS mad,
       floor(list_sort(a, 'DESC')[1] * 1e4 + 0.5) / 1e4 AS top1
FROM d ORDER BY event_id
"""


def _esql_enrich_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ENRICH with a GEO_MATCH policy: events' POINT WKT matched
    against BBOX shapes, compiled to a first-match-wins CASE chain of
    closed-interval relations (planning-level policy, zero joins)."""
    from elasticsearch_assets_spark.query.esql import esql

    ev = load_sf_table(spark, sf_dir, "events")
    regions = spark.createDataFrame(
        [("BBOX (-180.0, 0.0, 90.0, -90.0)", "west"),
         ("BBOX (0.0, 90.0, 90.0, -90.0)", "central"),
         ("BBOX (90.0, 180.0, 90.0, -90.0)", "east")],
        "shape string, region string",
    )
    out = esql(
        "FROM events | WHERE event_id % 43 == 0"
        " | EVAL lat = TO_DOUBLE(event_id % 160) - 80.0 + 0.5,"
        "   lon = TO_DOUBLE(event_id * 7 % 360) - 180.0 + 0.5"
        " | EVAL p = CONCAT('POINT (', TO_STRING(lon), ' ',"
        "   TO_STRING(lat), ')')"
        " | ENRICH regions ON p WITH region"
        " | STATS n = COUNT(*) BY region | SORT region",
        tables={"events": ev, "regions": regions},
    )
    return out


_ESQL_ENRICH_GEO_SQL = """
WITH b AS (
  SELECT event_id,
         (event_id % 160)::DOUBLE - 80.0 + 0.5 AS lat,
         (event_id * 7 % 360)::DOUBLE - 180.0 + 0.5 AS lon
  FROM events WHERE event_id % 43 = 0
)
SELECT count(*)::BIGINT AS n,
       CASE WHEN lon >= -180.0 AND lon <= 0.0 THEN 'west'
            WHEN lon >= 0.0 AND lon <= 90.0 THEN 'central'
            WHEN lon >= 90.0 AND lon <= 180.0 THEN 'east'
       END AS region
FROM b GROUP BY region ORDER BY region
"""


def _ingest_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES inference ingest processor with the deterministic
    hash-classifier stand-in (served models = declared boundary, the
    RERANK pattern): pipeline adds ml_score (sigmoid) + ml_class
    (threshold cut), composed after an uppercase processor to prove
    chain order. Zero shuffle."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    docs = load_sf_table(spark, sf_dir, "documents").where(
        "doc_id % 13 = 0"
    ).select("doc_id", "text", "lang")
    out = run_pipeline(docs, [
        {"uppercase": {"field": "lang", "target_field": "lang_uc"}},
        {"inference": {"model_id": "hash-classifier", "field": "text",
                       "target_field": "ml", "threshold": 0.5}},
    ], on_failure="drop")
    return out.select(
        "doc_id", "lang_uc", _f4("ml_score").alias("ml_score"), "ml_class"
    ).orderBy("doc_id")


def _ingest_inference_sql() -> str:
    base = OT.hash_classifier_sql(4096)
    inner = base.replace("FROM documents", "FROM documents WHERE doc_id % 13 = 0")
    return f"""
SELECT doc_id, upper(lang) AS lang_uc,
       floor(score * 1e4 + 0.5) / 1e4 AS ml_score,
       CASE WHEN score >= 0.5 THEN 'hq' ELSE 'lq' END AS ml_class
FROM ({inner}) s JOIN documents USING (doc_id)
ORDER BY doc_id
"""


def _esql_enrich_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ENRICH with a RANGE-type policy (the IP-range/ASN,
    value-band shape): policy rows carry [lo, hi) bands, matched by a
    non-equi broadcast left join — bands disjoint by construction."""
    from elasticsearch_assets_spark.query.esql import esql

    ev = load_sf_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 100.0, "mid"), (100.0, 1e9, "high")],
        "value_lo double, value_hi double, band string",
    )
    out = esql(
        "FROM events"
        " | ENRICH bands ON value WITH band"
        " | STATS n = COUNT(*), av = AVG(value) BY band"
        " | SORT band",
        tables={"events": ev, "bands": bands},
    )
    return out.select("n", _f4("av").alias("av"), "band")


_ESQL_ENRICH_RANGE_SQL = """
SELECT count(*)::BIGINT AS n,
       floor(avg(value) * 1e4 + 0.5) / 1e4 AS av,
       b.band
FROM events e LEFT JOIN (
  VALUES (0.0, 10.0, 'low'), (10.0, 100.0, 'mid'), (100.0, 1e9, 'high')
) b(value_lo, value_hi, band)
  ON e.value >= b.value_lo AND e.value < b.value_hi
GROUP BY b.band ORDER BY b.band
"""

_ESQL_SAMPLE_P = 0.3


def _esql_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL SAMPLE (deterministic variant, documented deviation from the
    random original): md5 hex-prefix cut keyed by event_id — replayable
    under retries/pages, the mixture-sampling machinery in the pipe."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        f"FROM events | SAMPLE {_ESQL_SAMPLE_P} BY event_id"
        " | STATS n = count(*), s = sum(value)",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("n", _f4("s").alias("s"))


def _esql_sample_sql() -> str:
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    thr = rate_threshold_hex(_ESQL_SAMPLE_P)
    return f"""
SELECT count(*)::BIGINT AS n,
       floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS s
FROM events
WHERE substr(md5('esql|' || CAST(event_id AS VARCHAR)), 1, 8) < '{thr}'
"""


def _script_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sort-by-script (`sort: {_script: ...}`): documents ordered by a
    script expression (the engine's one script dialect) with the id
    tie-break, top 20 — Catalyst collapses it to TakeOrderedAndProject."""
    docs = load_sf_table(spark, sf_dir, "documents")
    key = F.expr("n_chars % 97")
    return (
        docs.select("doc_id", key.alias("sort_key"))
        .orderBy(F.col("sort_key").asc(), F.col("doc_id").asc())
        .limit(20)
    )


def _esql_stats_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL per-aggregation filters (8.16: `agg(...) WHERE cond`) —
    compiled to SQL aggregate FILTER clauses, still ONE hash agg."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | STATS clicks = count(*) WHERE event_type == 'click',"
        " big = count(*) WHERE value > 50,"
        " total = count(*),"
        " s_click = sum(value) WHERE event_type == 'click'"
        " BY user_id"
        " | SORT user_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        "user_id", "clicks", "big", "total", _f4("s_click").alias("s_click")
    )


_ESQL_STATS_WHERE_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')::BIGINT AS clicks,
       count(*) FILTER (WHERE value > 50)::BIGINT AS big,
       count(*)::BIGINT AS total,
       floor(sum(value) FILTER (WHERE event_type = 'click')
             * 10000.0 + 0.5) / 10000.0 AS s_click
FROM events GROUP BY user_id ORDER BY user_id
"""


_SCRIPT_SORT_SQL = """
SELECT doc_id, n_chars % 97 AS sort_key FROM documents
ORDER BY sort_key ASC, doc_id ASC LIMIT 20
"""


def _facet_hist_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram with offset + extended_bounds + min_doc_count=0:
    every bucket in [0, 2000) appears (zero rows included), keys shifted
    by offset 50 — the dense-spine LEFT join over the counted histogram."""
    from elasticsearch_assets_spark.operators.facets import (
        facet_histogram_bounds,
    )

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = facet_histogram_bounds(
        matches, docs, "n_chars", 200.0,
        offset=50.0, extended_lo=0.0, extended_hi=1999.0,
    )
    return out.select("bucket", "doc_count")


_FACET_HIST_BOUNDS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
hist AS (
  SELECT (floor((d.n_chars - 50.0) / 200.0) * 200.0 + 50.0)::DOUBLE AS bucket,
         count(*)::BIGINT AS doc_count
  FROM documents d JOIN m USING (doc_id) GROUP BY 1
),
spine AS (
  SELECT (k * 200.0 + 50.0)::DOUBLE AS bucket
  FROM range(CAST(floor(-50.0 / 200.0) AS BIGINT),
             CAST(floor(1949.0 / 200.0) AS BIGINT) + 1) r(k)
)
SELECT s.bucket, coalesce(h.doc_count, 0)::BIGINT AS doc_count
FROM spine s LEFT JOIN hist h USING (bucket) ORDER BY s.bucket
"""


# ---------------------------------------------------------------------------
# Batch 3q: TSDB downsampling, balanced shard export
# ---------------------------------------------------------------------------


def _downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _downsample: raw event samples rolled up to one doc per
    (day, event_type series) with min/max/sum/value_count per metric —
    one partial-aggregated hash agg keyed by (bucket, series)."""
    from elasticsearch_assets_spark.operators.transforms import downsample

    ev = load_sf_table(spark, sf_dir, "events")
    out = downsample(ev, "ts", "day", ["event_type"], ["value"])
    return out.select(
        F.date_format("tbucket", "yyyy-MM-dd").alias("day"),
        "event_type",
        _f4("value_min").alias("value_min"),
        _f4("value_max").alias("value_max"),
        _f4("value_sum").alias("value_sum"),
        "value_value_count",
    )


_DOWNSAMPLE_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
       floor(min(value) * 10000.0 + 0.5) / 10000.0 AS value_min,
       floor(max(value) * 10000.0 + 0.5) / 10000.0 AS value_max,
       floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS value_sum,
       count(value)::BIGINT AS value_value_count
FROM events GROUP BY 1, 2
"""

_BS_SHARDS = 4


def _balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced export sharding: docs ranked by size take shards in
    snake order (LPT-flavored, deterministic) — the writer-side dual of
    sequence packing."""
    from elasticsearch_assets_spark.operators.packing import balanced_shards

    docs = load_sf_table(spark, sf_dir, "documents")
    return balanced_shards(docs, _BS_SHARDS)


def _balanced_shards_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, len({tokens_sql('text')})::BIGINT AS n_tokens FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) - 1 AS rk
  FROM t
)
SELECT doc_id, n_tokens,
       CASE WHEN (rk // {_BS_SHARDS}) % 2 = 0 THEN rk % {_BS_SHARDS}
            ELSE {_BS_SHARDS - 1} - (rk % {_BS_SHARDS}) END::INT AS shard
FROM r
"""


# ---------------------------------------------------------------------------
# Batch 3r: crawl-snapshot drift, n-gram diversity
# ---------------------------------------------------------------------------


def _url_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot drift: the new snapshot re-crawls the same URL
    space, every doc_id % 5 == 0 page changed content, doc_id % 97 == 0
    pages vanished, and one new page appeared — the report drives the
    refetch queue (one full-outer join on the canonical URL)."""
    from elasticsearch_assets_spark.operators.urls import snapshot_drift

    docs = load_sf_table(spark, sf_dir, "documents")
    base = docs.select(
        F.expr(_URL_DERIVE_SQL).alias("url"),
        F.md5(F.col("text")).alias("fp"),
        "doc_id",
    )
    # snapshots are URL-deduped first (keep-first per canonical url =
    # min doc_id, the url_dedup contract)
    from pyspark.sql import Window

    w = Window.partitionBy(F.expr("lower(url)")).orderBy(F.col("doc_id").asc())
    old = (
        base.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1").drop("_rn")
        .where("doc_id % 97 <> 0")  # removed in... present only in old
    )
    docs2 = docs.select("doc_id", "text")
    new = (
        base.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1").drop("_rn")
        .join(docs2, "doc_id")
        .withColumn(
            "fp",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.md5(F.concat(F.col("text"), F.lit("!"))),
            ).otherwise(F.md5(F.col("text"))),
        )
    )
    newrow = spark.createDataFrame(
        [("http://brandnew.example/x", "cafebabe", -1)],
        "url string, fp string, doc_id long",
    )
    out = snapshot_drift(
        old.select("url", "fp"),
        new.select("url", "fp").unionByName(newrow.select("url", "fp")),
    )
    return out.select("curl", "old_fp", "new_fp", "status")


def _url_drift_sql() -> str:
    from elasticsearch_assets_spark.operators.urls import canonical_url_sql

    canon = canonical_url_sql("url")
    return f"""
WITH base AS (
  SELECT {_URL_DERIVE_SQL} AS url, md5(text) AS fp, doc_id, text
  FROM documents
),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lower(url) ORDER BY doc_id ASC
    ) AS rn FROM base
  ) WHERE rn = 1
),
old AS (
  SELECT {canon} AS curl, fp AS old_fp FROM dedup WHERE doc_id % 97 <> 0
),
new AS (
  SELECT {canon} AS curl,
         CASE WHEN doc_id % 5 = 0 THEN md5(text || '!') ELSE md5(text) END
           AS new_fp
  FROM dedup
  UNION ALL
  SELECT {canonical_url_sql("'http://brandnew.example/x'")}, 'cafebabe'
)
SELECT coalesce(old.curl, new.curl) AS curl, old_fp, new_fp,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp = new_fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new ON old.curl = new.curl
"""


_ND_N = 3


def _ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity diagnostic: distinct-trigram ratio per language —
    the corpus-level repetition signal mixture designers check before
    weighting a stratum up."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.ngram_diversity(docs, n=_ND_N, strata_cols=["lang"])
    return out.select(
        "lang", "distinct_ngrams", "total_ngrams",
        _f4("diversity").alias("diversity"),
    )


def _ngram_diversity_sql() -> str:
    return f"""
WITH g AS (
  SELECT lang, unnest({shingles_sql(tokens_sql('text'), _ND_N)}) AS gram
  FROM documents
)
SELECT lang,
       count(DISTINCT gram)::BIGINT AS distinct_ngrams,
       count(*)::BIGINT AS total_ngrams,
       floor(count(DISTINCT gram)::DOUBLE / count(*) * 10000.0 + 0.5)
         / 10000.0 AS diversity
FROM g GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Batch 3s: search-as-you-type index, winnowing fingerprints,
# polygon-with-holes
# ---------------------------------------------------------------------------


def _docs_index_sayt(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """search_as_you_type field: the corpus re-analyzed with index-time
    edge n-grams (prefix lengths 2..4 plus the full token) so bare
    prefixes match INSTANTLY with no dictionary expansion — the ES
    _index_prefix subfield re-expressed as a derived analyzed column."""
    from elasticsearch_assets_spark.operators.texthash import (
        edge_ngrams_expr,
        tokens_expr,
    )

    key = os.path.abspath(sf_dir) + "#sayt"
    if key not in _INDEX_CACHE:
        idx_dir = _idx_dir(sf_dir, "_documents_sayt")
        import json

        from elasticsearch_assets_spark.analysis.tokenizer import TOKENIZER_VERSION
        from elasticsearch_assets_spark.index.codec import CODEC_VERSION

        meta_path = os.path.join(idx_dir, "meta.json")
        stale = True
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                m = json.load(fh)
            stale = (
                m.get("codec_version") != CODEC_VERSION
                or m.get("tokenizer_version") != TOKENIZER_VERSION
            )
        if stale:
            docs = load_sf_table(spark, sf_dir, "documents").select(
                "doc_id",
                F.concat_ws(
                    " ", edge_ngrams_expr(tokens_expr("text"), 2, 4)
                ).alias("sayt"),
            )
            build_index(
                spark, docs, idx_dir, id_col="doc_id", text_col="sayt",
                num_segments=4, num_chunks=1,
            )
        _INDEX_CACHE[key] = InvertedIndex(spark, idx_dir)
    return _INDEX_CACHE[key]


def _bm25_prefix_sayt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix query routed through the sayt companion
    (engine.search_prefix_sayt, round-4 verdict item #4): the main docs
    index carries an attached edge-ngram index; a 3-char prefix inside
    the [2, 4] window becomes ONE posting lookup on the companion,
    scored as BM25 of the gram under the sayt field's own stats (the ES
    index_prefixes rewrite — match set identical to the dictionary
    expansion, scoring contract documented on the engine method)."""
    idx = _docs_index(spark, sf_dir)
    idx.attach_sayt(_docs_index_sayt(spark, sf_dir), lo=2, hi=4)
    out = idx.search_prefix_sayt("que", k=None)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_sayt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-ahead over the search_as_you_type index: the bare prefix
    'qu' is a TERM of the edge-ngram field — one posting lookup, no
    dictionary scan, BM25 under the expanded field's own stats."""
    idx = _docs_index_sayt(spark, sf_dir)
    out = idx.search(["qu"], k=None, mode="and")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_sayt_sql(term: str = "qu", raw: bool = False) -> str:
    """`raw=True` returns the same query ending in unrounded `s` — the
    composable form (the mbp_sayt oracle sums it with a full-token BM25
    side BEFORE the single final round, matching the engine's combine)."""
    from elasticsearch_assets_spark.operators.texthash import edge_ngrams_sql

    toks = edge_ngrams_sql("string_split(text, ' ')", 2, 4)
    tail = (
        "SELECT doc_id, s FROM scored"
        if raw
        else "SELECT doc_id, round(s, 4) AS score FROM scored"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ('{term}') GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
)
{tail}
"""


def _mbp_sayt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_bool_prefix through the sayt companion
    (engine.match_bool_prefix_sayt, round-4): full-token clauses score
    on the main docs index, the trailing 3-char prefix scores as ONE
    posting lookup on the edge-ngram field, contributions sum per doc
    (the bool-should combine). Oracle: the two BM25 bodies composed
    raw and summed before the single final round."""
    idx = _docs_index(spark, sf_dir)
    idx.attach_sayt(_docs_index_sayt(spark, sf_dir), lo=2, hi=4)
    out = idx.match_bool_prefix_sayt("the que", k=None)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _mbp_sayt_sql() -> str:
    full_side = _bm25_sql(["the"], "or", None).strip()
    # strip the builder's rounded projection down to raw s (same CTE body)
    full_side = full_side.replace(
        "SELECT doc_id, round(s, 4) AS score FROM scored",
        "SELECT doc_id, s FROM scored",
    )
    sayt_side = _bm25_sayt_sql("que", raw=True).strip()
    return f"""
WITH fullside AS ( {full_side} ),
     saytside AS ( {sayt_side} ),
     u AS (SELECT * FROM fullside UNION ALL SELECT * FROM saytside)
SELECT doc_id, round(sum(s), 4) AS score FROM u GROUP BY doc_id
"""


_WN_K, _WN_W = 5, 4


def _aggs_tree2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-level aggregation TREE through the generalized aggs_dsl compiler
    (round-5, verdict item #2): terms(lang) > terms(source) with TWO
    metric children on different fields (avg + cardinality of n_chars) —
    the shape the one-level compiler rejected. Executes as ONE rollup
    shuffle (facets.facet_tree); the leaf frame keys by level path."""
    from elasticsearch_assets_spark.query.dsl import aggs_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = aggs_dsl(
        {
            "bylang": {
                "terms": {"field": "lang"},
                "aggs": {
                    "bysource": {
                        "terms": {"field": "source"},
                        "aggs": {
                            "avg_chars": {"avg": {"field": "n_chars"}},
                            "card_chars": {
                                "cardinality": {"field": "n_chars"}
                            },
                        },
                    }
                },
            }
        },
        matches, docs,
    )["bylang>bysource"]
    return out.select(
        "bylang", "bysource", "doc_count",
        _f4("avg_chars").alias("avg_chars"), "card_chars",
    )


_AGGS_TREE2_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.lang AS bylang, d.source AS bysource, count(*)::BIGINT AS doc_count,
       floor(avg(d.n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS avg_chars,
       count(DISTINCT d.n_chars)::BIGINT AS card_chars
FROM documents d JOIN m USING (doc_id)
WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
GROUP BY 1, 2
"""


def _aggs_tree3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level aggregation tree with per-level `size` cuts (round-5):
    terms(lang, size=2) > terms(source, size=2) > histogram(n_chars, 200)
    + sum metric. Each size cut is a per-parent row_number window (the
    QUALIFY shape) whose survivors prune deeper levels — the oracle
    spells the identical cuts with DuckDB QUALIFY."""
    from elasticsearch_assets_spark.query.dsl import aggs_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = aggs_dsl(
        {
            "bylang": {
                "terms": {"field": "lang", "size": 2},
                "aggs": {
                    "bysource": {
                        "terms": {"field": "source", "size": 2},
                        "aggs": {
                            "hist": {
                                "histogram": {
                                    "field": "n_chars", "interval": 200.0,
                                },
                                "aggs": {
                                    "sum_chars": {"sum": {"field": "n_chars"}}
                                },
                            }
                        },
                    }
                },
            }
        },
        matches, docs,
    )["bylang>bysource>hist"]
    return out.select(
        "bylang", "bysource", "hist", "doc_count",
        _f4("sum_chars").alias("sum_chars"),
    )


_AGGS_TREE3_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
d0 AS (
  SELECT d.* FROM documents d JOIN m USING (doc_id)
  WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
),
l1 AS (
  SELECT lang, count(*) AS n FROM d0 GROUP BY 1
  QUALIFY row_number() OVER (ORDER BY n DESC, lang ASC) <= 2
),
d1 AS (SELECT d0.* FROM d0 JOIN l1 USING (lang)),
l2 AS (
  SELECT lang, source, count(*) AS n FROM d1 GROUP BY 1, 2
  QUALIFY row_number() OVER (
    PARTITION BY lang ORDER BY n DESC, source ASC
  ) <= 2
),
d2 AS (SELECT d1.* FROM d1 JOIN l2 USING (lang, source))
SELECT lang AS bylang, source AS bysource,
       floor(n_chars / 200.0) * 200.0 AS hist,
       count(*)::BIGINT AS doc_count,
       floor(sum(n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_chars
FROM d2 GROUP BY 1, 2, 3
"""


def _aggs_tree_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline child in an agg tree (round-5): max_bucket over the child
    terms level's doc counts (`bysource>_count`) — pipeline aggs run over
    the BUCKET series of the already-aggregated frame, grouped by the
    owning level's keys (integer-exact across engines)."""
    from elasticsearch_assets_spark.query.dsl import aggs_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return aggs_dsl(
        {
            "bylang": {
                "terms": {"field": "lang"},
                "aggs": {
                    "bysource": {"terms": {"field": "source"}},
                    "pmax": {
                        "max_bucket": {"buckets_path": "bysource>_count"}
                    },
                },
            }
        },
        matches, docs,
    )["bylang>pmax"]


_AGGS_TREE_PIPE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
leaf AS (
  SELECT d.lang, d.source, count(*) AS n
  FROM documents d JOIN m USING (doc_id)
  WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
  GROUP BY 1, 2
)
SELECT lang AS bylang, max(n)::BIGINT AS value FROM leaf GROUP BY 1
"""


def _dsl_prefix_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL prefix AUTO-ROUTE (round-5, verdict item #1): a plain
    `{"prefix": ...}` body on a sayt-attached index routes to the
    companion WITHOUT the caller invoking search_prefix_sayt — the ES
    index_prefixes transparent rewrite. Same oracle as the explicit
    entry point: match set identical to expansion, scores = BM25 of the
    gram under the companion field's stats (query/dsl.py routing
    branch)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    idx.attach_sayt(_docs_index_sayt(spark, sf_dir), lo=2, hi=4)
    out = search_dsl(idx, {"query": {"prefix": {"text": "que"}}, "size": None})
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _dsl_mbp_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL match_bool_prefix AUTO-ROUTE (round-5): the default
    operator=or body routes its trailing prefix clause through the sayt
    companion automatically — same oracle as the explicit
    match_bool_prefix_sayt row (full-token BM25 + gram BM25 summed)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    idx.attach_sayt(_docs_index_sayt(spark, sf_dir), lo=2, hi=4)
    out = search_dsl(
        idx,
        {"query": {"match_bool_prefix": {"text": "the que"}}, "size": None},
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _qs_prefix_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-string prefix AUTO-ROUTE (round-5): `que*` — the
    reference's per-slice wildcard shape (id_slicer.js:65) — routes to
    the sayt companion when it is the whole query string; the oracle is
    the companion term-BM25 body."""
    idx = _docs_index(spark, sf_dir)
    idx.attach_sayt(_docs_index_sayt(spark, sf_dir), lo=2, hi=4)
    out = idx.search_querystring("que*", k=None)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _aggs_tree_knobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 agg-tree knobs in one body: fixed_interval date_histogram
    (epoch-floored buckets, UTC session == DuckDB naive epoch) > terms
    with min_doc_count (below-floor buckets AND their descendants drop)
    carrying an exact percentiles child (Spark `percentile` ==
    quantile_cont, the facet_percentiles oracle argument)."""
    from elasticsearch_assets_spark.query.dsl import aggs_dsl

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("value") > 0).select("event_id")
    out = aggs_dsl(
        {
            "byday": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {
                    "bytype": {
                        "terms": {
                            "field": "event_type", "min_doc_count": 2,
                        },
                        "aggs": {
                            "vp": {
                                "percentiles": {
                                    "field": "value",
                                    "percents": [50, 90],
                                }
                            }
                        },
                    }
                },
            }
        },
        matches, ev, id_col="event_id",
    )["byday>bytype"]
    return out.select(
        F.unix_timestamp("byday").cast("long").alias("day_epoch"),
        "bytype", "doc_count",
        _f4("vp_50").alias("p50"), _f4("vp_90").alias("p90"),
    )


_AGGS_TREE_KNOBS_SQL = """
WITH m AS (SELECT event_id FROM events WHERE value > 0),
e AS (SELECT events.* FROM events JOIN m USING (event_id)),
leaf AS (
  SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS day_epoch,
         event_type AS bytype,
         count(*)::BIGINT AS doc_count,
         floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
         floor(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90
  FROM e GROUP BY 1, 2
)
SELECT * FROM leaf WHERE doc_count >= 2
"""


def _facet_hist_mdc0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram with the ES DEFAULT min_doc_count=0 (round-5): every
    bucket between the observed min and max keys appears, zero-count
    buckets included — the fill is a distributed sequence() explode over
    the 1-row span agg, never a driver loop. Oracle: DuckDB's scalar
    range() list with the same LEFT JOIN."""
    from elasticsearch_assets_spark.query.dsl import aggs_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    return aggs_dsl(
        {
            "h": {
                "histogram": {
                    "field": "n_chars", "interval": 700.0,
                    "min_doc_count": 0,
                }
            }
        },
        matches, docs,
    )["h"]


_FACET_HIST_MDC0_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
c AS (
  SELECT floor(d.n_chars / 700.0)::BIGINT AS bidx,
         count(*)::BIGINT AS doc_count
  FROM documents d JOIN m USING (doc_id) GROUP BY 1
),
span AS (SELECT min(bidx) AS lo, max(bidx) AS hi FROM c),
allb AS (
  SELECT unnest(range(lo, hi + 1)) AS bidx FROM span WHERE lo IS NOT NULL
)
SELECT (bidx * 700.0)::DOUBLE AS bucket,
       coalesce(doc_count, 0)::BIGINT AS doc_count
FROM allb LEFT JOIN c USING (bidx)
"""


def _aggs_tree_serial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serial pipeline child in an agg tree (round-5): cumulative_sum of
    the per-month bucket counts under a terms parent — one value per
    CHILD bucket via a window over the bucket series partitioned by the
    parent key (bucket cardinality, the facet_pipeline safety argument).
    Oracle: the identical window sum in DuckDB."""
    from elasticsearch_assets_spark.query.dsl import aggs_dsl

    ev = load_sf_table(spark, sf_dir, "events")
    out = aggs_dsl(
        {
            "bytype": {
                "terms": {"field": "event_type"},
                "aggs": {
                    "bymonth": {
                        "date_histogram": {
                            "field": "ts", "calendar_interval": "month",
                        }
                    },
                    "cum": {
                        "cumulative_sum": {"buckets_path": "bymonth>_count"}
                    },
                },
            }
        },
        ev.select("event_id"), ev, id_col="event_id",
    )["bytype>cum"]
    return out.select(
        "bytype",
        F.date_format("bymonth", "yyyy-MM-dd").alias("bymonth"),
        "series", F.col("value").cast("long").alias("value"),
    )


_AGGS_TREE_SERIAL_SQL = """
WITH leaf AS (
  SELECT event_type AS bytype, date_trunc('month', ts) AS b,
         count(*)::BIGINT AS series
  FROM events GROUP BY 1, 2
)
SELECT bytype, strftime(b, '%Y-%m-%d') AS bymonth, series,
       (sum(series) OVER (PARTITION BY bytype ORDER BY b))::BIGINT AS value
FROM leaf
"""


def _resp_hits_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-section response body (round-5, verdict item #6): ONE request
    returns hits + aggs together (query/dsl.search_response — the query
    side scans once, the persisted id+score frame feeds both sections).
    This row returns the AGGS section; _resp_hits_aggs_hits returns the
    hits page of the SAME body — together they pin the composed response
    against the single-section oracles."""
    from elasticsearch_assets_spark.query.dsl import search_response

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    resp = search_response(
        idx,
        {
            "query": {"match": {"text": "spark"}},
            "size": 10,
            "aggs": {
                "bylang": {
                    "terms": {"field": "lang"},
                    "aggs": {"chars": {"avg": {"field": "n_chars"}}},
                }
            },
        },
        docs,
    )
    out = resp["aggs:bylang"]
    return out.select(
        F.col("bucket").alias("bylang"), "doc_count",
        _f4("avg").alias("chars"),
    )


_RESP_HITS_AGGS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT d.lang AS bylang, count(*)::BIGINT AS doc_count,
       floor(avg(d.n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS chars
FROM documents d JOIN m USING (doc_id)
WHERE d.lang IS NOT NULL
GROUP BY 1
"""


def _resp_hits_aggs_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hits page of the composed hits+aggs body — must equal the
    plain top-10 BM25 oracle even though the same matched frame also fed
    the aggregation section."""
    from elasticsearch_assets_spark.query.dsl import search_response

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    resp = search_response(
        idx,
        {
            "query": {"match": {"text": "spark"}},
            "size": 10,
            "aggs": {"bylang": {"terms": {"field": "lang"}}},
        },
        docs,
    )
    return resp["hits"].select(
        "doc_id", F.round("score", 4).alias("score")
    )


def _winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (MOSS, Schleimer et al. 2003): min hash of
    every w-window of token k-gram hashes — any shared run of
    >= w+k-1 tokens shares a fingerprint at ~2/(w+1) storage."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OD.winnow_fingerprints(docs, k=_WN_K, w=_WN_W)


def _winnow_sql() -> str:
    sh = shingles_sql("tk", _WN_K)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
h AS (
  SELECT doc_id,
         list_apply({sh}, s -> {hash60_sql('s')}) AS hs
  FROM t
),
w AS (
  SELECT doc_id, i AS win, list_min(hs[i : i + {_WN_W - 1}]) AS fp
  FROM h, unnest(range(1, len(hs) - {_WN_W} + 2)) AS g(i)
  WHERE len(hs) >= {_WN_W}
)
SELECT doc_id, fp AS fingerprint, min(win)::INT AS first_window
FROM w GROUP BY 1, 2
"""


_POLY_HOLE = [(30.0, -30.0), (40.0, 30.0), (0.0, 60.0), (-20.0, 0.0)]


def _geo_polygon_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_shape polygon WITH A HOLE: inside the outer ring, outside
    the inner ring — both rings the same shared ray-cast SQL text."""
    from elasticsearch_assets_spark.operators.geo import (
        polygon_with_holes_predicate,
    )

    ev = _geo_events(spark, sf_dir)
    pred = polygon_with_holes_predicate("lat", "lon", _POLY, [_POLY_HOLE])
    return ev.where(pred).select("event_id", "lat", "lon")


def _geo_polygon_holes_sql() -> str:
    from elasticsearch_assets_spark.operators.geo import (
        polygon_with_holes_sql,
    )

    pred = polygon_with_holes_sql("lat", "lon", _POLY, [_POLY_HOLE])
    return f"""
WITH g AS (
  SELECT event_id, ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events
)
SELECT event_id, lat, lon FROM g WHERE {pred}
"""


# ---------------------------------------------------------------------------
# Batch 3t: ES|QL CATEGORIZE, leakage-free cluster split
# ---------------------------------------------------------------------------


def _esql_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL 8.18 `STATS ... BY CATEGORIZE(field)`: log messages grouped
    by the deterministic template signature inside the pipe."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | EVAL msg = concat(event_type, ' ', props)"
        " | STATS doc_count = count(*) BY CATEGORIZE(msg)"
        " | SORT doc_count DESC, category ASC",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("category", "doc_count")


_ESQL_CATEGORIZE_SQL = """
WITH m AS (SELECT concat(event_type, ' ', props) AS msg FROM events)
SELECT array_to_string(
         list_transform(
           string_split(msg, ' ')[1:4],
           x -> CASE WHEN regexp_matches(x, '[0-9]') THEN '<num>' ELSE x END
         ), ' ') AS category,
       count(*)::BIGINT AS doc_count
FROM m GROUP BY 1 ORDER BY doc_count DESC, category ASC
"""

_CS_RATE = 0.2


def _cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/holdout split: the md5 cut keys on the near-dup
    cluster representative, so duplicate clusters never straddle splits —
    the eval-hygiene step after dedup clustering."""
    from elasticsearch_assets_spark.operators.sampling import cluster_split

    docs = load_sf_table(spark, sf_dir, "documents")
    pairs = OD.ngram_jaccard_pairs(docs, n=1, threshold=0.8)
    clusters = OD.dedup_clusters(docs.select("doc_id"), pairs, max_iter=50)
    return cluster_split(clusters, _CS_RATE)


def _cluster_split_sql() -> str:
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    thr = rate_threshold_hex(_CS_RATE)
    return f"""
WITH clusters AS ({_DEDUP_CLUSTERS_SQL})
SELECT doc_id, rep,
       CASE WHEN substr(md5('split|' || CAST(rep AS VARCHAR)), 1, 8) < '{thr}'
            THEN 'holdout' ELSE 'train' END AS split
FROM clusters
"""


# ---------------------------------------------------------------------------
# Batch 3u: ES|QL MATCH full-text filter
# ---------------------------------------------------------------------------


def _esql_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL 8.17 `WHERE MATCH(field, query)`: the analyzed full-text
    filter inside the pipe (AND over the query's terms, exact w.r.t. the
    tokenizer contract), composed with a structured predicate and an
    aggregation."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents"
        " | WHERE MATCH(text, 'spark join') AND n_chars >= 300"
        " | STATS n = count(*), avg_chars = avg(n_chars) BY lang"
        " | SORT lang",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("lang", "n", _f4("avg_chars").alias("avg_chars"))


_ESQL_MATCH_SQL = """
WITH t AS (
  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tk FROM documents
)
SELECT lang, count(*)::BIGINT AS n,
       floor(avg(n_chars) * 10000.0 + 0.5) / 10000.0 AS avg_chars
FROM t
WHERE list_contains(tk, 'spark') AND list_contains(tk, 'join')
  AND n_chars >= 300
GROUP BY lang ORDER BY lang
"""


def _esql_qstr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL `WHERE QSTR(...)` (8.17 full-text functions): the Lucene
    query-string compiler (query/lucene.py) runs inside the pipe —
    analyzed field groups + structured fields in one string — composed
    with a second `| WHERE` step (ES|QL's full-text functions are
    restricted to WHERE; conjunction = chained Filter nodes, one
    Catalyst plan)."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents"
        " | WHERE QSTR('text:(spark AND join) OR lang:zh')"
        " | WHERE n_chars >= 200"
        " | STATS n = COUNT(*) BY source"
        " | SORT source",
        spark=spark, sf_dir=sf_dir,
    )
    return out


_ESQL_QSTR_SQL = """
WITH t AS (
  SELECT source, lang, n_chars, string_split(text, ' ') AS tk FROM documents
)
SELECT n, source FROM (
  SELECT source, count(*)::BIGINT AS n
  FROM t
  WHERE ((list_contains(tk, 'spark') AND list_contains(tk, 'join'))
         OR lang = 'zh')
    AND n_chars >= 200
  GROUP BY source
) ORDER BY source
"""


def _esql_kql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL `WHERE KQL(...)`: KQL's lowercase word operators, spaced
    colons, field groups, and bare comparators translate onto the
    Lucene-subset AST (lucene.parse_kql) and compile to the same pushed
    Column predicates."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | WHERE KQL('event_type: (click or view) and value >= 30.5')"
        " | STATS n = COUNT(*), av = AVG(value) BY event_type"
        " | SORT event_type",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("n", _f4("av").alias("av"), "event_type")


_ESQL_KQL_SQL = """
SELECT count(*)::BIGINT AS n,
       floor(avg(value) * 1e4 + 0.5) / 1e4 AS av,
       event_type
FROM events
WHERE (event_type = 'click' OR event_type = 'view') AND value >= 30.5
GROUP BY event_type ORDER BY event_type
"""


def _esql_match_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL `WHERE MATCH_PHRASE(field, phrase)`: filter-context phrase
    as the adjacency-regex plan (analyzed tokens adjacent in raw text,
    tokenizer-contract analysis) — the same division as MATCH: ranked
    phrase goes through InvertedIndex.search_phrase's positional
    postings."""
    from elasticsearch_assets_spark.query.esql import esql

    return esql(
        "FROM documents"
        " | WHERE MATCH_PHRASE(text, 'hash join')"
        " | KEEP doc_id, source"
        " | SORT doc_id",
        spark=spark, sf_dir=sf_dir,
    )


_ESQL_MATCH_PHRASE_SQL = r"""
SELECT doc_id, source FROM documents
WHERE regexp_matches(text, '(?i)hash[^\p{L}\p{N}]+join')
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Batch 3v: query rules, _mtermvectors
# ---------------------------------------------------------------------------

_RULESET = [
    {"rule_id": "promo", "type": "pinned",
     "criteria": [{"type": "contains", "metadata": "user_query",
                   "values": ["spark"]}],
     "ids": [14, 2]},
    {"rule_id": "ban", "type": "exclude",
     "criteria": [{"type": "prefix", "metadata": "user_query",
                   "values": ["spark"]}],
     "ids": [21, 33]},
    {"rule_id": "other", "type": "pinned",
     "criteria": [{"type": "exact", "metadata": "user_query",
                   "values": ["something else"]}],
     "ids": [999]},
]


def _rule_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES query rules (rule retriever): the fired rules pin [14, 2] and
    exclude [21, 33] around the organic 'spark join' query — rule
    matching is O(rules) planning, pins/exclusions broadcast around the
    distributed search (query/rules.py)."""
    from elasticsearch_assets_spark.query.rules import search_with_rules

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    return search_with_rules(
        idx, "spark join", _RULESET, k=10, mode="or", corpus=docs
    )


def _rule_query_sql() -> str:
    return f"""
WITH {_bm25_body("term IN ('join', 'spark')")},
organic AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) + 2 AS rank
  FROM scored WHERE doc_id NOT IN (14, 2, 21, 33)
),
pins(doc_id, rank) AS (VALUES (14::BIGINT, 1::BIGINT), (2::BIGINT, 2::BIGINT))
SELECT doc_id, rank FROM (
  SELECT * FROM pins UNION ALL SELECT * FROM organic
) ORDER BY rank ASC LIMIT 10
"""


_MTV_IDS = [3, 11, 999999]


def _mtermvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _mtermvectors: termvectors for several docs in ONE fused decode
    pass (unknown ids contribute nothing)."""
    idx = _docs_index(spark, sf_dir)
    return idx.mtermvectors(_MTV_IDS)


_MTERMVECTORS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
  WHERE doc_id IN ({', '.join(str(i) for i in _MTV_IDS)})
  GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
)
SELECT tf.doc_id, tf.term, tf.tf, df.df
FROM tf JOIN df USING (term)
ORDER BY tf.doc_id ASC, tf.term ASC
"""


def _esql_from_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL multi-index FROM (`FROM region,nation`): heterogeneous
    schemas union by name with null fill — the ES cross-index mapping
    behavior — then one aggregation over the union."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM region,nation"
        " | STATS n = count(*), regions = count(r_regionkey),"
        " nations = count(n_nationkey)",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("n", "regions", "nations")


_ESQL_FROM_MULTI_SQL = """
SELECT (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
         AS n,
       (SELECT count(*) FROM region)::BIGINT AS regions,
       (SELECT count(*) FROM nation)::BIGINT AS nations
"""


def _bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned incremental exact dedup: the new snapshot's exact
    duplicates of the base corpus drop; genuinely novel docs (suffixed
    variants) survive. The bloom only prunes the anti-join's input —
    the output is exact, so the oracle is the plain anti-join."""
    docs = load_sf_table(spark, sf_dir, "documents")
    new = docs.where("doc_id % 2 = 0").select("doc_id", "text").unionByName(
        docs.where("doc_id % 2 = 1").select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" novelsuffix")).alias("text"),
        )
    )
    out = OD.bloom_prejoin_dedup(new, docs, m_bits=1 << 16, k_hashes=4)
    return out.select("doc_id")


_BLOOM_DEDUP_SQL = """
WITH newdocs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + 1000000, text || ' novelsuffix' FROM documents
  WHERE doc_id % 2 = 1
)
SELECT n.doc_id FROM newdocs n
WHERE n.text NOT IN (SELECT text FROM documents)
"""


def _analyze_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _analyze with a custom filter chain (stop → s_stem → unique)
    over one corpus document — positions renumber per stage, first
    surface wins the dedup (driver-side debug endpoint by design)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    text = docs.where("doc_id = 0").head()["text"]
    toks = idx.analyze(text, filters=["stop", "s_stem", "unique"])
    return spark.createDataFrame(
        [(int(p), t) for p, t in toks], "position long, token string"
    )


def _analyze_chain_sql() -> str:
    from elasticsearch_assets_spark.operators.textstats import _EN_STOPWORDS
    from elasticsearch_assets_spark.query.expand import s_stem_sql

    stops = ", ".join(f"'{w}'" for w in _EN_STOPWORDS)
    return f"""
WITH t AS (
  SELECT string_split(text, ' ') AS tk FROM documents WHERE doc_id = 0
),
stopped AS (
  SELECT list_filter(tk, x -> NOT list_contains([{stops}], x)) AS tk FROM t
),
pos AS (
  SELECT {s_stem_sql('tk[i]')} AS token, i
  FROM stopped, unnest(range(1, len(tk) + 1)) AS g(i)
),
firsts AS (SELECT token, min(i) AS mi FROM pos GROUP BY token)
SELECT row_number() OVER (ORDER BY mi ASC) - 1 AS position, token
FROM firsts
"""


def _analyze_chain2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _analyze, second filter chain (asciifolding → shingle:2 →
    length:3:12) over accented literals + one corpus document:
    combining-mark strip (DuckDB strip_accents twin), word shingles with
    unigrams kept in first-token order, then a length gate — positions
    renumber at the end (driver-side debug endpoint by design)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    text = "café naïve " + docs.where("doc_id = 0").head()["text"]
    toks = idx.analyze(
        text, filters=["asciifolding", "shingle:2", "length:3:12"]
    )
    return spark.createDataFrame(
        [(int(p), t) for p, t in toks], "position long, token string"
    )


_ANALYZE_CHAIN2_SQL = """
WITH t AS (
  SELECT string_split('café naïve ' || text, ' ') AS tk0
  FROM documents WHERE doc_id = 0
),
folded AS (SELECT list_transform(tk0, x -> strip_accents(x)) AS tk FROM t),
uni AS (
  SELECT 2 * i AS ord, tk[i] AS token
  FROM folded, unnest(range(1, 4096)) AS g(i) WHERE i <= len(tk)
),
bi AS (
  SELECT 2 * i + 1 AS ord, tk[i] || ' ' || tk[i + 1] AS token
  FROM folded, unnest(range(1, 4096)) AS g(i) WHERE i <= len(tk) - 1
),
allt AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
kept AS (SELECT ord, token FROM allt WHERE length(token) BETWEEN 3 AND 12)
SELECT row_number() OVER (ORDER BY ord ASC) - 1 AS position, token
FROM kept
"""


# ---------------------------------------------------------------------------
# Batch 3w: ES|QL analytics — BUCKET, named BY keys, INLINESTATS
# ---------------------------------------------------------------------------


def _esql_bucket_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL BUCKET with a fixed 6-hour span as a named grouping key:
    compiles to tz-free epoch-floor column math (timestampdiff/
    timestampadd against one literal origin, so the session zone
    cancels) — one hash aggregate, filter pushed to the scan."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        ' | WHERE event_type == "view"'
        " | STATS n = count(*), total = sum(value)"
        " BY h6 = BUCKET(ts, 6 hours)"
        " | SORT h6",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        F.date_format("h6", "yyyy-MM-dd HH:mm:ss").alias("h6"),
        "n", _f4("total").alias("total"),
    )


_ESQL_BUCKET_TIME_SQL = """
SELECT strftime(TIMESTAMP '1970-01-01 00:00:00'
         + (floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                  / 21600) * 21600)::BIGINT * INTERVAL 1 SECOND,
         '%Y-%m-%d %H:%M:%S') AS h6,
       count(*)::BIGINT AS n,
       floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS total
FROM events WHERE event_type = 'view'
GROUP BY 1 ORDER BY h6
"""


def _esql_bucket_num(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL BUCKET with a numeric span (floor(v/25)*25 bucket keys as
    DOUBLE on both engines — bare decimals parse as DECIMAL, so the
    compiler inserts the casts)."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | STATS n = count(*), av = avg(value) BY b = BUCKET(value, 25)"
        " | SORT b",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("b", "n", _f4("av").alias("av"))


_ESQL_BUCKET_NUM_SQL = """
SELECT floor(value::DOUBLE / 25.0::DOUBLE) * 25.0::DOUBLE AS b,
       count(*)::BIGINT AS n,
       floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS av
FROM events GROUP BY 1 ORDER BY b
"""


def _esql_inlinestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL INLINESTATS: per-group aggregates attached to every row
    (window aggregate over the BY keys — one Window node, one exchange,
    no self-join), then used as an ordinary column in WHERE: the
    argmax-per-group idiom."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | INLINESTATS mx = max(value) BY event_type"
        " | WHERE value == mx"
        " | KEEP event_type, event_id, value"
        " | SORT event_type, event_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out


_ESQL_INLINESTATS_SQL = """
SELECT event_type, event_id, value FROM (
  SELECT event_type, event_id, value,
         max(value) OVER (PARTITION BY event_type) AS mx
  FROM events
) WHERE value = mx
ORDER BY event_type, event_id
"""


def _esql_fork(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL FORK: two branch pipes over the same frame, unioned with the
    _fork discriminator — one Union plan, each branch's WHERE pushed to
    its own pruned scan."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        ' | FORK (WHERE event_type == "click" | STATS n = count(*),'
        " v = sum(value))"
        " (WHERE value > 100 | STATS n = count(*), v = sum(value))"
        " | SORT _fork",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("_fork", "n", _f4("v").alias("v"))


_ESQL_FORK_SQL = """
SELECT * FROM (
  SELECT 'fork1' AS _fork, count(*)::BIGINT AS n,
         floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS v
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'fork2', count(*)::BIGINT,
         floor(sum(value) * 10000.0 + 0.5) / 10000.0
  FROM events WHERE value > 100
) ORDER BY _fork
"""


def _esql_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL CHANGE_POINT over a STATS series: the pooled-mean step
    detector flags exactly one bucket (argmax |mean_after - mean_before|,
    earliest-bucket tiebreak); window math over bucket cardinality only."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | STATS v = sum(value) BY day = BUCKET(ts, 1 day)"
        " | CHANGE_POINT v ON day"
        " | WHERE type IS NOT NULL"
        " | KEEP day, type, pvalue",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "type", _f4("pvalue").alias("pvalue"),
    )


_ESQL_CHANGE_POINT_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS day, sum(value) AS v FROM events GROUP BY 1
),
w AS (
  SELECT day,
    sum(v) OVER (ORDER BY day ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv,
    count(v) OVER (ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc,
    sum(v) OVER () AS tv, count(v) OVER () AS tc
  FROM h
),
d AS (SELECT day, abs((tv - lv) / (tc - lc) - lv / lc) AS delta FROM w)
SELECT strftime(day, '%Y-%m-%d') AS day, 'step_change' AS type,
       floor(delta * 10000.0 + 0.5) / 10000.0 AS pvalue
FROM d WHERE delta IS NOT NULL
ORDER BY delta DESC, day ASC LIMIT 1
"""


_VK_SCRIPT = (
    "CASE WHEN value >= 100 THEN 'high' WHEN value >= 50 THEN 'mid' "
    "ELSE 'low' END"
)


def _runtime_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES runtime fields (runtime_mappings): a search-time computed
    column in the engine's one script dialect, queryable through the
    Lucene surface (`vk:high` compiles to an equality on the runtime
    column), chainable (`is_high` references `vk`), and projectable via
    `fields`. Mapped-column predicates keep their parquet pushdown; the
    runtime predicate evaluates JVM-side — the ES cost model."""
    from elasticsearch_assets_spark.sources.reader import (
        DateReader, ReaderConfig,
    )

    cfg = ReaderConfig(
        path=f"{sf_dir}/events.parquet",
        date_field_name="ts",
        query="vk:high AND event_type:click",
        fields=["event_id", "event_type", "vk", "is_high"],
        runtime_mappings={"vk": _VK_SCRIPT, "is_high": "vk = 'high'"},
    )
    return DateReader(spark, cfg).dataframe().select(
        "event_id", "event_type", "vk", "is_high"
    )


_RUNTIME_FIELD_SQL = f"""
WITH r AS (
  SELECT *, {_VK_SCRIPT} AS vk FROM events
)
SELECT event_id, event_type, vk, vk = 'high' AS is_high
FROM r WHERE vk = 'high' AND event_type = 'click'
"""


def _shrink_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _shrink: two doc-disjoint shard indexes recombine into one
    (segment tables re-homed with offset seg_ids, stats re-finalized from
    the union — no re-tokenization). BM25 over the shrunk index is
    rank-identical to a monolithic index over the union corpus, so the
    oracle is the plain global BM25 (index/reshard.py)."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.index.reshard import shrink_shards
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    docs = load_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = os.path.join("/tmp", "esa_shrink", uuid.uuid4().hex[:12])
    try:
        build_index(
            spark, docs.where("doc_id % 2 = 0"),
            os.path.join(scratch, "a"), num_segments=4, num_chunks=2,
        )
        build_index(
            spark, docs.where("doc_id % 2 = 1"),
            os.path.join(scratch, "b"), num_segments=4, num_chunks=2,
        )
        shrink_shards(
            spark,
            [os.path.join(scratch, "a"), os.path.join(scratch, "b")],
            os.path.join(scratch, "out"),
        )
        idx = InvertedIndex(spark, os.path.join(scratch, "out"))
        out = idx.search(["spark", "join"], k=None, mode="or")
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


_SHRINK_SEARCH_SQL = _bm25_sql(["spark", "join"], "or", None)


def _split_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _split: the source index hard-link-clones into each target and
    non-routed docs (hash60(_id) % 2 != t) become tombstones. Target 0's
    ranking == the source ranking RESTRICTED to its routed docs under
    GLOBAL stats (deleted docs keep counting until merge — the ES
    contract); the oracle reproduces routing verbatim via the shared
    hash60 SQL text."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.index.reshard import split_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    docs = load_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = os.path.join("/tmp", "esa_split", uuid.uuid4().hex[:12])
    try:
        build_index(
            spark, docs, os.path.join(scratch, "src"),
            num_segments=8, num_chunks=2,
        )
        targets = [os.path.join(scratch, "t0"), os.path.join(scratch, "t1")]
        split_index(spark, os.path.join(scratch, "src"), targets,
                    doc_ids=docs)
        idx = InvertedIndex(spark, targets[0])
        out = idx.search(["spark", "join"], k=None, mode="or")
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


def _split_search_sql() -> str:
    from elasticsearch_assets_spark.index.reshard import split_routing_sql

    return _bm25_sql(
        ["spark", "join"], "or", None,
        where=split_routing_sql("doc_id", 2, 0),
    )


def _ann_topk_bbq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES BBQ (bbq_flat, 8.16): 1-bit sign codes -> hamming-distance
    candidate generation (8 bytes of state per vector, no shuffle,
    TakeOrderedAndProject cut) -> exact float64 cosine re-scoring of the
    oversampled 128 candidates. The packing SQL comes from ONE generator
    for both engines (only the subscript base differs), so codes agree
    bit-for-bit by construction."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.ann_topk_binary(emb, qv, k=10, rerank=128)
    return out.select("vec_id", F.round("score", 4).alias("score"))


def _ann_topk_bbq_sql() -> str:
    from elasticsearch_assets_spark.operators.similarity import (
        binary_code_sql, hamming_sql,
    )

    code_a = binary_code_sql("a.embedding", 64, "duckdb")
    code_q = binary_code_sql("b.embedding", 64, "duckdb")
    ham = hamming_sql(code_a, "qc.code", "duckdb")
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
qc AS (SELECT {code_q} AS code FROM q b),
cand AS (
  SELECT a.vec_id, a.embedding
  FROM embeddings a, qc
  ORDER BY {ham} ASC, a.vec_id ASC
  LIMIT 128
)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM cand a, q b
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def _esql_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL FUSE (9.1): RRF-merge FORK branches that found the same _id.
    Per-branch rank over _score (deterministic _id tiebreak), fused
    score = sum 1/(60 + rank) — pure window math over two exchanges,
    no self-join."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents"
        " | EVAL _id = doc_id"
        " | FORK (WHERE lang == 'en' | EVAL _score = TO_DOUBLE(n_chars)"
        "         | SORT _score DESC, _id ASC | LIMIT 20)"
        "        (WHERE STARTS_WITH(source, 'src1')"
        "         | EVAL _score = TO_DOUBLE(doc_id * 37 % 101)"
        "         | SORT _score DESC, _id ASC | LIMIT 20)"
        " | FUSE rrf KEY BY _id RANK_CONSTANT 60"
        " | SORT _score DESC, _id ASC | LIMIT 15",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        F.col("_id").alias("doc_id"), _f4("_score").alias("score")
    )


_ESQL_FUSE_SQL = """
WITH b1 AS (
  SELECT doc_id AS _id, CAST(n_chars AS DOUBLE) AS s
  FROM documents WHERE lang = 'en' ORDER BY s DESC, _id LIMIT 20
), b2 AS (
  SELECT doc_id AS _id, CAST(doc_id * 37 % 101 AS DOUBLE) AS s
  FROM documents WHERE starts_with(source, 'src1')
  ORDER BY s DESC, _id LIMIT 20
), u AS (
  SELECT _id, s, 1 AS fork FROM b1
  UNION ALL SELECT _id, s, 2 AS fork FROM b2
), r AS (
  SELECT _id, row_number() OVER (PARTITION BY fork ORDER BY s DESC, _id)
         AS rnk
  FROM u
), f AS (
  SELECT _id, sum(CAST(1 AS DOUBLE) / (60 + rnk)) AS fused
  FROM r GROUP BY _id
)
SELECT _id AS doc_id, floor(fused * 10000.0 + 0.5) / 10000.0 AS score
FROM f ORDER BY fused DESC, _id LIMIT 15
"""


def _esql_fuse_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL FUSE linear: merge FORK branches by per-branch minmax score
    normalization (degenerate branch -> 1.0, ES's edge rule) then an
    unweighted sum per _id — the 8.16 linear retriever's math in window
    form, same two exchanges as FUSE rrf."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents"
        " | EVAL _id = doc_id"
        " | FORK (WHERE lang == 'en' | EVAL _score = TO_DOUBLE(n_chars)"
        "         | SORT _score DESC, _id ASC | LIMIT 20)"
        "        (WHERE STARTS_WITH(source, 'src1')"
        "         | EVAL _score = TO_DOUBLE(doc_id * 37 % 101)"
        "         | SORT _score DESC, _id ASC | LIMIT 20)"
        " | FUSE linear KEY BY _id"
        " | SORT _score DESC, _id ASC | LIMIT 15",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        F.col("_id").alias("doc_id"), _f4("_score").alias("score")
    )


_ESQL_FUSE_LINEAR_SQL = """
WITH b1 AS (
  SELECT doc_id AS _id, CAST(n_chars AS DOUBLE) AS s
  FROM documents WHERE lang = 'en' ORDER BY s DESC, _id LIMIT 20
), b2 AS (
  SELECT doc_id AS _id, CAST(doc_id * 37 % 101 AS DOUBLE) AS s
  FROM documents WHERE starts_with(source, 'src1')
  ORDER BY s DESC, _id LIMIT 20
), u AS (
  SELECT _id, s, 1 AS fork FROM b1
  UNION ALL SELECT _id, s, 2 AS fork FROM b2
), r AS (
  SELECT _id, s,
         min(s) OVER (PARTITION BY fork) AS lo,
         max(s) OVER (PARTITION BY fork) AS hi
  FROM u
), f AS (
  SELECT _id,
         sum(CASE WHEN hi = lo THEN CAST(1 AS DOUBLE)
                  ELSE (s - lo) / (hi - lo) END) AS fused
  FROM r GROUP BY _id
)
SELECT _id AS doc_id, floor(fused * 10000.0 + 0.5) / 10000.0 AS score
FROM f ORDER BY fused DESC, _id LIMIT 15
"""


def _esql_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL BUCKET 4-arg auto form: `BUCKET(ts, 20, from, to)` picks a
    "nice" span from the literal bounds AT COMPILE TIME (10 days / 20 ->
    12-hour rung on the second→90-day ladder) and then compiles exactly
    like the 2-arg fixed-span form — the bounds are an interval HINT, all
    rows still bucket (ES's contract)."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        ' | WHERE event_type == "click"'
        " | STATS n = count(*)"
        " BY b = BUCKET(ts, 20, '2024-01-01', '2024-01-11')"
        " | SORT b",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select(
        F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("b"), "n"
    )


_ESQL_BUCKET_AUTO_SQL = """
SELECT strftime(TIMESTAMP '1970-01-01 00:00:00'
         + (floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                  / 43200) * 43200)::BIGINT * INTERVAL 1 SECOND,
         '%Y-%m-%d %H:%M:%S') AS b,
       count(*)::BIGINT AS n
FROM events WHERE event_type = 'click'
GROUP BY 1 ORDER BY b
"""


def _esql_kql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL `field: *` existence shorthand (Kibana's field-presence test):
    rewritten to the Lucene surface's `_exists_:field` -> IsNotNull,
    pushed to the scan like any structured clause."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents"
        ' | WHERE KQL("lang: * and n_chars >= 900")'
        " | STATS n = count(*) BY lang"
        " | SORT lang",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("lang", "n")


_ESQL_KQL_EXISTS_SQL = """
SELECT lang, count(*)::BIGINT AS n
FROM documents WHERE lang IS NOT NULL AND n_chars >= 900
GROUP BY lang ORDER BY lang
"""


def _esql_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL scalar-function battery (TO_* casts, CASE, MV_* multivalue
    math, STARTS_WITH/ENDS_WITH/LOCATE) through the uppercase rewrite
    layer — every function compiles to a JVM column expression, one
    projection, zero shuffle before the sort."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents"
        " | WHERE doc_id % 7 == 0"
        " | EVAL up = TO_UPPER(source),"
        "   eng = CASE(lang == 'en', 1, 0),"
        "   arr = MV_SORT(array(n_chars, doc_id, 3)),"
        "   s = MV_SUM(arr), a = MV_AVG(arr),"
        "   mx = MV_MAX(arr), mn = MV_MIN(arr),"
        "   fst = MV_FIRST(arr), lst = MV_LAST(arr),"
        "   nv = MV_COUNT(MV_DEDUPE(arr)),"
        "   head = STARTS_WITH(text, 'the'),"
        "   loc = LOCATE(text, 'data')"
        " | KEEP doc_id, up, eng, s, a, mx, mn, fst, lst, nv, head, loc"
        " | SORT doc_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out.withColumn("a", _f4("a"))


_ESQL_SCALAR_FUNCS_SQL = """
SELECT doc_id,
       upper(source) AS up,
       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS eng,
       CAST(n_chars + doc_id + 3 AS DOUBLE) AS s,
       floor(CAST(n_chars + doc_id + 3 AS DOUBLE) / 3 * 10000.0 + 0.5)
         / 10000.0 AS a,
       greatest(n_chars, doc_id, 3) AS mx,
       least(n_chars, doc_id, 3) AS mn,
       least(n_chars, doc_id, 3) AS fst,
       greatest(n_chars, doc_id, 3) AS lst,
       CAST(len(list_distinct([n_chars, doc_id, 3])) AS INT) AS nv,
       starts_with(text, 'the') AS head,
       CAST(strpos(text, 'data') AS INT) AS loc
FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id
"""


def _esql_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL date functions + CIDR_MATCH: DATE_FORMAT/DATE_DIFF take
    ES|QL argument order (format first; unit literal -> timestampdiff
    keyword), CIDR blocks fold to integer [lo, hi] ranges at compile
    time so the filter is pushable column math. MEDIAN/COUNT_DISTINCT
    spellings ride the same rewrite into one hash aggregate."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | EVAL ip = concat('10.', TO_STRING(user_id % 200), '.0.1')"
        " | WHERE CIDR_MATCH(ip, '10.0.0.0/9', '10.160.0.0/11')"
        " | EVAL d = DATE_FORMAT('yyyy-MM-dd', ts),"
        "   dd = DATE_DIFF('day', TIMESTAMP '2024-01-01 00:00:00', ts)"
        " | STATS n = count(*), users = COUNT_DISTINCT(user_id),"
        "   md = MEDIAN(value), mxd = max(dd) BY d"
        " | SORT d",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("d", "n", "users", _f4("md").alias("md"), "mxd")


# the CIDR blocks fold to second-octet ranges 0-127 and 160-191; the
# oracle restates the same integer bounds over the derived ip numeric
_ESQL_DATE_FUNCS_SQL = """
WITH e AS (
  SELECT *,
         10 * 16777216 + (user_id % 200) * 65536 + 1 AS ipn
  FROM events
)
SELECT strftime(ts, '%Y-%m-%d') AS d,
       count(*) AS n,
       count(DISTINCT user_id) AS users,
       floor(median(value) * 10000.0 + 0.5) / 10000.0 AS md,
       max(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts)) AS mxd
FROM e
WHERE (ipn BETWEEN 167772160 AND 176160767)
   OR (ipn BETWEEN 178257920 AND 180355071)
GROUP BY 1 ORDER BY d
"""


def _term_suggest_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term-suggester suggest_mode: 'missing' suggests only when the
    input is absent from the dictionary (present input -> zero rows),
    'popular' keeps only suggestions MORE frequent than the input.
    One planning-level input-df probe + the same pushed stats scan."""
    idx = _docs_index(spark, sf_dir)
    parts = [
        ("missing_absent", idx.suggest("spork", 2, size=5,
                                       suggest_mode="missing")),
        ("missing_present", idx.suggest("spark", 2, size=5,
                                        suggest_mode="missing")),
        ("popular", idx.suggest("sort", 2, size=5,
                                suggest_mode="popular")),
    ]
    out = None
    for label, df_ in parts:
        x = df_.select(
            F.lit(label).alias("mode"), "suggestion", "df", "distance"
        )
        out = x if out is None else out.unionByName(x)
    return out.orderBy("mode", "distance", F.col("df").desc(), "suggestion")


_TERM_SUGGEST_MODES_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
d AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
      GROUP BY term)
SELECT * FROM (
  SELECT 'missing_absent' AS mode, term AS suggestion, df,
         levenshtein(term, 'spork')::INTEGER AS distance
  FROM d WHERE levenshtein(term, 'spork') <= 2
  ORDER BY distance, df DESC, suggestion LIMIT 5
)
UNION ALL
SELECT * FROM (
  SELECT 'popular', term, df, levenshtein(term, 'sort')::INTEGER
  FROM d
  WHERE levenshtein(term, 'sort') <= 2
    AND df > (SELECT coalesce(max(df), 0) FROM d WHERE term = 'sort')
  ORDER BY 4, df DESC, term LIMIT 5
)
ORDER BY mode, distance, df DESC, suggestion
"""


def _stored_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stored scripts: a named script (PUT-validated through the
    parser) referenced by id in a script query — transport-level
    indirection over the same filter-context plan (state/scripts.py +
    engine.script_query)."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.state.scripts import (
        get_script, put_script,
    )

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    store = os.path.join("/tmp", "esa_scripts", uuid.uuid4().hex[:12])
    try:
        put_script(store, "len-mod-7", "n_chars % 7 = 1")
        put_script(store, "unused", "n_chars > 0")
        out = idx.script_query(
            docs, get_script(store, "len-mod-7"),
            query=["spark", "table"], k=None, mode="or",
        )
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return res


_STORED_SCRIPT_SQL = _bm25_sql(
    ["spark", "table"], "or", None,
    where="doc_id IN (SELECT doc_id FROM documents WHERE n_chars % 7 = 1)",
)


_CAT_SEGMENTS_DIR = "/tmp/esa_cat_segments_idx"


def _cat_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _cat/segments: per-segment posting-list counts and df/cf
    totals — one grouped pass over the segment table (the introspection
    a capacity planner reads; at scale it is a metadata-sized agg over
    the term-sorted scan). Oracle reads the SAME committed files
    directly."""
    import shutil

    from elasticsearch_assets_spark.index.build import build_index

    docs = load_sf_table(spark, sf_dir, "documents").where(
        "doc_id % 5 = 0"
    ).select("doc_id", "text")
    shutil.rmtree(_CAT_SEGMENTS_DIR, ignore_errors=True)
    build_index(spark, docs, _CAT_SEGMENTS_DIR, num_segments=4, num_chunks=2)
    seg = spark.read.parquet(os.path.join(_CAT_SEGMENTS_DIR, "segments"))
    return (
        seg.groupBy("chunk", "seg_id")
        .agg(
            F.count("*").alias("n_lists"),
            F.sum("df").alias("sum_df"),
            F.sum("cf").alias("sum_cf"),
        )
        .orderBy("chunk", "seg_id")
    )


_CAT_SEGMENTS_SQL = f"""
SELECT CAST(chunk AS INT) AS chunk, seg_id,
       count(*)::BIGINT AS n_lists,
       sum(df)::BIGINT AS sum_df, sum(cf)::BIGINT AS sum_cf
FROM read_parquet('{_CAT_SEGMENTS_DIR}/segments/*/*.parquet',
                  hive_partitioning = true)
GROUP BY 1, 2 ORDER BY chunk, seg_id
"""


_DISK_USAGE_DIR = "/tmp/esa_disk_usage_idx"


def _disk_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _disk_usage: per-field on-disk footprint straight from the
    parquet footers (driver-side metadata, no data pages —
    index/stats.py disk_usage). The oracle reads the SAME files through
    DuckDB's parquet_metadata(), so the byte accounting cross-checks
    two independent footer readers."""
    import shutil

    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.index.stats import disk_usage

    docs = load_sf_table(spark, sf_dir, "documents").where(
        "doc_id % 4 = 0"
    ).select("doc_id", "text")
    shutil.rmtree(_DISK_USAGE_DIR, ignore_errors=True)
    build_index(spark, docs, _DISK_USAGE_DIR, num_segments=4, num_chunks=1)
    rows = disk_usage(_DISK_USAGE_DIR)
    return spark.createDataFrame(
        [(r["section"], r["column"], r["compressed_bytes"],
          r["uncompressed_bytes"], r["n_values"]) for r in rows],
        "section string, column string, compressed_bytes long, "
        "uncompressed_bytes long, n_values long",
    )


_DISK_USAGE_SQL = f"""
SELECT section, "column",
       sum(total_compressed_size)::BIGINT AS compressed_bytes,
       sum(total_uncompressed_size)::BIGINT AS uncompressed_bytes,
       sum(num_values)::BIGINT AS n_values
FROM (
  SELECT 'segments' AS section,
         replace(path_in_schema, ', ', '.') AS "column",
         total_compressed_size, total_uncompressed_size, num_values
  FROM parquet_metadata('{_DISK_USAGE_DIR}/segments/*/*.parquet')
  UNION ALL
  SELECT 'stats', replace(path_in_schema, ', ', '.'),
         total_compressed_size, total_uncompressed_size, num_values
  FROM parquet_metadata('{_DISK_USAGE_DIR}/stats/*.parquet')
)
GROUP BY 1, 2 ORDER BY section, "column"
"""


def _esql_scalar_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second ES|QL function battery: REPLACE (regex), SPLIT (literal
    delimiter -> escaped regex), MV_MEDIAN (sorted-middle, DOUBLE
    promotion), DATE_TRUNC via the BUCKET span compiler, DATE_PARSE
    (ES argument order), TAU — all through the uppercase rewrite into
    JVM column expressions."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 13 == 0"
        " | EVAL rep = REPLACE(event_type, '[aeiou]', '*'),"
        "   np = MV_COUNT(SPLIT(props, ':')),"
        "   md = MV_MEDIAN(array(value, value * 3, value * 2)),"
        "   d6 = DATE_FORMAT('yyyy-MM-dd HH:mm:ss', DATE_TRUNC(6 hours, ts)),"
        "   dd = DATE_FORMAT('yyyy-MM-dd', DATE_PARSE('yyyy-MM-dd',"
        "        concat('2024-03-0', TO_STRING(event_id % 9 + 1)))),"
        "   t = TAU()"
        " | KEEP event_id, rep, np, md, d6, dd, t | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out.withColumn("md", _f4("md"))


# median of (v, 3v, 2v) is 2v for every sign of v — the oracle states it
_ESQL_SCALAR_FUNCS2_SQL = """
SELECT event_id,
       regexp_replace(event_type, '[aeiou]', '*', 'g') AS rep,
       CAST(len(string_split(props, ':')) AS INT) AS np,
       floor(value * 2 * 10000.0 + 0.5) / 10000.0 AS md,
       strftime(TIMESTAMP '1970-01-01 00:00:00'
                + (floor(date_diff('second',
                         TIMESTAMP '1970-01-01 00:00:00', ts) / 21600)
                   * 21600)::BIGINT * INTERVAL 1 SECOND,
                '%Y-%m-%d %H:%M:%S') AS d6,
       strftime(strptime('2024-03-0' || CAST(event_id % 9 + 1 AS VARCHAR),
                         '%Y-%m-%d'), '%Y-%m-%d') AS dd,
       2 * pi() AS t
FROM events WHERE event_id % 13 = 0 ORDER BY event_id
"""


_GEO_ENV_BOX = (-20.0, 30.0, -60.0, 40.0)
# doc boxes: center at the derived (lat, lon), half-sizes keyed on the id
_GEO_ENV_COLS = {
    "minlat": f"(({_LAT_SQL}) - (event_id % 5 + 1) * 2.0)",
    "maxlat": f"(({_LAT_SQL}) + (event_id % 5 + 1) * 2.0)",
    "minlon": f"(({_LON_SQL}) - (event_id % 7 + 1) * 3.0)",
    "maxlon": f"(({_LON_SQL}) + (event_id % 7 + 1) * 3.0)",
}


def _geo_shape_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_shape over shape DOCUMENTS (each doc an envelope) vs a
    query envelope, all four relations as one shared interval-algebra
    SQL text per relation (operators/geo.py envelope_relation_sql —
    bit parity by construction, like the polygon ray-cast)."""
    from elasticsearch_assets_spark.operators.geo import envelope_relation_sql

    ev = load_sf_table(spark, sf_dir, "events").where("event_id % 7 = 0")
    c = _GEO_ENV_COLS
    sel = [F.col("event_id")]
    for rel in ("intersects", "disjoint", "within", "contains"):
        sel.append(
            F.expr(
                envelope_relation_sql(
                    c["minlat"], c["maxlat"], c["minlon"], c["maxlon"],
                    _GEO_ENV_BOX, rel,
                )
            ).alias(rel)
        )
    return ev.select(*sel).orderBy("event_id")


def _geo_shape_envelope_sql() -> str:
    from elasticsearch_assets_spark.operators.geo import envelope_relation_sql

    c = _GEO_ENV_COLS
    rels = ",\n       ".join(
        f"{envelope_relation_sql(c['minlat'], c['maxlat'], c['minlon'], c['maxlon'], _GEO_ENV_BOX, rel)} AS {rel}"
        for rel in ("intersects", "disjoint", "within", "contains")
    )
    return f"""
SELECT event_id,
       {rels}
FROM events WHERE event_id % 7 = 0 ORDER BY event_id
"""


def _esql_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL RERANK with the engine's deterministic stand-in scorer
    (models are the declared boundary; the plan — one projection, no
    shuffle — is identical whichever scorer fills _score):
    overlap/|q| + tf/(100|q|), analyzed by the one tokenizer contract."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents | WHERE doc_id % 11 == 0"
        ' | RERANK "spark join data table" ON text'
        " | KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 20",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("doc_id", _f4("_score").alias("score"))


def _esql_rerank_sql() -> str:
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    terms = "['data', 'join', 'spark', 'table']"
    return f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS tk FROM documents
  WHERE doc_id % 11 = 0
),
s AS (
  SELECT doc_id,
         CAST(len(list_intersect(list_distinct(tk), {terms})) AS DOUBLE)
           / 4
         + CAST(len(list_filter(tk, x -> list_contains({terms}, x)))
                AS DOUBLE) / 400 AS sc
  FROM t
)
SELECT doc_id, floor(sc * 10000.0 + 0.5) / 10000.0 AS score
FROM s ORDER BY sc DESC, doc_id ASC LIMIT 20
"""


def _esql_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL TS source command (9.x time-series querying): aggregates wrap
    over-time inner functions computed per series per bucket (series =
    the TSDS dimension fields, passed as mapping-level metadata), then
    the outer aggregate combines across series — two hash aggregations
    plus one window pass for RATE (the engine's one counter contract:
    reset-compensated increase / bucket seconds, identical math to
    counter_rate). The counter is derived deterministically (windowed
    cumsum mod) so both engines see identical resets; the gauge metric is
    integer cents so every inner aggregate is an exact int-valued-double
    sum plus at most one division — bit-identical across engines with no
    summation-order sensitivity (avg-of-avg was measured hitting the
    floor(x*1e4+0.5) boundary 4/720 buckets)."""
    from elasticsearch_assets_spark.query.esql import esql

    events = load_sf_table(spark, sf_dir, "events")
    staged = (
        events.withColumn("sid", F.col("user_id") % 5)
        .withColumn("v100", F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .withColumn(
            "c",
            F.expr(
                "sum(v100) OVER (PARTITION BY sid ORDER BY ts, event_id) "
                "% 50000"
            ),
        )
    )
    out = esql(
        "TS metrics"
        " | STATS mr = max(rate(c)), am = max(avg_over_time(v100)),"
        " lt = sum(last_over_time(v100)), ft = min(first_over_time(value)),"
        " ac = avg(count_over_time(value)), n = sum(count_over_time(value))"
        " BY h = BUCKET(ts, 1 hour)"
        " | SORT h",
        tables={"metrics": staged},
        time_series={
            "metrics": {"dimensions": ["sid"], "ts": "ts", "tiebreak": "event_id"}
        },
    )
    return out.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("h"),
        _f4("mr").alias("mr"),
        _f4("am").alias("am"),
        F.col("lt").cast("long").alias("lt"),
        _f4("ft").alias("ft"),
        _f4("ac").alias("ac"),
        F.col("n").cast("long").alias("n"),
    )


_ESQL_TS_SQL = """
WITH s AS (
  SELECT *, user_id % 5 AS sid,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
  FROM events
),
c AS (
  SELECT sid, ts, event_id, value, v100,
         sum(v100) OVER (PARTITION BY sid ORDER BY ts, event_id)
           % 50000 AS c
  FROM s
),
b AS (SELECT *, date_trunc('hour', ts) AS h FROM c),
w AS (
  SELECT *,
         CAST(c AS DOUBLE) - lag(CAST(c AS DOUBLE))
           OVER (PARTITION BY sid, h ORDER BY ts, event_id) AS d,
         row_number() OVER (PARTITION BY sid, h
                            ORDER BY ts DESC, event_id DESC) AS rl,
         row_number() OVER (PARTITION BY sid, h ORDER BY ts, event_id) AS rf
  FROM b
),
g1 AS (
  SELECT sid, h,
         sum(CASE WHEN d IS NULL THEN 0.0
                  WHEN d >= 0 THEN d
                  ELSE CAST(c AS DOUBLE) END) / 3600.0 AS rate,
         avg(v100) AS aot,
         max(CASE WHEN rl = 1 THEN v100 END) AS lot,
         max(CASE WHEN rf = 1 THEN value END) AS fot,
         count(value) AS cot
  FROM w GROUP BY sid, h
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS h,
       floor(max(rate) * 10000.0 + 0.5) / 10000.0 AS mr,
       floor(max(aot) * 10000.0 + 0.5) / 10000.0 AS am,
       CAST(sum(lot) AS BIGINT) AS lt,
       floor(min(fot) * 10000.0 + 0.5) / 10000.0 AS ft,
       floor(avg(cot) * 10000.0 + 0.5) / 10000.0 AS ac,
       CAST(sum(cot) AS BIGINT) AS n
FROM g1 GROUP BY h ORDER BY h
"""


def _esql_ts_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS with a DIMENSION in BY (per-series output, the Prometheus-style
    shape) and a fixed 6-hour epoch-floor bucket: rate + max_over_time
    per (sid, bucket). Exercises the stage-2 grouping that routes
    dimension columns through both aggregation levels."""
    from elasticsearch_assets_spark.query.esql import esql

    events = load_sf_table(spark, sf_dir, "events")
    staged = (
        events.withColumn("sid", F.col("user_id") % 5)
        .withColumn("v100", F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .withColumn(
            "c",
            F.expr(
                "sum(v100) OVER (PARTITION BY sid ORDER BY ts, event_id) "
                "% 50000"
            ),
        )
    )
    out = esql(
        "TS metrics"
        " | STATS r = sum(rate(c)), m = max(max_over_time(v100))"
        " BY sid, h = BUCKET(ts, 6 hours)"
        " | SORT sid, h",
        tables={"metrics": staged},
        time_series={
            "metrics": {"dimensions": ["sid"], "ts": "ts", "tiebreak": "event_id"}
        },
    )
    return out.select(
        "sid",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("h"),
        _f4("r").alias("r"),
        F.col("m").cast("long").alias("m"),
    )


_ESQL_TS_DIMS_SQL = """
WITH s AS (
  SELECT *, user_id % 5 AS sid,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
  FROM events
),
c AS (
  SELECT sid, ts, event_id, v100,
         sum(v100) OVER (PARTITION BY sid ORDER BY ts, event_id)
           % 50000 AS c
  FROM s
),
b AS (
  SELECT *, TIMESTAMP '1970-01-01 00:00:00'
         + (floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                  / 21600) * 21600)::BIGINT * INTERVAL 1 SECOND AS h
  FROM c
),
w AS (
  SELECT *,
         CAST(c AS DOUBLE) - lag(CAST(c AS DOUBLE))
           OVER (PARTITION BY sid, h ORDER BY ts, event_id) AS d
  FROM b
),
g1 AS (
  SELECT sid, h,
         sum(CASE WHEN d IS NULL THEN 0.0
                  WHEN d >= 0 THEN d
                  ELSE CAST(c AS DOUBLE) END) / 21600.0 AS rate,
         max(v100) AS mot
  FROM w GROUP BY sid, h
)
SELECT sid, strftime(h, '%Y-%m-%d %H:%M:%S') AS h,
       floor(sum(rate) * 10000.0 + 0.5) / 10000.0 AS r,
       CAST(max(mot) AS BIGINT) AS m
FROM g1 GROUP BY sid, h ORDER BY sid, h
"""


def _counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES TSDB rate over a counter metric: per (series, hour bucket),
    reset-compensated increase / seconds (facets.counter_rate). The
    counter is derived deterministically (windowed cumsum mod) so both
    engines see identical resets."""
    from elasticsearch_assets_spark.operators import facets as OFA

    events = load_sf_table(spark, sf_dir, "events")
    staged = events.withColumn(
        "sid", F.col("user_id") % 5
    ).withColumn(
        "c",
        F.expr(
            "sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER "
            "(PARTITION BY sid ORDER BY ts, event_id) % 50000"
        ),
    )
    out = OFA.counter_rate(
        staged, "ts", "c", ["sid"], bucket_seconds=3600,
        order_tiebreak="event_id",
    )
    return out.select(
        "sid",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n_samples",
        _f4("increase").alias("increase"),
        _f4("rate").alias("rate"),
    )


_COUNTER_RATE_SQL = """
WITH s AS (SELECT *, user_id % 5 AS sid FROM events),
c AS (
  SELECT sid, ts, event_id,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY sid ORDER BY ts, event_id) % 50000 AS c
  FROM s
),
b AS (
  SELECT sid, ts, event_id, c,
         TIMESTAMP '1970-01-01 00:00:00'
         + (floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                  / 3600) * 3600)::BIGINT * INTERVAL 1 SECOND AS bucket
  FROM c
),
d AS (
  SELECT sid, bucket, c::DOUBLE AS v,
         c::DOUBLE - lag(c::DOUBLE)
           OVER (PARTITION BY sid, bucket ORDER BY ts, event_id) AS delta
  FROM b
),
a AS (
  SELECT sid, bucket, count(*)::BIGINT AS n_samples,
         sum(CASE WHEN delta IS NULL THEN 0
                  WHEN delta >= 0 THEN delta ELSE v END) AS inc
  FROM d GROUP BY 1, 2
)
SELECT sid, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, n_samples,
       floor(inc * 10000.0 + 0.5) / 10000.0 AS increase,
       floor(inc / 3600 * 10000.0 + 0.5) / 10000.0 AS rate
FROM a ORDER BY sid, bucket
"""


def _wrapped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus has no line structure, so the Gopher/C4 rows
    derive one deterministically: ' a ' becomes a '.'-terminated line
    break, ' the ' an ellipsis-terminated break opening a bullet line —
    the same two regex replaces run verbatim in the oracle."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", " a ", ".\n"), " the ", "…\n- "
        ).alias("text"),
    )


_WRAPPED_CTE = (
    "SELECT doc_id, regexp_replace(regexp_replace(text, ' a ', "
    "'.' || chr(10), 'g'), ' the ', '…' || chr(10) || '- ', 'g') AS t "
    "FROM documents"
)


def _facet_filters_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters agg with other_bucket: docs matching NONE of the named
    filters count under _other_ — one more conditional partial on the
    same single-pass aggregate (facets.facet_filters)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    docs = load_sf_table(spark, sf_dir, "documents")
    out = OFA.facet_filters(
        docs,
        {
            "long": F.col("n_chars") >= 450,
            "english": F.col("lang") == "en",
        },
        other_bucket=True,
    )
    return out.select("bucket", "doc_count")


_FACET_FILTERS_OTHER_SQL = """
SELECT bucket, doc_count FROM (
  SELECT 'long' AS bucket,
         sum(CASE WHEN n_chars >= 450 THEN 1 ELSE 0 END)::BIGINT
           AS doc_count
  FROM documents
  UNION ALL
  SELECT 'english',
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT
  FROM documents
  UNION ALL
  SELECT '_other_',
         sum(CASE WHEN NOT coalesce(n_chars >= 450, false)
                   AND NOT coalesce(lang = 'en', false)
              THEN 1 ELSE 0 END)::BIGINT
  FROM documents
) ORDER BY bucket
"""


def _facet_terms_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg `missing` parameter: docs whose bucket value is null
    count under the literal instead of dropping (a coalesce before the
    same grouped pass). Nulls are derived deterministically (source
    'src3' nulled) since the corpus ships none."""
    from elasticsearch_assets_spark.operators import facets as OFA

    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "source2", F.expr("nullif(source, 'src3')")
    )
    out = OFA.facet_terms_metrics(
        docs.select("doc_id"), docs, "source2", "n_chars", n=None,
        missing="(none)",
    )
    return out.select(
        "bucket", "doc_count", _f4("sum").alias("sum"), _f4("avg").alias("avg")
    )


_FACET_TERMS_MISSING_SQL = """
SELECT coalesce(nullif(source, 'src3'), '(none)') AS bucket,
       count(*)::BIGINT AS doc_count,
       floor(sum(n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum,
       floor(avg(n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS avg
FROM documents
GROUP BY 1 ORDER BY count(*) DESC, bucket ASC
"""


def _ilm_warm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ILM warm phase: shrink the shards into one index, forcemerge
    with tombstone purge — after the purge the collection stats tighten
    to the survivors, so the warmed index ranks exactly like a fresh
    build over the live docs (oracle: subset-stats BM25,
    index/reshard.py ilm_warm_action)."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.index.reshard import ilm_warm_action
    from elasticsearch_assets_spark.index.tombstones import add_tombstones
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    docs = load_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = os.path.join("/tmp", "esa_ilm_warm", uuid.uuid4().hex[:12])
    try:
        shards = []
        for i, pred in enumerate(["doc_id % 2 = 0", "doc_id % 2 = 1"]):
            d = os.path.join(scratch, f"s{i}")
            build_index(
                spark, docs.where(pred), d, num_segments=4, num_chunks=1,
            )
            dead = [
                r["doc_id"]
                for r in docs.where(pred).where("doc_id % 9 = 0").collect()
            ]
            add_tombstones(d, dead)
            shards.append(d)
        warm = os.path.join(scratch, "warm")
        ilm_warm_action(spark, shards, warm, segs_out=4)
        idx = InvertedIndex(spark, warm)
        out = idx.search(["spark", "join"], k=None, mode="or")
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


# post-purge stats are the survivors' (corpus_where, not where)
_ILM_WARM_SQL = _bm25_sql(
    ["spark", "join"], "or", None, corpus_where="doc_id % 9 <> 0"
)


def _es_sql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES SQL (_sql): ANSI SQL over the index tables with the MATCH
    full-text predicate compiled through the tokenizer contract —
    a thin facade over Catalyst (query/essql.py); SCORE() routes to the
    ranked engine by design."""
    from elasticsearch_assets_spark.query.essql import es_sql

    docs = load_sf_table(spark, sf_dir, "documents")
    return es_sql(
        "SELECT lang, count(*) AS n, sum(n_chars) AS nc"
        " FROM documents WHERE MATCH(text, 'spark join')"
        " GROUP BY lang ORDER BY lang",
        {"documents": docs},
    )


def _es_sql_query_sql() -> str:
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    toks = tokens_sql("text")
    return f"""
SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS nc
FROM documents
WHERE list_contains({toks}, 'spark') AND list_contains({toks}, 'join')
GROUP BY lang ORDER BY lang
"""


def _graph_explore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _graph/explore, one hop: top-5 significant co-occurring terms
    of the 'spark' seed (the Graph API's significance ranking = the
    significant_terms percentage heuristic) + seed<->vertex edges
    weighted by document overlap — one tokenize pass, two hash aggs,
    one bounded join (operators/graph.py)."""
    from elasticsearch_assets_spark.operators.graph import graph_explore

    docs = load_sf_table(spark, sf_dir, "documents")
    out = graph_explore(docs, ["spark"], vertices=5, min_doc_count=3)
    return out.select(
        "source", "target", "doc_count",
        _f4("vertex_score").alias("vertex_score"),
    )


def _graph_explore_sql() -> str:
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    toks = tokens_sql("text")
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({toks})) AS term
  FROM documents
),
m AS (SELECT DISTINCT doc_id FROM dt WHERE term = 'spark'),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM documents),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  WHERE term != 'spark' GROUP BY term HAVING count(*) >= 3
),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY term),
top AS (
  SELECT term AS target,
         (fg_df / fg_total.n) / (bg_df / bg_total.n) AS vertex_score
  FROM fg JOIN bg USING (term), fg_total, bg_total
  ORDER BY vertex_score DESC, term ASC LIMIT 5
),
sd AS (SELECT doc_id, term AS source FROM dt WHERE term = 'spark'),
vd AS (SELECT dt.doc_id, top.target, top.vertex_score
       FROM dt JOIN top ON dt.term = top.target)
SELECT sd.source, vd.target, count(*)::BIGINT AS doc_count,
       floor(vd.vertex_score * 10000.0 + 0.5) / 10000.0 AS vertex_score
FROM sd JOIN vd USING (doc_id)
GROUP BY sd.source, vd.target, vd.vertex_score
ORDER BY vd.vertex_score DESC, vd.target ASC, sd.source ASC
"""


def _esql_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL aggregate spellings batch 2: WEIGHTED_AVG (float64
    promotion) and TOP (top-N values as a multivalue — collect + sort +
    slice; the order literal folds at compile time). TOP's array ships
    as exact-integer strings so the cross-engine compare is
    representation-free."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | STATS wa = WEIGHTED_AVG(value, user_id + 1),"
        "   tp = TOP(value, 3, 'desc') BY event_type"
        " | EVAL tps = array_join(transform(tp,"
        "     x -> CAST(floor(x * 100 + 0.5) AS BIGINT)), ',')"
        " | KEEP event_type, wa, tps | SORT event_type",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("event_type", _f4("wa").alias("wa"), "tps")


_ESQL_AGG_FUNCS_SQL = """
SELECT event_type,
       floor(sum(value::DOUBLE * (user_id + 1)::DOUBLE)
             / sum((user_id + 1)::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS wa,
       array_to_string(
         list_transform(list_sort(list(value), 'DESC')[1:3],
                        x -> CAST(floor(x * 100 + 0.5) AS BIGINT)),
         ',') AS tps
FROM events GROUP BY event_type ORDER BY event_type
"""


def _facet_terms_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg ordered by a metric SUB-AGG (order: {avg: asc}) —
    same one-pass grouped plan, only the final TakeOrdered key changes
    (facets.facet_terms_metrics order_by/ascending)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.facet_terms_metrics(
        matches, docs, "source", "n_chars", n=5,
        order_by="avg", ascending=True,
    )
    return out.select(
        "bucket", "doc_count", _f4("sum").alias("sum"), _f4("avg").alias("avg")
    )


_FACET_TERMS_ORDER_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
SELECT source AS bucket, count(*)::BIGINT AS doc_count,
       floor(sum(n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum,
       floor(avg(n_chars::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS avg
FROM documents JOIN m USING (doc_id)
GROUP BY source
ORDER BY avg(n_chars::DOUBLE) ASC, bucket ASC LIMIT 5
"""


_LTR_WEIGHTS = {"f_len": 0.5, "f_mod": 2.0}


def _ltr_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES LTR rescorer: top-40 BM25 window re-ranked by a linear feature
    model (the classic baseline AND the declared model boundary — any
    scorer fills the same column; the plan is window join + one
    projection). combined = 0.3 * bm25 + model."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        (F.col("n_chars").cast("double") / F.lit(100.0)).alias("f_len"),
        (F.col("doc_id") % 7).cast("double").alias("f_mod"),
    )
    out = idx.ltr_rescore(
        ["spark", "table"], feats, _LTR_WEIGHTS,
        window_size=40, k=10, mode="or",
        query_weight=0.3, model_weight=1.0,
    )
    return out.select("doc_id", _f4("score").alias("score"))


def _ltr_rescore_sql() -> str:
    # _bm25_body keeps the window's primary score FULL-precision (the
    # rounded _bm25_sql output would diverge from the engine's combine)
    body = _bm25_body("term IN ('spark', 'table')")
    return f"""
WITH {body},
w AS (SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id ASC LIMIT 40),
ltr AS (
  SELECT w.doc_id,
         w.s * CAST(0.3 AS DOUBLE)
         + (CAST(n_chars AS DOUBLE) / CAST(100.0 AS DOUBLE)
              * CAST(0.5 AS DOUBLE)
            + CAST(doc_id % 7 AS DOUBLE) * CAST(2.0 AS DOUBLE))
           AS s2
  FROM w JOIN documents USING (doc_id)
)
SELECT doc_id, floor(s2 * 10000.0 + 0.5) / 10000.0 AS score
FROM ltr ORDER BY s2 DESC, doc_id ASC LIMIT 10
"""


def _esql_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL LIKE wildcards: double-quoted patterns use * / ? (compiled
    to an anchored portable RLIKE); single-quoted stays SQL LIKE — the
    coexistence mirrors the uppercase function layer."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM documents"
        ' | WHERE source LIKE "src1*" AND text NOT LIKE "*vector*"'
        " | STATS n = count(*), nc = sum(n_chars) BY source"
        " | SORT source",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("source", "n", "nc")


_ESQL_LIKE_SQL = """
SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS nc
FROM documents
WHERE source LIKE 'src1%' AND text NOT LIKE '%vector%'
GROUP BY source ORDER BY source
"""


def _boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma/RefinedWeb boilerplate line removal over the line-wrapped
    corpus: lines in >= 40 distinct docs (the synthetic corpus repeats
    short lines heavily) are stripped everywhere, order preserved —
    posexplode + one line-keyed agg + broadcast anti-join + ordered
    re-assembly (textstats.remove_boilerplate_lines)."""
    from elasticsearch_assets_spark.operators.textstats import (
        remove_boilerplate_lines,
    )

    out = remove_boilerplate_lines(
        _wrapped_docs(spark, sf_dir), min_doc_freq=40
    )
    return out.select("doc_id", "cleaned_text", "n_lines", "n_removed")


_BOILERPLATE_REMOVAL_SQL = f"""
WITH w AS ({_WRAPPED_CTE}),
s AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(t, chr(10)),
                                    l -> trim(l)), l -> l != '') AS lines
  FROM w
),
e AS (
  SELECT doc_id, unnest(lines) AS line,
         generate_subscripts(lines, 1) AS pos
  FROM s
),
freq AS (
  SELECT line FROM e GROUP BY line
  HAVING count(DISTINCT doc_id) >= 40
),
kept AS (
  SELECT e.doc_id, e.pos, e.line FROM e
  LEFT JOIN freq USING (line) WHERE freq.line IS NULL
),
rebuilt AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS cleaned_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id,
       coalesce(r.cleaned_text, '') AS cleaned_text,
       len(s.lines)::BIGINT AS n_lines,
       (len(s.lines) - coalesce(r.n_kept, 0))::BIGINT AS n_removed
FROM s LEFT JOIN rebuilt r USING (doc_id)
ORDER BY s.doc_id
"""


def _gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter signals (Rae et al. 2021 A1.1) over the
    line-wrapped corpus: word/line array higher-order expressions, zero
    shuffle (textstats.gopher_rules)."""
    from elasticsearch_assets_spark.operators.textstats import gopher_rules

    out = gopher_rules(_wrapped_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_words", _f4("mean_word_len").alias("mean_word_len"),
        _f4("symbol_ratio").alias("symbol_ratio"),
        _f4("frac_bullet_lines").alias("frac_bullet_lines"),
        _f4("frac_ellipsis_lines").alias("frac_ellipsis_lines"),
        _f4("frac_alpha_words").alias("frac_alpha_words"),
        "n_stopwords", "passes_gopher",
    ).orderBy("doc_id")


_GOPHER_RULES_SQL = f"""
WITH w AS ({_WRAPPED_CTE}),
s AS (
  SELECT doc_id, t,
         list_filter(regexp_split_to_array(t, '\\s+'), x -> x != '')
           AS words,
         list_filter(list_transform(string_split(t, chr(10)),
                                    l -> trim(l)), l -> l != '') AS lines
  FROM w
),
m AS (
  SELECT doc_id,
         len(words)::BIGINT AS n_words,
         CASE WHEN len(words) > 0 THEN
           list_aggregate(list_transform(words, x -> length(x)),
                          'sum')::DOUBLE / len(words)
         ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(words) > 0 THEN
           (length(t) - length(replace(t, '#', ''))
            + length(t) - length(replace(t, '…', '')))::DOUBLE
           / len(words)
         ELSE 0.0 END AS symbol_ratio,
         len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %'
                                   OR l LIKE '• %'))::DOUBLE
           / greatest(len(lines), 1) AS frac_bullet_lines,
         len(list_filter(lines, l -> l LIKE '%…' OR l LIKE '%...'))::DOUBLE
           / greatest(len(lines), 1) AS frac_ellipsis_lines,
         CASE WHEN len(words) > 0 THEN
           len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
           / len(words)
         ELSE 0.0 END AS frac_alpha_words,
         ({" + ".join(
             "(list_contains(list_transform(words, x -> lower(x)), "
             f"'{sw}'))::BIGINT"
             for sw in (
                 "the", "be", "to", "of", "and", "that", "have", "with"
             )
         )}) AS n_stopwords
  FROM s
)
SELECT doc_id, n_words,
       floor(mean_word_len * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
       floor(symbol_ratio * 10000.0 + 0.5) / 10000.0 AS symbol_ratio,
       floor(frac_bullet_lines * 10000.0 + 0.5) / 10000.0
         AS frac_bullet_lines,
       floor(frac_ellipsis_lines * 10000.0 + 0.5) / 10000.0
         AS frac_ellipsis_lines,
       floor(frac_alpha_words * 10000.0 + 0.5) / 10000.0
         AS frac_alpha_words,
       n_stopwords,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND symbol_ratio <= 0.1
        AND frac_bullet_lines <= 0.9
        AND frac_ellipsis_lines <= 0.3
        AND frac_alpha_words >= 0.8
        AND n_stopwords >= 2) AS passes_gopher
FROM m ORDER BY doc_id
"""


def _c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line cleaning (Raffel et al. 2020 2.2) over the line-wrapped
    corpus: terminal-punctuation + min-words line retention, page flags,
    page keep decision — nested higher-order expressions, text never
    shuffles (textstats.c4_line_filter)."""
    from elasticsearch_assets_spark.operators.textstats import c4_line_filter

    out = c4_line_filter(_wrapped_docs(spark, sf_dir))
    return out.select(
        "doc_id", "cleaned_text", "n_lines", "n_kept",
        "has_brace", "has_lorem", "keep",
    ).orderBy("doc_id")


_C4_FILTERS_SQL = f"""
WITH w AS ({_WRAPPED_CTE}),
s AS (
  SELECT doc_id, t,
         list_filter(list_transform(string_split(t, chr(10)),
                                    l -> trim(l)), l -> l != '') AS lines
  FROM w
),
k AS (
  SELECT doc_id, t, lines,
         list_filter(lines, l ->
           right(l, 1) IN ('.', '!', '?', '"')
           AND len(list_filter(regexp_split_to_array(l, '\\s+'),
                               x -> x != '')) >= 3) AS kept
  FROM s
)
SELECT doc_id,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
       len(lines)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept,
       contains(t, '{{') AS has_brace,
       contains(lower(t), 'lorem ipsum') AS has_lorem,
       (len(kept) >= 3 AND NOT contains(t, '{{')
        AND NOT contains(lower(t), 'lorem ipsum')) AS keep
FROM k ORDER BY doc_id
"""


def _sorted_scan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES index.sort + early termination: the table is materialized
    range-partitioned/sorted on ts, so top-k-by-ts reads only the
    covering file PREFIX (footer min/max planning, disjoint ranges make
    the prune exact — sources/sorted_scan.py). The oracle is the plain
    full-scan ORDER BY LIMIT the prefix must reproduce bit-for-bit."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.sources.sorted_scan import (
        plan_sorted_topk, sorted_topk, write_sorted,
    )

    events = load_sf_table(spark, sf_dir, "events")
    scratch = os.path.join("/tmp", "esa_sorted", uuid.uuid4().hex[:12])
    try:
        write_sorted(events, scratch, "ts", num_files=8)
        picked, total = plan_sorted_topk(scratch, "ts", 25)
        assert len(picked) < total  # the prune actually prunes
        out = sorted_topk(
            spark, scratch, "ts", 25,
            where="event_type = 'view'", tiebreak="event_id",
        )
        res = out.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_type",
        )
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


_SORTED_SCAN_TOPK_SQL = """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type
FROM events WHERE event_type = 'view'
ORDER BY ts DESC, event_id ASC LIMIT 25
"""


def _watcher_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES Watcher: input search (filter + aggs) -> condition over the
    payload -> actions fired iff met. One filter + hash-agg plan; the
    condition is a projection over the single payload row
    (operators/watcher.py). Scheduling is the orchestrator's, as ES's
    trigger is the watcher scheduler's."""
    import math

    from elasticsearch_assets_spark.operators.watcher import execute_watch

    events = load_sf_table(spark, sf_dir, "events")
    rec = execute_watch(events, {
        "input": {
            "filter": "event_type = 'error'",
            "aggs": {"n": "count(*)", "av": "avg(value)"},
        },
        "condition": "n >= 10 AND av > 0",
        "actions": ["log", "notify"],
    })
    av = rec["payload"]["av"]
    av4 = math.floor(av * 10000.0 + 0.5) / 10000.0 if av is not None else None
    return spark.createDataFrame(
        [(rec["payload"]["n"], av4, rec["condition_met"],
          ",".join(rec["actions_fired"]))],
        "n long, av double, met boolean, fired string",
    )


_WATCHER_CHECK_SQL = """
SELECT count(*)::BIGINT AS n,
       floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS av,
       (count(*) >= 10 AND avg(value) > 0) AS met,
       CASE WHEN count(*) >= 10 AND avg(value) > 0
            THEN 'log,notify' ELSE '' END AS fired
FROM events WHERE event_type = 'error'
"""


def _ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ingest pipeline: a processor chain (set/rename/gsub/uppercase/
    script/convert/fingerprint/date/drop) compiled into ONE Catalyst
    projection chain + a filter — no per-document loop anywhere
    (sinks/ingest.py). The oracle restates each processor as SQL over
    the same rows."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    events = load_sf_table(spark, sf_dir, "events").where(
        "event_id % 3 = 0"
    )
    out = run_pipeline(events, [
        {"set": {"field": "pipeline_tag", "value": "v1"}},
        {"rename": {"field": "props", "target_field": "meta"}},
        {"gsub": {"field": "event_type", "pattern": "[aeiou]",
                  "replacement": "_", "target_field": "et_gsub"}},
        {"uppercase": {"field": "event_type", "target_field": "et_up"}},
        {"script": {"target_field": "value_sq",
                    "source": "CAST(value * value AS DOUBLE)"}},
        {"convert": {"field": "user_id", "type": "string",
                     "target_field": "uid_s"}},
        {"fingerprint": {"fields": ["event_id", "event_type"],
                         "target_field": "fp"}},
        {"script": {"target_field": "day_s",
                    "source": "date_format(ts, 'yyyy-MM-dd')"}},
        {"date": {"field": "day_s", "formats": ["yyyy-MM-dd"],
                  "target_field": "day_ts"}},
        {"drop": {"if": "event_type = 'error'"}},
    ], on_failure="fail")
    return out.select(
        "event_id", "pipeline_tag", "et_gsub", "et_up",
        _f4("value_sq").alias("value_sq"), "uid_s", "fp",
        F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
    ).orderBy("event_id")


_INGEST_PIPELINE_SQL = """
SELECT event_id,
       'v1' AS pipeline_tag,
       regexp_replace(event_type, '[aeiou]', '_', 'g') AS et_gsub,
       upper(event_type) AS et_up,
       floor(value * value * 10000.0 + 0.5) / 10000.0 AS value_sq,
       user_id::VARCHAR AS uid_s,
       md5(event_id::VARCHAR || '|' || event_type) AS fp,
       strftime(ts, '%Y-%m-%d') AS day
FROM events
WHERE event_id % 3 = 0 AND event_type != 'error'
ORDER BY event_id
"""


def _routed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES custom routing: docs shard by hash(routing_value) % n (here
    routed on `source`), search with routing=v fans out to ONE shard
    under GLOBAL stats (the ShardedIndex DFS contract) — so the result
    is the global ranking restricted to that shard's docs, which the
    oracle restates with the shared hash60 routing SQL
    (query/routing.py)."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.query.routing import (
        RoutedIndex, build_routed_shards,
    )

    docs = load_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    scratch = os.path.join("/tmp", "esa_routed", uuid.uuid4().hex[:12])
    try:
        build_routed_shards(
            spark, docs, scratch, 3, "source", num_segments=4,
        )
        idx = RoutedIndex(spark, scratch)
        out = idx.search(
            ["spark", "join"], k=None, mode="or", routing="src3"
        )
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


def _routed_search_sql() -> str:
    from elasticsearch_assets_spark.index.reshard import split_routing_sql
    from elasticsearch_assets_spark.query.routing import routing_shard

    routed = split_routing_sql("source", 3, routing_shard("src3", 3))
    return _bm25_sql(
        ["spark", "join"], "or", None,
        where=f"doc_id IN (SELECT doc_id FROM documents WHERE {routed})",
    )


_SEMDEDUP_NC = 16
_SEMDEDUP_TAU = 0.45


def _semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clusters bound the pair
    expansion, high-cosine within-cluster pairs prune to the
    lower-centroid-cosine member (similarity.semdedup). The scale path
    the O(n^2) emb_neardup baseline points at."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    out = OS.semdedup(
        emb, n_centroids=_SEMDEDUP_NC, threshold=_SEMDEDUP_TAU,
        sample=_IVF_SAMPLE,
    )
    return out.select("vec_id", "centroid", "is_dup")


def _semdedup_sql() -> "str | None":
    """DuckDB twin: same ordered-sample kmeans (identical float32 parquet
    input -> bit-identical centroids), assignment + centroid-cosine as
    the same sequential dot chains, pair pruning restated relationally."""
    import duckdb
    import numpy as np

    path = os.path.join(_ORACLE_SF_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT embedding FROM read_parquet('{path}') "
        f"ORDER BY vec_id LIMIT {_IVF_SAMPLE}"
    ).df()
    x = np.stack(pdf["embedding"].to_numpy())
    cents = OS.kmeans_fit(x, n_centroids=_SEMDEDUP_NC, iters=10)
    dim = cents.shape[1]

    def dot_chain(vec: str, c: "np.ndarray") -> str:
        return "(0.0 + " + " + ".join(
            f"{vec}[{d + 1}]::DOUBLE * {float(c[d])!r}" for d in range(dim)
        ) + ")"

    dots = "[" + ", ".join(
        dot_chain("embedding", cents[i]) for i in range(len(cents))
    ) + "]"
    sq = (
        "sqrt((SELECT sum(embedding[i]::DOUBLE * embedding[i]::DOUBLE) "
        "FROM range(1, 65) r(i)))"
    )
    dot_ab = (
        "(SELECT sum(a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE) "
        "FROM range(1, 65) r(i))"
    )
    return f"""
WITH assigned AS (
  SELECT vec_id, embedding,
         list_position(dots, list_max(dots)) - 1 AS centroid,
         list_max(dots) / nrm AS ccos, nrm
  FROM (SELECT vec_id, embedding, {dots} AS dots, {sq} AS nrm
        FROM embeddings)
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.centroid = b.centroid AND a.vec_id != b.vec_id
   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
  WHERE {dot_ab} / (a.nrm * b.nrm) >= {_SEMDEDUP_TAU}
)
SELECT s.vec_id, s.centroid, (d.vec_id IS NOT NULL) AS is_dup
FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
ORDER BY s.vec_id
"""


def _ccr_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES CCR: a follower bootstraps from the leader's committed
    snapshot, the leader then grows by one committed chunk (the
    streaming-epoch shape), and an incremental sync links ONLY the new
    chunk (O(new files) inode ops). The caught-up follower's BM25 is
    rank-identical to a monolithic index over the full corpus, so the
    oracle is the plain global BM25 (index/ccr.py)."""
    import shutil
    import uuid

    from elasticsearch_assets_spark.index.build import (
        build_chunk, build_index, finalize_index,
    )
    from elasticsearch_assets_spark.index.ccr import sync_follower
    from elasticsearch_assets_spark.index.seg_map import (
        SegMapEntry, upsert_chunk_entry,
    )
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    docs = load_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = os.path.join("/tmp", "esa_ccr", uuid.uuid4().hex[:12])
    leader = os.path.join(scratch, "leader")
    follower = os.path.join(scratch, "follower")
    try:
        build_index(
            spark, docs.where("doc_id % 2 = 0"), leader,
            num_segments=8, num_chunks=2,
        )
        rep = sync_follower(spark, leader, follower)
        assert rep["mode"] == "bootstrap"
        build_chunk(
            spark, docs.where("doc_id % 2 = 1"), leader,
            chunk_id=2, seg_base=8, segs_per_chunk=4, nparts=4,
        )
        upsert_chunk_entry(
            leader, SegMapEntry(chunk=2, spc=4, segs=[8, 9, 10, 11])
        )
        finalize_index(
            spark, leader, num_segments=12, num_chunks=3,
            partitioning="doc_hash", segs_per_chunk=4,
        )
        rep = sync_follower(spark, leader, follower)
        assert rep["chunks_added"] == ["chunk=2"]
        idx = InvertedIndex(spark, follower)
        out = idx.search(["spark", "join"], k=None, mode="or")
        res = out.select("doc_id", F.round("score", 4).alias("score"))
        res = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return res


_CCR_FOLLOW_SQL = _bm25_sql(["spark", "join"], "or", None)


def _completion_ctx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester with category contexts: suggestions
    restricted to the requested contexts (here the document language),
    scored df x context boost. One scan -> tokenize -> prefix filter ->
    hash agg on (context, term) (operators/suggesters.py)."""
    from elasticsearch_assets_spark.operators.suggesters import (
        completion_contexts,
    )

    docs = load_sf_table(spark, sf_dir, "documents")
    out = completion_contexts(
        docs, "s", ["en", "de"], boosts={"de": 2.0}, size=12
    )
    return out.select(
        "suggestion", "context", "df", _f4("score").alias("score")
    )


def _completion_ctx_sql() -> str:
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    return f"""
WITH t AS (
  SELECT lang AS context,
         unnest(list_distinct({tokens_sql('text')})) AS suggestion
  FROM documents WHERE lang IN ('en', 'de')
)
SELECT suggestion, context, count(*)::BIGINT AS df,
       floor(count(*)::DOUBLE
             * (CASE WHEN context = 'de' THEN CAST(2.0 AS DOUBLE)
                ELSE CAST(1.0 AS DOUBLE) END) * 10000.0 + 0.5) / 10000.0
         AS score
FROM t WHERE suggestion LIKE 's%'
GROUP BY suggestion, context
ORDER BY score DESC, suggestion ASC, context ASC LIMIT 12
"""


def _rank_eval_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _rank_eval expected_reciprocal_rank (the cascade metric the
    plain rank_eval row doesn't carry): sequential fold over the
    rank-sorted grade list per query — exact float64 in rank order, so
    the oracle's recursive CTE multiplying in the same order is
    bit-identical before rounding."""
    from elasticsearch_assets_spark.operators.rankeval import (
        expected_reciprocal_rank,
    )

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    results = idx.msearch(
        [{"query": q, "mode": "or", "k": _RE_K} for q in _RE_QUERIES]
    )
    toks = F.split(F.col("text"), " ")
    parts = []
    for qid, q in enumerate(_RE_QUERIES):
        grade = sum(F.array_contains(toks, t).cast("int") for t in q)
        parts.append(
            docs.where(F.col("doc_id") % 2 == 0)
            .select(
                F.lit(qid).alias("query_id"), "doc_id", grade.alias("grade")
            )
            .where(F.col("grade") > 0)
        )
    judgments = parts[0].unionByName(parts[1])
    out = expected_reciprocal_rank(results, judgments, k=_RE_K, max_grade=3)
    return out.select("query_id", _f4("err").alias("err"))


def _rank_eval_err_sql() -> str:
    # same corpus-derived results/judgments as _rank_eval_sql, then the
    # ERR cascade as a recursive CTE walking ranks in order (the proven
    # WITH-RECURSIVE-under-a-CTE DuckDB pattern)
    base = _rank_eval_sql()
    prefix = base[: base.index("met AS (")]
    return f"""{prefix}seq AS (
  WITH RECURSIVE walk(query_id, rank, err, p) AS (
    SELECT query_id, 0, CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)
    FROM (SELECT DISTINCT query_id FROM jt)
    UNION ALL
    SELECT w.query_id, w.rank + 1,
           w.err + w.p * ((pow(2, j.grade) - 1) / CAST(8 AS DOUBLE))
                 / (w.rank + 1),
           w.p * (1 - (pow(2, j.grade) - 1) / CAST(8 AS DOUBLE))
    FROM walk w JOIN jt j
      ON j.query_id = w.query_id AND j.rank = w.rank + 1
  )
  SELECT * FROM walk
)
SELECT query_id, floor(max_by(err, rank) * 10000.0 + 0.5) / 10000.0 AS err
FROM seq GROUP BY query_id ORDER BY query_id
"""


def _facet_moving_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_fn builtins beyond avg: linearWeightedAvg + ewma(0.5)
    over the daily event-count series, trailing window 3. Pipeline aggs
    see the bucket series only, so the window sort is over bucket
    cardinality (operators/facets.py moving_fn)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    events = load_sf_table(spark, sf_dir, "events")
    ser = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("bucket")
    ).agg(F.count("*").alias("doc_count"))
    out = OFA.moving_fn(ser, "linearWeightedAvg", window=3)
    out = OFA.moving_fn(out, "ewma", window=3, alpha=0.5)
    return out.select(
        "bucket", "doc_count",
        _f4("linearWeightedAvg").alias("lwa"), _f4("ewma").alias("ewma"),
    )


# ewma alpha = 0.5: every product is an exact dyadic float, so the
# closed-form sum equals the engine's sequential fold bit-for-bit
_FACET_MOVING_FN_SQL = """
WITH s AS (
  SELECT strftime(ts, '%Y-%m-%d') AS bucket, count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
),
f AS (
  SELECT bucket, doc_count,
         list(doc_count::DOUBLE)
           OVER (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS l
  FROM s
)
SELECT bucket, doc_count,
       floor((SELECT sum(l[i] * i) FROM range(1, 4) r(i) WHERE i <= len(l))
             / (CAST(len(l) * (len(l) + 1) AS DOUBLE) / 2)
             * 10000.0 + 0.5) / 10000.0 AS lwa,
       floor((SELECT sum(CASE WHEN i = 1 THEN power(0.5, len(l) - 1) * l[1]
                         ELSE 0.5 * power(0.5, len(l) - i) * l[i] END)
              FROM range(1, 4) r(i) WHERE i <= len(l))
             * 10000.0 + 0.5) / 10000.0 AS ewma
FROM f ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Batch 3z: training-pipeline selection — tokenizer fertility, DSIR
# importance weights, CCNet perplexity buckets
# ---------------------------------------------------------------------------


def _fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility accounting (GPT-2-style pre-tokens per
    whitespace word / bytes per pre-token) — the tokens-per-dollar lever
    for a 100 TB training corpus. Pure JVM regexp pass, zero shuffle
    (textstats.fertility_stats; the portable-RE2 pre-tokenizer deviation
    is documented there)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.fertility_stats(docs)
    return out.select(
        "doc_id", "n_bytes", "n_chars", "n_words", "n_subwords",
        _f4("fertility").alias("fertility"),
        _f4("bytes_per_token").alias("bpt"),
    )


def _fertility_stats_sql() -> str:
    return f"""
SELECT doc_id, n_bytes, n_chars, n_words, n_subwords,
       floor(fertility * 10000.0 + 0.5) / 10000.0 AS fertility,
       floor(bytes_per_token * 10000.0 + 0.5) / 10000.0 AS bpt
FROM ({OT.fertility_stats_sql()})
"""


_DSIR_BUCKETS = 1024


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) hashed-ngram importance weights: target =
    the src0 slice of the corpus, raw = the whole corpus; log w(x) =
    sum_b c_b(x)(ln p_b - ln q_b) over 1024 hashed unigram+bigram
    buckets. One tokenize scan, one dual-distribution hash agg, one
    broadcast ratio join (textstats.dsir_importance). The paper's Gumbel
    top-k resample adds sampling noise; ordering on logw is the
    deterministic, reproducible variant."""
    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "_is_tgt", F.col("source") == "src0"
    )
    out = OT.dsir_importance(docs, "_is_tgt", n_buckets=_DSIR_BUCKETS)
    return out.select("doc_id", "n_feats", _f4("logw").alias("logw"))


def _dsir_weights_sql() -> str:
    inner = OT.dsir_importance_sql(
        "source = 'src0'", n_buckets=_DSIR_BUCKETS
    )
    return f"""
SELECT doc_id, n_feats, floor(logw * 10000.0 + 0.5) / 10000.0 AS logw
FROM ({inner})
"""


def _ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity thirds under the corpus's own
    unigram LM (textstats.ccnet_buckets). Cut order is
    (rounded xent, doc_id) so the split is bit-stable cross-engine;
    thresholds='approx' (percentile_approx, no global sort) is the
    10^12-doc path, exercised in the unit test."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.ccnet_buckets(docs).select(
        "doc_id", "n_tokens", "xent_r", "bucket"
    )


# ---------------------------------------------------------------------------
# Batch 3z2: runtime fields, _field_caps, filtered kNN
# ---------------------------------------------------------------------------

# one definition feeds BOTH engines: the runtime-field script dialect is
# Spark SQL, and these expressions parse identically in DuckDB (the
# shared-SQL-text oracle pattern; CAST..DOUBLE per the DECIMAL gotcha)
_RUNTIME_MAPPINGS = {
    "chars_kb": "CAST(n_chars AS DOUBLE) / 1024.0",
    "lang_src": "concat(lang, '/', source)",
    "is_long": "n_chars > 150",
}


def _runtime_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES runtime_mappings: search-time computed fields used in a filter
    AND an aggregation without reindexing (query/runtime_fields.py).
    The mapping compiles to one projection inside the scan's codegen
    span; the filter on the runtime field still prunes before the agg
    shuffle."""
    from elasticsearch_assets_spark.query.runtime_fields import (
        apply_runtime_mappings,
    )

    docs = load_sf_table(spark, sf_dir, "documents")
    rt = apply_runtime_mappings(docs, _RUNTIME_MAPPINGS)
    return (
        rt.where(F.col("is_long"))
        .groupBy("lang_src")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.avg("chars_kb").alias("avg_kb"),
        )
        .select("lang_src", "doc_count", _f4("avg_kb").alias("avg_kb"))
        .orderBy("lang_src")
    )


_RUNTIME_FIELDS_SQL = f"""
WITH rt AS (
  SELECT *, {_RUNTIME_MAPPINGS['chars_kb']} AS chars_kb,
         {_RUNTIME_MAPPINGS['lang_src']} AS lang_src,
         {_RUNTIME_MAPPINGS['is_long']} AS is_long
  FROM documents
)
SELECT lang_src, count(*)::BIGINT AS doc_count,
       floor(avg(chars_kb) * 10000.0 + 0.5) / 10000.0 AS avg_kb
FROM rt WHERE is_long GROUP BY lang_src ORDER BY lang_src
"""


def _field_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _field_caps across three indices (documents/events/embeddings):
    pure footer metadata through Spark's schema reader; the oracle
    re-derives the same table from DuckDB's independent DESCRIBE over
    the same parquet files (two footer readers cross-check, the
    disk_usage pattern)."""
    from elasticsearch_assets_spark.sources.field_caps import field_caps

    tables = {
        name: load_sf_table(spark, sf_dir, name)
        for name in ("documents", "events", "embeddings")
    }
    return field_caps(spark, tables)


# the CASE mirrors sources/field_caps.py's documented type mapping; the
# driver's oracle runs at sf0.01 (TESTDATA.md), matching the fixed paths
_FIELD_CAPS_SQL = """
WITH cols AS (
  SELECT 'documents' AS idx, column_name, column_type
  FROM (DESCRIBE SELECT * FROM '/root/testdata/sf0.01/documents.parquet')
  UNION ALL
  SELECT 'events', column_name, column_type
  FROM (DESCRIBE SELECT * FROM '/root/testdata/sf0.01/events.parquet')
  UNION ALL
  SELECT 'embeddings', column_name, column_type
  FROM (DESCRIBE SELECT * FROM '/root/testdata/sf0.01/embeddings.parquet')
),
typed AS (
  SELECT idx, column_name AS field,
         CASE
           WHEN column_type = 'VARCHAR' AND column_name = 'text' THEN 'text'
           WHEN column_type = 'VARCHAR' THEN 'keyword'
           WHEN column_type IN ('FLOAT[]', 'DOUBLE[]') THEN 'dense_vector'
           WHEN column_type = 'BIGINT' THEN 'long'
           WHEN column_type = 'INTEGER' THEN 'integer'
           WHEN column_type = 'SMALLINT' THEN 'short'
           WHEN column_type = 'TINYINT' THEN 'byte'
           WHEN column_type = 'FLOAT' THEN 'float'
           WHEN column_type = 'DOUBLE' THEN 'double'
           WHEN column_type = 'BOOLEAN' THEN 'boolean'
           WHEN column_type = 'DATE' THEN 'date'
           WHEN column_type LIKE 'TIMESTAMP%' THEN 'date'
           WHEN column_type = 'BLOB' THEN 'binary'
         END AS es_type
  FROM cols
)
SELECT field, es_type,
       es_type NOT IN ('binary') AS searchable,
       es_type NOT IN ('text', 'dense_vector', 'binary') AS aggregatable,
       count(*)::BIGINT AS n_indices,
       string_agg(idx, ',' ORDER BY idx) AS indices
FROM typed GROUP BY field, es_type ORDER BY field, es_type
"""


def _ann_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES kNN with a filter: top-10 among label%3=0 vectors only — the
    filter applies DURING the search (similarity.knn_filtered), never as
    a post-filter that could return short. Exact method here; the IVF
    variant's parity is unit-tested."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    out = OS.knn_filtered(emb, qv, k=10, filter="label % 3 = 0")
    return out.select("vec_id", F.round("score", 4).alias("score"))


_ANN_TOPK_FILTERED_SQL = f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM embeddings a, q b WHERE a.label % 3 = 0
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def _moving_fn_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_fn holt (double exponential smoothing, window 4,
    alpha=beta=0.5): level/trend fold over the trailing daily-count
    window, one-step forecast s+b out. alpha=beta=0.5 keeps every fold
    product dyadic, and the DuckDB oracle replays the IDENTICAL fold
    via list_reduce with struct state — bit parity by construction."""
    from elasticsearch_assets_spark.operators import facets as OFA

    events = load_sf_table(spark, sf_dir, "events")
    ser = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("bucket")
    ).agg(F.count("*").alias("doc_count"))
    out = OFA.moving_fn(ser, "holt", window=4, alpha=0.5, beta=0.5)
    return out.select("bucket", "doc_count", _f4("holt").alias("holt"))


_MOVING_FN_HOLT_SQL = """
WITH s AS (
  SELECT strftime(ts, '%Y-%m-%d') AS bucket, count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
),
f AS (
  SELECT bucket, doc_count,
         list(doc_count::DOUBLE)
           OVER (ORDER BY bucket ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
           AS l
  FROM s
),
r AS (
  -- state is a [level, trend] LIST: DuckDB 1.0's list_reduce evaluates
  -- STRUCT lambda fields sequentially (the second field sees the first
  -- field's UPDATED value), so struct state miscomputes chained folds;
  -- list state folds correctly (probed; CLAUDE.md gotcha)
  SELECT bucket, doc_count,
         list_reduce(
           list_prepend([l[1], 0.0::DOUBLE],
                        list_apply(l[2:], v -> [v, 0.0::DOUBLE])),
           (acc, x) -> [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                        0.25 * (x[1] - acc[1]) + 0.75 * acc[2]]
         ) AS st
  FROM f
)
SELECT bucket, doc_count,
       floor((st[1] + st[2]) * 10000.0 + 0.5) / 10000.0 AS holt
FROM r ORDER BY bucket
"""


def _sigterms_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms with the mutual_information heuristic (2×2 MI
    in bits, include_negatives=false shape) over the 'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.significant_terms(
        matches, docs, n=10, heuristic="mutual_information"
    )
    return out.select("term", "fg_df", "bg_df", _f4("score").alias("score"))


_SIGTERMS_MI_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM documents),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  GROUP BY term HAVING count(*) >= 3
),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY term),
cells AS (
  SELECT term, fg_df, bg_df,
         fg_df::DOUBLE AS t1, (bg_df - fg_df)::DOUBLE AS t0,
         fg_total.n - fg_df AS o1,
         (bg_total.n - fg_total.n) - (bg_df - fg_df) AS o0,
         bg_total.n AS nn, fg_total.n AS fgn
  FROM fg JOIN bg USING (term), fg_total, bg_total
),
s AS (
  SELECT term, fg_df, bg_df,
    CASE WHEN fg_df / fgn > bg_df / nn THEN
      (CASE WHEN t1 > 0 THEN (t1/nn) * log2(t1*nn/((t1+t0)*(t1+o1))) ELSE 0 END)
    + (CASE WHEN t0 > 0 THEN (t0/nn) * log2(t0*nn/((t1+t0)*(t0+o0))) ELSE 0 END)
    + (CASE WHEN o1 > 0 THEN (o1/nn) * log2(o1*nn/((o1+o0)*(t1+o1))) ELSE 0 END)
    + (CASE WHEN o0 > 0 THEN (o0/nn) * log2(o0*nn/((o1+o0)*(t0+o0))) ELSE 0 END)
    ELSE 0.0 END AS score
  FROM cells
)
SELECT term, fg_df, bg_df,
       floor(score * 10000.0 + 0.5) / 10000.0 AS score
FROM s ORDER BY s.score DESC, term ASC LIMIT 10
"""


def _sigterms_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms with the chi_square heuristic (superset-adjusted
    2×2 χ², Manning et al.; include_negatives=false shape) over the
    'spark' match set — completes the heuristic set (jlh / mi / gnd /
    percentage / chi_square)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.significant_terms(matches, docs, n=10, heuristic="chi_square")
    return out.select("term", "fg_df", "bg_df", _f4("score").alias("score"))


_SIGTERMS_CHI2_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM documents),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  GROUP BY term HAVING count(*) >= 3
),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY term),
cells AS (
  SELECT term, fg_df, bg_df,
         fg_df::DOUBLE AS n11, (bg_df - fg_df)::DOUBLE AS n01,
         fg_total.n - fg_df AS n10,
         (bg_total.n - fg_total.n) - (bg_df - fg_df) AS n00,
         bg_total.n AS nn, fg_total.n AS fgn
  FROM fg JOIN bg USING (term), fg_total, bg_total
),
s AS (
  SELECT term, fg_df, bg_df,
    CASE WHEN fg_df / fgn > bg_df / nn THEN
      nn * pow(n11 * n00 - n10 * n01, 2)
      / ((n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00))
    ELSE 0.0 END AS score
  FROM cells
)
SELECT term, fg_df, bg_df,
       floor(score * 10000.0 + 0.5) / 10000.0 AS score
FROM s ORDER BY s.score DESC, term ASC LIMIT 10
"""


def _sigterms_gnd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms with the gnd heuristic (normalized Google
    distance, exp(-2·gnd) inversion) over the 'spark' match set."""
    from elasticsearch_assets_spark.operators import facets as OFA

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = OFA.significant_terms(matches, docs, n=10, heuristic="gnd")
    return out.select("term", "fg_df", "bg_df", _f4("score").alias("score"))


_SIGTERMS_GND_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
fg_total AS (SELECT count(*)::DOUBLE AS n FROM m),
bg_total AS (SELECT count(*)::DOUBLE AS n FROM documents),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df FROM dt JOIN m USING (doc_id)
  GROUP BY term HAVING count(*) >= 3
),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY term),
s AS (
  SELECT term, fg_df, bg_df,
    CASE WHEN ln(bg_total.n) - least(ln(bg_df::DOUBLE), ln(fg_total.n)) > 0
    THEN exp(-2.0 * (greatest(ln(bg_df::DOUBLE), ln(fg_total.n))
                     - ln(fg_df::DOUBLE))
                  / (ln(bg_total.n)
                     - least(ln(bg_df::DOUBLE), ln(fg_total.n))))
    ELSE 1.0 END AS score
  FROM fg JOIN bg USING (term), fg_total, bg_total
)
SELECT term, fg_df, bg_df,
       floor(score * 10000.0 + 0.5) / 10000.0 AS score
FROM s ORDER BY s.score DESC, term ASC LIMIT 10
"""


_NDJSON_DIR = "/tmp/esa_ndjson_scan"
_CSV_DIR = "/tmp/esa_csv_scan"


def _ndjson_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ndjson ingestion source (sources/files.py read_ndjson): stage the
    events table as newline-delimited JSON (timestamps as ISO strings —
    the tz-free cross-engine protocol), then read it back with an
    explicit schema, projection, and the [start, end) predicate. The
    oracle parses the SAME files through DuckDB's independent JSON
    reader."""
    from elasticsearch_assets_spark.sources import files as FSRC

    events = load_sf_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_iso"),
        "event_type",
        "user_id",
    )
    events.coalesce(4).write.mode("overwrite").json(_NDJSON_DIR)
    out = FSRC.read_ndjson(
        spark,
        _NDJSON_DIR,
        "event_id bigint, ts_iso string, event_type string, user_id bigint",
        fields=["event_id", "event_type"],
        date_field="ts_iso",
        start="2024-01-10 00:00:00",
        end="2024-01-20 00:00:00",
    )
    return out.orderBy("event_id")


_NDJSON_SCAN_SQL = f"""
SELECT event_id, event_type, ts_iso
FROM read_json('{_NDJSON_DIR}/*.json', format='newline_delimited',
               columns={{'event_id': 'BIGINT', 'ts_iso': 'VARCHAR',
                         'event_type': 'VARCHAR'}})
WHERE ts_iso >= '2024-01-10 00:00:00' AND ts_iso < '2024-01-20 00:00:00'
ORDER BY event_id
"""


def _csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion source (sources/files.py read_csv): documents staged
    as RFC-4180 CSV, read back with explicit schema + projection, then a
    post-read predicate (the composition a real ingest job does before
    to_parquet). Oracle = DuckDB's independent CSV parser on the same
    files."""
    from elasticsearch_assets_spark.sources import files as FSRC

    docs = load_sf_table(spark, sf_dir, "documents")
    docs.coalesce(2).write.mode("overwrite").option("header", "true").csv(
        _CSV_DIR
    )
    out = FSRC.read_csv(
        spark,
        _CSV_DIR,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
        fields=["doc_id", "lang", "source", "n_chars"],
    )
    return out.where(F.col("n_chars") >= 150).orderBy("doc_id")


_CSV_SCAN_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM read_csv('{_CSV_DIR}/*.csv', header=true,
              columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR',
                        'lang': 'VARCHAR', 'source': 'VARCHAR',
                        'n_chars': 'BIGINT'}})
WHERE n_chars >= 150 ORDER BY doc_id
"""


def _esql_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL COMPLETION with the deterministic stand-in (models are the
    declared boundary, the RERANK pattern): target column = inference-id
    tag + the prompt's first 8 analyzed tokens; prompt built from row
    columns by a scalar expression. One projection, no shuffle."""
    from elasticsearch_assets_spark.query.esql import esql

    return esql(
        "FROM documents | WHERE doc_id % 17 == 0"
        " | COMPLETION summary = CONCAT('sum: ', text) WITH test_model"
        " | KEEP doc_id, summary | SORT doc_id",
        spark=spark, sf_dir=sf_dir,
    )


_ESQL_COMPLETION_SQL = r"""
SELECT doc_id,
       concat('[test_model] ',
              array_to_string(
                regexp_extract_all(lower(concat('sum: ', text)),
                                   '[\p{L}\p{N}]+')[1:8], ' ')) AS summary
FROM documents WHERE doc_id % 17 = 0 ORDER BY doc_id
"""


def _moving_fn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_fn order-free builtins (min/max/sum/unweightedAvg/
    stdDev): each compiles to the window aggregate directly — no frame
    materialization. stdDev is population std over the window (the ES
    MovingFunctions contract)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    events = load_sf_table(spark, sf_dir, "events")
    ser = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("bucket")
    ).agg(F.count("*").alias("doc_count"))
    out = ser
    for f in ("min", "max", "sum", "unweightedAvg", "stdDev"):
        out = OFA.moving_fn(out, f, window=4)
    return out.select(
        "bucket", "doc_count", F.col("min").cast("long").alias("w_min"),
        F.col("max").cast("long").alias("w_max"),
        F.col("sum").cast("long").alias("w_sum"),
        _f4("unweightedAvg").alias("w_avg"), _f4("stdDev").alias("w_std"),
    )


_MOVING_FN_STATS_SQL = """
WITH s AS (
  SELECT strftime(ts, '%Y-%m-%d') AS bucket, count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket, doc_count,
  CAST(min(doc_count::DOUBLE) OVER w AS BIGINT) AS w_min,
  CAST(max(doc_count::DOUBLE) OVER w AS BIGINT) AS w_max,
  CAST(sum(doc_count::DOUBLE) OVER w AS BIGINT) AS w_sum,
  floor(avg(doc_count::DOUBLE) OVER w * 10000.0 + 0.5) / 10000.0 AS w_avg,
  floor(coalesce(stddev_pop(doc_count::DOUBLE) OVER w, 0.0)
        * 10000.0 + 0.5) / 10000.0 AS w_std
FROM s
WINDOW w AS (ORDER BY bucket ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY bucket
"""


def _hw_oracle_sql(p: int = 3) -> str:
    """Additive Holt-Winters fold as a DuckDB list_reduce with flat LIST
    state [i, s, b, c_1..c_p] — the same recurrence text (PRE-step state
    only) as facets.moving_fn's holtWinters branch, so the fold is
    bit-identical. alpha=beta=gamma=0.5, window 6."""
    j = f"(CAST(acc[1] AS BIGINT) % {p} + 4)"  # 1-based seasonal slot
    s_new = f"0.5 * (x[1] - acc[{j}]) + 0.5 * (acc[2] + acc[3])"
    b_new = f"0.25 * (x[1] - acc[{j}] - acc[2]) + 0.75 * acc[3]"
    c_new = f"0.5 * (x[1] - ({s_new})) + 0.5 * acc[{j}]"
    zeros = ", ".join(["0.0::DOUBLE"] * p)
    jf = f"(CAST(st[1] AS BIGINT) % {p} + 4)"
    return f"""
WITH s AS (
  SELECT strftime(ts, '%Y-%m-%d') AS bucket, count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
),
f AS (
  SELECT bucket, doc_count,
         list(doc_count::DOUBLE)
           OVER (ORDER BY bucket ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
           AS l
  FROM s
),
r AS (
  SELECT bucket, doc_count,
         list_reduce(
           list_prepend([1.0::DOUBLE, l[1], 0.0::DOUBLE, {zeros}],
                        list_apply(l[2:], v -> [v])),
           (acc, x) -> list_concat(
             [acc[1] + 1.0, {s_new}, {b_new}],
             list_concat(
               list_concat(acc[4:{j} - 1], [{c_new}]),
               acc[{j} + 1:{p + 3}]))
         ) AS st
  FROM f
)
SELECT bucket, doc_count,
       floor((st[2] + st[3] + st[{jf}]) * 10000.0 + 0.5) / 10000.0 AS hw
FROM r ORDER BY bucket
"""


def _moving_fn_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_fn holtWinters (ADDITIVE, zero-init seasonal — the
    documented deviation from ES's padded multiplicative default) over
    the daily-count series, window 6, period 3, alpha=beta=gamma=0.5
    (every fold product dyadic). The oracle replays the identical
    list-state fold (_hw_oracle_sql)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    events = load_sf_table(spark, sf_dir, "events")
    ser = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("bucket")
    ).agg(F.count("*").alias("doc_count"))
    out = OFA.moving_fn(ser, "holtWinters", window=6, period=3)
    return out.select("bucket", "doc_count", _f4("holtWinters").alias("hw"))


def _dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution after near-dup clustering (dedup.resolve_keepers,
    the RedPajama keep-one step): keep the LONGEST doc per cluster
    (priority = -n_chars, doc_id tie-break). One min-struct hash agg on
    rep + one join back."""
    docs = load_sf_table(spark, sf_dir, "documents")
    pairs = OD.ngram_jaccard_pairs(docs, n=1, threshold=0.8)
    clusters = OD.dedup_clusters(docs.select("doc_id"), pairs, max_iter=50)
    meta = docs.select("doc_id", (-F.col("n_chars")).alias("prio"))
    out = OD.resolve_keepers(clusters, meta, priority_col="prio")
    return out.orderBy("doc_id")


_DEDUP_KEEPERS_SQL = f"""
WITH clusters AS ({_DEDUP_CLUSTERS_SQL}),
j AS (
  SELECT c.doc_id, c.rep, -d.n_chars AS prio
  FROM clusters c JOIN documents d USING (doc_id)
),
w AS (
  SELECT rep, doc_id AS keeper,
         row_number() OVER (PARTITION BY rep
                            ORDER BY prio ASC, doc_id ASC) AS rn
  FROM j
)
SELECT j.doc_id, j.rep, w.keeper, j.doc_id = w.keeper AS keep, j.prio
FROM j JOIN w ON j.rep = w.rep AND w.rn = 1
ORDER BY j.doc_id
"""


def _bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under the corpus's own BIGRAM LM with stupid
    backoff (Brants et al. 2007) — the order-1 KenLM proxy upgrading the
    unigram_lm row (textstats.bigram_lm_score: one staged tokenize scan,
    Zipf-bounded count joins, one doc hash agg)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.bigram_lm_score(docs)
    return out.select("doc_id", "n_bigrams", _f4("xent").alias("xent"))


def _bigram_lm_sql() -> str:
    return f"""
SELECT doc_id, n_bigrams,
       floor(xent * 10000.0 + 0.5) / 10000.0 AS xent
FROM ({OT.bigram_lm_sql()})
"""


_TBP_WEIGHTS = {"src0": 6.0, "src1": 1.0, "src2": 1.0}
_TBP_BUDGET, _TBP_EPOCHS = 100_000, 3.0


def _token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-recipe sizing (sampling.token_budget_plan): explicit mixture
    weights over three sources, a 100k-token budget and a 3-epoch
    repetition cap — src0's oversized weight drives it into the cap so
    both arms (capped + uncapped) appear; deficits are reported, never
    silently redistributed."""
    from elasticsearch_assets_spark.operators.sampling import (
        token_budget_plan,
    )
    from elasticsearch_assets_spark.operators.textstats import (
        corpus_accounting,
    )

    docs = load_sf_table(spark, sf_dir, "documents")
    acct = corpus_accounting(docs, ["source"]).withColumnRenamed(
        "total_tokens", "n_tokens"
    )
    out = token_budget_plan(
        acct, _TBP_WEIGHTS, _TBP_BUDGET, max_epochs=_TBP_EPOCHS
    )
    return out.select(
        "source", "n_tokens", _f4("weight").alias("weight"),
        _f4("target_tokens").alias("target"), _f4("rate").alias("rate"),
        _f4("achieved_tokens").alias("achieved"),
        _f4("deficit_tokens").alias("deficit"),
    ).orderBy("source")


def _token_budget_plan_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {w!r}" for s, w in _TBP_WEIGHTS.items()
    )
    names = ", ".join(f"'{s}'" for s in _TBP_WEIGHTS)
    wsum = float(sum(_TBP_WEIGHTS.values()))
    return f"""
WITH acct AS (
  SELECT source, sum(n_tokens)::BIGINT AS n_tokens FROM (
    SELECT doc_id, source FROM documents
  ) d JOIN ({OT.token_stats_sql()}) USING (doc_id)
  GROUP BY source
),
p AS (
  SELECT source, n_tokens,
         (CASE source {cases} END) / {wsum!r} AS w,
         (CASE source {cases} END) / {wsum!r} * {float(_TBP_BUDGET)!r}
           AS target,
         least((CASE source {cases} END) / {wsum!r} * {float(_TBP_BUDGET)!r}
               / n_tokens::DOUBLE, {float(_TBP_EPOCHS)!r}) AS rate
  FROM acct WHERE source IN ({names})
)
SELECT source, n_tokens,
       floor(w * 10000.0 + 0.5) / 10000.0 AS weight,
       floor(target * 10000.0 + 0.5) / 10000.0 AS target,
       floor(rate * 10000.0 + 0.5) / 10000.0 AS rate,
       floor(rate * n_tokens::DOUBLE * 10000.0 + 0.5) / 10000.0 AS achieved,
       floor((target - rate * n_tokens::DOUBLE) * 10000.0 + 0.5) / 10000.0
         AS deficit
FROM p ORDER BY source
"""


# ---------------------------------------------------------------------------
def _esql_scalar_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third ES|QL function battery — string/bytes/hash: REVERSE, REPEAT,
    BIT_LENGTH (passthrough spellings), BYTE_LENGTH (octet_length),
    TO_BASE64/FROM_BASE64 round-trip, MD5, SHA256 (sha2), HASH with a
    literal algorithm. All compile to JVM column expressions."""
    from elasticsearch_assets_spark.query.esql import esql

    return esql(
        "FROM events | WHERE event_id % 17 == 0"
        " | EVAL rv = REVERSE(event_type), rp = REPEAT(event_type, 2),"
        "   bl = BIT_LENGTH(event_type), byl = BYTE_LENGTH(event_type),"
        "   b64 = TO_BASE64(event_type),"
        "   rt = FROM_BASE64(TO_BASE64(event_type)),"
        "   h1 = MD5(event_type), h2 = SHA256(event_type),"
        "   h3 = HASH('md5', props)"
        " | KEEP event_id, rv, rp, bl, byl, b64, rt, h1, h2, h3"
        " | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )


_ESQL_SCALAR_FUNCS3_SQL = """
SELECT event_id,
       reverse(event_type) AS rv,
       repeat(event_type, 2) AS rp,
       bit_length(event_type) AS bl,
       octet_length(event_type::BLOB) AS byl,
       to_base64(event_type::BLOB) AS b64,
       event_type AS rt,
       md5(event_type) AS h1,
       sha256(event_type) AS h2,
       md5(props) AS h3
FROM events WHERE event_id % 17 = 0 ORDER BY event_id
"""


def _esql_scalar_funcs4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth ES|QL function battery — angle conversions and fixed-point
    rounding: TO_DEGREES, TO_RADIANS, COPY_SIGN, SCALB, ROUND_TO (round
    down to nearest of literal points, clamp below the smallest), plus
    the same-spelling passthroughs COALESCE / GREATEST / LEAST. All fold
    to JVM column expressions; ROUND_TO's point array folds at compile
    time."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 23 == 0"
        " | EVAL x = TO_DOUBLE(event_id % 7) - 3.0"
        " | EVAL dg = TO_DEGREES(x), rd = TO_RADIANS(x),"
        "   cs = COPY_SIGN(3.5, x - 0.5), sb = SCALB(x, 3),"
        "   rt = ROUND_TO(value, 0.0, 10.0, 100.0, 500.0),"
        "   co = COALESCE(NULL, event_type, 'zz'),"
        "   gr = GREATEST(event_id % 7, user_id % 5),"
        "   ls = LEAST(event_id % 7, user_id % 5)"
        " | KEEP event_id, dg, rd, cs, sb, rt, co, gr, ls"
        " | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    for c in ["dg", "rd", "cs", "sb", "rt"]:
        out = out.withColumn(c, _f4(c))
    return out


_ESQL_SCALAR_FUNCS4_SQL = """
WITH b AS (
  SELECT event_id, user_id, event_type, value,
         (event_id % 7)::DOUBLE - 3.0 AS x
  FROM events WHERE event_id % 23 = 0
)
SELECT event_id,
       floor(degrees(x) * 1e4 + 0.5) / 1e4 AS dg,
       floor(radians(x) * 1e4 + 0.5) / 1e4 AS rd,
       CASE WHEN x - 0.5 < 0 THEN -3.5 ELSE 3.5 END AS cs,
       floor(x * 8.0 * 1e4 + 0.5) / 1e4 AS sb,
       floor(coalesce(
         list_max(list_filter([0.0, 10.0, 100.0, 500.0]::DOUBLE[],
                              v -> v <= value)),
         0.0) * 1e4 + 0.5) / 1e4 AS rt,
       coalesce(NULL, event_type, 'zz') AS co,
       greatest(event_id % 7, user_id % 5) AS gr,
       least(event_id % 7, user_id % 5) AS ls
FROM b ORDER BY event_id
"""


def _esql_stats_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL STATS aggregate battery 3: PERCENTILE (0-100 scale; exact
    linear interpolation == DuckDB quantile_cont, documented deviation
    from ES's t-digest), MEDIAN, STD_DEV (population), VALUES (distinct
    set, sorted for determinism), COUNT_DISTINCT — one hash-agg pass,
    partial aggregation map-side."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events"
        " | EVAL dec = user_id % 10"
        " | STATS p90 = PERCENTILE(value, 90), md = MEDIAN(value),"
        "   sd = STD_DEV(value), vs = VALUES(dec),"
        "   cd = COUNT_DISTINCT(dec) BY event_type"
        " | EVAL vss = array_join(transform(vs, x -> CAST(x AS STRING)), ',')"
        " | KEEP event_type, p90, md, sd, vss, cd | SORT event_type",
        spark=spark, sf_dir=sf_dir,
    )
    for c in ["p90", "md", "sd"]:
        out = out.withColumn(c, _f4(c))
    return out


_ESQL_STATS_FUNCS2_SQL = """
SELECT event_type,
       floor(quantile_cont(value, 0.90) * 1e4 + 0.5) / 1e4 AS p90,
       floor(quantile_cont(value, 0.50) * 1e4 + 0.5) / 1e4 AS md,
       floor(stddev_pop(value) * 1e4 + 0.5) / 1e4 AS sd,
       array_to_string(list_sort(list(DISTINCT user_id % 10)), ',') AS vss,
       count(DISTINCT user_id % 10) AS cd
FROM events GROUP BY event_type ORDER BY event_type
"""


def _esql_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second ES|QL date battery: DATE_EXTRACT over the calendar parts
    (year/quarter/month/day/hour/minute/dow) — compiles to date_part,
    the same field names both engines share (ES|QL's ChronoField
    spellings map 1:1 for these). dow is Spark's 1-based Sunday=1
    convention; DuckDB's 0-based dow shifts by one in the oracle."""
    from elasticsearch_assets_spark.query.esql import esql

    return esql(
        "FROM events | WHERE event_id % 37 == 0"
        " | EVAL y = DATE_EXTRACT('year', ts), q = DATE_EXTRACT('quarter', ts),"
        "   mo = DATE_EXTRACT('month', ts), d = DATE_EXTRACT('day', ts),"
        "   h = DATE_EXTRACT('hour', ts), mi = DATE_EXTRACT('minute', ts),"
        "   dw = DATE_EXTRACT('dow', ts)"
        " | KEEP event_id, y, q, mo, d, h, mi, dw"
        " | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )


_ESQL_DATE_FUNCS2_SQL = """
SELECT event_id,
       date_part('year', ts) AS y,
       date_part('quarter', ts) AS q,
       date_part('month', ts) AS mo,
       date_part('day', ts) AS d,
       date_part('hour', ts) AS h,
       date_part('minute', ts) AS mi,
       date_part('dow', ts) + 1 AS dw
FROM events WHERE event_id % 37 = 0 ORDER BY event_id
"""


def _esql_scalar_funcs5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth ES|QL function battery — trigonometry, constants, and the
    string-trim family, all same-spelling passthroughs to JVM column
    expressions: SIN/COS/TAN/ASIN/ACOS/ATAN, E/PI/EXP, CEIL/SQRT/POW,
    LEFT/RIGHT/TRIM/LTRIM/RTRIM/SPACE/SUBSTRING/LENGTH. (SHA1 exists on
    the engine via the same passthrough but DuckDB lacks sha1, so it is
    pinned by unit test rather than this oracle.)"""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 29 == 0"
        " | EVAL u = TO_DOUBLE(event_id % 7) / 10.0 - 0.3"
        " | EVAL sn = SIN(u), cn = COS(u), tn = TAN(u),"
        "   asn = ASIN(u), acn = ACOS(u), atn = ATAN(u),"
        "   ex = EXP(u), ee = E(), p = PI(),"
        "   cl = CEIL(value), sq = SQRT(value + 1.0),"
        "   pw = POW(2, event_id % 5),"
        "   lf = LEFT(event_type, 3), rg = RIGHT(event_type, 3),"
        "   tr = TRIM(CONCAT(' ', event_type, ' ')),"
        "   ltr = LTRIM(CONCAT('  ', event_type)),"
        "   rtr = RTRIM(CONCAT(event_type, '  ')),"
        "   sp = CONCAT(SPACE(2), 'x'),"
        "   sb = SUBSTRING(event_type, 2, 3), ln = LENGTH(event_type)"
        " | KEEP event_id, sn, cn, tn, asn, acn, atn, ex, ee, p, cl, sq,"
        "   pw, lf, rg, tr, ltr, rtr, sp, sb, ln"
        " | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    for c in ["sn", "cn", "tn", "asn", "acn", "atn", "ex", "ee", "p", "sq", "pw"]:
        out = out.withColumn(c, _f4(c))
    return out.withColumn("cl", F.col("cl").cast("long"))


_ESQL_SCALAR_FUNCS5_SQL = """
WITH b AS (
  SELECT event_id, event_type, value,
         (event_id % 7)::DOUBLE / 10.0 - 0.3 AS u
  FROM events WHERE event_id % 29 = 0
)
SELECT event_id,
       floor(sin(u) * 1e4 + 0.5) / 1e4 AS sn,
       floor(cos(u) * 1e4 + 0.5) / 1e4 AS cn,
       floor(tan(u) * 1e4 + 0.5) / 1e4 AS tn,
       floor(asin(u) * 1e4 + 0.5) / 1e4 AS asn,
       floor(acos(u) * 1e4 + 0.5) / 1e4 AS acn,
       floor(atan(u) * 1e4 + 0.5) / 1e4 AS atn,
       floor(exp(u) * 1e4 + 0.5) / 1e4 AS ex,
       floor(exp(1) * 1e4 + 0.5) / 1e4 AS ee,
       floor(pi() * 1e4 + 0.5) / 1e4 AS p,
       ceil(value)::BIGINT AS cl,
       floor(sqrt(value + 1.0) * 1e4 + 0.5) / 1e4 AS sq,
       floor(pow(2, event_id % 5) * 1e4 + 0.5) / 1e4 AS pw,
       left(event_type, 3) AS lf,
       right(event_type, 3) AS rg,
       trim(' ' || event_type || ' ') AS tr,
       ltrim('  ' || event_type) AS ltr,
       rtrim(event_type || '  ') AS rtr,
       repeat(' ', 2) || 'x' AS sp,
       substring(event_type, 2, 3) AS sb,
       length(event_type)::BIGINT AS ln
FROM b ORDER BY event_id
"""


def _esql_convert_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL type-conversion battery: TO_IP (dotted-quad validation,
    null on malformed — octets > 255 here), TO_VERSION (the version
    field's sort key: zero-padded numerics, prerelease before release),
    TO_DATETIME (epoch millis, tz-free timestampadd form). The SORT runs
    on the version key — the observable ES `sort on a version field`
    order."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 31 == 0"
        " | EVAL oct1 = TO_STRING(event_id % 300),"
        "   ips = CONCAT(oct1, '.', TO_STRING(user_id % 256), '.0.',"
        "         TO_STRING(event_id % 256)),"
        "   ver = CONCAT(TO_STRING(event_id % 3), '.',"
        "         TO_STRING(user_id % 12), '.', TO_STRING(event_id % 5),"
        "         CASE WHEN event_id % 7 == 0 THEN '-beta' ELSE '' END)"
        " | EVAL ip = TO_IP(ips), vk = TO_VERSION(ver),"
        "   dt = DATE_FORMAT('yyyy-MM-dd HH:mm:ss',"
        "        TO_DATETIME(event_id * 86400123))"
        " | KEEP event_id, ip, ver, vk, dt"
        " | SORT vk, event_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out


_ESQL_CONVERT_FUNCS_SQL = r"""
WITH b AS (
  SELECT event_id,
         (event_id % 300)::VARCHAR || '.' || (user_id % 256)::VARCHAR
           || '.0.' || (event_id % 256)::VARCHAR AS ips,
         (event_id % 3)::VARCHAR || '.' || (user_id % 12)::VARCHAR
           || '.' || (event_id % 5)::VARCHAR
           || CASE WHEN event_id % 7 = 0 THEN '-beta' ELSE '' END AS ver
  FROM events WHERE event_id % 31 = 0
),
k AS (
  SELECT event_id, ips, ver,
         CASE WHEN regexp_matches(ips,
           '^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$')
           THEN ips ELSE NULL END AS ip,
         lpad(coalesce(nullif(regexp_extract(ver, '^([0-9]+)', 1), ''), '0'), 10, '0')
           || '.' ||
         lpad(coalesce(nullif(regexp_extract(ver, '^[0-9]+\.([0-9]+)', 1), ''), '0'), 10, '0')
           || '.' ||
         lpad(coalesce(nullif(regexp_extract(ver, '^[0-9]+\.[0-9]+\.([0-9]+)', 1), ''), '0'), 10, '0')
           || CASE WHEN ver LIKE '%-%'
                THEN '-' || regexp_extract(ver, '-(.*)$', 1) ELSE '~' END AS vk,
         strftime(TIMESTAMP '1970-01-01 00:00:00'
                  + to_milliseconds(event_id * 86400123),
                  '%Y-%m-%d %H:%M:%S') AS dt
  FROM b
)
SELECT event_id, ip, ver, vk, dt FROM k ORDER BY vk, event_id
"""


def _esql_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL math battery over a small deterministic integer-derived
    domain (x in [-3, 3] so EXP/SINH stay in range): CBRT, EXP, SIGNUM,
    ATAN2, SINH, COSH, TANH, HYPOT, 2-arg LOG (base spelling matches
    Spark), LOG10, E(), PI() — all passthrough Spark spellings; the
    oracle rebuilds the missing DuckDB ones (sinh/cosh/tanh/hypot/E)
    from exp/sqrt."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 23 == 0"
        " | EVAL x = TO_DOUBLE(event_id % 7) - 3.0,"
        "   cb = CBRT(ABS(x) + 1.0), ex = EXP(x), sg = SIGNUM(x),"
        "   at = ATAN2(x, 2.0), sh = SINH(x), ch = COSH(x), th = TANH(x),"
        "   hy = HYPOT(x, 3.0), lg = LOG(2.0, ABS(x) + 1.0),"
        "   l10 = LOG10(ABS(x) + 1.0), ee = E(), p = PI()"
        " | KEEP event_id, x, cb, ex, sg, at, sh, ch, th, hy, lg, l10, ee, p"
        " | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    for c in ["cb", "ex", "at", "sh", "ch", "th", "hy", "lg", "l10", "ee", "p"]:
        out = out.withColumn(c, _f4(c))
    return out


_ESQL_MATH_FUNCS_SQL = """
WITH b AS (
  SELECT event_id, (event_id % 7)::DOUBLE - 3.0 AS x
  FROM events WHERE event_id % 23 = 0
)
SELECT event_id, x,
       floor(cbrt(abs(x) + 1.0) * 1e4 + 0.5) / 1e4 AS cb,
       floor(exp(x) * 1e4 + 0.5) / 1e4 AS ex,
       sign(x)::DOUBLE AS sg,
       floor(atan2(x, 2.0) * 1e4 + 0.5) / 1e4 AS at,
       floor((exp(x) - exp(-x)) / 2 * 1e4 + 0.5) / 1e4 AS sh,
       floor((exp(x) + exp(-x)) / 2 * 1e4 + 0.5) / 1e4 AS ch,
       floor((exp(x) - exp(-x)) / (exp(x) + exp(-x)) * 1e4 + 0.5) / 1e4 AS th,
       floor(sqrt(x * x + 9.0) * 1e4 + 0.5) / 1e4 AS hy,
       floor(ln(abs(x) + 1.0) / ln(2.0) * 1e4 + 0.5) / 1e4 AS lg,
       floor(log10(abs(x) + 1.0) * 1e4 + 0.5) / 1e4 AS l10,
       floor(exp(1.0) * 1e4 + 0.5) / 1e4 AS ee,
       floor(pi() * 1e4 + 0.5) / 1e4 AS p
FROM b ORDER BY event_id
"""


def _esql_mv_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL multivalue battery 2 over constructed 3-element arrays:
    MV_SLICE (0-based inclusive ES semantics incl. negative indices),
    MV_APPEND, MV_ZIP (custom delimiter), MV_PERCENTILE (linear
    interpolation), MV_PSERIES_WEIGHTED_SUM (1-based p-series weights,
    array order), IP_PREFIX (literal mask, folds to an integer AND)."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 29 == 0"
        " | EVAL a = array(value, value * 2, value * 3),"
        "   ip = CONCAT('10.', TO_STRING(event_id % 200), '.',"
        "        TO_STRING(user_id % 250), '.', TO_STRING(event_id % 251))"
        " | EVAL sl = MV_SLICE(a, 1, 2), sneg = MV_SLICE(a, -2, -1),"
        "   ap = MV_COUNT(MV_APPEND(a, a)),"
        "   z = MV_ZIP(array(event_type, 'x'), array('y', event_type), '-'),"
        "   pct = MV_PERCENTILE(a, 50), p25 = MV_PERCENTILE(a, 25),"
        "   ps = MV_PSERIES_WEIGHTED_SUM(a, 1.5),"
        "   ipp = IP_PREFIX(ip, 12, 0)"
        " | EVAL sl1 = MV_FIRST(sl), sn1 = MV_FIRST(sneg)"
        " | KEEP event_id, sl1, sn1, ap, z, pct, p25, ps, ipp"
        " | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    for c in ["sl1", "sn1", "pct", "p25", "ps"]:
        out = out.withColumn(c, _f4(c))
    return out.withColumn("z", F.array_join("z", "|"))


_ESQL_MV_FUNCS2_SQL = """
WITH b AS (
  SELECT event_id, event_type,
         [value, value * 2, value * 3] AS a,
         '10.' || (event_id % 200)::VARCHAR || '.'
              || (user_id % 250)::VARCHAR || '.'
              || (event_id % 251)::VARCHAR AS ip
  FROM events WHERE event_id % 29 = 0
),
m AS (
  SELECT event_id, event_type, a, ip,
         list_sort(a) AS s,
         (string_split(ip, '.')[1]::BIGINT * 16777216
          + string_split(ip, '.')[2]::BIGINT * 65536
          + string_split(ip, '.')[3]::BIGINT * 256
          + string_split(ip, '.')[4]::BIGINT) & 4293918720 AS masked
  FROM b
)
SELECT event_id,
       floor(a[2] * 1e4 + 0.5) / 1e4 AS sl1,
       floor(a[2] * 1e4 + 0.5) / 1e4 AS sn1,
       6 AS ap,
       event_type || '-y|x-' || event_type AS z,
       floor(s[2] * 1e4 + 0.5) / 1e4 AS pct,
       floor((s[1] + 0.5 * (s[2] - s[1])) * 1e4 + 0.5) / 1e4 AS p25,
       floor((a[1] / pow(1, 1.5) + a[2] / pow(2, 1.5) + a[3] / pow(3, 1.5))
             * 1e4 + 0.5) / 1e4 AS ps,
       (masked // 16777216)::VARCHAR || '.'
         || (masked // 65536 % 256)::VARCHAR || '.'
         || (masked // 256 % 256)::VARCHAR || '.'
         || (masked % 256)::VARCHAR AS ipp
FROM m ORDER BY event_id
"""


_SPAT_LAT = "(event_id % 160)::DOUBLE - 80.0 + 0.5"
_SPAT_LON = "((event_id * 7) % 360)::DOUBLE - 180.0 + 0.5"


def _esql_spatial_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL spatial relations over POINT/BBOX WKT: ST_INTERSECTS /
    ST_DISJOINT / ST_WITHIN (point vs envelope) and ST_CONTAINS
    (per-event envelope vs a query envelope) — closed-interval algebra
    per axis, all folding to JVM boolean expressions."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 37 == 0"
        " | EVAL lat = TO_DOUBLE(event_id % 160) - 80.0 + 0.5,"
        "   lon = TO_DOUBLE(event_id * 7 % 360) - 180.0 + 0.5"
        " | EVAL p = TO_GEOPOINT(CONCAT('POINT (', TO_STRING(lon), ' ',"
        "   TO_STRING(lat), ')')),"
        "   box = TO_GEOSHAPE(CONCAT('BBOX (', TO_STRING(lon - 5.0), ', ',"
        "   TO_STRING(lon + 5.0), ', ', TO_STRING(lat + 5.0), ', ',"
        "   TO_STRING(lat - 5.0), ')'))"
        " | EVAL q = TO_GEOSHAPE('BBOX (-60.0, 60.0, 40.0, -40.0)')"
        " | EVAL i = ST_INTERSECTS(p, q), dj = ST_DISJOINT(p, q),"
        "   w = ST_WITHIN(p, q), c = ST_CONTAINS(q, p),"
        "   bi = ST_INTERSECTS(box, q), bw = ST_WITHIN(box, q)"
        " | KEEP event_id, i, dj, w, c, bi, bw | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out


_ESQL_SPATIAL_REL_SQL = """
WITH b AS (
  SELECT event_id,
         (event_id % 160)::DOUBLE - 80.0 + 0.5 AS lat,
         (event_id * 7 % 360)::DOUBLE - 180.0 + 0.5 AS lon
  FROM events WHERE event_id % 37 = 0
)
SELECT event_id,
       (lon >= -60.0 AND lon <= 60.0 AND lat >= -40.0 AND lat <= 40.0) AS i,
       NOT (lon >= -60.0 AND lon <= 60.0 AND lat >= -40.0 AND lat <= 40.0) AS dj,
       (lon >= -60.0 AND lon <= 60.0 AND lat >= -40.0 AND lat <= 40.0) AS w,
       (lon >= -60.0 AND lon <= 60.0 AND lat >= -40.0 AND lat <= 40.0) AS c,
       (NOT (lon + 5.0 < -60.0 OR lon - 5.0 > 60.0
             OR lat + 5.0 < -40.0 OR lat - 5.0 > 40.0)) AS bi,
       (lon - 5.0 >= -60.0 AND lon + 5.0 <= 60.0
        AND lat - 5.0 >= -40.0 AND lat + 5.0 <= 40.0) AS bw
FROM b ORDER BY event_id
"""


def _esql_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL spatial scalars over WKT geo_points: TO_GEOPOINT, ST_X/ST_Y
    (substring/split parse, no regex), ST_DISTANCE (haversine meters via
    the shared portable SQL text st_distance_sql — bit parity by
    construction), ST_GEOHASH (reuses operators/facets.geohash_sql, the
    proven shared text)."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 19 == 0"
        " | EVAL lat = TO_DOUBLE(event_id % 160) - 80.0 + 0.5,"
        "   lon = TO_DOUBLE(event_id * 7 % 360) - 180.0 + 0.5"
        " | EVAL p = TO_GEOPOINT(CONCAT('POINT (', TO_STRING(lon), ' ',"
        "   TO_STRING(lat), ')'))"
        " | EVAL gx = ST_X(p), gy = ST_Y(p),"
        "   d = ST_DISTANCE(p, TO_GEOPOINT('POINT (10.0 20.0)')),"
        "   gh = ST_GEOHASH(p, 5)"
        " | KEEP event_id, gx, gy, d, gh | SORT event_id",
        spark=spark, sf_dir=sf_dir,
    )
    return out.withColumn("d", _f4("d"))


def _esql_spatial_sql() -> str:
    from elasticsearch_assets_spark.operators.facets import geohash_sql
    from elasticsearch_assets_spark.query.esql import st_distance_sql

    d = st_distance_sql("lon", "lat", "10.0", "20.0")
    gh = geohash_sql("lat", "lon", 5)
    return f"""
WITH b AS (
  SELECT event_id, {_SPAT_LAT} AS lat, {_SPAT_LON} AS lon
  FROM events WHERE event_id % 19 = 0
)
SELECT event_id, lon AS gx, lat AS gy,
       floor({d} * 1e4 + 0.5) / 1e4 AS d,
       {gh} AS gh
FROM b ORDER BY event_id
"""


def _esql_spatial_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL spatial aggregates: ST_CENTROID_AGG / ST_EXTENT_AGG per
    event_type, unpacked back to numbers with ST_X/ST_Y and the BBOX
    accessors (ST_XMIN/XMAX/YMAX/YMIN). The WKT round-trip through the
    aggregate string is exact (shortest-repr double formatting)."""
    from elasticsearch_assets_spark.query.esql import esql

    out = esql(
        "FROM events | WHERE event_id % 11 == 0"
        " | EVAL lat = TO_DOUBLE(event_id % 160) - 80.0 + 0.5,"
        "   lon = TO_DOUBLE(event_id * 7 % 360) - 180.0 + 0.5"
        " | EVAL p = CONCAT('POINT (', TO_STRING(lon), ' ', TO_STRING(lat), ')')"
        " | STATS c = ST_CENTROID_AGG(p), e = ST_EXTENT_AGG(p) BY event_type"
        " | EVAL cx = ST_X(c), cy = ST_Y(c), xmin = ST_XMIN(e),"
        "   xmax = ST_XMAX(e), ymax = ST_YMAX(e), ymin = ST_YMIN(e)"
        " | KEEP event_type, cx, cy, xmin, xmax, ymax, ymin"
        " | SORT event_type",
        spark=spark, sf_dir=sf_dir,
    )
    return out.withColumn("cx", _f4("cx")).withColumn("cy", _f4("cy"))


_ESQL_SPATIAL_AGG_SQL = f"""
WITH b AS (
  SELECT event_id, event_type, {_SPAT_LAT} AS lat, {_SPAT_LON} AS lon
  FROM events WHERE event_id % 11 = 0
)
SELECT event_type,
       floor(avg(lon) * 1e4 + 0.5) / 1e4 AS cx,
       floor(avg(lat) * 1e4 + 0.5) / 1e4 AS cy,
       min(lon) AS xmin, max(lon) AS xmax,
       max(lat) AS ymax, min(lat) AS ymin
FROM b GROUP BY event_type ORDER BY event_type
"""


# rich URL for uri_parts: userinfo + multi-label host + PSL suffix + port
# + extension + query + fragment, all doc_id-derived so the oracle
# recomputes every part from the CONSTRUCTION, not by re-parsing
_UP_URL_SQL = (
    "'https://u' || (doc_id % 5) || '@www.site' || (doc_id % 50)"
    " || '.co.uk:' || (8080 + doc_id % 3) || '/a/b/file' || (doc_id % 7)"
    " || '.html?x=' || (doc_id % 11) || '&y=2#s' || (doc_id % 4)"
)


def _ingest_uri_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES uri_parts + registered_domain processors: URL decomposition via
    the JVM parse_url kernel (scheme/domain/port/path/query/fragment/
    user_info/extension), then PSL longest-suffix-match splitting the
    host into top_level_domain / registered_domain / subdomain
    (sinks/ingest.py; embedded deterministic PSL subset)."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    docs = (
        load_sf_table(spark, sf_dir, "documents")
        .where("doc_id % 13 = 0")
        .withColumn("url", F.expr(_UP_URL_SQL))
    )
    out = run_pipeline(docs, [
        {"uri_parts": {"field": "url"}},
        {"registered_domain": {"field": "url_domain"}},
    ], on_failure="fail")
    return out.select(
        "doc_id", "url_scheme", "url_domain", "url_port", "url_path",
        "url_query", "url_fragment", "url_user_info", "url_extension",
        "url_top_level_domain", "url_registered_domain", "url_subdomain",
    ).orderBy("doc_id")


_INGEST_URI_PARTS_SQL = """
SELECT doc_id,
       'https' AS url_scheme,
       'www.site' || (doc_id % 50) || '.co.uk' AS url_domain,
       (8080 + doc_id % 3)::INT AS url_port,
       '/a/b/file' || (doc_id % 7) || '.html' AS url_path,
       'x=' || (doc_id % 11) || '&y=2' AS url_query,
       's' || (doc_id % 4) AS url_fragment,
       'u' || (doc_id % 5) AS url_user_info,
       'html' AS url_extension,
       'co.uk' AS url_top_level_domain,
       'site' || (doc_id % 50) || '.co.uk' AS url_registered_domain,
       'www' AS url_subdomain
FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id
"""


def _ingest_kv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES kv + json processors: str_to_map pair splitting with
    include_keys flattening, and schema-declared JSON parsing (schema is
    REQUIRED — inference would be a second full pass at 100 TB)."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    ev = (
        load_sf_table(spark, sf_dir, "events")
        .where("event_id % 7 = 0")
        .withColumn("qs", F.expr(
            "'a=' || (event_id % 7) || ';b=' || event_type"
            " || ';c=' || (user_id % 5)"
        ))
    )
    out = run_pipeline(ev, [
        {"json": {"field": "props", "schema": "k INT",
                  "target_field": "props_o"}},
        {"kv": {"field": "qs", "field_split": ";", "value_split": "=",
                "include_keys": ["a", "c"], "prefix": "kv_"}},
    ], on_failure="fail")
    return out.select(
        "event_id", F.col("props_o.k").alias("pk"), "kv_a", "kv_c"
    ).orderBy("event_id")


_INGEST_KV_JSON_SQL = """
SELECT event_id,
       (props::JSON ->> 'k')::INT AS pk,
       (event_id % 7)::VARCHAR AS kv_a,
       (user_id % 5)::VARCHAR AS kv_c
FROM events WHERE event_id % 7 = 0 ORDER BY event_id
"""


def _ingest_net_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES network_direction (CIDR membership via the ES|QL block compiler
    — masks fold to integer ranges) + date_index_name (resolved
    prefix + truncated-date name, the processor form of the
    time-series index selector)."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    ev = (
        load_sf_table(spark, sf_dir, "events")
        .where("event_id % 11 = 0")
        .withColumn("src_ip", F.expr(
            "CASE WHEN event_id % 4 < 2 THEN"
            " '10.1.' || (event_id % 200) || '.' || (user_id % 250)"
            " ELSE '172.32.' || (event_id % 200) || '.' || (user_id % 250)"
            " END"
        ))
        .withColumn("dst_ip", F.expr(
            "CASE WHEN event_id % 3 = 0 THEN"
            " '192.168.' || (event_id % 250) || '.9'"
            " ELSE '8.8.' || (event_id % 250) || '.9' END"
        ))
    )
    out = run_pipeline(ev, [
        {"network_direction": {
            "source_ip": "src_ip", "destination_ip": "dst_ip",
            "internal_networks": ["10.0.0.0/8", "192.168.0.0/16"],
        }},
        {"date_index_name": {
            "field": "ts", "date_rounding": "M",
            "index_name_prefix": "ev-", "index_name_format": "yyyy-MM",
        }},
    ], on_failure="fail")
    return out.select(
        "event_id", "network_direction", F.col("_index").alias("idx")
    ).orderBy("event_id")


_INGEST_NET_DIR_SQL = """
SELECT event_id,
       CASE WHEN event_id % 4 < 2 AND event_id % 3 = 0 THEN 'internal'
            WHEN event_id % 4 < 2 THEN 'outbound'
            WHEN event_id % 3 = 0 THEN 'inbound'
            ELSE 'external' END AS network_direction,
       'ev-' || strftime(date_trunc('month', ts), '%Y-%m') AS idx
FROM events WHERE event_id % 11 = 0 ORDER BY event_id
"""


def _ingest_bytes_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bytes (unit suffix -> long, ES floor semantics) + html_strip
    (tag removal + common entities) + csv (no-quote split path, trim) +
    append (array promote + order-stable dedup) processors."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    ev = (
        load_sf_table(spark, sf_dir, "events")
        .where("event_id % 17 = 0")
        .withColumn("sz", F.expr(
            "CASE event_id % 4 WHEN 0 THEN '512b' WHEN 1 THEN '2kb'"
            " WHEN 2 THEN '1.5MB' ELSE '3 gb' END"
        ))
        .withColumn("html", F.expr(
            "'<p>Hello &amp; <b>' || event_type || '</b></p><br/>'"
        ))
        .withColumn("line", F.expr(
            "event_id || ', ' || event_type || ' ,x'"
        ))
    )
    out = run_pipeline(ev, [
        {"bytes": {"field": "sz", "target_field": "sz_b"}},
        {"html_strip": {"field": "html", "target_field": "text_plain"}},
        {"csv": {"field": "line", "target_fields": ["c1", "c2", "c3"],
                 "trim": True}},
        {"append": {"field": "tags", "value": ["a", "b", "a"],
                    "allow_duplicates": False}},
    ], on_failure="fail")
    return out.select(
        "event_id", "sz_b", "text_plain", "c1", "c2", "c3",
        F.array_join("tags", "|").alias("tags"),
    ).orderBy("event_id")


_INGEST_BYTES_HTML_SQL = """
SELECT event_id,
       CASE event_id % 4 WHEN 0 THEN 512 WHEN 1 THEN 2048
            WHEN 2 THEN 1572864 ELSE 3221225472 END::BIGINT AS sz_b,
       'Hello & ' || event_type AS text_plain,
       event_id::VARCHAR AS c1, event_type AS c2, 'x' AS c3,
       'a|b' AS tags
FROM events WHERE event_id % 17 = 0 ORDER BY event_id
"""


_UA_CASES = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
     " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
     ("Chrome", "120.0.0.0", "Windows", "Desktop")),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15"
     " (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
     ("Safari", "17.1", "macOS", "Desktop")),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101"
     " Firefox/119.0",
     ("Firefox", "119.0", "Linux", "Desktop")),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36"
     " (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
     ("Chrome", "120.0.6099.43", "Android", "Mobile")),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
     " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
     " Edg/120.0.2210.91",
     ("Edge", "120.0.2210.91", "Windows", "Desktop")),
]


def _ingest_user_agent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES user_agent processor: browser family/version, OS, device class
    via deterministic regexp CASE chains over the major families (the
    uap-core regex db is a declared out-of-scope subset, like the PSL).
    The oracle maps each constructed UA back to its expected parse."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    ua_case = "CASE event_id % 5 " + " ".join(
        f"WHEN {i} THEN '{s}'" for i, (s, _) in enumerate(_UA_CASES)
    ) + " END"
    ev = (
        load_sf_table(spark, sf_dir, "events")
        .where("event_id % 19 = 0")
        .withColumn("ua", F.expr(ua_case))
    )
    out = run_pipeline(
        ev, [{"user_agent": {"field": "ua"}}], on_failure="fail"
    )
    return out.select(
        "event_id", "user_agent_name", "user_agent_version",
        "user_agent_os", "user_agent_device",
    ).orderBy("event_id")


def _ingest_user_agent_sql() -> str:
    def case(idx: int) -> str:
        return "CASE event_id % 5 " + " ".join(
            f"WHEN {i} THEN '{exp[idx]}'"
            for i, (_, exp) in enumerate(_UA_CASES)
        ) + " END"

    return f"""
SELECT event_id,
       {case(0)} AS user_agent_name,
       {case(1)} AS user_agent_version,
       {case(2)} AS user_agent_os,
       {case(3)} AS user_agent_device
FROM events WHERE event_id % 19 = 0 ORDER BY event_id
"""


def _delete_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _delete_by_query: tombstone every live doc matching a query
    (query/engine.py delete_by_query — matched ids through the tombstone
    writer, stats untouched until compaction), then a follow-up search
    excludes them under GLOBAL stats. Output carries the deleted count
    alongside the post-delete ranking. The scratch index copy is rebuilt
    every call so the count is the first-delete count (the API is
    idempotent — second identical call deletes 0, unit-tested in
    tests/test_round3d_ops.py)."""
    import shutil

    base = _docs_index(spark, sf_dir)
    dbq_dir = _idx_dir(sf_dir, "_documents_dbq")
    shutil.rmtree(dbq_dir, ignore_errors=True)
    shutil.copytree(base.index_dir, dbq_dir)
    idx = InvertedIndex(spark, dbq_dir)
    n = idx.delete_by_query(["vector"], mode="or")
    res = idx.search(["scan", "filter"], k=None, mode="or")
    return res.select(
        "doc_id", F.round("score", 4).alias("score"),
        F.lit(n).cast("bigint").alias("deleted"),
    )


_DELETE_BY_QUERY_SQL = f"""
WITH {_bm25_body("term IN ('filter', 'scan')")},
del AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'vector')
SELECT doc_id, round(s, 4) AS score,
       (SELECT count(*) FROM del)::BIGINT AS deleted
FROM scored WHERE doc_id NOT IN (SELECT doc_id FROM del)
"""


def _bm25_span_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_within: an occurrence of term(join) inside an ordered
    near(spark, table, slop 7) span (query/engine.py search_span_within;
    doc set equals span_containing over the same pair, emitted spans
    differ — kernel contract in query/phrase.py)."""
    idx = _docs_index_pos(spark, sf_dir)
    out = idx.search_span_within(
        ("term", "join"), ("near", "spark", "table", 7, True), k=None
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


_BM25_SPAN_WITHIN_SQL = f"""
WITH {_PTOKS_ONLY_CTE},
{_bm25_body("term IN ('join', 'spark', 'table')")},
m AS (
  SELECT DISTINCT a.doc_id FROM ptoks a
  JOIN ptoks b ON a.doc_id = b.doc_id
  JOIN ptoks c ON c.doc_id = a.doc_id
  WHERE a.term = 'spark' AND b.term = 'table' AND c.term = 'join'
    AND b.pos > a.pos AND b.pos - a.pos <= 7
    AND c.pos >= a.pos AND c.pos <= b.pos
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id IN (SELECT doc_id FROM m)
"""


_NAMED_CLAUSES = {
    "big_joins": ["big", "join"],
    "fast_scan": ["fast", "scan"],
    "spark": ["spark"],
}


def _named_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES named queries (`_name` on bool clauses → per-hit
    matched_queries): OR-BM25 over the union of clause terms; each hit
    lists the names of clauses whose terms all match
    (query/engine.py search_named — one pruned AND lookup per clause,
    left-joined distributed; concat_ws('|') flattens the array with
    identical NULL-skip semantics in both engines)."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_named(_NAMED_CLAUSES, k=None)
    return res.select(
        "doc_id", F.round("score", 4).alias("score"), "matched_queries"
    )


def _named_queries_sql() -> str:
    all_terms = sorted({t for ts in _NAMED_CLAUSES.values() for t in ts})
    tlist = ", ".join(f"'{t}'" for t in all_terms)
    clauses, cases = [], []
    for i, name in enumerate(sorted(_NAMED_CLAUSES)):
        terms = sorted(set(_NAMED_CLAUSES[name]))
        cl = ", ".join(f"'{t}'" for t in terms)
        clauses.append(
            f"c{i} AS (SELECT doc_id FROM tf WHERE term IN ({cl})"
            f" GROUP BY doc_id HAVING count(DISTINCT term) = {len(terms)})"
        )
        cases.append(
            f"CASE WHEN doc_id IN (SELECT doc_id FROM c{i})"
            f" THEN '{name}' END"
        )
    return f"""
WITH {_bm25_body(f"term IN ({tlist})")},
{", ".join(clauses)}
SELECT doc_id, round(s, 4) AS score,
       concat_ws('|', {", ".join(cases)}) AS matched_queries
FROM scored
"""


_GEO_GRID_CELLS = ["2s", "u5"]


def _geo_grid_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_grid query (geohash form): filter events to two
    precision-2 geohash cells (operators/geo.py geo_grid_filter — the
    cell expression is the SAME SQL text as the geohash_grid agg and
    ST_GEOHASH, so query/agg cell assignment is bit-identical; at scale
    the persisted cell column makes this partition pruning)."""
    from elasticsearch_assets_spark.operators.geo import geo_grid_filter

    ev = _geo_events(spark, sf_dir)
    out = geo_grid_filter(ev, "lat", "lon", 2, _GEO_GRID_CELLS)
    return out.select("event_id", "lat", "lon").orderBy("event_id")


def _geo_grid_query_sql() -> str:
    from elasticsearch_assets_spark.operators.facets import geohash_sql

    cell = geohash_sql("lat", "lon", 2)
    in_list = ", ".join(f"'{c}'" for c in _GEO_GRID_CELLS)
    return f"""
WITH g AS (
  SELECT event_id, ({_LAT_SQL})::DOUBLE AS lat, ({_LON_SQL})::DOUBLE AS lon
  FROM events
)
SELECT event_id, lat, lon FROM g
WHERE ({cell}) IN ({in_list}) ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# round 3 session 9: post_filter / track_total_hits / zero_terms / fields API,
# multi-kNN, EQL head pipe, paragraph dedup, ICT pairs, vocab coverage
# ---------------------------------------------------------------------------


def _bm25_post_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES post_filter (the faceted-navigation contract): aggregations see
    EVERY query match — `total_before_filter` is the unfiltered match
    count the agg side computed — while the hit list is additionally
    restricted to doc_id % 5 == 1 AFTER scoring. One scored scan feeds
    both; the total rides back as a 1-row broadcast (engine
    .search_post_filter)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    post = docs.where(F.col("doc_id") % 5 == 1)
    out = idx.search_post_filter(["spark", "table"], post, k=10, mode="or")
    return out.select(
        "doc_id", F.round("score", 4).alias("score"), "total_before_filter"
    )


def _bm25_post_filter_sql() -> str:
    body = _bm25_body("term IN ('spark', 'table')")
    return f"""
WITH {body},
tot AS (SELECT count(*)::BIGINT AS total_before_filter FROM scored)
SELECT doc_id, round(s, 4) AS score, total_before_filter
FROM scored, tot
WHERE doc_id % 5 = 1 ORDER BY s DESC, doc_id ASC LIMIT 10
"""


def _bm25_tracked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES track_total_hits: hits carry the match total counted only up to
    the cap (100 here; the query matches more, so the arm fires) and
    relation 'gte' — the stop-counting-at-10k contract; the engine's
    early stop is a limit(cap+1) CollectLimit over the match-id stream
    (engine.search_tracked)."""
    idx = _docs_index(spark, sf_dir)
    out = idx.search_tracked(
        ["spark", "table"], k=10, mode="or", track_total_hits=100
    )
    return out.select(
        "doc_id", F.round("score", 4).alias("score"), "total_hits", "relation"
    )


def _bm25_tracked_sql() -> str:
    body = _bm25_body("term IN ('spark', 'table')")
    return f"""
WITH {body},
tot AS (SELECT count(*) AS c FROM scored)
SELECT doc_id, round(s, 4) AS score,
       least(c, 100)::BIGINT AS total_hits,
       CASE WHEN c > 100 THEN 'gte' ELSE 'eq' END AS relation
FROM scored, tot ORDER BY s DESC, doc_id ASC LIMIT 10
"""


def _match_zero_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match with zero_terms_query='all': a query the analyzer reduces
    to ZERO tokens (punctuation only) degrades to match_all — every live
    doc scores a constant 1.0, deterministic doc_id tie-break
    (engine.search_match / match_all)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    out = idx.search_match(
        "??? !!!", k=15, mode="or", zero_terms_query="all", corpus=docs
    )
    return out.select("doc_id", "score")


_MATCH_ZERO_ALL_SQL = """
SELECT doc_id, (1.0)::DOUBLE AS score FROM documents
ORDER BY doc_id ASC LIMIT 15
"""


def _fields_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES fields API: requested stored fields projected onto the hit
    list — plain names, `n_*` wildcard expansion, and a formatted date
    field ({'field': 'crawl_date', 'format': 'yyyy/MM/dd'} — formatted
    values serialize as STRINGS, the fields-API contract). The derived
    crawl_date (epoch + doc_id % 1000 days) runs verbatim in the oracle
    (engine.fetch_fields)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    stored = docs.withColumn(
        "crawl_date",
        F.date_add(
            F.to_date(F.lit("2020-01-01")), (F.col("doc_id") % 1000).cast("int")
        ),
    )
    hits = idx.search(["spark", "join"], k=10, mode="and")
    out = idx.fetch_fields(
        hits, stored,
        ["lang", "n_*", {"field": "crawl_date", "format": "yyyy/MM/dd"}],
    )
    return out.select(
        "doc_id", F.round("score", 4).alias("score"),
        "lang", "n_chars", "crawl_date",
    ).orderBy("doc_id")


def _fields_fetch_sql() -> str:
    body = _bm25_body(
        "term IN ('join', 'spark')", "HAVING count(*) = 2"
    )
    return f"""
WITH {body},
top AS (
  SELECT doc_id, round(s, 4) AS score FROM scored
  ORDER BY s DESC, doc_id ASC LIMIT 10
)
SELECT t.doc_id, t.score, d.lang, d.n_chars,
       strftime(DATE '2020-01-01' + (d.doc_id % 1000)::INT, '%Y/%m/%d')
         AS crawl_date
FROM top t JOIN documents d USING (doc_id) ORDER BY t.doc_id
"""


def _ann_multi_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple knn clauses in one search (ES 8.7): two exact cosine
    retrievals (k=20 each, boosts 1.0 / 0.5) whose boosted similarities
    SUM per doc before the global top-10 cut — union + one hash agg
    (similarity.multi_knn)."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    q0 = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    q1 = [float(x) for x in emb.where(F.col("vec_id") == 1).head()["embedding"]]
    out = OS.multi_knn(
        emb,
        [
            {"query_vec": q0, "k": 20, "boost": 1.0},
            {"query_vec": q1, "k": 20, "boost": 0.5},
        ],
        k=10,
    )
    return out.select("vec_id", _f4("score").alias("score"))


def _ann_multi_knn_sql() -> str:
    return f"""
WITH qa AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
qb AS (SELECT embedding FROM embeddings WHERE vec_id = 1),
ta AS (
  SELECT vec_id, s FROM (
    SELECT a.vec_id AS vec_id, ({_COS_AB}) * 1.0 AS s
    FROM embeddings a, qa b
  ) ORDER BY s DESC, vec_id ASC LIMIT 20
),
tb AS (
  SELECT vec_id, s FROM (
    SELECT a.vec_id AS vec_id, ({_COS_AB}) * 0.5 AS s
    FROM embeddings a, qb b
  ) ORDER BY s DESC, vec_id ASC LIMIT 20
),
u AS (SELECT * FROM ta UNION ALL SELECT * FROM tb)
SELECT vec_id, floor(sum(s) * 10000.0 + 0.5) / 10000.0 AS score
FROM u GROUP BY vec_id ORDER BY sum(s) DESC, vec_id ASC LIMIT 10
"""


def _eql_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL result pipe `| head 5`: the five chains whose FIRST event is
    earliest (encoded (ts, id)-key tie-break) — one
    TakeOrderedAndProject over the chain rows, no extra shuffle
    (sequences.eql_sequence(head=))."""
    from elasticsearch_assets_spark.operators.sequences import eql_sequence

    ev = load_sf_table(spark, sf_dir, "events")
    return eql_sequence(
        ev, "user_id",
        ["event_type = 'view'", "event_type = 'error'"],
        maxspan_seconds=_EQL_SPAN_S,
        head=5,
    )


_EQL_HEAD_SQL = f"""
WITH keyed AS (
  SELECT user_id, event_type,
         date_diff('millisecond', TIMESTAMP '1970-01-01 00:00:00', ts)
           * 1000000 + event_id AS k
  FROM events
),
nxt AS (
  SELECT user_id, event_type, k,
         min(CASE WHEN event_type = 'error' THEN k END) OVER (
           PARTITION BY user_id ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS n1
  FROM keyed
)
SELECT user_id, (k % 1000000)::BIGINT AS id_0, (n1 % 1000000)::BIGINT AS id_1,
       ((n1 // 1000000) - (k // 1000000))::BIGINT AS span_ms
FROM nxt
WHERE event_type = 'view' AND n1 IS NOT NULL
  AND (n1 // 1000000) - (k // 1000000) <= {_EQL_SPAN_S * 1000}
ORDER BY k ASC LIMIT 5
"""


def _paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact paragraph dedup, keep-FIRST (the Dolma/
    RefinedWeb paragraph pass): a repeated paragraph survives only at its
    globally first (doc, position) occurrence — one hash agg on the
    paragraph hash (min struct), join back, ordered re-assembly; line
    structure derived by the shared _WRAPPED_CTE replaces
    (dedup.paragraph_dedup)."""
    out = OD.paragraph_dedup(_wrapped_docs(spark, sf_dir), sep="\n")
    return out.select("doc_id", "cleaned_text", "n_paras", "n_removed")


_PARAGRAPH_DEDUP_SQL = f"""
WITH w AS ({_WRAPPED_CTE}),
s AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(t, chr(10)),
                                    l -> trim(l)), l -> l != '') AS paras
  FROM w
),
e AS (
  SELECT doc_id, unnest(paras) AS para,
         generate_subscripts(paras, 1) AS pos
  FROM s
),
r AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM e
),
rebuilt AS (
  SELECT doc_id,
         string_agg(para, chr(10) ORDER BY pos) AS cleaned_text,
         count(*)::BIGINT AS n_kept
  FROM r WHERE rn = 1 GROUP BY doc_id
)
SELECT s.doc_id,
       coalesce(rb.cleaned_text, '') AS cleaned_text,
       len(s.paras)::BIGINT AS n_paras,
       (len(s.paras) - coalesce(rb.n_kept, 0))::BIGINT AS n_removed
FROM s LEFT JOIN rebuilt rb USING (doc_id)
ORDER BY s.doc_id
"""


def _ict_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse Cloze Task pairs (ORQA): per doc, the hash60(doc_id)-picked
    sentence becomes the pseudo-query, the rest (in order) the context —
    pure array expressions, zero shuffle; the pick hash is the shared
    md5-prefix SQL text, so both engines choose the same sentence
    (mining.ict_pairs over the line-wrapped corpus)."""
    from elasticsearch_assets_spark.operators.mining import ict_pairs

    out = ict_pairs(
        _wrapped_docs(spark, sf_dir), sep="\n", min_sentences=2
    )
    return out.select("doc_id", "n_sents", "pick", "query_sent", "context")


_ICT_PAIRS_SQL = f"""
WITH w AS ({_WRAPPED_CTE}),
s AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(t, chr(10)),
                                    x -> trim(x)), x -> x != '') AS l
  FROM w
),
p AS (
  SELECT doc_id, l, len(l)::BIGINT AS n,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % len(l))::BIGINT AS pick
  FROM s WHERE len(l) >= 2
)
SELECT doc_id, n AS n_sents, pick,
       l[pick + 1] AS query_sent,
       array_to_string(list_concat(l[1:pick], l[pick + 2:len(l)]), ' ')
         AS context
FROM p ORDER BY doc_id
"""


_VOCAB = [
    "a", "and", "data", "for", "in", "index", "is", "of", "on", "query",
    "spark", "table", "the", "to", "web",
]


def _vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage / OOV rate per doc (pairs with the
    fertility diagnostic): tokens outside a fixed 15-term vocab counted
    with one array filter — pure JVM expressions, zero shuffle; the
    tokenizer is the frozen contract kernel shared with the oracle
    (textstats.vocab_coverage)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.vocab_coverage(docs, _VOCAB)
    return out.select(
        "doc_id", "n_tokens", "n_oov", _f4("oov_rate").alias("oov_rate")
    ).orderBy("doc_id")


def _vocab_coverage_sql() -> str:
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    vlist = ", ".join(f"'{v}'" for v in _VOCAB)
    return f"""
WITH s AS (SELECT doc_id, {tokens_sql("text")} AS toks FROM documents),
m AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         len(list_filter(toks, t -> NOT list_contains([{vlist}], t)))::BIGINT
           AS n_oov
  FROM s
)
SELECT doc_id, n_tokens, n_oov,
       CASE WHEN n_tokens > 0
            THEN floor(n_oov::DOUBLE / n_tokens * 10000.0 + 0.5) / 10000.0
            ELSE (0.0)::DOUBLE END AS oov_rate
FROM m ORDER BY doc_id
"""


def _bm25_custom_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES custom BM25 similarity (index-settings `similarity` block,
    k1=1.6 / b=0.3): the constants live in index meta, so every kernel
    re-ranks consistently. The row hard-link-clones the committed docs
    index (metadata-only, the PIT/snapshot machinery) and rewrites only
    its meta — same postings, different scorer
    (index.stats.set_similarity)."""
    import shutil

    from elasticsearch_assets_spark.index.stats import set_similarity
    from elasticsearch_assets_spark.query.engine import clone_index_files

    base = _docs_index(spark, sf_dir)
    d = _idx_dir(sf_dir, "_documents_sim")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    clone_index_files(base.index_dir, d)
    set_similarity(d, k1=1.6, b=0.3)
    idx = InvertedIndex(spark, d)
    res = idx.search(["spark", "join"], k=None, mode="or")
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_custom_sim_sql() -> str:
    body = _bm25_body("term IN ('join', 'spark')", k1=1.6, b=0.3)
    return f"""
WITH {body}
SELECT doc_id, round(s, 4) AS score FROM scored
ORDER BY s DESC, doc_id ASC
"""


def _facet_hist_hard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram hard_bounds (7.10): the bucket space is CLIPPED to
    [300, 1300] — keys outside never bucket (the predicate lands before
    the count shuffle, ES's bucket-explosion guard) and extended_bounds
    only widen inside the clip (facets.facet_histogram_bounds)."""
    from elasticsearch_assets_spark.operators.facets import (
        facet_histogram_bounds,
    )

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    matches = idx.search(["spark"], k=None, mode="and")
    out = facet_histogram_bounds(
        matches, docs, "n_chars", 200.0,
        offset=50.0, extended_lo=0.0, extended_hi=1999.0,
        hard_lo=300.0, hard_hi=1300.0,
    )
    return out.select("bucket", "doc_count")


_FACET_HIST_HARD_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
hist AS (
  SELECT bucket, count(*)::BIGINT AS doc_count FROM (
    SELECT (floor((d.n_chars - 50.0) / 200.0) * 200.0 + 50.0)::DOUBLE
      AS bucket
    FROM documents d JOIN m USING (doc_id)
  ) WHERE bucket >= 250.0 AND bucket <= 1250.0 GROUP BY bucket
),
spine AS (
  SELECT (k * 200.0 + 50.0)::DOUBLE AS bucket FROM range(1, 7) r(k)
)
SELECT s.bucket, coalesce(h.doc_count, 0)::BIGINT AS doc_count
FROM spine s LEFT JOIN hist h USING (bucket) ORDER BY s.bucket
"""


def _zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-exponent corpus diagnostic: alpha = -regr_slope(ln freq,
    ln rank) over the 64 most frequent terms (deterministic (freq DESC,
    term ASC) ranks) — one tokenize + vocab-sized hash agg + one window
    + one aggregate (textstats.zipf_fit)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    out = OT.zipf_fit(docs, top=64)
    return out.select(
        _f4("alpha").alias("alpha"), "n_vocab", "n_top"
    )


def _zipf_fit_sql() -> str:
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    return f"""
WITH s AS (SELECT doc_id, {tokens_sql("text")} AS toks FROM documents),
t AS (SELECT unnest(toks) AS term FROM s),
tf AS (SELECT term, count(*)::DOUBLE AS c FROM t GROUP BY term),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS r FROM tf
  QUALIFY r <= 64
)
SELECT floor((-regr_slope(ln(c), ln(r::DOUBLE))) * 10000.0 + 0.5) / 10000.0
         AS alpha,
       (SELECT count(*) FROM tf)::BIGINT AS n_vocab,
       count(*)::BIGINT AS n_top
FROM ranked
"""




def _ann_nested_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES kNN over a nested dense_vector field: parents rank by their
    BEST passage's cosine, `best_chunk` = the argmax passage ordinal (the
    inner_hits contract). Passages derive from the flat embeddings by the
    shared 4x16 chunking; the query is embedding 0's first chunk
    (similarity.nested_knn over chunk_vectors)."""
    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]][:16]
    nested = OS.chunk_vectors(emb, 4)
    out = OS.nested_knn(nested, qv, k=10)
    return out.select("vec_id", _f4("score").alias("score"), "best_chunk")


def _ann_nested_best_sql() -> str:
    chunk_cos = []
    for j in range(4):
        off = j * 16
        dot = (f"(SELECT sum(a.embedding[{off} + i]::DOUBLE * b.embedding[i]::DOUBLE) "
               f"FROM range(1, 17) r(i))")
        na = (f"sqrt((SELECT sum(a.embedding[{off} + i]::DOUBLE * a.embedding[{off} + i]::DOUBLE) "
              f"FROM range(1, 17) r(i)))")
        nb = ("sqrt((SELECT sum(b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE) "
              "FROM range(1, 17) r(i)))")
        chunk_cos.append(f"({dot}) / (({na}) * ({nb}))")
    cols = ", ".join(f"({c}) AS c{j}" for j, c in enumerate(chunk_cos))
    best = ("CASE WHEN c0 = s THEN 0 WHEN c1 = s THEN 1 "
            "WHEN c2 = s THEN 2 ELSE 3 END")
    return f"""
WITH q AS (SELECT embedding[1:16] AS embedding FROM embeddings WHERE vec_id = 0),
per AS (SELECT a.vec_id AS vec_id, {cols} FROM embeddings a, q b),
m AS (SELECT vec_id, c0, c1, c2, c3, greatest(c0, c1, c2, c3) AS s FROM per)
SELECT vec_id, floor(s * 10000.0 + 0.5) / 10000.0 AS score,
       ({best})::INT AS best_chunk
FROM m ORDER BY s DESC, vec_id ASC LIMIT 10
"""




def _bm25_wildcard_tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-wildcard query `*ark*` through the trigram-accelerated
    dictionary (the ES `wildcard` field type's n-gram subfield): candidate
    terms come from a pushed gram lookup instead of the full-dictionary
    regex a leading `*` forces, the glob regex verifies candidates only —
    expansion- and rank-identical to the brute-force path
    (engine.search_wildcard_trigram)."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_wildcard_trigram("*ark*", k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): top-25 by ln(u)/w with u = the shared 60-bit md5-hash
    uniform and w = n_chars — the quality-weighted curation pick,
    replayable under retries, zero shuffle
    (operators/sampling.weighted_sample)."""
    from elasticsearch_assets_spark.operators.sampling import weighted_sample

    docs = load_sf_table(spark, sf_dir, "documents")
    out = weighted_sample(docs, 25, "n_chars")
    return out.select("doc_id", "lang", "n_chars").orderBy("doc_id")


_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         ln((('0x' || substr(md5('esw1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             + 1.0) / 1152921504606846976.0) / n_chars::DOUBLE AS k
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
) ORDER BY k DESC, doc_id ASC LIMIT 25
"""




def _analyze_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _analyze with char_filters (the pre-tokenize slot): html_strip
    (tags to one space + the five standard entities — analysis/extract's
    shared SQL twin gives bit parity) then a pattern_replace digit wipe,
    then the frozen tokenizer and a length gate. The `x&amp;y` probe makes
    entity decoding observable (undecoded it would tokenize as x/amp/y)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    body = docs.where("doc_id = 1").head()["text"]
    text = "<p>" + body + "</p> <b>x&amp;y</b> <a href='z'>link2go</a>"
    toks = idx.analyze(
        text,
        filters=["length:2:10"],
        char_filters=["html_strip", ("pattern_replace", "[0-9]+", " ")],
    )
    return spark.createDataFrame(
        [(int(p), t) for p, t in toks], "position long, token string"
    )


def _analyze_html_sql() -> str:
    from elasticsearch_assets_spark.analysis.extract import html_strip_sql
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    return f"""
WITH raw AS (
  SELECT '<p>' || text || '</p> <b>x&amp;y</b> <a href=''z''>link2go</a>'
    AS x
  FROM documents WHERE doc_id = 1
),
s AS (
  SELECT regexp_replace({html_strip_sql("x")}, '[0-9]+', ' ', 'g') AS y
  FROM raw
),
tk AS (SELECT {tokens_sql("y")} AS toks FROM s),
e AS (
  SELECT unnest(toks) AS token, generate_subscripts(toks, 1) AS ord FROM tk
),
kept AS (SELECT ord, token FROM e WHERE length(token) BETWEEN 2 AND 10)
SELECT row_number() OVER (ORDER BY ord ASC) - 1 AS position, token FROM kept
"""


_HEAPS_LADDER = [50, 100, 200, 400]


def _heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct terms among the doc_id < N
    prefix at four ladder points — ONE tokenize + per-term min(doc_id)
    reduction, then all points as conditional counts in a single
    aggregate (textstats.heaps_curve; pairs with zipf_fit)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return OT.heaps_curve(docs, _HEAPS_LADDER)


def _heaps_curve_sql() -> str:
    from elasticsearch_assets_spark.operators.texthash import tokens_sql

    vals = ", ".join(f"({n})" for n in _HEAPS_LADDER)
    return f"""
WITH s AS (SELECT doc_id, {tokens_sql("text")} AS toks FROM documents),
e AS (SELECT doc_id, unnest(toks) AS term FROM s),
f AS (SELECT term, min(doc_id) AS first FROM e GROUP BY term)
SELECT n::BIGINT AS prefix_docs,
       (SELECT count(*) FROM f WHERE first < n)::BIGINT AS vocab_size
FROM (VALUES {vals}) v(n) ORDER BY prefix_docs
"""




_LUHN_SALT_CTE = (
    "SELECT doc_id, text || CASE doc_id % 3"
    " WHEN 0 THEN ' card 4111111111111111 ok'"
    " WHEN 1 THEN ' fake 4111111111111112 no'"
    " ELSE '' END AS text FROM documents"
)


def _pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-card PII with Luhn validation: 13-16 digit candidate runs,
    pure-integer-fold check digit (textstats.luhn_stats) — the corpus is
    salted identically in both engines with one valid and one invalid
    card so both counters fire (the pii_scrub salting pattern)."""
    docs = load_sf_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" card 4111111111111111 ok"))
            .when(F.col("doc_id") % 3 == 1, F.lit(" fake 4111111111111112 no"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    out = OT.luhn_stats(docs)
    return out.select("doc_id", "n_candidates", "n_valid").orderBy("doc_id")


def _pii_luhn_sql() -> str:
    from elasticsearch_assets_spark.operators.textstats import (
        _LUHN_CAND_RE,
        luhn_sql,
    )

    return f"""
WITH salted AS ({_LUHN_SALT_CTE}),
c AS (
  SELECT doc_id,
         regexp_extract_all(text, '{_LUHN_CAND_RE}') AS cands
  FROM salted
)
SELECT doc_id,
       len(cands)::BIGINT AS n_candidates,
       len(list_filter(cands, c -> {luhn_sql("c")}))::BIGINT AS n_valid
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# distributed BPE tokenizer training (operators/bpe.py)
# ---------------------------------------------------------------------------

_BPE_K = 8
_BPE_SPARK_CACHE: dict[tuple[str, int], list] = {}
_BPE_ORACLE_CACHE: dict[int, list] = {}


def _bpe_spark_merges(spark: SparkSession, sf_dir: str, k: int = _BPE_K) -> list:
    """Train once per (sf_dir, k) per process — both BPE rows share the
    distributed training run."""
    from elasticsearch_assets_spark.operators import bpe as OB

    key = (os.path.abspath(sf_dir), k)
    if key not in _BPE_SPARK_CACHE:
        docs = load_sf_table(spark, sf_dir, "documents")
        _BPE_SPARK_CACHE[key] = OB.bpe_learn(docs, k)
    return _BPE_SPARK_CACHE[key]


def _bpe_oracle_merges(k: int = _BPE_K) -> "list | None":
    """Independent re-training for the oracle twin: the (word, count)
    vocabulary is read through DuckDB with the shared tokens_sql text, the
    merge loop is the pure-Python reference trainer (bpe.bpe_learn_local) —
    a from-scratch implementation of the same deterministic algorithm, the
    trained-constants pattern of _ann_ivf_sql."""
    from elasticsearch_assets_spark.operators import bpe as OB

    if k not in _BPE_ORACLE_CACHE:
        import duckdb

        path = os.path.join(_ORACLE_SF_DIR, "documents.parquet")
        if not os.path.exists(path):
            return None
        vocab = duckdb.connect().execute(
            f"SELECT wd, count(*)::BIGINT AS c FROM ("
            f"SELECT unnest({tokens_sql('text')}) AS wd "
            f"FROM read_parquet('{path}')) GROUP BY wd"
        ).fetchall()
        _BPE_ORACLE_CACHE[k] = OB.bpe_learn_local(vocab, k)
    return _BPE_ORACLE_CACHE[k]


def _bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training (Sennrich et al. 2016): the corpus reduces
    to its cached word vocabulary once, each merge iteration is one tiny
    pair-count aggregation + one vectorized symbol-array fold, ties break
    (count DESC, left ASC, right ASC). Output: the learned merge list."""
    merges = _bpe_spark_merges(spark, sf_dir)
    rows = [(i + 1, a, b, int(c)) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, schema="rank BIGINT, lhs STRING, rhs STRING, cnt BIGINT"
    ).orderBy("rank")


def _bpe_merges_sql() -> "str | None":
    merges = _bpe_oracle_merges()
    if merges is None:
        return None
    vals = ", ".join(
        f"({i + 1}, '{a}', '{b}', {int(c)})" for i, (a, b, c) in enumerate(merges)
    )
    return f"""
SELECT rank::BIGINT AS rank, lhs, rhs, cnt::BIGINT AS cnt
FROM (VALUES {vals}) t(rank, lhs, rhs, cnt) ORDER BY rank
"""


def _bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the learned merges: one zero-shuffle
    projection of per-word JVM merge folds (bpe.bpe_apply); output is the
    per-doc BPE token count + an md5 signature of the full symbol stream,
    so the hash checks every symbol of every doc."""
    merges = _bpe_spark_merges(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    from elasticsearch_assets_spark.operators import bpe as OB

    out = OB.bpe_apply(docs, merges)
    return out.select(
        "doc_id",
        F.size("bpe").cast("long").alias("n_bpe"),
        F.md5(F.array_join("bpe", " ")).alias("sig"),
    ).orderBy("doc_id")


def _bpe_apply_sql() -> "str | None":
    from elasticsearch_assets_spark.operators import bpe as OB

    merges = _bpe_oracle_merges()
    if merges is None:
        return None
    word_sql = OB.bpe_apply_word_sql("wd", merges)
    return f"""
SELECT doc_id, length(b)::BIGINT AS n_bpe, md5(array_to_string(b, ' ')) AS sig
FROM (
  SELECT doc_id,
         flatten(list_transform({tokens_sql('text')}, wd -> {word_sql})) AS b
  FROM documents)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# round-3 session-10 batch 2: caret boosts, sharded terms agg, _source
# filtering, per-host caps
# ---------------------------------------------------------------------------


def _querystring_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene caret boosts in the query-string surface: `spark^2.5 OR
    jo*^0.5 OR table` — the term boost and the rewrite boost (applied to
    every jo*-expansion term) fold into the per-term idf exactly where
    Lucene folds `clause^w` into its scorers; `table` stays unboosted."""
    idx = _docs_index(spark, sf_dir)
    res = idx.search_querystring("spark^2.5 OR jo*^0.5 OR table", k=None)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_QS_BOOST_SQL = _bm25_sql(
    [], "or", None,
    term_cond="term = 'spark' OR term LIKE 'jo%' OR term = 'table'",
    boost_case=(
        "CASE WHEN tf.term = 'spark' THEN 2.5 "
        "WHEN tf.term LIKE 'jo%' THEN 0.5 ELSE 1.0 END"
    ),
)


def _facet_terms_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES's distributed terms agg with its real accuracy contract: 4
    hash-routed shards each report only their top shard_size=3 lang
    buckets; the merge reports per-bucket doc_count_error_upper_bound
    (sum of non-reporting shards' smallest returned counts)."""
    from elasticsearch_assets_spark.operators import facets as OFA

    docs = load_sf_table(spark, sf_dir, "documents")
    return OFA.facet_terms_sharded(
        docs, "lang", 3, n_shards=4, shard_size=3
    )


_FACET_SHARDED_SQL = """
WITH per AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 4 AS shard,
         lang AS bucket, count(*) AS cnt
  FROM documents GROUP BY 1, 2
),
top AS (
  SELECT * FROM per
  QUALIFY row_number() OVER (
    PARTITION BY shard ORDER BY cnt DESC, bucket ASC) <= 3
),
floors AS (
  SELECT shard,
         CASE WHEN count(*) = 3 THEN min(cnt) ELSE 0 END AS flr
  FROM top GROUP BY shard
),
tot AS (SELECT coalesce(sum(flr), 0) AS tot FROM floors),
merged AS (
  SELECT bucket, sum(cnt) AS doc_count, sum(flr) AS rep
  FROM top JOIN floors USING (shard) GROUP BY bucket
)
SELECT bucket, doc_count::BIGINT AS doc_count,
       (tot.tot - rep)::BIGINT AS doc_count_error_upper_bound
FROM merged, tot
ORDER BY doc_count DESC, bucket ASC LIMIT 3
"""


def _source_filtering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `_source` filtering: includes=['lang', 'n_*'] expands by
    wildcard, excludes=['n_chars'] wins on the overlap — the hit list
    carries back exactly (doc_id, score, lang)."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    hits = idx.search(["spark", "join"], k=10, mode="or")
    src = idx.fetch_source(
        hits, docs, includes=["lang", "n_*"], excludes=["n_chars"]
    )
    return src.select(
        "doc_id", F.round("score", 4).alias("score"), "lang"
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())


_SOURCE_FILTER_SQL = f"""
WITH hits AS ({_bm25_sql(["spark", "join"], "or", 10)})
SELECT h.doc_id, h.score, d.lang
FROM hits h JOIN documents d USING (doc_id)
ORDER BY h.score DESC, h.doc_id ASC
"""


def _host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap (RefinedWeb/C4 curation rule): at most 2 docs
    per URL host, keeping the largest by n_chars (priority mode), ties on
    doc_id — ONE window shuffle keyed by host, replayable."""
    from elasticsearch_assets_spark.operators.sampling import cap_per_host
    from elasticsearch_assets_spark.operators.urls import url_host_sql

    docs = load_sf_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_DERIVE_SQL)
    )
    hosted = docs.withColumn("host", F.expr(url_host_sql("url")))
    out = cap_per_host(hosted, "host", 2, priority_col="n_chars")
    return out.select("host", "doc_id", "n_chars").orderBy("host", "doc_id")


def _host_cap_sql() -> str:
    from elasticsearch_assets_spark.operators.urls import url_host_sql

    return f"""
WITH u AS (
  SELECT doc_id, n_chars, {_URL_DERIVE_SQL} AS url FROM documents
),
h AS (SELECT doc_id, n_chars, {url_host_sql("url")} AS host FROM u)
SELECT host, doc_id, n_chars FROM h
QUALIFY row_number() OVER (
  PARTITION BY host ORDER BY n_chars DESC, doc_id ASC) <= 2
ORDER BY host, doc_id
"""


# ---------------------------------------------------------------------------
# round-3 session-10 batch 3: ES|QL KNN, semantic query, extended_stats_bucket,
# terms include/exclude regex
# ---------------------------------------------------------------------------


def _esql_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL KNN function in WHERE (9.1): restrict the pipe to the 10 rows
    nearest the literal query vector by cosine, similarity emitted as
    _score (the RERANK convention). Exact top-k — ONE scan +
    TakeOrderedAndProject; the ANN variants are the 10^12-row swap-in."""
    from elasticsearch_assets_spark.query.esql import esql

    emb = load_sf_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    vec = ", ".join(repr(v) for v in qv)
    out = esql(
        f"FROM embeddings | WHERE KNN(embedding, [{vec}], 10)"
        " | KEEP vec_id, _score",
        spark=spark, sf_dir=sf_dir,
    )
    return out.select("vec_id", F.round("_score", 4).alias("score"))


_ESQL_KNN_SQL = f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cos, 4) AS score FROM (
  SELECT a.vec_id AS vec_id, {_COS_AB} AS cos
  FROM embeddings a, q b
) ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


_SEM_QUERY = "spark join table row quick brown"


def _semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES semantic query (semantic_text fields, 8.15): rank by cosine in
    the deterministic hashed-unigram stand-in embedding space (declared
    model boundary — the plan is embedder-agnostic). Integer dims make
    both engines' sums exact; the one float expression at the end gives
    bit parity by construction."""
    from elasticsearch_assets_spark.operators.semantic import semantic_topk

    docs = load_sf_table(spark, sf_dir, "documents")
    out = semantic_topk(docs, _SEM_QUERY, k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _semantic_search_sql() -> str:
    from elasticsearch_assets_spark.operators.semantic import semantic_sql

    return semantic_sql(_SEM_QUERY, k=10)


def _facet_ext_stats_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats_bucket over the click-events daily histogram:
    integer n/sum/sum_of_squares, float variance/std/±2σ derived in one
    projection over the single reduced row."""
    from elasticsearch_assets_spark.operators import facets as OFA

    ev = load_sf_table(spark, sf_dir, "events")
    matches = ev.where(F.col("event_type") == "click").select("event_id")
    out = OFA.facet_extended_stats_bucket(
        matches, ev, "ts", "day", id_col="event_id"
    )
    return out.select(
        "n_buckets", "sum_bucket", "min_bucket", "max_bucket",
        "sum_of_squares",
        _f4("avg_bucket").alias("avg_bucket"),
        _f4("variance").alias("variance"),
        _f4("std_deviation").alias("std_deviation"),
        _f4("std_upper").alias("std_upper"),
        _f4("std_lower").alias("std_lower"),
    )


_FACET_EXT_STATS_BUCKET_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS bucket, count(*)::BIGINT AS doc_count
  FROM events WHERE event_type = 'click' GROUP BY 1
),
base AS (
  SELECT count(*)::BIGINT AS n_buckets,
         sum(doc_count)::BIGINT AS sum_bucket,
         min(doc_count)::BIGINT AS min_bucket,
         max(doc_count)::BIGINT AS max_bucket,
         sum(doc_count * doc_count)::BIGINT AS sum_of_squares
  FROM h
)
SELECT n_buckets, sum_bucket, min_bucket, max_bucket, sum_of_squares,
  floor((sum_bucket::DOUBLE / n_buckets::DOUBLE) * 10000.0 + 0.5) / 10000.0
    AS avg_bucket,
  floor((sum_of_squares::DOUBLE / n_buckets::DOUBLE
         - (sum_bucket::DOUBLE / n_buckets::DOUBLE)
           * (sum_bucket::DOUBLE / n_buckets::DOUBLE)) * 10000.0 + 0.5)
    / 10000.0 AS variance,
  floor(sqrt(sum_of_squares::DOUBLE / n_buckets::DOUBLE
             - (sum_bucket::DOUBLE / n_buckets::DOUBLE)
               * (sum_bucket::DOUBLE / n_buckets::DOUBLE)) * 10000.0 + 0.5)
    / 10000.0 AS std_deviation,
  floor((sum_bucket::DOUBLE / n_buckets::DOUBLE
         + 2.0 * sqrt(sum_of_squares::DOUBLE / n_buckets::DOUBLE
                      - (sum_bucket::DOUBLE / n_buckets::DOUBLE)
                        * (sum_bucket::DOUBLE / n_buckets::DOUBLE)))
        * 10000.0 + 0.5) / 10000.0 AS std_upper,
  floor((sum_bucket::DOUBLE / n_buckets::DOUBLE
         - 2.0 * sqrt(sum_of_squares::DOUBLE / n_buckets::DOUBLE
                      - (sum_bucket::DOUBLE / n_buckets::DOUBLE)
                        * (sum_bucket::DOUBLE / n_buckets::DOUBLE)))
        * 10000.0 + 0.5) / 10000.0 AS std_lower
FROM base
"""


def _facet_terms_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg include/exclude regex knobs: whole-string-anchored
    patterns prune the bucket universe BEFORE the count shuffle
    (include src1.* minus exclude src1[23]); portable regex dialect."""
    from elasticsearch_assets_spark.operators import facets as OFA

    docs = load_sf_table(spark, sf_dir, "documents")
    return OFA.facet_counts_regex(
        docs.select("doc_id"), docs, "source", 10,
        include_re="src1.*", exclude_re="src1[23]",
    )


_FACET_TERMS_REGEX_SQL = """
SELECT source AS bucket, count(*)::BIGINT AS doc_count
FROM documents
WHERE regexp_full_match(source, '(?:src1.*)')
  AND NOT regexp_full_match(source, '(?:src1[23])')
GROUP BY 1 ORDER BY doc_count DESC, bucket ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# round-3 session-10 batch 4: SLM retention, bulk op_type=create
# ---------------------------------------------------------------------------

_SLM_NOW = "2024-02-05"
_SLM_EXPIRE, _SLM_MIN, _SLM_MAX = 10, 3, 4


def _slm_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES SLM retention (expire_after yields to min_count, max_count
    overrides freshness): the decision table over one snapshot per event
    day — both delete reasons fire under this policy (max_count cuts an
    unexpired snapshot at rank 5, expire_after everything older)."""
    from elasticsearch_assets_spark.index.slm import retention_plan

    ev = load_sf_table(spark, sf_dir, "events")
    snaps = ev.select(
        F.date_trunc("day", F.col("ts")).alias("ts")
    ).distinct().select(
        F.concat(F.lit("snap-"), F.date_format("ts", "yyyy-MM-dd")).alias(
            "name"
        ),
        "ts",
    )
    return retention_plan(
        snaps, _SLM_NOW,
        expire_after_days=_SLM_EXPIRE, min_count=_SLM_MIN, max_count=_SLM_MAX,
    )


_SLM_SQL = f"""
WITH s AS (
  SELECT 'snap-' || strftime(d, '%Y-%m-%d') AS name, d AS ts
  FROM (SELECT DISTINCT date_trunc('day', ts) AS d FROM events)
),
r AS (
  SELECT name, strftime(ts, '%Y-%m-%d') AS snap_date,
         date_diff('day', ts::DATE, DATE '{_SLM_NOW}') AS age_days,
         row_number() OVER (ORDER BY ts DESC, name ASC) AS rank
  FROM s
)
SELECT name, snap_date, age_days::INT AS age_days, rank::INT AS rank,
       (rank <= {_SLM_MIN}
        OR (age_days <= {_SLM_EXPIRE} AND rank <= {_SLM_MAX})) AS keep,
       CASE
         WHEN rank <= {_SLM_MIN}
           OR (age_days <= {_SLM_EXPIRE} AND rank <= {_SLM_MAX})
           THEN 'retained'
         WHEN age_days > {_SLM_EXPIRE} THEN 'expired'
         ELSE 'max_count_exceeded'
       END AS reason
FROM r ORDER BY rank
"""


def _bulk_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bulk `op_type=create` (insert-if-absent): the second batch's
    rows whose keys already exist are conflicts and never written —
    existing docs win, exactly ES's create-conflict contract. Output is
    the final table: batch-1 rows plus only the genuinely-new batch-2
    keys."""
    import tempfile

    from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable

    docs = load_sf_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="esa_create_"), "tbl")
    table = KeyedParquetTable(spark, path, key="_id", num_buckets=8)
    table.create(
        docs.where(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").alias("_id"), F.lit("first").alias("src")
        )
    )
    table.create(
        docs.where(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("_id"), F.lit("second").alias("src")
        )
    )
    return table.read().select("_id", "src").orderBy("_id")


_BULK_CREATE_SQL = """
SELECT doc_id AS _id, 'first' AS src FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id AS _id, 'second' AS src FROM documents
WHERE doc_id % 3 = 0 AND doc_id % 2 <> 0
ORDER BY _id
"""


_MLT_MULTI_LIKES = [7, 21]
_MLT_MULTI_UNLIKE = 12


def _mlt_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this with a multi-doc `like` array + `unlike`: term
    frequencies AGGREGATE across the like-docs before the characteristic-
    term cut, any unlike-doc's terms are subtracted, and every like-doc is
    excluded from the hits."""
    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    res = idx.more_like_this(
        _MLT_MULTI_LIKES, docs, max_terms=10, k=10, unlike=[_MLT_MULTI_UNLIKE]
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _mlt_multi_sql() -> str:
    likes = ", ".join(str(i) for i in _MLT_MULTI_LIKES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
src AS (
  SELECT term, count(*)::BIGINT AS tf FROM toks
  WHERE doc_id IN ({likes}) GROUP BY term
),
gdf AS (
  SELECT t.term, count(DISTINCT t.doc_id)::BIGINT AS df
  FROM toks t JOIN src USING (term) GROUP BY t.term
),
sel AS (
  SELECT s.term FROM src s JOIN gdf g USING (term)
  WHERE s.term NOT IN (
    SELECT term FROM toks WHERE doc_id = {_MLT_MULTI_UNLIKE})
  ORDER BY s.tf DESC, g.df ASC, s.term ASC LIMIT 10
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored
WHERE doc_id NOT IN ({likes})
ORDER BY s DESC, doc_id ASC LIMIT 10
"""


def _ingest_composed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline processor (pipeline composition): the outer pipeline
    invokes a shared named pipeline by name; composition inlines into ONE
    projection chain (a single Catalyst plan, no per-doc dispatch)."""
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    docs = load_sf_table(spark, sf_dir, "documents")
    shared = [
        {"uppercase": {"field": "lang"}},
        {"set": {"field": "curated", "value": "yes"}},
    ]
    outer = [
        {"script": {"target_field": "n_kchars", "source": "n_chars / 1000.0"}},
        {"pipeline": {"name": "shared-enrich"}},
    ]
    out = run_pipeline(
        docs.select("doc_id", "lang", "n_chars"),
        outer,
        registry={"shared-enrich": shared},
    )
    return out.select(
        "doc_id", "lang", "curated", _f4("n_kchars").alias("n_kchars")
    ).orderBy("doc_id")


_INGEST_COMPOSED_SQL = """
SELECT doc_id, upper(lang) AS lang, 'yes' AS curated,
       floor((n_chars / 1000.0) * 10000.0 + 0.5) / 10000.0 AS n_kchars
FROM documents ORDER BY doc_id
"""


def _cached_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES shard request cache: the second identical request reads a
    parquet entry keyed by (canonical query, index-state fingerprint) —
    no posting scan at all. Parity with the uncached search IS the
    contract; the row runs miss-then-hit and returns the hit."""
    import tempfile

    from elasticsearch_assets_spark.query.cache import RequestCache

    idx = _docs_index(spark, sf_dir)
    cache = RequestCache(
        idx, cache_dir=os.path.join(tempfile.mkdtemp(prefix="esa_rc_"), "rc")
    )
    cache.search(["spark", "join"], k=None, mode="or")  # miss fills
    res = cache.search(["spark", "join"], k=None, mode="or")  # hit
    assert cache.hits == 1 and cache.misses == 1
    return res.select("doc_id", F.round("score", 4).alias("score"))


_CACHED_SEARCH_SQL = _bm25_sql(["spark", "join"], "or", None)


_HYB_SEM_Q = "spark join table row quick brown"


def _hybrid_semantic_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, both retrievers from this engine: BM25 top-20 +
    semantic (stand-in embedding) top-20 fused by RRF (rank_constant 60).
    Every stage has an exact SQL twin, so the fused ranking is value-
    checked end-to-end — the ES `retriever: rrf` over a semantic_text
    field."""
    from elasticsearch_assets_spark.operators.semantic import semantic_topk
    from elasticsearch_assets_spark.operators.similarity import rrf_fuse

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    bm = idx.search(["spark", "join"], k=20, mode="or")
    sem = semantic_topk(docs, _HYB_SEM_Q, k=20)
    out = rrf_fuse([bm, sem], k_const=60, k=10)
    return out.select("doc_id", _f4("score").alias("score"))


def _hybrid_semantic_rrf_sql() -> str:
    from elasticsearch_assets_spark.operators.semantic import semantic_sql

    bm = _bm25_sql(["spark", "join"], "or", 20)
    sem = semantic_sql(_HYB_SEM_Q, k=20)
    return f"""
WITH bm AS ({bm}),
sem AS ({sem}),
rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM bm),
rs AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM sem),
u AS (
  SELECT doc_id, 1.0 / (60 + r) AS c FROM rb
  UNION ALL
  SELECT doc_id, 1.0 / (60 + r) AS c FROM rs
)
SELECT doc_id,
       floor(sum(c) * 10000.0 + 0.5) / 10000.0 AS score
FROM u GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT 10
"""


def _dsl_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES Query DSL (the JSON body surface the reference passes through):
    bool must (operator=and match) + structured range filter + must_not
    term, compiled onto search_filtered — rank semantics inherited from
    the oracle-pinned kernels (query/dsl.py)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": {"query": "spark join",
                                         "operator": "and"}}}],
            "filter": [{"range": {"n_chars": {"gte": 400}}}],
            "must_not": [{"term": {"text": "table"}}],
        }},
        "size": None,
    }
    res = search_dsl(idx, body, docs)
    return res.select("doc_id", F.round("score", 4).alias("score"))


_DSL_BOOL_SQL = _bm25_sql(
    ["spark", "join"], "and", None,
    where=(
        "doc_id IN (SELECT doc_id FROM documents WHERE n_chars >= 400) "
        "AND doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'table')"
    ),
)


def _dsl_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full ES search body with a RESPONSE-SHAPE section — post_filter —
    through the DSL compiler (query/dsl.py search_dsl): aggregations see
    every query match (total_before_filter), only the hit list narrows
    (the faceted-navigation contract; one scored scan, semi join, 1-row
    broadcast total)."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    body = {
        "query": {"match": {"text": "spark table"}},
        "post_filter": {"range": {"n_chars": {"gte": 500}}},
        "size": 10,
    }
    res = search_dsl(idx, body, docs)
    return res.select(
        "doc_id", F.round("score", 4).alias("score"), "total_before_filter"
    )


def _dsl_shaped_sql() -> str:
    body = _bm25_body("term IN ('spark', 'table')")
    return f"""
WITH {body},
tot AS (SELECT count(*)::BIGINT AS total_before_filter FROM scored)
SELECT doc_id, round(s, 4) AS score, total_before_filter
FROM scored, tot
WHERE doc_id IN (SELECT doc_id FROM documents WHERE n_chars >= 500)
ORDER BY s DESC, doc_id ASC LIMIT 10
"""


def _dsl_knn_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search body with BOTH `query` and a `knn` section (8.7 hybrid):
    a doc found by both sides SUMS its BM25 and cosine scores (the
    documented ES combination), then the global size cut applies. The knn
    corpus is documents ⋈ embeddings on id."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx = _docs_index(spark, sf_dir)
    docs = load_sf_table(spark, sf_dir, "documents")
    emb = load_sf_table(spark, sf_dir, "embeddings")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    body = {
        "query": {"match": {"text": "spark"}},
        "knn": {"field": "embedding", "query_vector": qv, "k": 10},
        "size": 10,
    }
    res = search_dsl(idx, body, corpus)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _dsl_knn_hybrid_sql() -> str:
    body = _bm25_body("term IN ('spark')")
    return f"""
WITH {body},
bm AS (SELECT doc_id, s AS score FROM scored),
j AS (
  SELECT d.doc_id, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
knn AS (
  SELECT doc_id, cos AS score FROM (
    SELECT a.doc_id AS doc_id, {_COS_AB} AS cos FROM j a, q b
  ) ORDER BY cos DESC, doc_id ASC LIMIT 10
),
u AS (
  SELECT doc_id, score FROM bm
  UNION ALL
  SELECT doc_id, score FROM knn
)
SELECT doc_id, round(sum(score), 4) AS score FROM u
GROUP BY doc_id ORDER BY sum(score) DESC, doc_id ASC LIMIT 10
"""


# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 conjunctive top-10 over the sf0.001 documents corpus."""
    return _bm25_query(["spark", "join"], "and", 10)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_and_all": _bm25_query(["spark", "join"], "and", None),
        "bm25_and_topk": _bm25_query(["query", "merge", "scan"], "and", 10),
        "bm25_or_all": _bm25_query(["spark", "table"], "or", None),
        "bm25_single_term": _bm25_query(["filter"], "and", None),
        "bm25_filtered": _bm25_filtered,
        "bm25_phrase": _bm25_phrase,
        "bm25_phrase_groups": _bm25_phrase_groups,
        "bm25_near": _bm25_near,
        "bm25_prefix": _bm25_prefix,
        "bm25_wildcard": _bm25_wildcard,
        "bm25_fuzzy": _bm25_fuzzy,
        "bm25_fuzzy_osa": _bm25_fuzzy_osa,
        "bm25_fuzzy_auto": _bm25_fuzzy_auto,
        "bm25_msm": _bm25_msm,
        "bm25_boosted": _bm25_boosted,
        "bm25_must_not": _bm25_must_not,
        "bm25_dismax": _bm25_dismax,
        "constant_score": _constant_score,
        "function_score": _function_score,
        "term_suggest": _term_suggest,
        "facet_terms_metrics": _facet_terms_metrics,
        "match_sorted": _match_sorted,
        "facet_composite": _facet_composite,
        "facet_filters": _facet_filters,
        "facet_terms_nested": _facet_terms_nested,
        "facet_pipeline": _facet_pipeline,
        "suggest_completion": _suggest_completion,
        "multi_match_best": _multi_match_best,
        "multi_match_most": _multi_match_most,
        "multi_match_cross": _multi_match_cross,
        "ann_topk_rescore": _ann_topk_rescore,
        "ann_topk_mrl": _ann_topk_mrl,
        "percolate_filtered": _percolate_filtered,
        "eql_until": _eql_until,
        "eql_sample": _eql_sample,
        "eql_sequence3": _eql_sequence3,
        "hard_negatives": _hard_negatives,
        "esql_now": _esql_now,
        "facet_terms_other": _facet_terms_other,
        "analyze_chain2": _analyze_chain2,
        "span_corruption": _span_corruption,
        "fim_transform": _fim_transform,
        "curriculum_order": _curriculum_order,
        "facet_normalize": _facet_normalize,
        "script_score": _script_score,
        "random_score": _random_score,
        "dedup_passages": _dedup_passages,
        "decontaminate": _decontaminate,
        "hybrid_rrf": _hybrid_rrf,
        "retriever_tree": _retriever_tree,
        "scroll_page3": _scroll_page3,
        "ann_topk_prefilter": _ann_topk_prefilter,
        "phrase_suggest": _phrase_suggest,
        "index_stats": _index_stats,
        "bm25_boosting": _bm25_boosting,
        "bm25_span_first": _bm25_span_first,
        "bm25_span_not": _bm25_span_not,
        "explain_doc": _explain_doc,
        "termvectors_doc": _termvectors_doc,
        "facet_ext_stats": _facet_ext_stats,
        "facet_pct_ranks": _facet_pct_ranks,
        "facet_weighted_avg": _facet_weighted_avg,
        "facet_rare_terms": _facet_rare_terms,
        "facet_adjacency": _facet_adjacency,
        "facet_geotile": _facet_geotile,
        "facet_auto_dh": _facet_auto_dh,
        "terms_set": _terms_set,
        "lucene_exists": _lucene_exists,
        "ids_query": _ids_query,
        "pinned_query": _pinned_query,
        "rank_feature": _rank_feature,
        "distance_feature": _distance_feature,
        "match_bool_prefix": _match_bool_prefix,
        "percolate": _percolate,
        "facet_missing": _facet_missing,
        "facet_value_count": _facet_value_count,
        "facet_global": _facet_global,
        "facet_boxplot": _facet_boxplot,
        "facet_string_stats": _facet_string_stats,
        "facet_t_test": _facet_t_test,
        "facet_rate": _facet_rate,
        "facet_geo_bounds": _facet_geo_bounds,
        "facet_date_range": _facet_date_range,
        "facet_ip_range": _facet_ip_range,
        "facet_geohash": _facet_geohash,
        "facet_div_sampler": _facet_div_sampler,
        "facet_serial_diff": _facet_serial_diff,
        "facet_cum_card": _facet_cum_card,
        "facet_bucket_sort": _facet_bucket_sort,
        "facet_sig_text": _facet_sig_text,
        "facet_vw_hist": _facet_vw_hist,
        "bm25_span_or": _bm25_span_or,
        "span_near_multi": _span_near_multi,
        "span_field_masking": _span_field_masking,
        "bm25_span_containing": _bm25_span_containing,
        "bm25_intervals": _bm25_intervals,
        "sqs_search": _sqs_search,
        "sqs_or": _sqs_or,
        "pii_scrub": _pii_scrub,
        "combined_fields": _combined_fields,
        "geo_polygon": _geo_polygon,
        "url_dedup": _url_dedup,
        "dup_spans": _dup_spans,
        "update_by_query": _update_by_query,
        "sigterms_jlh": _sigterms_jlh,
        "has_child": _has_child,
        "has_parent": _has_parent,
        "nested_match": _nested_match,
        "facet_moving_pct": _facet_moving_pct,
        "match_sorted_page2": _match_sorted_page2,
        "hybrid_linear": _hybrid_linear,
        "facet_scripted": _facet_scripted,
        "msearch": _msearch,
        "mget_docs": _mget_docs,
        "terms_lookup": _terms_lookup,
        "script_filter": _script_filter,
        "wrapper_query": _wrapper_query,
        "rank_eval": _rank_eval_row,
        "sparse_vector": _sparse_vector,
        "sparse_vector_pruned": _sparse_vector_pruned,
        "sparse_rescore_pruned": _sparse_rescore_pruned,
        "dsl_script_fields": _dsl_script_fields,
        "nested_maxp": _nested_maxp,
        "nested_inner_hits": _nested_inner_hits,
        "dsl_rank_rrf": _dsl_rank_rrf,
        "alias_search": _alias_search,
        "reindex_search": _reindex_search,
        "facet_sibling": _facet_sibling,
        "facet_ip_prefix": _facet_ip_prefix,
        "facet_children": _facet_children,
        "facet_reverse_nested": _facet_reverse_nested,
        "categorize_text": _categorize_text,
        "change_point": _change_point,
        "anomaly_mad": _anomaly_mad,
        "bpe_pairs": _bpe_pairs,
        "filter_sweep": _filter_sweep,
        "geo_line": _geo_line,
        "frequent_pairs": _frequent_pairs,
        "dedup_keep_best": _dedup_keep_best,
        "mixture_sample": _mixture_sample,
        "ann_topk_int8": _ann_topk_int8,
        "pit_search": _pit_search,
        "span_multi_containing": _span_multi_containing,
        "collapse_inner": _collapse_inner,
        "terms_enum": _terms_enum,
        "search_template": _search_template,
        "min_score_search": _min_score_search,
        "doc_chunks": _doc_chunks,
        "dedup_incremental": _dedup_incremental,
        "facet_pct_bucket": _facet_pct_bucket,
        "qs_multi_field": _qs_multi_field,
        "corpus_accounting": _corpus_accounting,
        "bm25_phrase_filtered": _bm25_phrase_filtered,
        "facet_matrix_stats": _facet_matrix_stats,
        "facet_mad": _facet_mad,
        "facet_multi_terms": _facet_multi_terms,
        "facet_top_metrics": _facet_top_metrics,
        "facet_geo_dist": _facet_geo_dist,
        "facet_geo_centroid": _facet_geo_centroid,
        "facet_sampler": _facet_sampler,
        "facet_bucket_script": _facet_bucket_script,
        "bm25_regexp": _bm25_regexp,
        "bm25_rescore": _bm25_rescore,
        "bm25_phrase_prefix": _bm25_phrase_prefix,
        "search_after_page2": _search_after_page2,
        "more_like_this": _more_like_this,
        "facet_terms": _facet_terms,
        "facet_histogram": _facet_histogram,
        "facet_top_hits": _facet_top_hits,
        "facet_date_hist": _facet_date_hist,
        "facet_range": _facet_range,
        "facet_stats": _facet_stats,
        "facet_percentiles": _facet_percentiles,
        "facet_cardinality": _facet_cardinality,
        "collapse_topk": _collapse_topk,
        "repetition_stats": _repetition_stats,
        "querystring_search": _querystring_search,
        "querystring_or": _querystring_or,
        "significant_terms": _significant_terms,
        "highlight": _highlight,
        "highlight_frags": _highlight_frags,
        "bm25_after_delete": _bm25_after_delete,
        "bm25_materialize": _bm25_materialize,
        "date_sort_topk": _date_sort_topk,
        "term_count": _term_count,
        "date_range_scan": _date_range_scan,
        "minmax_dates": _minmax_dates,
        "slice_histogram": _slice_histogram,
        "id_prefix_scan": _id_prefix_scan,
        "id_prefix_histogram": _id_prefix_histogram,
        "dedup_exact": _dedup_exact,
        "dedup_ngram_pairs": _dedup_ngram_pairs,
        "minhash_sigs": _minhash_sigs,
        "lsh_candidates": _lsh_candidates,
        "lsh_verified": _lsh_verified,
        "dedup_clusters": _dedup_clusters,
        "simhash_fps": _simhash_fps,
        "simhash_pairs": _simhash_pairs,
        "simhash_pairs60": _simhash_pairs60,
        "emb_neardup": _emb_neardup,
        "ann_topk": _ann_topk,
        "ann_topk_lsh": _ann_topk_lsh,
        "ann_topk_ivf": _ann_topk_ivf,
        "token_stats": _token_stats,
        "quality_score": _quality,
        "lang_id": _lang_id,
        "doc_fingerprint": _fingerprint,
        "media_stats": _media_stats,
        "enrich_join": _enrich_join,
        "stream_windowed_counts": _stream_windowed_counts,
        "stream_running_stats": _stream_running_stats,
        "geo_bbox": _geo_bbox,
        "geo_distance": _geo_distance,
        "geo_sort_topk": _geo_sort_topk,
        "lucene_filter": _lucene_filter,
        "timeseries_index": _timeseries_index,
        "bulk_route": _bulk_route,
        "scripted_upsert": _scripted_upsert,
        "sliced_scan": _sliced_scan,
        "transform_latest": _transform_latest,
        "transform_pivot": _transform_pivot,
        "rollover_plan": _rollover_plan,
        "snapshot_restore": _snapshot_restore,
        "decay_gauss": _decay_gauss,
        "bm25_span_near3": _bm25_span_near3,
        "synonym_search": _synonym_search,
        "eql_sequence": _eql_sequence,
        "bucket_corr": _bucket_corr,
        "knn_outliers": _knn_outliers,
        "unigram_lm": _unigram_lm,
        "hash_classifier": _hash_classifier,
        "emb_lsh_neardup": _emb_lsh_neardup,
        "facet_parent": _facet_parent,
        "facet_ks_test": _facet_ks_test,
        "dup_span_removal": _dup_span_removal,
        "normalized_text": _normalized_text,
        "bm25_stemmed": _bm25_stemmed,
        "packed_docs": _packed_docs,
        "esql_stats": _esql_stats,
        "esql_rowpipe": _esql_rowpipe,
        "esql_grok": _esql_grok,
        "esql_dissect": _esql_dissect,
        "esql_dissect2": _esql_dissect2,
        "esql_dissect3": _esql_dissect3,
        "esql_rlike": _esql_rlike,
        "esql_enrich_range": _esql_enrich_range,
        "esql_enrich_geo": _esql_enrich_geo,
        "ingest_foreach": _ingest_foreach,
        "url_quality": _url_quality,
        "esql_mv_funcs3": _esql_mv_funcs3,
        "esql_metadata_index": _esql_metadata_index,
        "ingest_inference": _ingest_inference,
        "completion_fuzzy": _completion_fuzzy,
        "count_query": _count_query,
        "indices_boost": _indices_boost,
        "esql_lookup": _esql_lookup,
        "esql_mv_expand": _esql_mv_expand,
        "esql_row": _esql_row,
        "terminate_after": _terminate_after,
        "facet_terms_part": _facet_terms_part,
        "occ_upsert": _occ_upsert,
        "maxsim_topk": _maxsim_topk,
        "ann_topk_sim": _ann_topk_sim,
        "ilm_retention": _ilm_retention,
        "bm25_term_range": _bm25_term_range,
        "parent_id_children": _parent_id_children,
        "msearch_template": _msearch_template_row,
        "mixture_temperature": _mixture_temperature,
        "mixture_upsample": _mixture_upsample,
        "ccs_search": _ccs_search,
        "index_templates": _index_templates,
        "reindex_scripted": _reindex_scripted,
        "esql_enrich": _esql_enrich,
        "esql_sample": _esql_sample,
        "esql_stats_where": _esql_stats_where,
        "script_sort": _script_sort,
        "facet_hist_bounds": _facet_hist_bounds,
        "downsample": _downsample,
        "balanced_shards": _balanced_shards,
        "url_drift": _url_drift,
        "ngram_diversity": _ngram_diversity,
        "bm25_sayt": _bm25_sayt,
        "bm25_prefix_sayt": _bm25_prefix_sayt,
        "bm25_mbp_sayt": _mbp_sayt,
        "dsl_prefix_auto": _dsl_prefix_auto,
        "dsl_mbp_auto": _dsl_mbp_auto,
        "qs_prefix_auto": _qs_prefix_auto,
        "aggs_tree2": _aggs_tree2,
        "aggs_tree3": _aggs_tree3,
        "aggs_tree_pipe": _aggs_tree_pipe,
        "resp_hits_aggs": _resp_hits_aggs,
        "resp_hits_aggs_hits": _resp_hits_aggs_hits,
        "aggs_tree_knobs": _aggs_tree_knobs,
        "aggs_tree_serial": _aggs_tree_serial,
        "facet_hist_mdc0": _facet_hist_mdc0,
        "winnow_fps": _winnow_fps,
        "geo_polygon_holes": _geo_polygon_holes,
        "esql_categorize": _esql_categorize,
        "cluster_split": _cluster_split,
        "esql_match": _esql_match,
        "rule_query": _rule_query,
        "mtermvectors": _mtermvectors,
        "analyze_chain": _analyze_chain,
        "bloom_dedup": _bloom_dedup,
        "esql_from_multi": _esql_from_multi,
        "esql_bucket_time": _esql_bucket_time,
        "esql_bucket_num": _esql_bucket_num,
        "esql_inlinestats": _esql_inlinestats,
        "esql_fork": _esql_fork,
        "esql_change_point": _esql_change_point,
        "runtime_field": _runtime_field,
        "shrink_search": _shrink_search,
        "split_search": _split_search,
        "esql_fuse": _esql_fuse,
        "esql_fuse_linear": _esql_fuse_linear,
        "esql_bucket_auto": _esql_bucket_auto,
        "esql_kql_exists": _esql_kql_exists,
        "esql_scalar_funcs": _esql_scalar_funcs,
        "esql_date_funcs": _esql_date_funcs,
        "ann_topk_bbq": _ann_topk_bbq,
        "completion_ctx": _completion_ctx,
        "rank_eval_err": _rank_eval_err,
        "facet_moving_fn": _facet_moving_fn,
        "ccr_follow": _ccr_follow,
        "semdedup": _semdedup,
        "routed_search": _routed_search,
        "ingest_pipeline": _ingest_pipeline,
        "watcher_check": _watcher_check,
        "sorted_scan_topk": _sorted_scan_topk,
        "gopher_rules": _gopher_rules,
        "c4_filters": _c4_filters,
        "esql_rerank": _esql_rerank,
        "counter_rate": _counter_rate,
        "esql_ts": _esql_ts,
        "esql_ts_dims": _esql_ts_dims,
        "esql_scalar_funcs5": _esql_scalar_funcs5,
        "esql_date_funcs2": _esql_date_funcs2,
        "facet_random_sampler": _facet_random_sampler,
        "frequent_itemsets3": _frequent_itemsets3,
        "geo_shape_envelope": _geo_shape_envelope,
        "esql_scalar_funcs2": _esql_scalar_funcs2,
        "esql_scalar_funcs3": _esql_scalar_funcs3,
        "esql_scalar_funcs4": _esql_scalar_funcs4,
        "esql_stats_funcs2": _esql_stats_funcs2,
        "esql_convert_funcs": _esql_convert_funcs,
        "esql_qstr": _esql_qstr,
        "esql_kql": _esql_kql,
        "esql_match_phrase": _esql_match_phrase,
        "esql_math_funcs": _esql_math_funcs,
        "esql_mv_funcs2": _esql_mv_funcs2,
        "esql_spatial": _esql_spatial,
        "esql_spatial_rel": _esql_spatial_rel,
        "esql_spatial_agg": _esql_spatial_agg,
        "ingest_uri_parts": _ingest_uri_parts,
        "ingest_kv_json": _ingest_kv_json,
        "ingest_net_dir": _ingest_net_dir,
        "ingest_bytes_html": _ingest_bytes_html,
        "ingest_user_agent": _ingest_user_agent,
        "delete_by_query": _delete_by_query,
        "bm25_span_within": _bm25_span_within,
        "named_queries": _named_queries,
        "geo_grid_query": _geo_grid_query,
        "disk_usage": _disk_usage,
        "term_suggest_modes": _term_suggest_modes,
        "cat_segments": _cat_segments,
        "stored_script": _stored_script,
        "boilerplate_removal": _boilerplate_removal,
        "esql_like": _esql_like,
        "sigterms_bgfilter": _sigterms_bgfilter,
        "facet_terms_order": _facet_terms_order,
        "ltr_rescore": _ltr_rescore,
        "multi_match_phrase": _multi_match_phrase,
        "esql_agg_funcs": _esql_agg_funcs,
        "es_sql_query": _es_sql_query,
        "graph_explore": _graph_explore,
        "mlt_unlike": _mlt_unlike,
        "phrase_suggest_collate": _phrase_suggest_collate,
        "ilm_warm": _ilm_warm,
        "facet_filters_other": _facet_filters_other,
        "facet_terms_missing": _facet_terms_missing,
        "fertility_stats": _fertility_stats,
        "dsir_weights": _dsir_weights,
        "ccnet_buckets": _ccnet_buckets,
        "runtime_fields": _runtime_fields,
        "field_caps": _field_caps,
        "ann_topk_filtered": _ann_topk_filtered,
        "moving_fn_holt": _moving_fn_holt,
        "sigterms_mi": _sigterms_mi,
        "sigterms_chi2": _sigterms_chi2,
        "sigterms_gnd": _sigterms_gnd,
        "ndjson_scan": _ndjson_scan,
        "csv_scan": _csv_scan,
        "esql_completion": _esql_completion,
        "moving_fn_stats": _moving_fn_stats,
        "moving_fn_hw": _moving_fn_hw,
        "dedup_keepers": _dedup_keepers,
        "bigram_lm": _bigram_lm,
        "token_budget_plan": _token_budget_plan,
        "bm25_post_filter": _bm25_post_filter,
        "bm25_tracked": _bm25_tracked,
        "match_zero_all": _match_zero_all,
        "fields_fetch": _fields_fetch,
        "ann_multi_knn": _ann_multi_knn,
        "eql_head": _eql_head,
        "paragraph_dedup": _paragraph_dedup,
        "ict_pairs": _ict_pairs,
        "vocab_coverage": _vocab_coverage,
        "bm25_custom_sim": _bm25_custom_sim,
        "facet_hist_hard": _facet_hist_hard,
        "zipf_fit": _zipf_fit,
        "ann_nested_best": _ann_nested_best,
        "bm25_wildcard_tri": _bm25_wildcard_tri,
        "weighted_sample": _weighted_sample,
        "analyze_html": _analyze_html,
        "heaps_curve": _heaps_curve,
        "bpe_merges": _bpe_merges,
        "bpe_apply": _bpe_apply,
        "querystring_boost": _querystring_boost,
        "facet_terms_sharded": _facet_terms_sharded,
        "source_filtering": _source_filtering,
        "host_cap": _host_cap,
        "esql_knn": _esql_knn,
        "semantic_search": _semantic_search,
        "facet_ext_stats_bucket": _facet_ext_stats_bucket,
        "facet_terms_regex": _facet_terms_regex,
        "slm_retention": _slm_retention,
        "bulk_create": _bulk_create,
        "mlt_multi": _mlt_multi,
        "ingest_composed": _ingest_composed,
        "cached_search": _cached_search,
        "dsl_bool": _dsl_bool,
        "dsl_knn_hybrid": _dsl_knn_hybrid,
        "hybrid_semantic_rrf": _hybrid_semantic_rrf,
        "pii_luhn": _pii_luhn,
        "bm25_msm_filtered": _bm25_msm_filtered,
        "dsl_shaped": _dsl_shaped,
        "bm25_opt_should": _bm25_opt_should_query(_OPT_MUST, _OPT_CLAUSES, 0),
        "bm25_opt_should_msm": _bm25_opt_should_query(
            _OPTM_MUST, _OPTM_CLAUSES, 2
        ),
        "bm25_opt_should_filtered": _bm25_opt_should_filtered,
        "dsl_filter_should_default": _dsl_filter_should_default,
        "bm25_opt_should_phrase": _bm25_opt_should_phrase,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "bm25_and_all": _bm25_sql(["spark", "join"], "and", None),
        "bm25_and_topk": _bm25_sql(["query", "merge", "scan"], "and", 10),
        "bm25_or_all": _bm25_sql(["spark", "table"], "or", None),
        "bm25_single_term": _bm25_sql(["filter"], "and", None),
        "bm25_filtered": _bm25_sql(
            ["spark", "table"], "or", 10, where="doc_id % 3 = 0"
        ),
        "bm25_phrase": _bm25_phrase_sql(_PHRASE_TERMS),
        "bm25_phrase_groups": _bm25_phrase_groups_sql(_PHRASE_TERMS, "jo%"),
        "bm25_near": _bm25_near_sql(_NEAR_T1, _NEAR_T2, _NEAR_SLOP),
        "bm25_prefix": _bm25_sql([], "or", None, term_cond="term LIKE 's%'"),
        "bm25_wildcard": _bm25_sql(
            [], "or", None, term_cond="term LIKE 's_a%'"
        ),
        "bm25_fuzzy": _bm25_sql(
            [], "or", None, term_cond="levenshtein(term, 'grow') <= 2"
        ),
        "bm25_fuzzy_osa": _bm25_sql(
            [], "or", None,
            term_cond="damerau_levenshtein(term, 'spakr') <= 1",
        ),
        "bm25_fuzzy_auto": _bm25_sql(
            [], "or", None, term_cond="levenshtein(term, 'queryy') <= 2"
        ),
        "bm25_msm": _bm25_sql(_MSM_TERMS, "or", None, min_match=_MSM_M),
        "bm25_must_not": _bm25_sql(
            ["spark"], "and", None,
            where=(
                "doc_id NOT IN "
                "(SELECT DISTINCT doc_id FROM toks WHERE term = 'join')"
            ),
        ),
        "bm25_dismax": _bm25_dismax_sql(),
        "constant_score": _CONSTANT_SCORE_SQL,
        "function_score": _function_score_sql(),
        "term_suggest": _TERM_SUGGEST_SQL,
        "facet_terms_metrics": _FACET_TERMS_METRICS_SQL,
        "match_sorted": _MATCH_SORTED_SQL,
        "facet_composite": _FACET_COMPOSITE_SQL,
        "facet_filters": _FACET_FILTERS_SQL,
        "facet_terms_nested": _FACET_TERMS_NESTED_SQL,
        "facet_pipeline": _FACET_PIPELINE_SQL,
        "suggest_completion": _SUGGEST_COMPLETION_SQL,
        "multi_match_best": _multi_match_sql("best_fields"),
        "multi_match_most": _multi_match_sql("most_fields"),
        "multi_match_cross": _multi_match_cross_sql(),
        "ann_topk_rescore": _ANN_RESCORE_SQL,
        "ann_topk_mrl": _ANN_MRL_SQL,
        "percolate_filtered": _percolate_filtered_sql(),
        "eql_until": _EQL_UNTIL_SQL,
        "eql_sample": _EQL_SAMPLE_SQL,
        "eql_sequence3": _EQL_SEQ3_SQL,
        "hard_negatives": _hard_negatives_sql(),
        "esql_now": _ESQL_NOW_SQL,
        "facet_terms_other": _FACET_TERMS_OTHER_SQL,
        "analyze_chain2": _ANALYZE_CHAIN2_SQL,
        "span_corruption": OT.span_corruption_sql(),
        "fim_transform": OT.fim_transform_sql(),
        "curriculum_order": _CURRICULUM_SQL,
        "facet_normalize": _FACET_NORMALIZE_SQL,
        "script_score": _script_score_sql(),
        "random_score": _RANDOM_SCORE_SQL,
        "dedup_passages": _DEDUP_PASSAGES_SQL,
        "decontaminate": _DECONTAMINATE_SQL,
        "hybrid_rrf": _hybrid_rrf_sql(),
        "retriever_tree": _retriever_tree_sql(),
        "scroll_page3": _SCROLL_PAGE3_SQL,
        "ann_topk_prefilter": _ann_filtered_sql(),
        "phrase_suggest": _phrase_suggest_sql(),
        "index_stats": _INDEX_STATS_SQL,
        "bm25_boosting": _bm25_boosting_sql(),
        "bm25_span_first": _bm25_span_first_sql(),
        "bm25_span_not": _bm25_span_not_sql(),
        "explain_doc": _explain_doc_sql(),
        "termvectors_doc": _TERMVECTORS_SQL,
        "facet_ext_stats": _FACET_EXT_STATS_SQL,
        "facet_pct_ranks": _facet_pct_ranks_sql(),
        "facet_weighted_avg": _FACET_WAVG_SQL,
        "facet_rare_terms": _FACET_RARE_SQL,
        "facet_adjacency": _FACET_ADJ_SQL,
        "facet_geotile": _facet_geotile_sql(),
        "facet_auto_dh": _facet_auto_dh_sql(),
        "terms_set": _terms_set_sql(),
        "lucene_exists": _LUCENE_EXISTS_SQL,
        "ids_query": _IDS_SQL,
        "pinned_query": _pinned_sql(),
        "rank_feature": _RANK_FEATURE_SQL,
        "distance_feature": _DISTANCE_FEATURE_SQL,
        "match_bool_prefix": _MATCH_BOOL_PREFIX_SQL,
        "percolate": _percolate_sql(),
        "facet_missing": _FACET_MISSING_SQL,
        "facet_value_count": _FACET_VALUE_COUNT_SQL,
        "facet_global": _FACET_GLOBAL_SQL,
        "facet_boxplot": _FACET_BOXPLOT_SQL,
        "facet_string_stats": _FACET_STRING_STATS_SQL,
        "facet_t_test": _FACET_TTEST_SQL,
        "facet_rate": _FACET_RATE_SQL,
        "facet_geo_bounds": _FACET_GEO_BOUNDS_SQL,
        "facet_date_range": _facet_date_range_sql(),
        "facet_ip_range": _facet_ip_range_sql(),
        "facet_geohash": _facet_geohash_sql(),
        "facet_div_sampler": _FACET_DIV_SAMPLER_SQL,
        "facet_serial_diff": _FACET_SERIAL_DIFF_SQL,
        "facet_cum_card": _FACET_CUM_CARD_SQL,
        "facet_bucket_sort": _FACET_BUCKET_SORT_SQL,
        "facet_sig_text": _FACET_SIG_TEXT_SQL,
        "facet_vw_hist": _FACET_VWH_SQL,
        "bm25_span_or": _BM25_SPAN_OR_SQL,
        "span_near_multi": _span_near_multi_sql(),
        "span_field_masking": _SPAN_FIELD_MASKING_SQL,
        "bm25_span_containing": _BM25_SPAN_CONTAINING_SQL,
        "bm25_intervals": _bm25_intervals_sql(),
        "sqs_search": _SQS_SQL,
        "sqs_or": _SQS_OR_SQL,
        "pii_scrub": _pii_scrub_sql(),
        "combined_fields": _combined_fields_sql(),
        "geo_polygon": _geo_polygon_sql(),
        "url_dedup": _url_dedup_sql(),
        "dup_spans": _DUP_SPANS_SQL,
        "update_by_query": _UPDATE_BY_QUERY_SQL,
        "sigterms_jlh": _SIGTERMS_JLH_SQL,
        "has_child": _HAS_CHILD_SQL,
        "has_parent": _HAS_PARENT_SQL,
        "nested_match": _nested_match_sql(),
        "facet_moving_pct": _FACET_MOVING_PCT_SQL,
        "match_sorted_page2": _MATCH_SORTED_PAGE2_SQL,
        "hybrid_linear": _hybrid_linear_sql(),
        "facet_scripted": _FACET_SCRIPTED_SQL,
        "msearch": _msearch_sql(),
        "mget_docs": _MGET_SQL,
        "terms_lookup": _TERMS_LOOKUP_SQL,
        "script_filter": _SCRIPT_FILTER_SQL,
        "wrapper_query": _QS_SQL,
        "rank_eval": _rank_eval_sql(),
        "sparse_vector": _sparse_vector_sql(),
        "sparse_vector_pruned": _sparse_vector_pruned_sql(),
        "sparse_rescore_pruned": _sparse_rescore_pruned_sql(),
        "dsl_script_fields": _dsl_script_fields_sql(),
        "nested_maxp": _nested_maxp_sql(),
        "nested_inner_hits": _nested_inner_hits_sql(),
        "dsl_rank_rrf": _dsl_rank_rrf_sql(),
        "alias_search": _ALIAS_SQL,
        "reindex_search": _REINDEX_SQL,
        "facet_sibling": _FACET_SIBLING_SQL,
        "facet_ip_prefix": _facet_ip_prefix_sql(),
        "facet_children": _FACET_CHILDREN_SQL,
        "facet_reverse_nested": _FACET_REVERSE_NESTED_SQL,
        "categorize_text": _CATEGORIZE_SQL,
        "change_point": _CHANGE_POINT_SQL,
        "anomaly_mad": _ANOMALY_MAD_SQL,
        "bpe_pairs": OT.bpe_pair_counts_sql(20),
        "filter_sweep": OT.filter_sweep_sql(_SWEEP_TS),
        "geo_line": _GEO_LINE_SQL,
        "frequent_pairs": _FREQ_PAIRS_SQL,
        "dedup_keep_best": _dedup_keep_best_sql(),
        "mixture_sample": _mixture_sample_sql(),
        "ann_topk_int8": _ANN_INT8_SQL,
        "pit_search": _PIT_SQL,
        "span_multi_containing": _SPAN_MULTI_SQL,
        "collapse_inner": _COLLAPSE_IH_SQL,
        "terms_enum": _TERMS_ENUM_SQL,
        "search_template": _QS_SQL,
        "min_score_search": _MIN_SCORE_SQL,
        "doc_chunks": _DOC_CHUNKS_SQL,
        "dedup_incremental": _dedup_incremental_sql(),
        "facet_pct_bucket": _FACET_PCT_BUCKET_SQL,
        "qs_multi_field": _qs_multi_field_sql(),
        "corpus_accounting": _corpus_accounting_sql(),
        "bm25_phrase_filtered": _bm25_phrase_filtered_sql(),
        "facet_matrix_stats": _FACET_MATRIX_SQL,
        "facet_mad": _FACET_MAD_SQL,
        "facet_multi_terms": _FACET_MULTI_TERMS_SQL,
        "facet_top_metrics": _FACET_TOP_METRICS_SQL,
        "facet_geo_dist": _facet_geo_dist_sql(),
        "facet_geo_centroid": _FACET_GEO_CENTROID_SQL,
        "facet_sampler": _FACET_SAMPLER_SQL,
        "facet_bucket_script": _FACET_BSCRIPT_SQL,
        "bm25_boosted": _bm25_sql(
            _BOOST_TERMS, "or", None,
            boost_case="CASE WHEN tf.term = 'spark' THEN 2.5 ELSE 1.0 END",
        ),
        "bm25_regexp": _bm25_sql(
            [], "or", None,
            term_cond=f"regexp_full_match(term, '{_REGEXP_PAT}')",
        ),
        "bm25_rescore": _bm25_rescore_sql(),
        "bm25_phrase_prefix": _bm25_phrase_prefix_sql(),
        "search_after_page2": _bm25_sql(_AFTER_TERMS, "or", 10, offset=10),
        "more_like_this": _more_like_this_sql(),
        "facet_terms": _FACET_TERMS_SQL,
        "facet_histogram": _FACET_HIST_SQL,
        "facet_top_hits": _facet_top_hits_sql(),
        "facet_date_hist": _FACET_DATE_HIST_SQL,
        "facet_range": _FACET_RANGE_SQL,
        "facet_stats": _FACET_STATS_SQL,
        "facet_percentiles": _facet_percentiles_sql(),
        "facet_cardinality": _FACET_CARD_SQL,
        "collapse_topk": _collapse_topk_sql(),
        "repetition_stats": _repetition_stats_sql(),
        "querystring_search": _QS_SQL,
        "querystring_or": _QS_OR_SQL,
        "significant_terms": _SIGTERMS_SQL,
        "highlight": _highlight_sql(),
        "highlight_frags": _highlight_frags_sql(),
        "bm25_after_delete": _bm25_sql(
            ["spark", "join"], "or", None, where=_DELETE_PRED_SQL
        ),
        "bm25_materialize": f"""
WITH topk AS ({_bm25_sql(["spark", "join"], "and", 10)})
SELECT doc_id, score, lang, n_chars
FROM topk JOIN documents USING (doc_id)
""",
        "date_sort_topk": (
            "SELECT event_id, ts FROM events "
            "ORDER BY ts ASC, event_id ASC LIMIT 25"
        ),
        "term_count": (
            "SELECT count(*)::BIGINT AS cnt FROM documents "
            "WHERE list_contains(string_split(text, ' '), 'spark')"
        ),
        "date_range_scan": (
            "SELECT event_id, ts, event_type FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-05 00:00:00'"
        ),
        "minmax_dates": "SELECT min(ts) AS min_ts, max(ts) AS max_ts FROM events",
        "slice_histogram": (
            "SELECT date_trunc('hour', ts) AS bucket, count(*) AS cnt FROM events GROUP BY 1"
        ),
        "id_prefix_scan": (
            "SELECT doc_id, md5(doc_id::VARCHAR) AS doc_key FROM documents "
            "WHERE md5(doc_id::VARCHAR) LIKE 'a%'"
        ),
        "id_prefix_histogram": (
            "SELECT substr(md5(doc_id::VARCHAR), 1, 1) AS prefix, count(*) AS cnt "
            "FROM documents GROUP BY 1"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, "
            "count(*) AS n_copies FROM documents GROUP BY 1"
        ),
        "dedup_ngram_pairs": _NGRAM_PAIRS_SQL,
        "minhash_sigs": _MINHASH_SQL,
        "lsh_candidates": _LSH_SQL,
        "lsh_verified": _lsh_verified_sql(),
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "simhash_fps": _SIMHASH_SQL,
        "simhash_pairs": _SIMHASH_PAIRS_SQL,
        "simhash_pairs60": _SIMHASH_PAIRS60_SQL,
        "emb_neardup": _EMB_NEARDUP_SQL,
        "ann_topk": _ANN_TOPK_SQL,
        "ann_topk_lsh": _ANN_LSH_SQL,
        "token_stats": _TOKEN_STATS_SQL,
        "quality_score": _QUALITY_SQL,
        "lang_id": OT.lang_id_sql(),
        "doc_fingerprint": OT.doc_fingerprint_sql(),
        "media_stats": _MEDIA_STATS_SQL,
        "enrich_join": _ENRICH_SQL,
        "stream_running_stats": _STREAM_STATS_SQL,
        "stream_windowed_counts": (
            "SELECT date_trunc('hour', ts) AS win_start, count(*) AS cnt "
            "FROM events GROUP BY 1"
        ),
        "geo_bbox": _GEO_BBOX_SQL,
        "geo_distance": _GEO_DIST_SQL,
        "geo_sort_topk": _GEO_SORT_SQL,
        "lucene_filter": _LUCENE_SQL,
        "timeseries_index": _TIMESERIES_SQL,
        "bulk_route": _BULK_ROUTE_SQL,
        "scripted_upsert": _SCRIPTED_UPSERT_SQL,
        "sliced_scan": _sliced_scan_sql(),
        "transform_latest": _TRANSFORM_LATEST_SQL,
        "transform_pivot": _TRANSFORM_PIVOT_SQL,
        "rollover_plan": _ROLLOVER_SQL,
        "snapshot_restore": _SNAPSHOT_RESTORE_SQL,
        "decay_gauss": _decay_gauss_sql(),
        "bm25_span_near3": _bm25_span_near3_sql(),
        "synonym_search": _SYNONYM_SQL,
        "eql_sequence": _EQL_SQL,
        "bucket_corr": _BUCKET_CORR_SQL,
        "knn_outliers": _KNN_OUTLIERS_SQL,
        "unigram_lm": _unigram_lm_sql(),
        "hash_classifier": _hash_classifier_sql(),
        "emb_lsh_neardup": _emb_lsh_neardup_sql(),
        "facet_parent": _FACET_PARENT_SQL,
        "facet_ks_test": _FACET_KS_SQL,
        "dup_span_removal": _DUP_REMOVAL_SQL,
        "normalized_text": OT.normalize_text_sql(),
        "bm25_stemmed": _bm25_stemmed_sql(),
        "packed_docs": _PACKED_SQL,
        "esql_stats": _ESQL_STATS_SQL,
        "esql_rowpipe": _ESQL_ROW_SQL,
        "esql_grok": _esql_grok_sql(),
        "esql_dissect": _esql_dissect_sql(),
        "esql_dissect2": _esql_dissect2_sql(),
        "esql_dissect3": _ESQL_DISSECT3_SQL,
        "esql_rlike": _ESQL_RLIKE_SQL,
        "esql_enrich_range": _ESQL_ENRICH_RANGE_SQL,
        "esql_enrich_geo": _ESQL_ENRICH_GEO_SQL,
        "ingest_foreach": _INGEST_FOREACH_SQL,
        "url_quality": _url_quality_sql(),
        "esql_mv_funcs3": _ESQL_MV_FUNCS3_SQL,
        "esql_metadata_index": _ESQL_METADATA_INDEX_SQL,
        "ingest_inference": _ingest_inference_sql(),
        "completion_fuzzy": _COMPLETION_FUZZY_SQL,
        "count_query": _COUNT_QUERY_SQL,
        "indices_boost": _indices_boost_sql(),
        "esql_lookup": _ESQL_LOOKUP_SQL,
        "esql_mv_expand": _ESQL_MV_SQL,
        "esql_row": _ESQL_ROW_LIT_SQL,
        "terminate_after": _terminate_after_sql(),
        "facet_terms_part": _facet_terms_part_sql(),
        "occ_upsert": _OCC_SQL,
        "maxsim_topk": _maxsim_sql(),
        "ann_topk_sim": _ann_topk_sim_sql(),
        "ilm_retention": _ilm_retention_sql(),
        "bm25_term_range": _TERM_RANGE_SQL,
        "parent_id_children": _PARENT_ID_SQL,
        "msearch_template": _msearch_template_sql(),
        "mixture_temperature": _mixture_temperature_sql(),
        "mixture_upsample": _mixture_upsample_sql(),
        "ccs_search": _ccs_sql(),
        "index_templates": _index_templates_sql(),
        "reindex_scripted": _REINDEX_SCRIPTED_SQL,
        "esql_enrich": _ESQL_ENRICH_SQL,
        "esql_sample": _esql_sample_sql(),
        "esql_stats_where": _ESQL_STATS_WHERE_SQL,
        "script_sort": _SCRIPT_SORT_SQL,
        "facet_hist_bounds": _FACET_HIST_BOUNDS_SQL,
        "downsample": _DOWNSAMPLE_SQL,
        "balanced_shards": _balanced_shards_sql(),
        "url_drift": _url_drift_sql(),
        "ngram_diversity": _ngram_diversity_sql(),
        "bm25_sayt": _bm25_sayt_sql(),
        "bm25_prefix_sayt": _bm25_sayt_sql("que"),
        "bm25_mbp_sayt": _mbp_sayt_sql(),
        "dsl_prefix_auto": _bm25_sayt_sql("que"),
        "dsl_mbp_auto": _mbp_sayt_sql(),
        "qs_prefix_auto": _bm25_sayt_sql("que"),
        "aggs_tree2": _AGGS_TREE2_SQL,
        "aggs_tree3": _AGGS_TREE3_SQL,
        "aggs_tree_pipe": _AGGS_TREE_PIPE_SQL,
        "resp_hits_aggs": _RESP_HITS_AGGS_SQL,
        "resp_hits_aggs_hits": _bm25_sql(["spark"], "and", 10),
        "aggs_tree_knobs": _AGGS_TREE_KNOBS_SQL,
        "aggs_tree_serial": _AGGS_TREE_SERIAL_SQL,
        "facet_hist_mdc0": _FACET_HIST_MDC0_SQL,
        "winnow_fps": _winnow_sql(),
        "geo_polygon_holes": _geo_polygon_holes_sql(),
        "esql_categorize": _ESQL_CATEGORIZE_SQL,
        "cluster_split": _cluster_split_sql(),
        "esql_match": _ESQL_MATCH_SQL,
        "rule_query": _rule_query_sql(),
        "mtermvectors": _MTERMVECTORS_SQL,
        "analyze_chain": _analyze_chain_sql(),
        "bloom_dedup": _BLOOM_DEDUP_SQL,
        "esql_from_multi": _ESQL_FROM_MULTI_SQL,
        "esql_bucket_time": _ESQL_BUCKET_TIME_SQL,
        "esql_bucket_num": _ESQL_BUCKET_NUM_SQL,
        "esql_inlinestats": _ESQL_INLINESTATS_SQL,
        "esql_fork": _ESQL_FORK_SQL,
        "esql_change_point": _ESQL_CHANGE_POINT_SQL,
        "runtime_field": _RUNTIME_FIELD_SQL,
        "shrink_search": _SHRINK_SEARCH_SQL,
        "split_search": _split_search_sql(),
        "esql_fuse": _ESQL_FUSE_SQL,
        "esql_fuse_linear": _ESQL_FUSE_LINEAR_SQL,
        "esql_bucket_auto": _ESQL_BUCKET_AUTO_SQL,
        "esql_kql_exists": _ESQL_KQL_EXISTS_SQL,
        "esql_scalar_funcs": _ESQL_SCALAR_FUNCS_SQL,
        "esql_date_funcs": _ESQL_DATE_FUNCS_SQL,
        "ann_topk_bbq": _ann_topk_bbq_sql(),
        "completion_ctx": _completion_ctx_sql(),
        "rank_eval_err": _rank_eval_err_sql(),
        "facet_moving_fn": _FACET_MOVING_FN_SQL,
        "ccr_follow": _CCR_FOLLOW_SQL,
        "routed_search": _routed_search_sql(),
        "ingest_pipeline": _INGEST_PIPELINE_SQL,
        "watcher_check": _WATCHER_CHECK_SQL,
        "sorted_scan_topk": _SORTED_SCAN_TOPK_SQL,
        "gopher_rules": _GOPHER_RULES_SQL,
        "c4_filters": _C4_FILTERS_SQL,
        "esql_rerank": _esql_rerank_sql(),
        "counter_rate": _COUNTER_RATE_SQL,
        "esql_ts": _ESQL_TS_SQL,
        "esql_ts_dims": _ESQL_TS_DIMS_SQL,
        "esql_scalar_funcs5": _ESQL_SCALAR_FUNCS5_SQL,
        "esql_date_funcs2": _ESQL_DATE_FUNCS2_SQL,
        "facet_random_sampler": _FACET_RANDOM_SAMPLER_SQL,
        "frequent_itemsets3": _FREQ_ITEMSETS3_SQL,
        "geo_shape_envelope": _geo_shape_envelope_sql(),
        "esql_scalar_funcs2": _ESQL_SCALAR_FUNCS2_SQL,
        "esql_scalar_funcs3": _ESQL_SCALAR_FUNCS3_SQL,
        "esql_scalar_funcs4": _ESQL_SCALAR_FUNCS4_SQL,
        "esql_stats_funcs2": _ESQL_STATS_FUNCS2_SQL,
        "esql_convert_funcs": _ESQL_CONVERT_FUNCS_SQL,
        "esql_qstr": _ESQL_QSTR_SQL,
        "esql_kql": _ESQL_KQL_SQL,
        "esql_match_phrase": _ESQL_MATCH_PHRASE_SQL,
        "esql_math_funcs": _ESQL_MATH_FUNCS_SQL,
        "esql_mv_funcs2": _ESQL_MV_FUNCS2_SQL,
        "esql_spatial": _esql_spatial_sql(),
        "esql_spatial_rel": _ESQL_SPATIAL_REL_SQL,
        "esql_spatial_agg": _ESQL_SPATIAL_AGG_SQL,
        "ingest_uri_parts": _INGEST_URI_PARTS_SQL,
        "ingest_kv_json": _INGEST_KV_JSON_SQL,
        "ingest_net_dir": _INGEST_NET_DIR_SQL,
        "ingest_bytes_html": _INGEST_BYTES_HTML_SQL,
        "ingest_user_agent": _ingest_user_agent_sql(),
        "delete_by_query": _DELETE_BY_QUERY_SQL,
        "bm25_span_within": _BM25_SPAN_WITHIN_SQL,
        "named_queries": _named_queries_sql(),
        "geo_grid_query": _geo_grid_query_sql(),
        "disk_usage": _DISK_USAGE_SQL,
        "term_suggest_modes": _TERM_SUGGEST_MODES_SQL,
        "cat_segments": _CAT_SEGMENTS_SQL,
        "stored_script": _STORED_SCRIPT_SQL,
        "boilerplate_removal": _BOILERPLATE_REMOVAL_SQL,
        "esql_like": _ESQL_LIKE_SQL,
        "sigterms_bgfilter": _SIGTERMS_BGFILTER_SQL,
        "facet_terms_order": _FACET_TERMS_ORDER_SQL,
        "ltr_rescore": _ltr_rescore_sql(),
        "multi_match_phrase": _multi_match_phrase_sql(),
        "esql_agg_funcs": _ESQL_AGG_FUNCS_SQL,
        "es_sql_query": _es_sql_query_sql(),
        "graph_explore": _graph_explore_sql(),
        "mlt_unlike": _mlt_unlike_sql(),
        "phrase_suggest_collate": _phrase_suggest_collate_sql(),
        "ilm_warm": _ILM_WARM_SQL,
        "facet_filters_other": _FACET_FILTERS_OTHER_SQL,
        "facet_terms_missing": _FACET_TERMS_MISSING_SQL,
        "fertility_stats": _fertility_stats_sql(),
        "dsir_weights": _dsir_weights_sql(),
        "ccnet_buckets": OT.ccnet_buckets_sql(),
        "runtime_fields": _RUNTIME_FIELDS_SQL,
        "field_caps": _FIELD_CAPS_SQL,
        "ann_topk_filtered": _ANN_TOPK_FILTERED_SQL,
        "moving_fn_holt": _MOVING_FN_HOLT_SQL,
        "sigterms_mi": _SIGTERMS_MI_SQL,
        "sigterms_chi2": _SIGTERMS_CHI2_SQL,
        "sigterms_gnd": _SIGTERMS_GND_SQL,
        "ndjson_scan": _NDJSON_SCAN_SQL,
        "csv_scan": _CSV_SCAN_SQL,
        "esql_completion": _ESQL_COMPLETION_SQL,
        "moving_fn_stats": _MOVING_FN_STATS_SQL,
        "moving_fn_hw": _hw_oracle_sql(),
        "dedup_keepers": _DEDUP_KEEPERS_SQL,
        "bigram_lm": _bigram_lm_sql(),
        "token_budget_plan": _token_budget_plan_sql(),
        "bm25_post_filter": _bm25_post_filter_sql(),
        "bm25_tracked": _bm25_tracked_sql(),
        "match_zero_all": _MATCH_ZERO_ALL_SQL,
        "fields_fetch": _fields_fetch_sql(),
        "ann_multi_knn": _ann_multi_knn_sql(),
        "eql_head": _EQL_HEAD_SQL,
        "paragraph_dedup": _PARAGRAPH_DEDUP_SQL,
        "ict_pairs": _ICT_PAIRS_SQL,
        "vocab_coverage": _vocab_coverage_sql(),
        "bm25_custom_sim": _bm25_custom_sim_sql(),
        "facet_hist_hard": _FACET_HIST_HARD_SQL,
        "zipf_fit": _zipf_fit_sql(),
        "ann_nested_best": _ann_nested_best_sql(),
        "bm25_wildcard_tri": _bm25_sql(
            [], "or", None, term_cond="term LIKE '%ark%'"
        ),
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "analyze_html": _analyze_html_sql(),
        "heaps_curve": _heaps_curve_sql(),
        "pii_luhn": _pii_luhn_sql(),
    }
    ivf = _ann_ivf_sql()
    if ivf is not None:  # oracle tables unavailable -> rows-only check
        out["ann_topk_ivf"] = ivf
    sdd = _semdedup_sql()
    if sdd is not None:
        out["semdedup"] = sdd
    for name, sql in (
        ("bpe_merges", _bpe_merges_sql()),
        ("bpe_apply", _bpe_apply_sql()),
    ):
        if sql is not None:
            out[name] = sql
    out["querystring_boost"] = _QS_BOOST_SQL
    out["facet_terms_sharded"] = _FACET_SHARDED_SQL
    out["source_filtering"] = _SOURCE_FILTER_SQL
    out["host_cap"] = _host_cap_sql()
    out["esql_knn"] = _ESQL_KNN_SQL
    out["semantic_search"] = _semantic_search_sql()
    out["facet_ext_stats_bucket"] = _FACET_EXT_STATS_BUCKET_SQL
    out["facet_terms_regex"] = _FACET_TERMS_REGEX_SQL
    out["slm_retention"] = _SLM_SQL
    out["bulk_create"] = _BULK_CREATE_SQL
    out["mlt_multi"] = _mlt_multi_sql()
    out["ingest_composed"] = _INGEST_COMPOSED_SQL
    out["cached_search"] = _CACHED_SEARCH_SQL
    out["dsl_bool"] = _DSL_BOOL_SQL
    out["dsl_knn_hybrid"] = _dsl_knn_hybrid_sql()
    out["hybrid_semantic_rrf"] = _hybrid_semantic_rrf_sql()
    out["bm25_msm_filtered"] = _bm25_sql(
        _MSM_TERMS, "or", None, where="doc_id % 3 = 0", min_match=_MSM_M
    )
    out["dsl_shaped"] = _dsl_shaped_sql()
    out["bm25_opt_should"] = _bm25_opt_should_sql(_OPT_MUST, _OPT_CLAUSES)
    out["bm25_opt_should_msm"] = _bm25_opt_should_sql(
        _OPTM_MUST, _OPTM_CLAUSES, msm=2
    )
    out["bm25_opt_should_filtered"] = _bm25_opt_should_sql(
        _OPT_MUST, _OPT_CLAUSES, msm=1, where="doc_id % 3 = 0"
    )
    out["dsl_filter_should_default"] = _DSL_FILTER_SHOULD_SQL
    out["bm25_opt_should_phrase"] = _bm25_opt_should_phrase_sql()
    return out
