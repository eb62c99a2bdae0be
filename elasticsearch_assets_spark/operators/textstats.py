"""Text-analysis operators: token stats, quality score, language ID,
document fingerprint.

All pure column expressions over the shared tokenizer contract
(texthash.tokens_expr) — JVM-side, zero shuffle, exact DuckDB oracle
spellings provided next to each. The reference has no analysis code of its
own (it delegates to ES analyzers); these are the training-data-pipeline
extensions over the same documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from elasticsearch_assets_spark.operators.texthash import tokens_expr, tokens_sql

# tiny per-language marker lexicons (heuristic n-gram-free language ID —
# stopword hits; deterministic, SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
    "zh": ["de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"],
}

_EN_STOPWORDS = LANG_MARKERS["en"]


# ---------------------------------------------------------------------------
# token stats
# ---------------------------------------------------------------------------


def token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id[, extra_cols...], n_tokens, n_unique, avg_token_len,
    stopword_ratio).

    The token array is staged in its own projection so the regex extraction
    runs once per row, not once per derived stat. `extra_cols` pass through
    untouched — downstream groupings (corpus_accounting) stay on the ONE
    reading scan instead of joining stats back to the corpus."""
    keep = [F.col(c) for c in extra_cols]
    df = df.select(F.col(id_col), *keep, tokens_expr(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_EN_STOPWORDS))
    )
    return df.select(
        F.col(id_col),
        *keep,
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.when(n > 0, total_len / n).otherwise(F.lit(0.0)).alias("avg_token_len"),
        F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0)).alias("stopword_ratio"),
    )


def token_stats_sql(text: str = "text", id_col: str = "doc_id") -> str:
    toks = tokens_sql(text)
    stops = ", ".join(f"'{w}'" for w in _EN_STOPWORDS)
    return f"""
SELECT {id_col},
       len(t)::BIGINT AS n_tokens,
       len(list_distinct(t))::BIGINT AS n_unique,
       CASE WHEN len(t) > 0
            THEN list_sum(list_apply(t, x -> length(x)))::DOUBLE / len(t)
            ELSE 0.0 END AS avg_token_len,
       CASE WHEN len(t) > 0
            THEN len(list_filter(t, x -> list_contains([{stops}], x)))::DOUBLE / len(t)
            ELSE 0.0 END AS stopword_ratio
FROM (SELECT {id_col}, {toks} AS t FROM documents)
"""


# ---------------------------------------------------------------------------
# quality score
# ---------------------------------------------------------------------------


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic [0,1] quality: length band + lexical diversity + stopword
    presence — the standard cheap pre-filter shape for web-text pipelines.

    score = 0.4*min(n_tokens/100, 1) + 0.3*(n_unique/n_tokens)
          + 0.3*min(stopword_ratio*5, 1);  0 for empty docs.
    """
    s = token_stats(df, text_col, id_col)
    return s.select(F.col(id_col), _quality_expr().alias("quality"))


def _quality_expr() -> "F.Column":
    """The quality formula over token_stats' output columns — one
    definition shared by quality_score and corpus_accounting (which
    inlines it on the same scan instead of joining)."""
    n = F.col("n_tokens")
    return (
        F.when(
            n > 0,
            F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
            + F.lit(0.3) * (F.col("n_unique") / n)
            + F.lit(0.3) * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)),
        ).otherwise(F.lit(0.0))
    )


def quality_score_sql(text: str = "text", id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col},
       CASE WHEN n_tokens > 0 THEN
         0.4::DOUBLE * least(n_tokens / 100.0::DOUBLE, 1.0::DOUBLE)
         + 0.3::DOUBLE * (n_unique::DOUBLE / n_tokens)
         + 0.3::DOUBLE * least(stopword_ratio * 5.0::DOUBLE, 1.0::DOUBLE)
       ELSE 0.0::DOUBLE END AS quality
FROM ({token_stats_sql(text, id_col)})
"""


# ---------------------------------------------------------------------------
# language ID
# ---------------------------------------------------------------------------


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, lang_hits): argmax of marker-lexicon hit counts with
    deterministic tie-break on language code; 'und' when zero hits."""
    staged = df.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    toks = F.col("__toks")
    langs = sorted(LANG_MARKERS)
    hit_cols = [
        F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang]))).alias(lang)
        for lang in langs
    ]
    scored = staged.select(F.col(id_col), *hit_cols)
    best = F.greatest(*[F.col(lang) for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first (alphabetical) max wins — deterministic
        pred = pred.when(F.col(lang) == best, F.lit(lang))
    # hit columns are computed in `scored`'s projection; this second select
    # only compares them
    return scored.select(
        F.col(id_col), pred.alias("pred_lang"), best.cast("long").alias("lang_hits")
    )


def lang_id_sql(text: str = "text", id_col: str = "doc_id") -> str:
    toks = tokens_sql(text)
    langs = sorted(LANG_MARKERS)
    hits = ", ".join(
        "len(list_filter(t, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        + f"], x))) AS {lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(langs) + ")"
    whens = " ".join(
        f"WHEN {lang} = {best} THEN '{lang}'" for lang in langs
    )
    return f"""
SELECT {id_col},
       CASE WHEN {best} <= 0 THEN 'und' {whens} END AS pred_lang,
       {best}::BIGINT AS lang_hits
FROM (SELECT {id_col}, {hits}
      FROM (SELECT {id_col}, {toks} AS t FROM documents))
"""


# ---------------------------------------------------------------------------
# within-doc repetition (Gopher-style repetition filters)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText-style
    duplicate-n-gram filters (Rae et al. 2021, §A1.1) over bigrams:

      n_bigrams        total bigram occurrences (n_tokens - 1)
      n_unique_bigrams distinct bigrams
      dup_bigram_frac  1 - distinct/total   (0 for docs with < 2 tokens)
      top_bigram_share most frequent bigram's share of all occurrences

    Pure JVM column expressions, zero shuffle: bigrams via transform over
    the staged token array, then ONE O(n) pass over the sorted array with
    an `aggregate` accumulator counting runs (distinct = run starts,
    top count = longest run) — no per-doc quadratic filter, no explode."""
    staged = df.select(
        F.col(id_col), tokens_expr(text_col).alias("__toks")
    ).select(
        F.col(id_col),
        F.when(
            F.size("__toks") >= 2,
            F.expr(
                "transform(sequence(0, size(__toks) - 2),"
                " i -> concat(__toks[i], ' ', __toks[i + 1]))"
            ),
        )
        .otherwise(F.expr("array()"))
        .alias("__bg"),
    )
    runs = F.expr(
        """
        aggregate(
          array_sort(__bg),
          named_struct('prev', cast(null as string),
                       'run', 0L, 'maxrun', 0L, 'uniq', 0L),
          (acc, x) -> named_struct(
            'prev', x,
            'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
            'maxrun', greatest(acc.maxrun,
                               IF(x <=> acc.prev, acc.run + 1L, 1L)),
            'uniq', acc.uniq + IF(x <=> acc.prev, 0L, 1L)),
          acc -> named_struct('maxrun', acc.maxrun, 'uniq', acc.uniq))
        """
    )
    total = F.size("__bg").cast("long")
    out = staged.select(
        F.col(id_col), total.alias("n_bigrams"), runs.alias("__r")
    ).select(
        F.col(id_col),
        "n_bigrams",
        F.col("__r.uniq").alias("n_unique_bigrams"),
        F.when(
            F.col("n_bigrams") > 0,
            1.0 - F.col("__r.uniq") / F.col("n_bigrams"),
        ).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
        F.when(
            F.col("n_bigrams") > 0, F.col("__r.maxrun") / F.col("n_bigrams")
        ).otherwise(F.lit(0.0)).alias("top_bigram_share"),
    )
    return out


def repetition_stats_sql(text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin: bigrams via list_transform + unnest, counts via
    group-by (the oracle may shuffle; the engine side must not)."""
    toks = tokens_sql(text)
    return f"""
WITH t AS (SELECT {id_col}, {toks} AS tk FROM documents),
b AS (SELECT {id_col},
             list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1]) AS bg
      FROM t),
e AS (SELECT {id_col}, unnest(bg) AS g FROM b),
c AS (SELECT {id_col}, g, count(*) AS cnt FROM e GROUP BY 1, 2),
a AS (SELECT {id_col}, sum(cnt) AS total, count(*) AS uniq, max(cnt) AS top
      FROM c GROUP BY 1)
SELECT d.{id_col},
       coalesce(a.total, 0)::BIGINT AS n_bigrams,
       coalesce(a.uniq, 0)::BIGINT AS n_unique_bigrams,
       CASE WHEN a.total > 0 THEN 1 - a.uniq / a.total::DOUBLE
            ELSE 0.0 END AS dup_bigram_frac,
       CASE WHEN a.total > 0 THEN a.top / a.total::DOUBLE
            ELSE 0.0 END AS top_bigram_share
FROM documents d LEFT JOIN a USING ({id_col})
"""


# ---------------------------------------------------------------------------
# fingerprint
# ---------------------------------------------------------------------------


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized content fingerprint: md5 over the sorted unique token set
    (the classic 'fingerprint method' — whitespace/order/dup insensitive)."""
    toks = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias(
            "fingerprint"
        ),
    )


def doc_fingerprint_sql(text: str = "text", id_col: str = "doc_id") -> str:
    toks = tokens_sql(text)
    return (
        f"SELECT {id_col}, md5(array_to_string(list_sort(list_distinct({toks})), ' ')) "
        f"AS fingerprint FROM documents"
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data-pipeline extension)
# ---------------------------------------------------------------------------

# One pattern dialect, two engines: Java regex (Spark) and RE2 (DuckDB)
# agree on these constructs (char classes, bounded repeats, \b, \d) —
# no lookarounds, no backrefs. Replacement ORDER is part of the contract
# (earlier categories consume their text before later ones scan).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection + redaction: per doc, the match count per category
    (email / SSN / phone / IPv4) and the text with every match replaced
    by its placeholder, applied in PII_PATTERNS order.

    Pure JVM regexp column expressions (regexp_count + chained
    regexp_replace) — zero shuffle, scales as a map-only pass; the
    patterns are the standard scrubbing set a C4/CCNet-style pipeline
    applies before training."""
    cols = [F.col(id_col)]
    cur = F.col(text_col)
    for name, pat, _ in PII_PATTERNS:
        cols.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
    for _, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    cols.append(cur.alias("clean_text"))
    return df.select(*cols)


def pii_scrub_sql(text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of pii_scrub (RE2 spelling of the same patterns)."""
    counts = ", ".join(
        f"len(regexp_extract_all({text}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    cur = text
    for _, pat, repl in PII_PATTERNS:
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return f"SELECT {id_col}, {counts}, {cur} AS clean_text FROM documents"


def chunk_documents(
    df: DataFrame,
    window: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    `window`-token chunks every `stride` tokens (overlap = window −
    stride; stride defaults to window = disjoint chunks) — the standard
    segmentation step before embedding or sequence training, where models
    consume fixed-length windows of a long document.

    Plan: one JVM sequence→transform→posexplode over the token array —
    no Python, no shuffle; output rows ≈ tokens/stride per doc, each
    carrying (doc_id, chunk_id, n_tokens, chunk_text). The final
    (possibly short) chunk is kept — training pipelines pad it; filter
    `n_tokens == window` for strict fixed-length units."""
    if window < 1:
        raise ValueError("window must be >= 1")
    stride = window if stride is None else stride
    if not (1 <= stride <= window):
        raise ValueError("stride must be in 1..window")
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, window))
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_toks")
    ).select(
        id_col,
        "chunk_id",
        F.size("_toks").alias("n_tokens"),
        F.concat_ws(" ", "_toks").alias("chunk_text"),
    )


def corpus_accounting(
    df: DataFrame,
    strata_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus accounting for training-mixture design: per stratum (e.g.
    language × source) — document count, total/mean token counts, and
    mean quality score. This is the table mixture weights are sized FROM
    (how many tokens does each slice actually hold?) before
    sampling.stratified_sample applies them.

    Plan: the per-doc stats AND the quality formula are column
    expressions on the ONE reading scan (token_stats with strata
    passthrough — no join back to the corpus), then ONE hash agg on the
    strata key (map-side partials; strata cardinality is tiny). Returns
    (strata..., n_docs, total_tokens, avg_tokens, avg_quality),
    strata ASC."""
    per_doc = token_stats(
        df, text_col, id_col, extra_cols=tuple(strata_cols)
    ).withColumn("quality", _quality_expr())
    return (
        per_doc.groupBy(*strata_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("n_tokens").alias("avg_tokens"),
            F.avg("quality").alias("avg_quality"),
        )
        .orderBy(*[F.col(c).asc() for c in strata_cols])
    )


# ---------------------------------------------------------------------------
# corpus-LM quality + hashed linear classifier
# ---------------------------------------------------------------------------


def unigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document cross-entropy under the corpus's OWN unigram language
    model (MLE: p(t) = cf(t)/T) — the KenLM-perplexity quality proxy of
    CCNet/Gopher pipelines reduced to its order-0 form, trainable from the
    corpus itself with no external model. Low xent = boilerplate-typical
    text, high xent = rare-token soup; both tails get filtered.

    Plan: one tokenize scan exploded to (doc, term); collection counts are
    ONE hash agg on term (map-side partials absorb head-term skew exactly
    like the index build's df pass); per-doc scoring joins terms back to
    their counts (broadcast when the vocabulary is small, shuffle-hash
    otherwise — Zipf keeps vocab << corpus) and reduces with ONE hash agg
    on doc. Returns (id, n_tokens, xent), xent in nats."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("term")
    )
    # reduce to (doc, term, tf) BEFORE the cf join: the join input shrinks
    # from token occurrences to distinct pairs (Zipf: typically 5-10x),
    # and xent = Σ tf·(-ln cf/T) / n is identical
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    tot = cf.agg(F.sum("cf").alias("t"))
    return (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("tf") * -F.log(F.col("cf") / F.col("t")))
                / F.sum("tf")
            ).alias("xent"),
        )
    )


def unigram_lm_sql(text: str = "text", id_col: str = "doc_id") -> str:
    toks = tokens_sql(text)
    return f"""
SELECT {id_col}, count(*)::BIGINT AS n_tokens,
       avg(-ln(cf.cf / tot.t)) AS xent
FROM (SELECT {id_col}, unnest({toks}) AS term FROM documents) tk
JOIN (
  SELECT term, count(*)::DOUBLE AS cf
  FROM (SELECT unnest({toks}) AS term FROM documents) GROUP BY term
) cf USING (term),
(SELECT count(*)::DOUBLE AS t
 FROM (SELECT unnest({toks}) AS term FROM documents)) tot
GROUP BY {id_col}
"""


# deterministic stand-in weight lattice for the hashed classifier:
# w(bucket) = ((bucket % _HC_MOD) - (_HC_MOD - 1)/2) / ((_HC_MOD - 1)/2),
# uniform in [-1, 1]. A trained fastText-style model would broadcast a
# learned weight array instead; the plan below (one per-row JVM fold, zero
# shuffle) is identical either way — that is the declared boundary.
_HC_MOD = 1999
_HC_HALF = (_HC_MOD - 1) // 2


def hash_classifier_score(
    df: DataFrame,
    n_buckets: int = 4096,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-shaped linear quality classifier with the hashing trick:
    score = sigmoid(bias + mean over tokens of w[hash(token) % n_buckets]).
    Feature hashing is the cross-engine 60-bit md5 (texthash.hash60) so
    the DuckDB twin is value-identical; weights are the deterministic
    lattice above. Per-row JVM expressions only — no shuffle, no Python."""
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    df = df.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    toks = F.col("__toks")
    w = lambda t: (  # noqa: E731
        ((hash60_expr(t) % n_buckets) % _HC_MOD - F.lit(_HC_HALF))
        / F.lit(float(_HC_HALF))
    )
    s = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w(t))
    n = F.size(toks)
    x = F.lit(float(bias)) + F.when(n > 0, s / n).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-x))).alias("score"),
    )


def hash_classifier_sql(
    n_buckets: int = 4096,
    bias: float = 0.0,
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    from elasticsearch_assets_spark.operators.texthash import hash60_sql

    toks = tokens_sql(text)
    w = (
        f"((({hash60_sql('x')} % {n_buckets}) % {_HC_MOD}) - {_HC_HALF})"
        f" / {float(_HC_HALF)!r}"
    )
    return f"""
SELECT {id_col},
       len(t)::BIGINT AS n_tokens,
       1.0 / (1.0 + exp(-({float(bias)!r} + CASE WHEN len(t) > 0
         THEN list_sum(list_apply(t, x -> {w})) / len(t) ELSE 0.0 END))) AS score
FROM (SELECT {id_col}, {toks} AS t FROM documents)
"""


# ---------------------------------------------------------------------------
# text normalization
# ---------------------------------------------------------------------------

# portable regex classes (Java regex == RE2 for these): control/format
# chars strip, whitespace runs collapse
_NORM_STRIP = r"[\p{Cc}\p{Cf}]"
_NORM_WS = r"\s+"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = False,
) -> DataFrame:
    """Deterministic text normalization (the canonicalize step every
    web-text pipeline runs before hashing/dedup): strip control/format
    characters, collapse whitespace runs to single spaces, trim, and
    optionally lowercase. Returns (id, n_chars_raw, n_chars_norm,
    norm_fp) with norm_fp = md5 of the normalized text — the byte
    identity downstream exact-dedup keys on.

    One JVM regexp chain per row — zero shuffle, zero Python. (Full NFKC
    needs ICU, which Spark SQL doesn't expose; the regex chain above is
    the portable subset and the declared normalization contract.)"""
    c = F.col(text_col)
    # controls/format chars become SPACES first (not ''): a tab or
    # zero-width between words must stay a separator, never merge them
    norm = F.regexp_replace(c, _NORM_STRIP, " ")
    norm = F.trim(F.regexp_replace(norm, _NORM_WS, " "))
    if lowercase:
        norm = F.lower(norm)
    return df.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.md5(norm).alias("norm_fp"),
    )


def normalize_text_sql(
    text: str = "text", id_col: str = "doc_id", lowercase: bool = False
) -> str:
    norm = f"regexp_replace({text}, '{_NORM_STRIP}', ' ', 'g')"
    norm = f"trim(regexp_replace({norm}, '{_NORM_WS}', ' ', 'g'))"
    if lowercase:
        norm = f"lower({norm})"
    return f"""
SELECT {id_col},
       length({text})::BIGINT AS n_chars_raw,
       length({norm})::BIGINT AS n_chars_norm,
       md5({norm}) AS norm_fp
FROM documents
"""


def ngram_diversity(
    df: DataFrame,
    n: int = 3,
    strata_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Corpus diversity diagnostic: distinct-n-gram ratio per stratum
    (distinct token n-grams / total n-gram occurrences — the corpus-level
    analogue of per-doc repetition_stats; low ratios flag template-heavy
    strata before they dominate a training mixture).

    Plan: one tokenize scan -> shingle explode -> ONE hash agg per
    stratum with count + approx-free exact distinct (two-level agg:
    distinct shuffles on (stratum, shingle hash-sized keys), then the
    stratum rollup — the exact-dedup shuffle shape)."""
    from elasticsearch_assets_spark.operators.texthash import shingles_expr

    if n < 1:
        raise ValueError("n must be >= 1")
    keys = strata_cols or []
    toks = tokens_expr(text_col)
    rows = df.select(
        *[F.col(c) for c in keys],
        F.explode(shingles_expr(toks, n)).alias("__g"),
    )
    grouped = rows.groupBy(*[F.col(c) for c in keys]).agg(
        F.count(F.lit(1)).cast("long").alias("total_ngrams"),
        F.countDistinct("__g").cast("long").alias("distinct_ngrams"),
    )
    return grouped.select(
        *keys, "distinct_ngrams", "total_ngrams",
        (F.col("distinct_ngrams") / F.col("total_ngrams")).alias("diversity"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules + C4 line cleaning (web-corpus curation classics)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveText quality-filter signals (Rae et al. 2021 §A1.1)
    beyond the repetition family repetition_stats carries:

      n_words            whitespace-split word count
      mean_word_len      mean characters per word
      symbol_ratio       ('#' + '…' occurrences) / n_words
      frac_bullet_lines  lines starting '- ', '* ' or '• '
      frac_ellipsis_lines lines ending '…' or '...'
      frac_alpha_words   words containing an ASCII letter
      n_stopwords        how many of the 8 Gopher stopwords appear
      passes_gopher      the paper's bounds, ANDed:
                         50 <= words <= 100k, 3 <= mean <= 10,
                         symbol_ratio <= 0.1, bullets <= 0.9,
                         ellipsis <= 0.3, alpha >= 0.8, stopwords >= 2

    Pure JVM higher-order-function expressions over the words/lines
    arrays — zero shuffle, one projection."""
    words = F.expr(
        f"filter(split({text_col}, '\\\\s+'), w -> w != '')"
    )
    lines = F.expr(
        f"filter(transform(split({text_col}, '\\n'), l -> trim(l)),"
        " l -> l != '')"
    )
    staged = df.select(
        F.col(id_col), F.col(text_col).alias("__t"),
        words.alias("__w"), lines.alias("__l"),
    )
    nw = F.size("__w").cast("long")
    nl = F.greatest(F.size("__l").cast("long"), F.lit(1).cast("long"))
    mean_len = F.when(
        nw > 0,
        F.expr("aggregate(__w, 0L, (a, w) -> a + length(w))") / nw,
    ).otherwise(F.lit(0.0))
    n_sym = (
        F.length("__t") - F.length(F.replace(F.col("__t"), F.lit("#")))
        + F.length("__t") - F.length(F.replace(F.col("__t"), F.lit("…")))
    ).cast("long")
    sym_ratio = F.when(nw > 0, n_sym / nw).otherwise(F.lit(0.0))
    bullets = F.expr(
        "size(filter(__l, l -> l LIKE '- %' OR l LIKE '* %'"
        " OR l LIKE '• %'))"
    ).cast("long")
    ellipsis = F.expr(
        "size(filter(__l, l -> l LIKE '%…' OR l LIKE '%...'))"
    ).cast("long")
    alpha = F.expr(
        "size(filter(__w, w -> w RLIKE '[A-Za-z]'))"
    ).cast("long")
    frac_alpha = F.when(nw > 0, alpha / nw).otherwise(F.lit(0.0))
    stops = sum(
        F.array_contains(
            F.expr(f"transform(__w, w -> lower(w))"), s
        ).cast("int")
        for s in GOPHER_STOPWORDS
    ).cast("long")
    out = staged.select(
        F.col(id_col),
        nw.alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        (bullets / nl).alias("frac_bullet_lines"),
        (ellipsis / nl).alias("frac_ellipsis_lines"),
        frac_alpha.alias("frac_alpha_words"),
        stops.alias("n_stopwords"),
    )
    return out.withColumn(
        "passes_gopher",
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("frac_bullet_lines") <= 0.9)
        & (F.col("frac_ellipsis_lines") <= 0.3)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("n_stopwords") >= 2),
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_lines: int = 3,
) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2), line-level + page-level:

      * keep only lines ending in terminal punctuation (. ! ? ")
        with >= `min_words_per_line` words;
      * flag pages containing '{' (code) or 'lorem ipsum';
      * a page survives (keep=true) iff >= `min_lines` lines remain and
        neither flag fires. (C4 uses sentences >= 5; the line/word
        thresholds are the parameters — documented mapping.)

    Returns (id, cleaned_text, n_lines, n_kept, has_brace, has_lorem,
    keep). One projection of nested higher-order functions — line
    filtering never explodes rows, text never shuffles."""
    lines = F.expr(
        f"filter(transform(split({text_col}, '\\n'), l -> trim(l)),"
        " l -> l != '')"
    )
    staged = df.select(
        F.col(id_col), F.col(text_col).alias("__t"), lines.alias("__l")
    )
    kept = F.expr(
        "filter(__l, l -> right(l, 1) IN ('.', '!', '?', '\"') AND "
        f"size(filter(split(l, '\\\\s+'), w -> w != '')) >= "
        f"{int(min_words_per_line)})"
    )
    out = staged.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("cleaned_text"),
        F.size("__l").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.col("__t").contains("{").alias("has_brace"),
        F.lower("__t").contains("lorem ipsum").alias("has_lorem"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_kept") >= int(min_lines))
        & ~F.col("has_brace") & ~F.col("has_lorem"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_doc_freq: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate removal (the Dolma/RefinedWeb line-dedup
    pass): a LINE that appears in >= `min_doc_freq` DISTINCT documents
    is navigation/footer/cookie boilerplate — strip it from every doc,
    preserving the order of the surviving lines.

    Plan: posexplode the trimmed lines (the only place text fans out —
    rows, not copies), ONE hash agg on the line string for the
    distinct-doc counts, an anti-join back (broadcast when the frequent
    set is small — it is vocabulary-of-boilerplate-sized, not
    corpus-sized), then per-doc re-assembly via sort_array over
    (pos, line) structs — no window, no per-row Python.

    Returns (id, cleaned_text, n_lines, n_removed)."""
    lines = F.expr(
        f"filter(transform(split({text_col}, '\\n'), l -> trim(l)),"
        " l -> l != '')"
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )
    frequent = (
        exploded.groupBy("line")
        .agg(F.count_distinct(id_col).alias("docs"))
        .where(F.col("docs") >= int(min_doc_freq))
        .select("line")
    )
    kept = exploded.join(F.broadcast(frequent), "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(pos, line))),"
                   " s -> s.line)"),
            "\n",
        ).alias("cleaned_text"),
        F.count("*").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col), F.size(lines).cast("long").alias("n_lines")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .alias("n_removed"),
        )
        .orderBy(F.col(id_col).asc())
    )


# ---------------------------------------------------------------------------
# tokenizer fertility, DSIR importance weights, CCNet perplexity buckets
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer, PORTABLE variant: the original
# (gpt2/encoder.py) uses a lookahead (`\s+(?!\S)`) that RE2 (DuckDB)
# rejects, so trailing-space runs segment slightly differently here —
# deterministic in both engines, documented deviation. Contractions first
# (longest-alternative order matters), then space-attached letter / number /
# punctuation runs, then whitespace runs.
PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def fertility_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Tokenizer-fertility accounting for training-data budgeting: how many
    subword pre-tokens a tokenizer family will spend per whitespace word /
    per byte of this corpus (fertility is THE lever on tokens-per-dollar at
    100 TB). Subword units are GPT-2-style pre-tokens (PRETOKEN_RE above);
    whitespace-only matches don't count as units.

    Pure per-row JVM expressions (one regexp pass + arithmetic) — zero
    shuffle, scan-bound at any scale."""
    pre = F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)
    units = F.filter(pre, lambda m: m.rlike(r"\S"))
    n_sub = F.size(units).cast("long")
    n_words = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    ).cast("long")
    n_bytes = F.octet_length(text_col).cast("long")
    n_chars = F.length(text_col).cast("long")
    return df.select(
        F.col(id_col),
        n_bytes.alias("n_bytes"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_sub.alias("n_subwords"),
        F.when(n_words > 0, n_sub.cast("double") / n_words)
        .alias("fertility"),
        F.when(n_sub > 0, n_bytes.cast("double") / n_sub)
        .alias("bytes_per_token"),
    )


def fertility_stats_sql(text: str = "text", id_col: str = "doc_id") -> str:
    # '' doubles the apostrophe for the SQL literal; DuckDB standard
    # strings pass backslashes through to RE2 untouched
    pat = PRETOKEN_RE.replace("'", "''")
    units = (
        f"list_filter(regexp_extract_all({text}, '{pat}'), "
        f"m -> regexp_matches(m, '\\S'))"
    )
    return f"""
SELECT {id_col},
       strlen({text})::BIGINT AS n_bytes,
       length({text})::BIGINT AS n_chars,
       len(regexp_extract_all({text}, '\\S+'))::BIGINT AS n_words,
       len({units})::BIGINT AS n_subwords,
       CASE WHEN len(regexp_extract_all({text}, '\\S+')) > 0
            THEN len({units})::DOUBLE
                 / len(regexp_extract_all({text}, '\\S+'))
       END AS fertility,
       CASE WHEN len({units}) > 0
            THEN strlen({text})::DOUBLE / len({units})
       END AS bytes_per_token
FROM documents
"""


def _dsir_features_pandas(n_buckets: int, id_col: str):
    """mapInPandas batch kernel: (id, _t, _toks) -> (id, _t, b, c) per-doc
    bucket COUNTS. md5 runs once per UNIQUE feature (unigram or bigram)
    per Arrow batch — the semantic.py batch-embedder shape — and every
    per-occurrence step is a vectorized np pass (repeat / unique over
    int64 pair keys), no per-row Python over tokens. Bucket ids are
    bit-identical
    to the SQL path's hash60 % n_buckets (int(md5[:15],16) over the same
    UTF-8 bytes); emitting counts matches the DuckDB oracle's own `db`
    CTE, so the grouped sum(c*r) downstream mirrors the oracle more
    closely than the per-occurrence SQL fold does."""
    import hashlib

    import numpy as np
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            toks = pdf["_toks"]
            lens = np.fromiter(
                (0 if t is None else len(t) for t in toks),
                np.int64, count=n,
            )
            total = int(lens.sum())
            if total == 0:
                # zero-feature docs drop: no evidence, no weight
                continue
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks
                 if t is not None and len(t)]
            ).astype("U")
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            uniq, inv = np.unique(flat, return_inverse=True)
            ub_uni = np.empty(len(uniq), np.int64)
            for i, u in enumerate(uniq):
                d = hashlib.md5(u.encode()).hexdigest()
                ub_uni[i] = int(d[:15], 16) % n_buckets
            # bigrams dedup as INT pairs of unigram indices — the string
            # (and its md5) is built once per unique pair, never per
            # occurrence, and np.unique runs over int64 keys instead of
            # sorting millions of strings
            if total >= 2:
                same = rows[:-1] == rows[1:]
                nv = np.int64(len(uniq))
                bkey = inv[:-1][same] * nv + inv[1:][same]
                brow = rows[:-1][same]
                ubkey, binv = np.unique(bkey, return_inverse=True)
                ub_bi = np.empty(len(ubkey), np.int64)
                for i, bk in enumerate(ubkey):
                    s = uniq[bk // nv] + " " + uniq[bk % nv]
                    d = hashlib.md5(s.encode()).hexdigest()
                    ub_bi[i] = int(d[:15], 16) % n_buckets
                occ_b = np.concatenate([ub_uni[inv], ub_bi[binv]])
                frow = np.concatenate([rows, brow])
            else:
                occ_b = ub_uni[inv]
                frow = rows
            key = frow * np.int64(n_buckets) + occ_b
            ukey, cnt = np.unique(key, return_counts=True)
            orow = ukey // n_buckets
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[orow],
                    "_t": pdf["_t"].to_numpy()[orow],
                    "b": ukey % n_buckets,
                    "c": cnt.astype(np.int64),
                }
            )

    return fn


# worker-global md5 memo caches for the fused DSIR engine: keyed by the
# RAW feature string (values are the full 60-bit hash60, config-free, so
# one cache serves every n_buckets). Global repetition makes them pay —
# measured on the bench corpus: unigrams 1100x occurrences/distinct,
# bigrams ~5x — and BOTH caches are size-capped so unbounded real-text
# vocabularies (ids, typos, web tokens at 10^12 docs) degrade to
# hashing uncached keys, never to executor memory growth.
_DSIR_UHASH: dict = {}
_DSIR_UHASH_CAP = 4_000_000
_DSIR_PHASH: dict = {}
_DSIR_PHASH_CAP = 4_000_000


def _dsir_batch_buckets(pdf: "pd.DataFrame", n_buckets: int, text_col: str):
    """One Arrow batch -> (uni_b, bi_b, lens, bl): flat unigram/bigram
    bucket streams plus per-doc feature counts. Tokenization is the
    frozen arrow/RE2 kernel (tokenize_flat), term coding is dictionary
    encoding, and md5 runs once per unique token / unique ADJACENT PAIR
    per batch (then memoized worker-globally) — every per-occurrence
    step is a vectorized int64 pass. Bucket ids are bit-identical to
    hash60(feature) % n_buckets."""
    import hashlib

    import numpy as np

    from elasticsearch_assets_spark.analysis.tokenizer import (
        encode_tokens,
        tokenize_flat,
    )

    flat, lens = tokenize_flat(pdf[text_col])
    bl = np.maximum(lens - 1, 0)
    if lens.sum() == 0:
        z = np.array([], dtype=np.int64)
        return z, z, lens, bl
    codes, uniques = encode_tokens(flat)

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    lut = np.empty(len(uniques), dtype=np.int64)
    for i, u in enumerate(uniques):
        v = _DSIR_UHASH.get(u)
        if v is None:
            v = h60(u)
            if len(_DSIR_UHASH) < _DSIR_UHASH_CAP:
                _DSIR_UHASH[u] = v
        lut[i] = v
    uni_b = (lut % n_buckets)[codes]
    doc_of = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
    same = doc_of[1:] == doc_of[:-1]
    a, b = codes[:-1][same], codes[1:][same]
    nv = np.int64(len(uniques))
    upk, inv = np.unique(a * nv + b, return_inverse=True)
    plut = np.empty(len(upk), dtype=np.int64)
    ua, ub = upk // nv, upk % nv
    for i in range(len(upk)):
        key = (uniques[ua[i]], uniques[ub[i]])
        v = _DSIR_PHASH.get(key)
        if v is None:
            v = h60(key[0] + " " + key[1])
            if len(_DSIR_PHASH) < _DSIR_PHASH_CAP:
                _DSIR_PHASH[key] = v
        plut[i] = v
    return uni_b, (plut % n_buckets)[inv], lens, bl


def _dsir_fused(
    df: DataFrame,
    target_col: str,
    n_buckets: int,
    lam: float,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """The fused two-scan DSIR plan (engine="fused", the default and the
    10^12-doc shape): pass 1 reduces the corpus to ONE (bucket, q, p)
    histogram — np.bincount partials per batch, a <=n_buckets-row
    shuffle, nothing else moves; the log-ratio table collects to the
    driver (n_buckets doubles); pass 2 re-derives each batch's feature
    buckets (the worker-global md5 memo makes the re-hash nearly free)
    and emits per-doc (n_feats, logw) with ZERO shuffle — logw via
    prefix-sum differences over the batch's flat r-streams (absolute FP
    error <= eps * sum|r| per batch, ~1e-9 at the bench shape — five
    orders inside the 1e-4 contract protocol; parity with the sql
    engine's grouped sum asserted in tests).

    vs engine="sql" (measured cold at the 200k-page bench shape, fresh
    process, local[32]): 18.4 s -> 9.4 s. The sql engine materializes +
    persists the ~80M-row occurrence frame and joins it back; at 10^12
    docs that persisted frame is infeasible while this plan's state is
    two corpus scans + one 4096-row histogram — which is why fused is
    the default. The sql/pandas engines remain for the CacheManager
    warm-rerun loop (persist_features) and as oracle-shaped references."""
    import numpy as np
    import pandas as pd

    staged = df.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("_t"),
        F.col(text_col).alias("_txt"),
    )
    B = int(n_buckets)

    def hist_kernel(batches):
        import numpy as np
        import pandas as pd

        q = np.zeros(B, dtype=np.int64)
        p = np.zeros(B, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            uni_b, bi_b, lens, bl = _dsir_batch_buckets(pdf, B, "_txt")
            if lens.sum() == 0:
                continue
            t = pdf["_t"].fillna(False).to_numpy(dtype=bool)
            q += np.bincount(uni_b, minlength=B)
            q += np.bincount(bi_b, minlength=B)
            tu, tb = np.repeat(t, lens), np.repeat(t, bl)
            if t.any():
                p += np.bincount(uni_b[tu], minlength=B)
                p += np.bincount(bi_b[tb], minlength=B)
        yield pd.DataFrame({"b": np.arange(B), "q": q, "p": p})

    hist = (
        staged.mapInPandas(hist_kernel, "b long, q long, p long")
        .groupBy("b")
        .agg(F.sum("q").alias("q"), F.sum("p").alias("p"))
        .toPandas()
    )
    q = np.zeros(B)
    p = np.zeros(B)
    q[hist["b"].to_numpy()] = hist["q"].to_numpy()
    p[hist["b"].to_numpy()] = hist["p"].to_numpy()
    tq, tp = q.sum(), p.sum()
    lamb = float(lam)
    r = np.log((p + lamb) / (tp + lamb * B)) - np.log(
        (q + lamb) / (tq + lamb * B)
    )

    def score_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            uni_b, bi_b, lens, bl = _dsir_batch_buckets(pdf, B, "_txt")
            nf = lens + bl
            keep = nf > 0  # zero-feature docs drop: no evidence, no weight
            if not keep.any():
                continue
            ui = np.concatenate(([0], np.cumsum(lens)))
            bi = np.concatenate(([0], np.cumsum(bl)))
            ru = np.concatenate(([0.0], np.cumsum(r[uni_b])))
            rb = np.concatenate(([0.0], np.cumsum(r[bi_b])))
            logw = (ru[ui[1:]] - ru[ui[:-1]]) + (rb[bi[1:]] - rb[bi[:-1]])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[keep],
                    "n_feats": nf[keep],
                    "logw": logw[keep],
                }
            )

    # preserve the caller's id dtype (string ids are the common web-corpus
    # shape) — hardcoding `long` here turned a previously-working default
    # call into an Arrow conversion error (round-4 advice #3, same class
    # of bug lsh_neardup_pairs fixed in round 3)
    id_type = df.schema[id_col].dataType.simpleString()
    return staged.mapInPandas(
        score_kernel, f"{id_col} {id_type}, n_feats long, logw double"
    )


def dsir_importance(
    df: DataFrame,
    target_col: str,
    n_buckets: int = 1024,
    lam: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    feature_hash: str = "md5",
    persist_features: bool = True,
    engine: str | None = None,
) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling") log importance weights over hashed n-gram
    features: unigrams + word bigrams hash to `n_buckets` buckets, the
    target (`target_col` true) and raw (whole-corpus) bucket distributions
    are smoothed with `lam`, and a document's weight is

        log w(x) = sum_b c_b(x) * [ln p_b - ln q_b],
        p_b = (cnt_target(b) + lam) / (T + lam*B)   (q_b likewise over all)

    Plan: ONE tokenize+hash scan produces the (doc, target, bucket,
    count) feature frame, persisted MEMORY_AND_DISK
    (`persist_features`, default on — it feeds both phases of the
    classically two-pass DSIR recipe; measured ~2x over recomputing the
    scan per phase, and a localCheckpoint variant measured SLOWER than
    both, RDD-row storage losing the columnar pipelining). The cache
    entry lives in the session's CacheManager until clearCache() —
    re-scoring the same corpus serves the feature frame from cache
    (document-level resampling reruns are the common loop); a long-lived
    service scoring MANY distinct corpora should pass
    persist_features=False (pure two-scan plan, zero retained state) or
    clear the cache between corpora. Phase 1:
    both distributions in one groupBy(b) hash agg — map-side partials
    shrink every task to <= n_buckets rows before the shuffle, so
    head-bucket skew never moves rows. Phase 2: the <=B-row log-ratio
    table broadcasts onto the cached occurrences and one per-doc hash agg
    finishes (sum of r over occurrences == sum of c_b*r_b over distinct
    buckets). Docs with zero features drop (no evidence, no weight) —
    documented.

    `feature_hash`: "md5" (default) is the oracle-matched 60-bit
    texthash.hash60; "xxhash64" is the production swap — same plan,
    measurably less hash CPU, NOT cross-engine portable.

    `engine`: None (default) selects "fused" (round-4) — the two-scan
    zero-persist plan in `_dsir_fused`: measured 18.4 s -> 9.4 s COLD at
    the 200k-page bench shape (fresh process, local[32]), and the only
    shape that survives 10^12 docs (the sql engine's persisted 80M-row
    occurrence frame does not). Its per-batch kernel hashes once per
    unique feature THEN memoizes worker-globally — profiled GLOBAL
    repetition (unigrams 1100x, bigrams ~5x across the corpus) is what
    the earlier per-batch profile (383k unique of 396k in ONE batch)
    hid, which is why the round-3 conclusion favoring "sql" inverts
    here. NOTE the round-3 "15 s cold vs 1.8 s warm = JIT" diagnosis
    was re-measured this round and falsified: a tiny same-plan warm-up
    run did NOT close the gap (17.0 -> 21.1 s) — the warm number was the
    CacheManager serving the persisted occurrence frame. "sql" remains
    the oracle-shaped reference (codegen explode chain + persisted
    two-phase frame — the CacheManager warm-rerun loop) and the only
    engine supporting feature_hash="xxhash64". "pandas"
    (_dsir_features_pandas) stays
    as the tested alternative for corpora whose batch vocabulary is
    genuinely small relative to the token stream (boilerplate-heavy
    shards); it also emits per-doc bucket COUNTS directly, so its
    persisted frame and shuffles carry <= distinct (doc, bucket) rows.
    Bucket ids and counts are bit-identical across engines (tested);
    logw sums agree to FP round-off (both well inside the contract's
    1e-4 protocol; the grouped sum(c*r) is the DuckDB oracle's own
    db-CTE shape).

    Returns (id, n_feats, logw). Select by ordering on logw (the paper's
    Gumbel top-k adds sampling noise; deterministic top-k is the
    reproducible variant, noted in the docstring of the contract row)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if feature_hash not in ("md5", "xxhash64"):
        raise ValueError(f"feature_hash must be md5 | xxhash64, got {feature_hash!r}")
    if engine is None:
        engine = "fused"
    if engine not in ("fused", "pandas", "sql"):
        raise ValueError(f"engine must be fused | pandas | sql, got {engine!r}")
    if engine in ("fused", "pandas") and feature_hash != "md5":
        raise ValueError(
            f"engine={engine!r} implements the md5 hash60 contract only; "
            "use engine='sql' with feature_hash='xxhash64'"
        )
    if engine == "fused":
        # persist_features does not apply: the fused plan persists NOTHING
        # (its warm-rerun economics are the worker-global md5 memo, not
        # the CacheManager) — see _dsir_fused's docstring
        return _dsir_fused(df, target_col, n_buckets, lam, text_col, id_col)
    from elasticsearch_assets_spark.operators.texthash import (
        hash60_expr,
        shingles_expr,
    )

    # stage the token array in its OWN projection: referenced as a bare
    # column, the shingle lambda reuses it per element; inlined, Catalyst
    # would re-run the regexp per shingle (O(tokens^2) — measured 20x on
    # the bench corpus, the simhash staging rule from texthash.py)
    staged = df.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("_t"),
        tokens_expr(text_col).alias("_toks"),
    )

    if engine == "pandas":
        occ = staged.mapInPandas(
            _dsir_features_pandas(n_buckets, id_col),
            schema=f"{id_col} long, _t boolean, b long, c long",
        )
    else:
        toks = F.col("_toks")
        feats = F.concat(toks, shingles_expr(toks, 2))
        hfn = (
            (lambda c: hash60_expr(c) % n_buckets)
            if feature_hash == "md5"
            else (lambda c: F.pmod(F.xxhash64(c), F.lit(n_buckets)))
        )
        occ = staged.select(
            F.col(id_col), F.col("_t"), F.explode(feats).alias("_f")
        ).select(
            id_col, "_t", hfn(F.col("_f")).alias("b"),
            F.lit(1).cast("long").alias("c"),
        )
    if persist_features:
        from pyspark import StorageLevel

        occ = occ.persist(StorageLevel.MEMORY_AND_DISK)
    dist = occ.groupBy("b").agg(
        F.sum("c").cast("double").alias("q"),
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(F.lit(0)))
        .cast("double")
        .alias("p"),
    )
    tot = dist.agg(F.sum("q").alias("tq"), F.sum("p").alias("tp"))
    lamb = float(lam)
    ratio = dist.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("p") + lamb) / (F.col("tp") + lamb * n_buckets))
            - F.log((F.col("q") + lamb) / (F.col("tq") + lamb * n_buckets))
        ).alias("r"),
    )
    return (
        occ.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("r")).alias("logw"),
        )
    )


def dsir_importance_sql(
    target_where: str,
    n_buckets: int = 1024,
    lam: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin; `target_where` is the SQL predicate matching target_col."""
    from elasticsearch_assets_spark.operators.texthash import (
        hash60_sql,
        shingles_sql,
    )

    toks = tokens_sql(text)
    feats = f"({toks} || {shingles_sql(toks, 2)})"
    lamb = float(lam)
    return f"""
WITH fe AS (
  SELECT {id_col}, ({target_where}) AS t,
         {hash60_sql('f')} % {n_buckets} AS b
  FROM (SELECT *, unnest({feats}) AS f FROM documents)
),
db AS (
  SELECT {id_col}, t, b, count(*)::DOUBLE AS c FROM fe GROUP BY 1, 2, 3
),
dist AS (
  SELECT b, sum(c) AS q, sum(CASE WHEN t THEN c ELSE 0.0 END) AS p
  FROM db GROUP BY b
),
tot AS (SELECT sum(q) AS tq, sum(p) AS tp FROM dist),
ratio AS (
  SELECT b, ln((p + {lamb!r}) / (tp + {lamb!r} * {n_buckets}))
           - ln((q + {lamb!r}) / (tq + {lamb!r} * {n_buckets})) AS r
  FROM dist, tot
)
SELECT {id_col}, sum(c)::BIGINT AS n_feats, sum(c * r) AS logw
FROM db JOIN ratio USING (b) GROUP BY {id_col}
"""


def ccnet_buckets(
    df: DataFrame,
    thresholds: str = "exact",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    document under the corpus's own unigram LM (unigram_lm_score — the
    order-0 KenLM stand-in, declared model boundary) and split the corpus
    into head / middle / tail thirds by ascending cross-entropy. CCNet
    keeps `head` (+ often `middle`) as the pretraining cut.

    Ties and float parity: ordering is on the 4-decimal-rounded xent then
    id, so the cut is bit-stable across engines (CLAUDE.md float rule).

    thresholds="exact" ranks with ONE global row_number over the per-doc
    stats frame — fine up to ~10^9 docs (the frame is 16 bytes/doc), the
    contract/oracle path. thresholds="approx" computes the two cuts with
    percentile_approx (one partial-aggregable pass, NO global sort) and
    assigns buckets with a broadcast-filter pass — the 10^12-doc path,
    where a +-epsilon boundary error on a corpus cut is immaterial."""
    scored = unigram_lm_score(df, text_col=text_col, id_col=id_col)
    xr = (F.floor(F.col("xent") * 10000.0 + F.lit(0.5)) / 10000.0).alias(
        "xent_r"
    )
    scored = scored.select(id_col, "n_tokens", xr)
    if thresholds == "approx":
        cuts = scored.agg(
            F.percentile_approx("xent_r", [1.0 / 3.0, 2.0 / 3.0], 10000)
            .alias("c")
        )
        bucket = (
            F.when(F.col("xent_r") <= F.col("c")[0], F.lit("head"))
            .when(F.col("xent_r") <= F.col("c")[1], F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        return scored.crossJoin(F.broadcast(cuts)).select(
            id_col, "n_tokens", "xent_r", bucket.alias("bucket")
        )
    if thresholds != "exact":
        raise ValueError("thresholds must be 'exact' or 'approx'")
    w = Window.orderBy(F.col("xent_r").asc(), F.col(id_col).asc())
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(Window.partitionBy())
    bucket = (
        F.when(rn * 3 <= n, F.lit("head"))
        .when(rn * 3 <= n * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.select(
        id_col, "n_tokens", "xent_r", bucket.alias("bucket")
    )


def ccnet_buckets_sql(text: str = "text", id_col: str = "doc_id") -> str:
    return f"""
WITH s AS (
  SELECT {id_col}, n_tokens,
         floor(xent * 10000.0 + 0.5) / 10000.0 AS xent_r
  FROM ({unigram_lm_sql(text, id_col)})
),
r AS (
  SELECT *, row_number() OVER (ORDER BY xent_r ASC, {id_col} ASC) AS rn,
         count(*) OVER () AS n
  FROM s
)
SELECT {id_col}, n_tokens, xent_r,
       CASE WHEN rn * 3 <= n THEN 'head'
            WHEN rn * 3 <= n * 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
"""


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
    counts_from: "DataFrame | None" = None,
) -> DataFrame:
    """Per-document cross-entropy under the corpus's OWN bigram LM with
    stupid backoff (Brants et al. 2007) — the order-1 upgrade of
    unigram_lm_score toward the CCNet/Gopher KenLM proxy:

        p(w | v) = cnt(v w) / ctx(v)            when cnt(v w) > 0
                 = backoff * cf(w) / T           otherwise
        xent     = -(1/m) * sum over a doc's bigrams ln p(w | v)

    (ctx(v) = occurrences of v as a bigram LEFT context, so p(.|v) sums
    to 1 over observed continuations. Counts come from `counts_from`
    when given — the frozen-reference-corpus / held-out-scoring mode,
    where the backoff arm fires on unseen bigrams; unseen CONTEXTS
    likewise back off to the unigram arm. Scoring the corpus against
    itself (counts_from=None) never reaches the backoff arm by
    construction.)

    Plan: one tokenize scan staged once, exploded to (doc, bigram) and
    reduced to per-doc bigram tfs BEFORE any join (the unigram_lm Zipf
    argument); bigram corpus counts and left-context counts come from
    the SAME aggregated frame (one extra hash agg on the split context,
    not a second scan); joins are shuffle-hash on Zipf-bounded vocab
    tables; ONE final hash agg on doc. Docs with < 2 tokens drop
    (no bigram evidence) — documented."""
    from elasticsearch_assets_spark.operators.texthash import shingles_expr

    staged = df.select(
        F.col(id_col), tokens_expr(text_col).alias("_toks")
    ).where(F.size("_toks") >= 2)
    grams = staged.select(
        F.col(id_col),
        F.explode(shingles_expr(F.col("_toks"), 2)).alias("bg"),
    )
    tf = grams.groupBy(id_col, "bg").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    ref = counts_from if counts_from is not None else df
    if counts_from is None:
        # self-scoring: derive counts from the already-reduced tf frame
        bg_cnt = tf.groupBy("bg").agg(F.sum("tf").alias("cbg"))
    else:
        ref_staged = ref.select(
            tokens_expr(text_col).alias("_toks")
        ).where(F.size("_toks") >= 2)
        bg_cnt = (
            ref_staged.select(
                F.explode(shingles_expr(F.col("_toks"), 2)).alias("bg")
            )
            .groupBy("bg")
            .agg(F.count(F.lit(1)).cast("double").alias("cbg"))
        )
    ctx_cnt = bg_cnt.groupBy(
        F.substring_index("bg", " ", 1).alias("_v")
    ).agg(F.sum("cbg").alias("cctx"))
    uni = ref.select(
        F.explode(tokens_expr(text_col)).alias("w")
    ).groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("cw"))
    tot = uni.agg(F.sum("cw").alias("t"))
    b = float(backoff)
    scored = (
        tf.join(bg_cnt, "bg", "left")
        .withColumn("_v", F.substring_index("bg", " ", 1))
        .withColumn("_w", F.substring_index("bg", " ", -1))
        .join(ctx_cnt, "_v", "left")
        .join(uni.withColumnRenamed("w", "_w"), "_w", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_p",
            F.when(
                F.col("cbg").isNotNull() & (F.col("cbg") > 0),
                F.col("cbg") / F.col("cctx"),
            # OOV words get an add-one count floor so held-out xent stays
            # finite (stupid backoff leaves OOV undefined; documented)
            ).otherwise(b * F.coalesce(F.col("cw"), F.lit(1.0)) / F.col("t")),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        (F.sum(F.col("tf") * -F.log("_p")) / F.sum("tf")).alias("xent"),
    )


def bigram_lm_sql(text: str = "text", id_col: str = "doc_id", backoff: float = 0.4) -> str:
    from elasticsearch_assets_spark.operators.texthash import shingles_sql

    toks = tokens_sql(text)
    grams = shingles_sql(toks, 2)
    return f"""
WITH tf AS (
  SELECT {id_col}, bg, count(*)::DOUBLE AS tf
  FROM (SELECT {id_col}, unnest({grams}) AS bg FROM documents)
  GROUP BY 1, 2
),
bgc AS (SELECT bg, sum(tf) AS cbg FROM tf GROUP BY bg),
ctx AS (
  SELECT split_part(bg, ' ', 1) AS v, sum(cbg) AS cctx FROM bgc GROUP BY 1
),
uni AS (
  SELECT w, count(*)::DOUBLE AS cw
  FROM (SELECT unnest({toks}) AS w FROM documents) GROUP BY w
),
tot AS (SELECT sum(cw) AS t FROM uni)
SELECT {id_col}, sum(tf)::BIGINT AS n_bigrams,
       sum(tf * -ln(CASE WHEN cbg IS NOT NULL AND cbg > 0
                         THEN cbg / cctx
                         ELSE {float(backoff)!r} * coalesce(cw, 1.0) / t END))
         / sum(tf) AS xent
FROM tf
LEFT JOIN bgc USING (bg)
LEFT JOIN ctx ON ctx.v = split_part(bg, ' ', 1)
LEFT JOIN uni ON uni.w = split_part(bg, ' ', 2)
CROSS JOIN tot
GROUP BY {id_col}
"""


def bpe_pair_counts(
    df: DataFrame,
    n: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """One BPE-training merge step (Sennrich et al. 2016) at corpus
    scale: count adjacent CHARACTER pairs across all words, weighted by
    word frequency, and return the top-n merge candidates
    (pair, cnt) ordered (cnt DESC, pair ASC).

    Scale shape — the classic BPE trick done distributively: the corpus
    reduces to the VOCABULARY first (one word-count hash agg with
    map-side partials; vocab is sublinear in corpus size), pairs are
    then generated per DISTINCT word via a JVM transform over a
    sequence() index array (no explode of corpus-sized data, no Python),
    and the final agg shuffles only vocab * avg_word_len rows. A 100 TB
    corpus with a 10M-type vocabulary shuffles ~100M tiny rows — the
    same reason real BPE trainers count over the vocab, not the text."""
    if n < 1:
        raise ValueError("n must be >= 1")
    words = df.select(
        F.explode(tokens_expr(text_col)).alias("wd")
    ).where(F.length("wd") >= 2)
    vocab = words.groupBy("wd").agg(F.count("*").alias("c"))
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(wd) - 1),"
                " i -> substring(wd, i, 2))"
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(n)
    )


def bpe_pair_counts_sql(n: int = 20, text: str = "text") -> str:
    """DuckDB twin of bpe_pair_counts (constant range + length guard —
    DuckDB's range() rejects lateral column bounds)."""
    return f"""
WITH w AS (SELECT unnest({tokens_sql(text)}) AS wd FROM documents),
wc AS (SELECT wd, count(*)::BIGINT AS c FROM w WHERE length(wd) >= 2 GROUP BY wd),
p AS (
  SELECT substr(wd, i::INT, 2) AS pair, c
  FROM wc, range(1, 64) r(i) WHERE i <= length(wd) - 1
)
SELECT pair, sum(c)::BIGINT AS cnt FROM p
GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT {n}
"""


def filter_sweep(
    df: DataFrame,
    thresholds: "list[float]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-filter threshold calibration (the FineWeb-style ablation
    report): for each candidate threshold, how many documents and tokens
    survive `quality >= t` — docs_kept / tokens_kept plus retained
    fractions, in ONE conditional-aggregate corpus pass (never one scan
    per threshold; N thresholds = 2N extra agg expressions on the same
    partial-aggregable plan).

    Thresholds compare against the 4-decimal-quantized score
    (floor(q*1e4+0.5)/1e4) so the cut is bit-stable across engines —
    pick thresholds off the quantization grid. Output ordered by
    threshold."""
    if not thresholds:
        raise ValueError("filter_sweep needs at least one threshold")
    ts = sorted(float(t) for t in thresholds)
    s = token_stats(df, text_col, id_col).select(
        F.col(id_col),
        F.col("n_tokens"),
        (F.floor(_quality_expr() * 1e4 + 0.5) / 1e4).alias("q"),
    )
    aggs = []
    for i, t in enumerate(ts):
        keep = F.col("q") >= F.lit(t)
        aggs.append(F.sum(keep.cast("long")).alias(f"_d{i}"))
        aggs.append(
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(F.lit(0)))
            .alias(f"_t{i}")
        )
    aggs.append(F.count("*").alias("_nd"))
    aggs.append(F.sum("n_tokens").alias("_nt"))
    one = s.agg(*aggs)
    stack = ", ".join(
        f"{t}D, _d{i}, _t{i}" for i, t in enumerate(ts)
    )
    return (
        one.select(
            F.expr(
                f"stack({len(ts)}, {stack}) AS "
                "(threshold, docs_kept, tokens_kept)"
            ),
            "_nd", "_nt",
        )
        .select(
            "threshold", "docs_kept", "tokens_kept",
            (F.floor(F.col("docs_kept") / F.col("_nd") * 1e4 + 0.5) / 1e4)
            .alias("doc_frac"),
            (F.floor(F.col("tokens_kept") / F.col("_nt") * 1e4 + 0.5) / 1e4)
            .alias("token_frac"),
        )
        .orderBy("threshold")
    )


def filter_sweep_sql(
    thresholds: "list[float]", text: str = "text", id_col: str = "doc_id"
) -> str:
    ts = sorted(float(t) for t in thresholds)
    vals = ", ".join(f"({t})" for t in ts)
    return f"""
WITH q AS (
  SELECT {id_col}, n_tokens,
         floor(CASE WHEN n_tokens > 0 THEN
           0.4::DOUBLE * least(n_tokens / 100.0::DOUBLE, 1.0::DOUBLE)
           + 0.3::DOUBLE * (n_unique::DOUBLE / n_tokens)
           + 0.3::DOUBLE * least(stopword_ratio * 5.0::DOUBLE, 1.0::DOUBLE)
         ELSE 0.0::DOUBLE END * 1e4 + 0.5) / 1e4 AS q
  FROM ({token_stats_sql(text, id_col)})
),
tot AS (SELECT count(*)::DOUBLE AS nd, sum(n_tokens)::DOUBLE AS nt FROM q),
th(threshold) AS (VALUES {vals})
SELECT threshold::DOUBLE AS threshold,
       count(*) FILTER (q.q >= threshold)::BIGINT AS docs_kept,
       coalesce(sum(n_tokens) FILTER (q.q >= threshold), 0)::BIGINT AS tokens_kept,
       floor(count(*) FILTER (q.q >= threshold) / tot.nd * 1e4 + 0.5) / 1e4 AS doc_frac,
       floor(coalesce(sum(n_tokens) FILTER (q.q >= threshold), 0) / tot.nt * 1e4 + 0.5) / 1e4 AS token_frac
FROM q, th, tot
GROUP BY threshold, tot.nd, tot.nt
ORDER BY threshold
"""


def span_corruption(
    corpus: DataFrame,
    *,
    span: int = 3,
    block: int = 10,
    rate: float = 0.5,
    seed: str = "sc",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4), the
    DETERMINISTIC blockwise variant: tokens partition into fixed blocks
    of `block`; a block masks its first `span` tokens iff the salted md5
    of (seed, doc, block) clears the `rate` hex cut — the engine's
    reproducible-sampling contract (operators/sampling.py): no RNG, so
    the (inputs, targets) pairs are identical across engines, runs,
    retries, and resumes, which T5's sampled spans are not. Masked runs
    become <extra_id_k> sentinels in reading order; targets carry the
    sentinels + the masked tokens — the exact T5 seq2seq shape. Expected
    noise density = rate * span / block (defaults: 0.15).

    Plan: pure JVM array lambdas over the scan — ZERO shuffle; the
    sentinel rank is closed-form per block (count of masked blocks
    before it), O(blocks^2) array work per doc in exchange for no
    sequential fold — blocks ~ len/block stays small, and closed-form
    masking is what makes a resumed/retried job emit byte-identical
    training pairs.

    Returns (id, inputs, targets)."""
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    if span < 1 or block <= span:
        raise ValueError("need 1 <= span < block")
    thr = rate_threshold_hex(rate)
    mask = (
        f"substr(md5(concat('{seed}|', CAST({id_col} AS STRING), '|', "
        "CAST(%s AS STRING))), 1, 8) < '" + thr + "'"
    )
    k_of = f"size(filter(sequence(0, nb - 1), x -> x < %s AND {mask % 'x'}))"
    inputs = (
        "concat_ws(' ', flatten(transform(sequence(0, nb - 1), b -> "
        f"CASE WHEN {mask % 'b'} THEN concat(array(concat('<extra_id_', "
        f"{k_of % 'b'}, '>')), slice(tk, b * {block} + {span} + 1, "
        f"{block} - {span})) ELSE slice(tk, b * {block} + 1, {block}) "
        "END)))"
    )
    targets = (
        "concat_ws(' ', flatten(transform(filter(sequence(0, nb - 1), "
        f"b -> {mask % 'b'}), b -> concat(array(concat('<extra_id_', "
        f"{k_of % 'b'}, '>')), slice(tk, b * {block} + 1, {span})))))"
    )
    return (
        corpus.withColumn("tk", F.split(F.col(text_col), " "))
        .withColumn(
            "nb",
            F.expr(f"int(ceil(size(tk) / CAST({block} AS DOUBLE)))"),
        )
        .selectExpr(
            id_col, f"({inputs}) AS inputs", f"({targets}) AS targets"
        )
    )


def span_corruption_sql(
    span: int = 3,
    block: int = 10,
    rate: float = 0.5,
    seed: str = "sc",
) -> str:
    """DuckDB twin of span_corruption over the `documents` view — the
    same md5-hex cut, block geometry, and sentinel ranks, so outputs are
    byte-identical (integers and strings only, no floats)."""
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    thr = rate_threshold_hex(rate)

    def mask(b: str) -> str:
        return (
            f"substr(md5('{seed}|' || doc_id::VARCHAR || '|' || "
            f"({b})::VARCHAR), 1, 8) < '{thr}'"
        )

    def k_of(b: str) -> str:
        return (
            f"len(list_filter(range(0, nb), x -> x < {b} AND {mask('x')}))"
        )

    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
n AS (
  SELECT doc_id, tk,
         CAST(ceil(len(tk) / CAST({block} AS DOUBLE)) AS INT) AS nb
  FROM t
)
SELECT doc_id,
  coalesce(array_to_string(flatten(list_transform(range(0, nb), b ->
    CASE WHEN {mask('b')}
         THEN ['<extra_id_' || {k_of('b')} || '>']
              || tk[b * {block} + {span} + 1 : b * {block} + {block}]
         ELSE tk[b * {block} + 1 : b * {block} + {block}] END)), ' '),
    '') AS inputs,
  coalesce(array_to_string(flatten(list_transform(
    list_filter(range(0, nb), b -> {mask('b')}), b ->
    ['<extra_id_' || {k_of('b')} || '>']
    || tk[b * {block} + 1 : b * {block} + {span}])), ' '), '') AS targets
FROM n
"""


def fim_transform(
    corpus: DataFrame,
    *,
    spm_rate: float = 0.5,
    seed: str = "fim",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al. 2022):
    split each document at two cut points into (prefix, middle, suffix)
    and emit the sentinel-joined sequence — PSM
    `<PRE> p <SUF> s <MID> m` or SPM `<PRE> <SUF> s <MID> p m` — with
    the PSM/SPM choice made per doc at `spm_rate` (the paper's 50/50
    joint training).

    Determinism contract: the cut points come from multiplicative
    integer hashing of the doc id (Knuth 2654435761 — exact BIGINT math
    in both engines; hex->int conversion is NOT portable, CLAUDE.md) and
    the mode from the engine's md5-hex rate cut, so a resumed/retried
    job emits byte-identical sequences. Docs under 3 tokens pass through
    unsplit (mode 'plain'). Pure JVM expressions, zero shuffle.

    Returns (id, mode, fim)."""
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    thr = rate_threshold_hex(spm_rate)
    tk = "tk"
    c1 = f"(1 + (({id_col} * 2654435761) % 1000003) % (size({tk}) - 1))"
    c2 = (
        f"(c1 + 1 + (({id_col} * 40503 + 2654435769) % 1000033) "
        f"% (size({tk}) - c1))"
    )
    spm = (
        f"substr(md5(concat('{seed}|', CAST({id_col} AS STRING))), 1, 8)"
        f" < '{thr}'"
    )
    parts = (
        "CASE WHEN spm THEN concat(array('<PRE>', '<SUF>'), array(suf), "
        "array('<MID>'), array(pre), array(mid)) "
        "ELSE concat(array('<PRE>'), array(pre), array('<SUF>'), "
        "array(suf), array('<MID>'), array(mid)) END"
    )
    return (
        corpus.withColumn(tk, F.split(F.col(text_col), " "))
        .withColumn("c1", F.expr(f"CASE WHEN size({tk}) >= 3 THEN {c1} END"))
        .withColumn("c2", F.expr(f"CASE WHEN size({tk}) >= 3 THEN {c2} END"))
        .withColumn("pre", F.expr(f"concat_ws(' ', slice({tk}, 1, c1))"))
        .withColumn(
            "mid", F.expr(f"concat_ws(' ', slice({tk}, c1 + 1, c2 - c1))")
        )
        .withColumn(
            "suf",
            F.expr(f"concat_ws(' ', slice({tk}, c2 + 1, size({tk}) - c2))"),
        )
        .withColumn("spm", F.expr(spm))
        .selectExpr(
            id_col,
            "CASE WHEN c1 IS NULL THEN 'plain' "
            "WHEN spm THEN 'spm' ELSE 'psm' END AS mode",
            f"CASE WHEN c1 IS NULL THEN {text_col} "
            f"ELSE concat_ws(' ', filter({parts}, x -> x != '')) END AS fim",
        )
    )


def fim_transform_sql(spm_rate: float = 0.5, seed: str = "fim") -> str:
    """DuckDB twin over the `documents` view — same multiplicative-hash
    cuts, same md5 mode cut, byte-identical output."""
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    thr = rate_threshold_hex(spm_rate)
    return f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
c AS (
  SELECT *,
    CASE WHEN len(tk) >= 3 THEN
      1 + ((doc_id * 2654435761) % 1000003) % (len(tk) - 1) END AS c1
  FROM t
),
c2t AS (
  SELECT *,
    CASE WHEN c1 IS NOT NULL THEN
      c1 + 1 + ((doc_id * 40503 + 2654435769) % 1000033) % (len(tk) - c1)
    END AS c2,
    substr(md5('{seed}|' || doc_id::VARCHAR), 1, 8) < '{thr}' AS spm
  FROM c
),
p AS (
  SELECT doc_id, text, spm, c1,
         array_to_string(tk[1 : c1], ' ') AS pre,
         array_to_string(tk[c1 + 1 : c2], ' ') AS mid,
         array_to_string(tk[c2 + 1 : len(tk)], ' ') AS suf
  FROM c2t
)
SELECT doc_id,
  CASE WHEN c1 IS NULL THEN 'plain' WHEN spm THEN 'spm' ELSE 'psm' END AS mode,
  CASE WHEN c1 IS NULL THEN text
       WHEN spm THEN array_to_string(
         list_filter(['<PRE>', '<SUF>', suf, '<MID>', pre, mid],
                     x -> x != ''), ' ')
       ELSE array_to_string(
         list_filter(['<PRE>', pre, '<SUF>', suf, '<MID>', mid],
                     x -> x != ''), ' ') END AS fim
FROM p
"""


def vocab_coverage(
    df: DataFrame,
    vocab: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-vocabulary coverage / OOV rate per document — the
    pre-training diagnostic that decides whether a tokenizer's vocab fits
    a corpus (high OOV ⇒ fertility blows up on exactly these docs; pairs
    with textstats.tokenizer_fertility). `vocab` is the known-token list
    (e.g. the top-N corpus terms or a tokenizer's word-level vocab
    export), folded into the plan as ONE literal array — at real vocab
    sizes (≤ a few 100k strings) this stays an executor-local array
    probe; beyond that, join against a vocab table instead.

    Plan: tokenize (the frozen analyzer contract) + one array_contains
    filter + size arithmetic — pure JVM expressions, ZERO shuffle.

    Returns (id, n_tokens, n_oov, oov_rate)."""
    vset = sorted(set(vocab))
    varr = F.array(*[F.lit(v) for v in vset])
    toks = tokens_expr(text_col)
    staged = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.filter(toks, lambda t: ~F.array_contains(varr, t))
        ).cast("long").alias("n_oov"),
    )
    return staged.select(
        id_col, "n_tokens", "n_oov",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_oov").cast("double") / F.col("n_tokens"),
        ).otherwise(F.lit(0.0)).alias("oov_rate"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 64,
) -> DataFrame:
    """Zipf-law fit over the corpus term-frequency distribution — the
    classic corpus-health diagnostic (natural text follows freq ∝
    rank^-alpha with alpha ≈ 1; template/spam corpora bend the curve):
    least-squares slope of ln(freq) on ln(rank) over the `top` most
    frequent terms, alpha = -slope.

    Plan: one tokenize + hash agg builds the term-frequency table (the
    same vocabulary-sized reduction the index's stats pass does), a
    row_number window ranks it (vocab-sized, the bounded-window argument
    every facet op uses), regr_slope folds the top slice in one
    aggregate. Ties rank deterministically by (freq DESC, term ASC).

    Returns one row (alpha, n_vocab, n_top)."""
    tf = (
        df.select(F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("term").asc())
    ranked = tf.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= int(top)
    )
    fit = ranked.agg(
        (-F.regr_slope(F.ln("c"), F.ln(F.col("r").cast("double")))).alias(
            "alpha"
        ),
        F.count(F.lit(1)).cast("long").alias("n_top"),
    )
    vocab = tf.agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    return fit.crossJoin(vocab).select("alpha", "n_vocab", "n_top")


def heaps_curve(
    df: DataFrame,
    ladder: "list[int]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps-law vocabulary-growth curve (the companion diagnostic to
    zipf_fit): distinct-term count among the corpus prefix `doc_id < N`
    for each ladder point — natural text grows vocab ∝ N^beta with
    beta ≈ 0.5; a flattening curve betrays template/duplicated text.

    Plan: the expensive reduction happens ONCE — tokenize + explode +
    per-term min(doc_id) (the vocab-sized hash agg the index's stats pass
    already proves scales); each ladder point is then one conditional
    count over the vocab table, all K in a single aggregate pass. Exact,
    not sampled; the prefix-by-id framing makes the answer deterministic
    and oracle-checkable (a time-ordered corpus would use its timestamp
    the same way).

    Returns (prefix_docs, vocab_size), one row per ladder point."""
    if not ladder:
        raise ValueError("ladder must be non-empty")
    first = (
        df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.min(id_col).alias("_first"))
    )
    aggs = [
        F.count_if(F.col("_first") < int(n)).cast("long").alias(f"_v{i}")
        for i, n in enumerate(ladder)
    ]
    row = first.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(n)).cast("long").alias("prefix_docs"),
                F.col(f"_v{i}").alias("vocab_size"),
            )
            for i, n in enumerate(ladder)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.prefix_docs", "p.vocab_size")
        .orderBy("prefix_docs")
    )


_LUHN_CAND_RE = "[0-9]{13,16}"  # shared Java/RE2 dialect, non-overlapping


def _luhn_valid_expr(c: str) -> str:
    """Spark SQL boolean: the digit string `c` passes the Luhn check —
    from the RIGHTMOST digit, every second digit doubles (9-wrapped),
    sum % 10 == 0. Pure integer fold, no UDF."""
    d = f"(ascii(substring({c}, i, 1)) - 48)"
    term = (
        f"CASE WHEN (length({c}) - i) % 2 = 0 THEN {d} "
        f"ELSE CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END END"
    )
    return (
        f"aggregate(sequence(1, length({c})), 0, (acc, i) -> acc + ({term}))"
        " % 10 = 0"
    )


def luhn_sql(c: str) -> str:
    """DuckDB twin of _luhn_valid_expr — identical integer math, DuckDB's
    list_reduce (INT state is safe; the struct-state gotcha in CLAUDE.md
    does not apply) over range()."""
    d = f"(ascii(substring({c}, i, 1)) - 48)"
    term = (
        f"CASE WHEN (length({c}) - i) % 2 = 0 THEN {d} "
        f"ELSE CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END END"
    )
    return (
        f"list_reduce(list_prepend(0, range(1, length({c}) + 1)),"
        f" (acc, i) -> acc + ({term})) % 10 = 0"
    )


def luhn_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Credit-card PII detection with Luhn validation (the pii_scrub
    family's high-precision member): 13-16 digit runs are candidates
    (non-overlapping regex, both engines' dialect), a pure integer fold
    checks the Luhn digit — random digit runs pass only ~10% of the
    time, so validation is what separates card numbers from ids/phone
    runs. Zero shuffle, no UDF.

    Returns (id, n_candidates, n_valid)."""
    cands = F.expr(f"regexp_extract_all({text_col}, '{_LUHN_CAND_RE}', 0)")
    valid = F.expr(
        f"size(filter(regexp_extract_all({text_col}, '{_LUHN_CAND_RE}', 0),"
        f" c -> {_luhn_valid_expr('c')}))"
    )
    return df.select(
        F.col(id_col),
        F.size(cands).cast("long").alias("n_candidates"),
        valid.cast("long").alias("n_valid"),
    )
