"""Multi-term query rewrite over the term dictionary (round 3).

Elasticsearch's prefix / wildcard / fuzzy queries are Lucene MultiTermQuery
rewrites: enumerate the matching terms from the term dictionary, then run
the expansion as a boolean query. The reference exposes that surface through
its Lucene query strings (wildcards in `q=`,
/root/reference/asset/elasticsearch_reader/index.js:118-122) but delegates
the enumeration to ES. Here the term dictionary IS the index's distributed
stats table (term, df, cf), so enumeration is a pushed-down Spark filter:

  prefix    `term LIKE 'pre%'`   -> StringStartsWith, parquet-pushed
  wildcard  leading-literal StartsWith conjunct (pushed) + anchored rlike
  fuzzy     length band (pushed) + optional prefix + JVM levenshtein

The matched (term, df) rows are collected driver-side — a *vocabulary*-level
result (bounded by `max_expansions`), never a corpus scan. Capping picks the
highest-df terms first (Lucene's TopTermsRewrite order), tie-broken by term.

Scoring contract: the expansion runs as a scored OR query with each term's
real idf — Lucene's `scoring_boolean` rewrite — so results have an exact
SQL oracle. (ES's default `constant_score_blended` blends the dfs; we keep
per-term idf for oracle exactness and document the deviation here.)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

# matches Java regex metacharacters we must escape when translating globs
_GLOB_SPECIALS = re.compile(r"([.^$+{}\[\]()|\\])")


def wildcard_to_regex(pattern: str) -> str:
    """Glob (`*` any run, `?` one char) -> anchored Java/RE2 regex."""
    esc = _GLOB_SPECIALS.sub(r"\\\1", pattern)
    return "^" + esc.replace("*", ".*").replace("?", ".") + "$"


def wildcard_to_like(pattern: str) -> str:
    """Glob -> SQL LIKE pattern (terms are L*+N* runs, so literal `%`/`_`
    never appear in a term; a pattern containing them matches nothing on
    the engine side and we escape them for the SQL side)."""
    return (
        pattern.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
        .replace("?", "_")
    )


def literal_prefix(pattern: str) -> str:
    """Longest literal prefix before the first glob metachar — the part a
    parquet StartsWith filter can push down."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def prefix_condition(prefix: str) -> Column:
    return F.col("term").startswith(prefix)


def wildcard_condition(pattern: str) -> Column:
    cond = F.col("term").rlike(wildcard_to_regex(pattern))
    lit = literal_prefix(pattern)
    if lit:  # pushed-down scan narrowing; rlike re-verifies
        cond = F.col("term").startswith(lit) & cond
    return cond


def regexp_literal_prefix(pattern: str) -> str:
    """Longest leading run of plain literal chars (letters/digits) before
    the first regex metacharacter — pushable as StartsWith. Conservative: a
    literal followed by `*`/`?`/`{` quantifies the previous char, so the
    char before a quantifier is excluded too."""
    lit = []
    for i, ch in enumerate(pattern):
        if not ch.isalnum():
            break
        nxt = pattern[i + 1] if i + 1 < len(pattern) else ""
        if nxt and nxt in "*?+{":
            break
        lit.append(ch)
    return "".join(lit)


def regexp_condition(pattern: str) -> Column:
    """ES regexp query: the pattern is implicitly anchored to the WHOLE
    term (Lucene RegexpQuery semantics — `jo.*` matches `join`, `o.*`
    does not). Non-capturing anchor wrap keeps alternations whole; the
    literal prefix (if any) narrows the pushed-down dictionary scan."""
    cond = F.col("term").rlike(f"^(?:{pattern})$")
    lit = regexp_literal_prefix(pattern)
    if lit:
        cond = F.col("term").startswith(lit) & cond
    return cond


def fuzzy_condition(term: str, max_edits: int = 1, prefix_length: int = 0) -> Column:
    """Terms within `max_edits` Levenshtein distance (includes distance 0,
    the ES contract). The |len| band is a pushable pre-filter; the distance
    itself is Spark's JVM levenshtein."""
    n = len(term)
    cond = (F.length("term") >= n - max_edits) & (F.length("term") <= n + max_edits)
    if prefix_length > 0:
        cond = cond & F.col("term").startswith(term[:prefix_length])
    return cond & (F.levenshtein(F.col("term"), F.lit(term)) <= max_edits)


def parse_fuzziness(spec: "int | str", term: str) -> int:
    """ES `fuzziness` values: an integer edit count, or `AUTO[:low,high]`
    — 0 edits for terms shorter than `low` (default 3), 1 below `high`
    (default 6), else 2 (the ES AUTO ladder). Resolved at planning time
    from the QUERY term's length, exactly like ES."""
    if isinstance(spec, int):
        return spec
    m = re.match(r"^AUTO(?::(\d+),(\d+))?$", str(spec).strip(), re.I)
    if not m:
        raise ValueError(
            f"fuzziness must be an int or 'AUTO[:low,high]', got {spec!r}"
        )
    low, high = (
        (int(m.group(1)), int(m.group(2))) if m.group(1) else (3, 6)
    )
    if not (0 < low < high):
        raise ValueError(f"AUTO needs 0 < low < high, got {spec!r}")
    n = len(term)
    return 0 if n < low else (1 if n < high else 2)


def osa_distances(q: str, terms) -> "object":
    """Optimal-string-alignment (restricted Damerau) distances from `q` to
    every term in a numpy unicode array — Lucene's `transpositions=true`
    fuzziness metric (an adjacent swap costs 1; unlike UNRESTRICTED
    Damerau, no substring is edited twice, so OSA('ca','abc') = 3 where
    Damerau = 2 — DuckDB's damerau_levenshtein is the unrestricted one;
    the two coincide at distance <= 1).

    Vectorized over the candidate batch: terms view as a 0-padded UTF-32
    char matrix (numpy '<U' arrays are fixed-width code points), the DP
    runs |q| x maxlen rounds of whole-batch vector ops — no per-row
    Python."""
    import numpy as np

    terms = np.asarray(terms, dtype="U")
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if terms.dtype.itemsize == 0:  # all-empty batch
        return np.full(n, len(q), dtype=np.int64)
    L = terms.dtype.itemsize // 4
    T = terms.view(np.uint32).reshape(n, L)
    tlens = (T != 0).sum(axis=1)
    m = len(q)
    Q = np.array([ord(c) for c in q], dtype=np.uint32)
    prev2 = None
    prev = np.broadcast_to(
        np.arange(L + 1, dtype=np.int64), (n, L + 1)
    ).copy()
    for i in range(1, m + 1):
        cur = np.empty((n, L + 1), dtype=np.int64)
        cur[:, 0] = i
        sub = (T != Q[i - 1]).astype(np.int64)
        for j in range(1, L + 1):
            c = np.minimum(prev[:, j] + 1, prev[:, j - 1] + sub[:, j - 1])
            np.minimum(c, cur[:, j - 1] + 1, out=c)
            if i > 1 and j > 1:
                trans = (T[:, j - 1] == Q[i - 2]) & (T[:, j - 2] == Q[i - 1])
                c = np.where(trans, np.minimum(c, prev2[:, j - 2] + 1), c)
            cur[:, j] = c
        prev2, prev = prev, cur
    return prev[np.arange(n), tlens]


def expand_fuzzy_osa(
    stats,
    term: str,
    max_edits: int = 1,
    prefix_length: int = 0,
    max_expansions: int | None = None,
) -> list[str]:
    """Fuzzy expansion under Lucene's DEFAULT metric (transpositions=true,
    OSA): a JVM pre-filter enumerates the candidate band distributed —
    length band (OSA >= |len diff|, pushable) + optional literal prefix +
    levenshtein <= 2*max_edits (a transposition costs <= 2 plain edits, so
    OSA <= e implies lev <= 2e) — then the exact OSA check runs once on
    the collected candidate rows (vocabulary-band-sized planning data,
    same altitude as every other rewrite's collect) with the vectorized
    kernel. Capping keeps highest-df first (TopTermsRewrite order)."""
    import numpy as np

    n = len(term)
    cond = (F.length("term") >= n - max_edits) & (
        F.length("term") <= n + max_edits
    )
    if prefix_length > 0:
        cond = cond & F.col("term").startswith(term[:prefix_length])
    cond = cond & (
        F.levenshtein(F.col("term"), F.lit(term)) <= 2 * max_edits
    )
    rows = stats.where(cond).select("term", "df").collect()
    if not rows:
        return []
    cands = np.array([r["term"] for r in rows], dtype="U")
    dfs = np.array([r["df"] for r in rows], dtype=np.int64)
    keep = osa_distances(term, cands) <= max_edits
    cands, dfs = cands[keep], dfs[keep]
    order = np.lexsort((cands, -dfs))
    if max_expansions is not None:
        order = order[:max_expansions]
    return sorted(str(t) for t in cands[order])


def expand_terms(stats, cond: Column, max_expansions: int | None = None) -> list[str]:
    """Enumerate matching dictionary terms, highest-df first under a cap.

    `stats` is the index's (term, df, cf) DataFrame; the filter runs
    distributed over the vocabulary and only the matched terms (≤ cap)
    reach the driver — the Lucene rewrite enumeration re-expressed as a
    pushed-down scan."""
    sdf = stats.where(cond).select("term", "df")
    if max_expansions is not None:
        sdf = sdf.orderBy(F.col("df").desc(), F.col("term").asc()).limit(
            max_expansions
        )
    return sorted(r["term"] for r in sdf.collect())


def synonym_groups(
    terms: list[str], synonyms: dict[str, list[str]]
) -> list[list[str]]:
    """Query-time synonym expansion (the ES synonym_graph token filter as
    applied by the search analyzer): each query term becomes the clause
    group {term} ∪ synonyms[term] — one Lucene BooleanQuery clause whose
    members are interchangeable. Groups feed the engine's clause-level
    group kernel (wand.topk_group_conjunctive). Expansion is symmetric
    only if the caller's map is (ES equivalent-synonyms lists expand every
    direction; a one-way `a => b` map is the contraction form)."""
    if not terms:
        raise ValueError("synonym expansion needs at least one query term")
    groups: list[list[str]] = []
    for t in terms:
        alts = synonyms.get(t, [])
        if any(not isinstance(a, str) or not a for a in alts):
            raise ValueError(f"invalid synonym list for {t!r}")
        groups.append(sorted({t, *alts}))
    return groups


# ---------------------------------------------------------------------------
# S-stemmer (Harman 1991, "How effective is suffixing?")
# ---------------------------------------------------------------------------


def s_stem(term: str) -> str:
    """The three-rule S-stemmer: ies->y (not aies/eies), es->e (not
    aes/ees/oes), trailing s dropped (not us/ss). Deterministic and
    cheap enough to run as a column expression over the whole dictionary."""
    if term.endswith("ies") and not term.endswith(("aies", "eies")):
        return term[:-3] + "y"
    if term.endswith("es") and not term.endswith(("aes", "ees", "oes")):
        return term[:-1]
    if term.endswith("s") and not term.endswith(("us", "ss")):
        return term[:-1]
    return term


def s_stem_col(colname: str) -> Column:
    """JVM column twin of s_stem: the SAME CASE-chain SQL text compiled by
    Catalyst (s_stem_sql is valid in both dialects — that shared text IS
    the bit-parity argument, same trick as geohash_sql/ip_prefix_key_sql)."""
    return F.expr(s_stem_sql(colname))


def s_stem_sql(col: str) -> str:
    """Shared CASE-expression text: valid Spark SQL AND DuckDB SQL, so
    engine and oracle stem with byte-identical logic."""
    return (
        f"CASE "
        f"WHEN {col} LIKE '%ies' AND {col} NOT LIKE '%aies' "
        f"AND {col} NOT LIKE '%eies' "
        f"THEN substr({col}, 1, length({col}) - 3) || 'y' "
        f"WHEN {col} LIKE '%es' AND {col} NOT LIKE '%aes' "
        f"AND {col} NOT LIKE '%ees' AND {col} NOT LIKE '%oes' "
        f"THEN substr({col}, 1, length({col}) - 1) "
        f"WHEN {col} LIKE '%s' AND {col} NOT LIKE '%us' "
        f"AND {col} NOT LIKE '%ss' "
        f"THEN substr({col}, 1, length({col}) - 1) "
        f"ELSE {col} END"
    )


def wildcard_runs(pattern: str) -> "list[str]":
    """Literal runs of a glob pattern (the text between `*`/`?`)."""
    import re as _re

    return [r for r in _re.split(r"[*?]+", pattern) if r]


def trigram_dictionary(stats: DataFrame) -> DataFrame:
    """(gram, term) rows derived from the term dictionary — the engine's
    analog of the ES `wildcard` FIELD TYPE's n-gram subfield. Vocab-sized
    (≤ ~len(term) grams per distinct term); at 10^12 docs persist it
    gram-sorted next to stats/ at build time, so candidate lookups are a
    pushed `gram IN (...)` scan instead of a full-dictionary regex."""
    grams = F.expr(
        "transform(sequence(1, greatest(length(term) - 2, 0)),"
        " i -> substring(term, i, 3))"
    )
    return stats.select(
        F.explode(F.array_distinct(grams)).alias("gram"), "term"
    )


def wildcard_candidates_trigram(
    tri: DataFrame, pattern: str
) -> "DataFrame | None":
    """Candidate dictionary terms for a glob via the trigram table: a term
    qualifies only if it contains EVERY 3-gram of every literal run
    (necessary condition), then the full glob regex verifies candidates
    only — rank-identical to the brute-force dictionary scan by
    construction. Returns None when no run yields a trigram (pattern too
    wild — the caller falls back to the full scan, like ES does when the
    n-gram subfield can't prune)."""
    grams = sorted(
        {run[i : i + 3] for run in wildcard_runs(pattern)
         for i in range(len(run) - 2)}
    )
    if not grams:
        return None
    cand = (
        tri.where(F.col("gram").isin(grams))
        .groupBy("term")
        .agg(F.count_distinct("gram").alias("_g"))
        .where(F.col("_g") == len(grams))
    )
    return cand.where(
        F.col("term").rlike(wildcard_to_regex(pattern))
    ).select("term")
