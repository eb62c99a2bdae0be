"""Distributed BPE tokenizer training + application.

Re-expresses byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
the subword algorithm behind GPT-2/RoBERTa vocabularies) the way it scales:

* the corpus reduces to its word VOCABULARY once (one hash aggregation with
  map-side partials — vocabulary size is sublinear in corpus size, so a
  100 TB corpus becomes a ~10M-row cached table);
* the iterative merge loop runs entirely over that vocab table — each
  iteration is one tiny pair-count aggregation (pairs are generated per
  DISTINCT word by a JVM lambda, weighted by word count) plus one
  vectorized symbol-array rebuild (a per-word JVM fold); the argmax merge
  decision is the only driver-side value per iteration (one row);
* applying the learned merge list to the corpus is a chain of per-word JVM
  array folds inlined into one projection — ZERO shuffle, embarrassingly
  parallel, linear in corpus bytes, so it rides the same scan as any other
  zero-shuffle textstats operator.

Merge-application semantics: greedy left-to-right non-overlapping, one pass
per merge rule — newly formed symbols do not re-merge under the same rule
within the pass (``aaa`` + merge (a,a) -> ``[aa, a]``), exactly the classic
algorithm. The fold kernel ``(acc, x) -> merge-or-append`` implements this
identically in Spark (``aggregate``) and DuckDB (``list_reduce``): a merged
symbol ``a||b`` is strictly longer than ``a`` so it can never re-trigger the
same rule as the new "last" element.

Determinism contract: ties break (count DESC, left ASC, right ASC); no RNG
anywhere, so the merge list is a pure function of the corpus. The oracle
twin re-trains with the independent pure-Python trainer (`bpe_learn_local`)
over the same vocabulary read through DuckDB and embeds the merges as SQL
literals — the trained-constants pattern of ``ann_topk_ivf``.

Deviation from Sennrich et al.: no end-of-word marker symbol (``</w>``) —
words are closed units here (the engine's frozen tokenizer already splits
them), so the marker would be a constant suffix on every word. Documented,
deterministic in both engines.

Reference behavior this extends: the reference pipeline ships raw text to
Elasticsearch and has no tokenizer-training stage; this is one of the
training-data-pipeline operators the brief adds as first-class components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .texthash import tokens_expr

__all__ = [
    "bpe_learn",
    "bpe_learn_local",
    "bpe_apply",
    "bpe_apply_word_sql",
    "chars_sql",
]

# symbols only ever contain characters matched by the tokenizer contract
# ([\p{L}\p{N}]+ — no quotes, no backslashes), so SQL literal embedding is
# structurally safe; _sq() guards against misuse with other alphabets.


def _sq(s: str) -> str:
    if "'" in s or "\\" in s:
        raise ValueError(f"BPE symbol {s!r} contains SQL-literal metacharacters")
    return f"'{s}'"


def chars_sql(word: str) -> str:
    """Symbol init: the word split into single characters (both engines
    spell substring identically; sequence/generate_series differ — this is
    the Spark spelling, the DuckDB twin lives in bpe_apply_word_sql)."""
    return f"transform(sequence(1, length({word})), i -> substring({word}, i, 1))"


def _merge_fold_spark(inner: str, a: str, b: str) -> str:
    """One merge application over a symbol-array expression (Spark SQL).

    IF guards keep element_at off empty arrays (ANSI mode); a merged symbol
    is appended in place of the popped last element, implementing the
    greedy left-to-right single-pass contract (see module docstring)."""
    m = _sq(a + b)
    return (
        f"aggregate({inner}, cast(array() as array<string>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = {_sq(a)} AND x = {_sq(b)}, "
        f"concat(slice(acc, 1, size(acc) - 1), array({m})), "
        f"concat(acc, array(x))))"
    )


def _merge_fold_duck(inner: str, a: str, b: str) -> str:
    """DuckDB twin of _merge_fold_spark: list_reduce has no init slot, so
    elements are wrapped as single-element lists (acc starts as the first
    wrapped element — identical result for the non-empty words the
    tokenizer emits). LIST accumulator on purpose: DuckDB 1.0 struct-state
    lambdas evaluate fields sequentially (CLAUDE.md gotcha)."""
    m = _sq(a + b)
    return (
        f"list_reduce(list_transform({inner}, _e -> [_e]), (acc, x) -> "
        f"CASE WHEN acc[-1] = {_sq(a)} AND x[1] = {_sq(b)} "
        f"THEN acc[:length(acc) - 1] || [{m}] ELSE acc || x END)"
    )


def apply_merges_spark_sql(word: str, merges) -> str:
    """Spark SQL expression: `word` (a string expr) -> BPE symbol array
    after applying `merges` in order. Expression size is linear in the
    number of merges (each fold wraps the previous once)."""
    e = chars_sql(word)
    for mg in merges:
        e = _merge_fold_spark(e, mg[0], mg[1])
    return e


def bpe_apply_word_sql(word: str, merges) -> str:
    """DuckDB twin of apply_merges_spark_sql: the same fold chain spelled
    with list_reduce. Each fold re-wraps elements as single-element lists
    (list_reduce has no init slot); the lambda's `acc || x` appends x's one
    element, so every fold returns a plain list-of-strings again."""
    e = f"list_transform(generate_series(1, length({word})), i -> substr({word}, i, 1))"
    for mg in merges:
        e = _merge_fold_duck(e, mg[0], mg[1])
    return e


# --- training -------------------------------------------------------------

_PAIRS_EXPR = (
    "IF(size(syms) >= 2, transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)), "
    "cast(array() as array<struct<a:string,b:string>>))"
)


def bpe_learn(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn `num_merges` BPE merges from a corpus, distributed.

    Returns [(left, right, pair_count), ...] in merge order. Training stops
    early when the best remaining pair occurs < min_count times.

    Scale shape: ONE corpus pass builds the (word, count) vocabulary
    (map-side-partial hash agg), eagerly localCheckpoint'ed so no iteration
    ever touches the corpus again. Each iteration aggregates vocab-sized
    pair rows (pairs enumerated per distinct word by a JVM transform — no
    corpus-sized explode) and folds one merge into the cached symbol
    arrays; lineage is cut every `checkpoint_every` folds so the plan never
    accretes unbounded expression depth. Words of length 1 contribute no
    pairs and are dropped from the training vocab up front (they cannot
    affect any merge decision)."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = (
        df.select(F.explode(tokens_expr(text_col)).alias("wd"))
        .where(F.length("wd") >= 2)
        .groupBy("wd")
        .agg(F.count("*").alias("c"))
        .select(F.expr(chars_sql("wd")).alias("syms"), "c")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    since_ckpt = 0
    for _ in range(num_merges):
        top = (
            vocab.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "c")
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .head(1)
        )
        if not top or int(top[0]["cnt"]) < min_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.select(
            F.expr(_merge_fold_spark("syms", a, b)).alias("syms"), "c"
        )
        since_ckpt += 1
        if since_ckpt >= checkpoint_every:
            vocab = vocab.localCheckpoint(eager=True)
            since_ckpt = 0
    return merges


def bpe_learn_local(
    vocab: "list[tuple[str, int]]",
    num_merges: int,
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Pure-Python reference trainer over a (word, count) vocabulary —
    independent of Spark; the oracle twin trains through this over the
    vocabulary read via DuckDB, then embeds the merges as SQL literals."""
    syms = [([ch for ch in w], int(c)) for w, c in vocab if len(w) >= 2]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, c in syms:
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        syms = [(_apply_local(s, a, b), c) for s, c in syms]
    return merges


def _apply_local(s: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def bpe_apply(
    df: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list: (id, bpe symbol array).

    One projection, zero shuffle: tokens are staged in their own projection
    (Catalyst does not CSE lambda subtrees — the dsir lesson), then each
    word runs the merge-fold chain inline. At any corpus size this is a
    pure map — the 100 TB design point is exactly this plan."""
    pairs = [(m[0], m[1]) for m in merges]
    toks = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    word_expr = apply_merges_spark_sql("wd", pairs)
    return toks.select(
        F.col(id_col),
        F.expr(f"flatten(transform(_toks, wd -> {word_expr}))").alias(out_col),
    )
