"""Shared text/hash column expressions for the pipeline operators.

Everything here is a pure Spark column expression (JVM-side, codegen'd,
zero shuffle, zero Python in the data path) with an exactly-equivalent
DuckDB SQL spelling, so every operator built on these can be oracle-checked
value-for-value. The cross-engine 60-bit hash is
``int(md5(s)[:15], 16)`` — Spark ``conv(substring(md5(s),1,15),16,10)``,
DuckDB ``('0x' || substr(md5(s),1,15))::BIGINT`` — verified identical.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Unicode word tokens (letters/digits, no underscore) — same RE class syntax
# compiles in Java regex (Spark) and RE2 (DuckDB). ASCII-equal to the engine
# tokenizer contract in analysis/tokenizer.py.
TOKEN_RE = r"[\p{L}\p{N}]+"

# Mersenne prime 2^31-1: (a*(h%P)+b) stays < 2^62 — no int64 overflow in
# either engine's checked arithmetic.
MH_PRIME = 2_147_483_647

# fixed minhash permutation constants (a odd, deterministic; "seed" is the
# index — no RNG so builds are reproducible)
MINHASH_PERMS: list[tuple[int, int]] = [
    (1_203_114_875, 613_057_807),
    (1_150_398_525, 197_658_381),
    (1_848_328_561, 903_984_123),
    (697_032_217, 1_557_224_949),
    (1_402_737_197, 1_110_088_775),
    (923_250_187, 365_209_627),
    (1_714_585_547, 744_100_223),
    (533_090_721, 1_942_490_727),
]


def tokens_expr(text: str | Column) -> Column:
    """Lowercased Unicode word tokens, duplicates preserved (tf carrier)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def tokens_sql(text: str = "text") -> str:
    return f"regexp_extract_all(lower({text}), '{TOKEN_RE}')"


def hash60_expr(s: Column) -> Column:
    """60-bit deterministic string hash, identical across Spark and DuckDB."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash60_sql(s: str) -> str:
    return f"('0x' || substr(md5({s}), 1, 15))::BIGINT"


def shingles_expr(toks: Column, n: int) -> Column:
    """Word n-grams (space-joined), empty when the doc has < n tokens."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(toks: str, n: int) -> str:
    if n == 1:
        return toks
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_apply(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def minhash_expr(shingles: Column, k: int = 8) -> Column:
    """k-value MinHash signature as array<long> — per-row, NO shuffle.

    min over shingles of ((a_j*(h60(s) mod P) + b_j) mod P); empty docs get
    sentinel P (larger than any real hash value).
    """
    uniq = F.array_distinct(shingles)
    sig = []
    for j in range(k):
        a, b = MINHASH_PERMS[j]
        hashed = F.transform(
            uniq, lambda s: (F.lit(a) * (hash60_expr(s) % MH_PRIME) + F.lit(b)) % MH_PRIME
        )
        sig.append(F.coalesce(F.array_min(hashed), F.lit(MH_PRIME)))
    return F.array(*sig)


def minhash_sql(shingles: str, k: int = 8) -> str:
    parts = []
    for j in range(k):
        a, b = MINHASH_PERMS[j]
        parts.append(
            f"coalesce(list_min(list_apply(list_distinct({shingles}), "
            f"s -> ({a} * ({hash60_sql('s')} % {MH_PRIME}) + {b}) % {MH_PRIME})), {MH_PRIME})"
        )
    return "[" + ", ".join(parts) + "]"


def simhash_expr(hashes: Column, n_bits: int = 32) -> Column:
    """n_bit SimHash from a per-token hash array (array<long>), as a long.

    bit_j = 1 iff sum over token occurrences of ±1 (by bit j of the token's
    hash) is > 0. Takes the ALREADY-HASHED array so callers stage the md5
    work in its own projection and it runs once per token, not once per bit
    (Catalyst keeps multi-referenced non-trivial projections un-inlined).
    """
    acc = F.lit(0).cast("long")
    for j in range(n_bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda s, h: s + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        acc = acc + F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
    return acc


def simhash_sql(hashes: str, n_bits: int = 32) -> str:
    """DuckDB spelling over a pre-hashed BIGINT list column."""
    terms = []
    for j in range(n_bits):
        terms.append(
            f"CASE WHEN list_sum(list_apply({hashes}, "
            f"h -> CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN {2**j}::BIGINT ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def token_hashes_sql(toks: str) -> str:
    return f"list_apply({toks}, t -> {hash60_sql('t')})"


def edge_ngrams_expr(toks: Column, lo: int = 2, hi: int = 4) -> Column:
    """Search-as-you-type index-time analyzer: each token expands to its
    distinct leading prefixes of length lo..hi plus the full token
    (substr caps at the token length in BOTH engines, so short tokens
    collapse into themselves — identical expansion by construction)."""
    if not (1 <= lo <= hi):
        raise ValueError("need 1 <= lo <= hi")
    return F.flatten(
        F.transform(
            toks,
            lambda t: F.array_distinct(
                F.concat(
                    F.array(
                        *[F.substring(t, 1, n) for n in range(lo, hi + 1)]
                    ),
                    F.array(t),
                )
            ),
        )
    )


def edge_ngrams_sql(toks: str, lo: int = 2, hi: int = 4) -> str:
    subs = ", ".join(f"t[1:{n}]" for n in range(lo, hi + 1))
    return (
        f"flatten(list_apply({toks}, "
        f"t -> list_distinct(list_append([{subs}], t))))"
    )
