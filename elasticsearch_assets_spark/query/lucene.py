"""Lucene-subset query language -> Spark Column predicates + BM25 term list.

The reference ANDs a user-supplied Lucene `query`/`q=` string onto every
slice (/root/reference/asset/elasticsearch_reader/index.js:118-122, composed
at /root/reference/asset/simple_api_reader/index.js:67-84). Forms observed in
its tests (/root/reference/test/simple_api_reader-spec.js:42-172):

    foo:bar                          field term
    foo:"bar+baz"                    phrase
    test:query OR other:thing AND bytes:>=2000
    date:[2015-01-01 TO 2015-01-02}  range, '['/']' inclusive, '{'/'}' exclusive
    key:ba*                          prefix wildcard (id reader's _uid form)
    spark join                       bare terms -> full-text (BM25) match

AND binds tighter than OR; NOT is prefix; parentheses group; implicit
adjacency is AND. Bare/analyzed terms compile to token-membership predicates
for filtering and are also exposed via `text_terms()` for BM25 scoring
(free-text relevance is Half B; the reference delegates it to ES).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Term:
    field: str | None
    value: str
    boost: float = 1.0  # Lucene `term^boost` (1.0 = unboosted)


@dataclass(frozen=True)
class Phrase:
    field: str | None
    value: str
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix:
    field: str | None
    value: str  # without the trailing *
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    field: str | None
    value: str  # raw pattern with * (any run) and ? (single char)
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy:
    field: str | None
    value: str
    max_edits: int  # Lucene `term~` defaults to 2, `term~N` pins it
    boost: float = 1.0


@dataclass(frozen=True)
class Cmp:
    field: str
    op: str  # >= <= > <
    value: str


@dataclass(frozen=True)
class Range:
    field: str
    lo: str
    hi: str
    incl_lo: bool
    incl_hi: bool


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    child: object


def _boosted(node, w: float):
    """Apply a caret boost to a parsed clause: leaves multiply their boost
    (Lucene folds `clause^w` into the leaf scorers), groups distribute to
    children, filter-context nodes (Range/Cmp/Not) ignore it — exactly the
    ES rule that boost is meaningless in filter context."""
    import dataclasses

    if isinstance(node, (Term, Phrase, Prefix, Wildcard, Fuzzy)):
        return dataclasses.replace(node, boost=node.boost * w)
    if isinstance(node, And):
        return And(tuple(_boosted(c, w) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(_boosted(c, w) for c in node.children))
    return node


# ---------------------------------------------------------------------------
# tokenizer + recursive-descent parser
# ---------------------------------------------------------------------------

# terms may contain backslash-escaped specials (\:, \(, \), \", \\ …)
_TOKEN_RE = re.compile(
    r"""
    \s*(
        \(|\)|
        "[^"]*"|
        \[[^\]\}]*(\]|\})|
        \{[^\]\}]*(\]|\})|
        AND\b|OR\b|NOT\b|
        (?:\\.|[^\s():\\])+:|
        (?:\\.|[^\s()\\])+
    )
    """,
    re.VERBOSE,
)

_ESCAPE_RE = re.compile(r"\\(.)")


def _unescape(v: str) -> str:
    return _ESCAPE_RE.sub(r"\1", v)


def _tokenize_query(q: str) -> list[str]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"bad query near {q[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr(None)
        if self.peek() is not None:
            raise ValueError(f"trailing tokens at {self.toks[self.i:]}")
        return node

    # `ctx` is the field a surrounding `field:(...)` group puts in scope:
    # every field-less clause inside — terms, comparators, ranges,
    # wildcards — binds to it; explicit inner fields win.
    def or_expr(self, ctx: str | None):
        kids = [self.and_expr(ctx)]
        while self.peek() == "OR":
            self.take()
            kids.append(self.and_expr(ctx))
        return kids[0] if len(kids) == 1 else Or(tuple(kids))

    def and_expr(self, ctx: str | None):
        kids = [self.unary(ctx)]
        while True:
            t = self.peek()
            if t == "AND":
                self.take()
                kids.append(self.unary(ctx))
            elif t is not None and t not in ("OR", ")"):
                kids.append(self.unary(ctx))  # implicit adjacency = AND
            else:
                break
        return kids[0] if len(kids) == 1 else And(tuple(kids))

    def unary(self, ctx: str | None):
        t = self.peek()
        if t == "NOT":
            self.take()
            return self._maybe_boost(Not(self.unary(ctx)))
        if t == "(":
            self.take()
            node = self.or_expr(ctx)
            if self.take() != ")":
                raise ValueError("unbalanced parens")
            return self._maybe_boost(node)
        return self._maybe_boost(self.clause(ctx))

    _BOOST_TOKEN_RE = re.compile(r"^\^(\d+(?:\.\d+)?)$")

    def _maybe_boost(self, node):
        """Consume a standalone `^N` token following a clause — the boost
        spelling for quoted phrases (`"a b"^2`), groups (`(a OR b)^2`) and
        ranges, whose tokens end before the caret. Attached boosts
        (`term^2`) are stripped inside value_clause."""
        t = self.peek()
        if t is None:
            return node
        m = self._BOOST_TOKEN_RE.match(t)
        if not m:
            return node
        self.take()
        return _boosted(node, float(m.group(1)))

    @staticmethod
    def _is_field_token(t: str) -> bool:
        """A token is a field clause iff it ends in an UNESCAPED colon.
        Escape-ness is decided by the parity of the backslash run before
        the colon: odd = the colon is escaped (`foo\\:` -> term "foo:"),
        even = the backslashes escape each other and the colon is a real
        separator (`foo\\\\:` -> field named "foo\\")."""
        if not t.endswith(":"):
            return False
        body = t[:-1]
        n_bs = len(body) - len(body.rstrip("\\"))
        return n_bs % 2 == 0

    def clause(self, ctx: str | None):
        t = self.take()
        if self._is_field_token(t):
            field = _unescape(t[:-1])
            if self.peek() == "(":
                # field:(...) — group contents inherit the field, incl.
                # comparators/ranges: count:(>10 AND <20)
                self.take()
                node = self.or_expr(field)
                if self.take() != ")":
                    raise ValueError("unbalanced parens in field group")
                return node
            v = self.take()
            return self.value_clause(field, v)
        return self.value_clause(ctx, t)

    def value_clause(self, field: str | None, v: str):
        if v.startswith('"') and v.endswith('"'):
            return Phrase(field, v[1:-1])
        # attached caret boost (`term^2`, `jo*^1.5`, `word~1^2`): the caret
        # is a boost iff unescaped (backslash-run parity, as for `:`/`~`)
        boost = 1.0
        mb = re.match(r"^(.+)\^(\d+(?:\.\d+)?)$", v)
        if mb:
            body = mb.group(1)
            n_bs = len(body) - len(body.rstrip("\\"))
            if n_bs % 2 == 0:
                v, boost = body, float(mb.group(2))
        if boost != 1.0:
            return _boosted(self._value_clause_inner(field, v), boost)
        return self._value_clause_inner(field, v)

    def _value_clause_inner(self, field: str | None, v: str):
        if v and v[0] in "[{":
            incl_lo = v[0] == "["
            incl_hi = v[-1] == "]"
            body = v[1:-1].strip()
            parts = re.split(r"\s+TO\s+", body)
            if len(parts) != 2 or field is None:
                raise ValueError(f"bad range {v!r}")
            return Range(field, parts[0], parts[1], incl_lo, incl_hi)
        m = re.match(r"(>=|<=|>|<)(.+)$", v)
        if m:
            if field is None:
                raise ValueError(f"comparator needs a field: {v!r}")
            return Cmp(field, m.group(1), m.group(2))
        # fuzzy: `term~` (2 edits, the Lucene default) or `term~N`; the
        # tilde is fuzzy iff unescaped (backslash-run parity, as for `:`)
        m = re.match(r"^(.+?)~(\d?)$", v)
        if m:
            body = m.group(1)
            n_bs = len(body) - len(body.rstrip("\\"))
            has_wild = any(not esc for _, esc in _wild_chars(body))
            if n_bs % 2 == 0 and not has_wild:
                return Fuzzy(
                    field, _unescape(body), int(m.group(2) or 2)
                )
        # wildcards: unescaped * (any run) / ? (single char). A trailing *
        # with no other wildcard is the fast Prefix form.
        specials = [c for c, esc in _wild_chars(v) if not esc]
        if specials:
            if specials == ["*"] and v.endswith("*") and "?" not in v:
                return Prefix(field, _unescape(v[:-1]))
            return Wildcard(field, v)
        return Term(field, _unescape(v))


def _wild_chars(v: str):
    """Yield (char, was_escaped) for wildcard chars in a raw token."""
    i = 0
    while i < len(v):
        if v[i] == "\\" and i + 1 < len(v):
            if v[i + 1] in "*?":
                yield v[i + 1], True
            i += 2
            continue
        if v[i] in "*?":
            yield v[i], False
        i += 1


def parse_lucene(q: str):
    return _Parser(_tokenize_query(q)).parse()


def parse_kql(q: str):
    """Parse the KQL (Kibana Query Language) subset that maps onto the
    Lucene-subset AST by spelling translation
    (ref: /root/reference uses query strings; KQL is the ES|QL `KQL()`
    function's dialect):

    - lowercase word operators `and` / `or` / `not` (KQL's spelling) ->
      uppercase Lucene operators,
    - `field : value` with optional whitespace around the colon ->
      `field:value` (KQL allows the space, Lucene's grammar does not),
    - `field > 5` / `field >= 5` comparator spacing -> `field:>5`,
    - quoted phrases, wildcards, parenthesized field groups
      (`field: (a or b)`) pass through — the Lucene parser already
      accepts those shapes.

    Unsupported KQL-only constructs (nested-field `{}` syntax,
    `field: *` existence shorthand) raise with guidance."""
    if re.search(r"\{", q):
        raise ValueError(
            "KQL nested-field `{...}` syntax is not supported; flatten "
            "the field path"
        )
    out = []
    i, in_str = 0, False
    while i < len(q):
        ch = q[i]
        if ch == '"':
            in_str = not in_str
            out.append(ch)
            i += 1
            continue
        if in_str:
            out.append(ch)
            i += 1
            continue
        m = re.match(r"(and|or|not)(?![\w])", q[i:], re.I)
        if m and (not out or not (out[-1].isalnum() or out[-1] in "._")):
            out.append(m.group(1).upper())
            i += len(m.group(1))
            continue
        m = re.match(r"\s*:\s*", q[i:])
        if m and out and (out[-1].isalnum() or out[-1] in "._"):
            out.append(":")
            i += len(m.group(0))
            continue
        m = re.match(r"\s*(>=|<=|>|<)\s*", q[i:])
        if m and out and (out[-1].isalnum() or out[-1] in "._"):
            out.append(":" + m.group(1))
            i += len(m.group(0))
            continue
        out.append(ch)
        i += 1
    s = "".join(out)
    # `field: *` existence shorthand -> the Lucene surface's `_exists_:f`
    # (same IsNotNull compile, pushed to the scan)
    s = re.sub(r"([\w.]+):\s*\*(?![\w?*])", r"_exists_:\1", s)
    if re.search(r":\s*\*(?![\w?*])", s):
        raise ValueError(
            "KQL `field: *` existence needs a plain field name on the left"
        )
    return parse_lucene(s)


# ---------------------------------------------------------------------------
# compiler: AST -> Spark Column predicate
# ---------------------------------------------------------------------------

# JVM-side analyzer mirror: lowercase + split on non-letter/number runs.
# Same Unicode class definition as the normative RE2 kernel
# (analysis/tokenizer.py `[^\p{L}\p{N}]+`) — Java regex supports \p{L}/\p{N}
# natively, so `text:café` filters exactly as the index analyzes (tested on
# mixed-script text in tests/test_lucene.py).
_JVM_SPLIT_PATTERN = "[^\\p{L}\\p{N}]+"


def _tokens_col(text_col: str) -> Column:
    return F.array_remove(
        F.split(F.lower(F.col(text_col)), _JVM_SPLIT_PATTERN), ""
    )


def _wildcard_regex(v: str) -> str:
    """Lucene wildcard token -> anchored regex body: * = any run, ? = one
    char, backslash-escapes are literals."""
    out = []
    i = 0
    while i < len(v):
        c = v[i]
        if c == "\\" and i + 1 < len(v):
            out.append(re.escape(v[i + 1]))
            i += 2
            continue
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def _lit(v: str):
    try:
        return F.lit(int(v))
    except ValueError:
        try:
            return F.lit(float(v))
        except ValueError:
            return F.lit(v)


def compile_filter(
    node,
    *,
    text_col: str = "text",
    analyzed_fields: set[str] | None = None,
) -> Column:
    """Compile the AST to a boolean Column (filter semantics — presence, not
    relevance). Free-text terms become token-membership tests; Catalyst pushes
    the structured parts down to the scan."""
    analyzed = analyzed_fields or {text_col}

    def go(n) -> Column:
        if isinstance(n, And):
            out = go(n.children[0])
            for c in n.children[1:]:
                out = out & go(c)
            return out
        if isinstance(n, Or):
            out = go(n.children[0])
            for c in n.children[1:]:
                out = out | go(c)
            return out
        if isinstance(n, Not):
            return ~go(n.child)
        if isinstance(n, Term):
            if n.field == "_exists_":
                # ES `_exists_:field` pseudo-field (the query-string form
                # of the exists query): matches docs where the named field
                # has a non-null value — an IsNotNull Catalyst pushes to
                # the scan
                return F.col(n.value).isNotNull()
            if n.field is None or n.field in analyzed:
                col = n.field if n.field is not None and n.field != text_col else text_col
                return F.array_contains(_tokens_col(col), n.value.lower())
            return F.col(n.field) == _lit(n.value)
        if isinstance(n, Phrase):
            if n.field is None or n.field in analyzed:
                col = n.field if n.field is not None and n.field != text_col else text_col
                # phrase = analyzed tokens adjacent in the raw text;
                # analysis goes through the normative tokenizer contract
                from elasticsearch_assets_spark.analysis.tokenizer import tokenize

                toks = tokenize(n.value)
                if not toks:
                    return F.lit(True)
                pattern = "(?i)" + r"[^\p{L}\p{N}]+".join(
                    re.escape(t) for t in toks
                )
                return F.col(col).rlike(pattern)
            return F.col(n.field) == F.lit(n.value)
        if isinstance(n, Prefix):
            if n.field is None or n.field in analyzed:
                # analyzed prefix: any token starts with the prefix
                col = n.field if n.field is not None and n.field != text_col else text_col
                return F.exists(
                    _tokens_col(col), lambda t: t.startswith(n.value.lower())
                )
            return F.col(n.field).startswith(n.value)
        if isinstance(n, Wildcard):
            pattern = "^" + _wildcard_regex(n.value.lower()) + "$"
            if n.field is None or n.field in analyzed:
                # analyzed wildcard: any token matches the whole pattern
                col = n.field if n.field is not None and n.field != text_col else text_col
                return F.exists(_tokens_col(col), lambda t: t.rlike(pattern))
            return F.col(n.field).rlike("^" + _wildcard_regex(n.value) + "$")
        if isinstance(n, Fuzzy):
            if n.field is None or n.field in analyzed:
                col = n.field if n.field is not None and n.field != text_col else text_col
                lit = F.lit(n.value.lower())
                return F.exists(
                    _tokens_col(col),
                    lambda t: F.levenshtein(t, lit) <= n.max_edits,
                )
            return F.levenshtein(F.col(n.field), F.lit(n.value)) <= n.max_edits
        if isinstance(n, Cmp):
            c = F.col(n.field)
            v = _lit(n.value)
            return {">=": c >= v, "<=": c <= v, ">": c > v, "<": c < v}[n.op]
        if isinstance(n, Range):
            c = F.col(n.field)
            lo = c >= _lit(n.lo) if n.incl_lo else c > _lit(n.lo)
            hi = c <= _lit(n.hi) if n.incl_hi else c < _lit(n.hi)
            return lo & hi
        raise TypeError(f"unknown node {n!r}")

    return go(node)


def text_terms(node, *, analyzed_fields: set[str] | None = None, text_col: str = "text") -> list[str]:
    """Positive free-text terms (for BM25 scoring). NOT-negated terms are
    excluded — they filter, they don't score."""
    analyzed = analyzed_fields or {text_col}
    out: list[str] = []

    def go(n, negated: bool) -> None:
        if isinstance(n, (And, Or)):
            for c in n.children:
                go(c, negated)
        elif isinstance(n, Not):
            go(n.child, not negated)
        elif isinstance(n, Term) and (n.field is None or n.field in analyzed):
            if not negated:
                out.append(n.value.lower())
        elif isinstance(n, Phrase) and (n.field is None or n.field in analyzed):
            if not negated:
                from elasticsearch_assets_spark.analysis.tokenizer import tokenize

                out.extend(tokenize(n.value))

    go(node, False)
    return out
