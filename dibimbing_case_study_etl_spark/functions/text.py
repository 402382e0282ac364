"""Text-analysis primitives for the LLM-data-pipeline operators — all
JVM-side built-ins (split/filter/transform/aggregate), no Python UDFs in
any hot path.

Conventions shared with the DuckDB oracles (testing.py gate):
- tokens  = split on runs of whitespace after trim;
- shingles = space-joined word k-grams, de-duplicated per document;
- fingerprint = polynomial rolling hash (base 31, mod 2^31-1) over the
  character codepoints — cheap, deterministic, and expressible in both
  engines for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker lexicons for the language-ID heuristic; configurable — these
# defaults use words that actually occur in the synthetic corpus so the
# scorer exercises real variation. A production deployment swaps in real
# stopword lexicons per language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("data", "table", "row"),
    "fr": ("join", "merge", "sort"),
    "de": ("window", "batch", "stream"),
    "zh": ("spark", "vector", "hash"),
}

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    """Whitespace tokenization: split on ``' +'`` after trim (empty string
    still yields one empty token — callers filter if needed)."""
    return F.split(F.trim(col), " +")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_token_estimate(col: Column) -> Column:
    """~1 BPE token per 4 chars — the standard back-of-envelope estimator."""
    return F.ceil(F.length(col) / 4.0).cast("bigint")


def _with_tokens(col: Column, build) -> Column:
    """Bind the token array ONCE as a higher-order-function lambda variable
    and hand it to ``build``. Referencing ``tokens(col)`` directly from the
    k ``element_at`` lambdas textually inlines the whole split subtree into
    every reference, and the analyzer re-walks each copy — measured ~9×
    fresh-build (pure planning) latency on the shingle family at k=3.
    ``transform`` over a one-element array turns the subtree into a single
    evaluation bound to a cheap variable reference."""
    return F.element_at(F.transform(F.array(tokens(col)), build), 1)


def word_ngrams(col: Column, k: int) -> Column:
    """NON-distinct space-joined word ``k``-grams in document order
    (frequency callers: n-gram counting). Documents shorter than ``k``
    words yield an empty array (guarded: Spark's ``sequence(1, n)`` with
    n < 1 counts *down*, which would fabricate indices)."""

    def build(w: Column) -> Column:
        n = F.size(w) - (k - 1)
        gram = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
        )
        return F.when(n >= 1, gram).otherwise(F.array().cast("array<string>"))

    return _with_tokens(col, build)


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct space-joined word ``k``-grams (deduplication callers)."""
    return F.array_distinct(word_ngrams(col, k))


def marker_score(col: Column, markers: tuple[str, ...]) -> Column:
    """Number of token occurrences belonging to ``markers`` (not distinct —
    repeated markers count repeatedly)."""
    return F.size(F.filter(tokens(col), lambda x: x.isin(*markers))).cast("bigint")


def fingerprint(col_name: str) -> Column:
    """Polynomial rolling hash over codepoints: h = (h*31 + code) mod 2^31-1.

    Deterministic and cross-engine (DuckDB twin via list_reduce); parity
    target for document identity at 100 TB where full-text comparison is
    too wide to shuffle. Takes a column *name* (the expression is built in
    SQL text so ``substr`` can take a dynamic position)."""
    return F.expr(
        "aggregate(transform(sequence(1, length({c})), i -> ascii(substr({c}, i, 1))), "
        "0L, (acc, x) -> (acc * 31 + x) % 2147483647)".format(c=col_name)
    )


def sql_fingerprint(expr: str) -> str:
    """DuckDB twin of :func:`fingerprint`."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length({expr})), "
        f"i -> CAST(unicode(substr({expr}, i, 1)) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % 2147483647)"
    )


# --- PII scrubbing ---------------------------------------------------------
# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB) parse
# identically: character classes, bounded repetition, no backrefs/lookarounds.
# Both engines match non-overlapping occurrences left-to-right with greedy
# quantifiers, so counts and replacements agree byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "phone": r"\+?[0-9][0-9() -]{6,}[0-9]",
}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (non-overlapping)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("bigint")


def redact_pii(col: Column) -> Column:
    """Replace every PII occurrence with ``[KIND]``. Order matters and is
    fixed (email, ipv4, phone — most- to least-specific) so an IPv4 inside
    a URL-ish email domain is consumed by the email pass first; the DuckDB
    twin applies the same order."""
    out = col
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def sql_pii_count(expr: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count`."""
    return f"CAST(len(regexp_extract_all({expr}, '{PII_PATTERNS[kind]}')) AS BIGINT)"


def sql_redact_pii(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` (global flag; same pattern order)."""
    out = expr
    for kind in ("email", "ipv4", "phone"):
        out = f"regexp_replace({out}, '{PII_PATTERNS[kind]}', '[{kind.upper()}]', 'g')"
    return out
