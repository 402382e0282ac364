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


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct space-joined word ``k``-grams. Documents shorter than ``k``
    words yield an empty array (guarded: Spark's ``sequence(1, n)`` with
    n < 1 counts *down*, which would fabricate indices)."""
    w = tokens(col)
    n = F.size(w) - (k - 1)
    gram = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
    )
    return F.when(n >= 1, F.array_distinct(gram)).otherwise(F.array().cast("array<string>"))


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
