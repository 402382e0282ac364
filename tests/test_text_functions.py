"""PII scrub semantics on crafted rows (the synthetic corpus has no PII,
so t13's registry oracle only proves the all-zero case — these pin the
actual matching/redaction behavior and the Spark↔DuckDB twin parity)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.functions.text import (
    pii_count,
    redact_pii,
    sql_pii_count,
    sql_redact_pii,
)

ROWS = [
    ("plain text with no pii at all",),
    ("contact me at alice.smith+spam@example.co.uk thanks",),
    ("two mails: a@b.cd and x_y%z@sub.domain.org!",),
    ("server at 192.168.0.1 and backup 10.0.255.254",),
    ("call +1 (555) 123-4567 or 020 7946 0958 now",),
    ("mixed: bob@web.io from 8.8.8.8 dials 555-867-5309",),
    ("",),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(ROWS, "text string")
    return df.select(
        "text",
        pii_count(F.col("text"), "email").alias("n_emails"),
        pii_count(F.col("text"), "ipv4").alias("n_ipv4"),
        pii_count(F.col("text"), "phone").alias("n_phones"),
        redact_pii(F.col("text")).alias("redacted"),
    ).collect()


def _by_text(rows):
    return {r.text: r for r in rows}


def test_counts(scrubbed):
    got = _by_text(scrubbed)
    assert (got["plain text with no pii at all"].n_emails,
            got["plain text with no pii at all"].n_ipv4,
            got["plain text with no pii at all"].n_phones) == (0, 0, 0)
    assert got["contact me at alice.smith+spam@example.co.uk thanks"].n_emails == 1
    assert got["two mails: a@b.cd and x_y%z@sub.domain.org!"].n_emails == 2
    assert got["server at 192.168.0.1 and backup 10.0.255.254"].n_ipv4 == 2
    assert got["call +1 (555) 123-4567 or 020 7946 0958 now"].n_phones == 2
    mixed = got["mixed: bob@web.io from 8.8.8.8 dials 555-867-5309"]
    assert (mixed.n_emails, mixed.n_ipv4, mixed.n_phones) == (1, 1, 1)
    assert got[""].redacted == ""


def test_redaction_text(scrubbed):
    got = _by_text(scrubbed)
    assert (
        got["contact me at alice.smith+spam@example.co.uk thanks"].redacted
        == "contact me at [EMAIL] thanks"
    )
    assert (
        got["server at 192.168.0.1 and backup 10.0.255.254"].redacted
        == "server at [IPV4] and backup [IPV4]"
    )
    assert (
        got["mixed: bob@web.io from 8.8.8.8 dials 555-867-5309"].redacted
        == "mixed: [EMAIL] from [IPV4] dials [PHONE]"
    )


def test_duckdb_twin_parity(scrubbed):
    """The DuckDB twins must agree with Spark on every crafted row — this
    is the same parity contract the registry oracle enforces, applied to
    text that actually contains PII."""
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": [r[0] for r in ROWS]}))
    oracle = con.execute(
        f"""
        SELECT text,
               {sql_pii_count("text", "email")} AS n_emails,
               {sql_pii_count("text", "ipv4")} AS n_ipv4,
               {sql_pii_count("text", "phone")} AS n_phones,
               {sql_redact_pii("text")} AS redacted
        FROM t
        """
    ).df()
    want = {
        r["text"]: (r["n_emails"], r["n_ipv4"], r["n_phones"], r["redacted"])
        for _, r in oracle.iterrows()
    }
    for r in scrubbed:
        assert (r.n_emails, r.n_ipv4, r.n_phones, r.redacted) == want[r.text], r.text


def test_tokenizer_cross_engine_parity_on_adversarial_whitespace(spark):
    """The corpus never exercises leading/trailing/repeated spaces or
    empty-ish strings; hypothesis-style adversarial cases pin that Spark's
    tokens()/word_ngrams() and the DuckDB twins split identically (both
    sides: trim then split on ' +' — literal spaces, not general
    whitespace)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.functions.text import word_ngrams

    cases = [
        "",
        " ",
        "   ",
        "one",
        " one ",
        "a b",
        "a  b",
        "  a   b  c ",
        "a b c d e",
        "x " * 40,
        "tab\tinside stays one-token",
        "newline\ninside stays one-token",
        "trailing  ",
        "  leading",
    ]
    pdf = pd.DataFrame({"i": range(len(cases)), "text": cases})
    got = (
        spark.createDataFrame(pdf)
        .select("i", F.array_join(word_ngrams(F.col("text"), 2), "|").alias("g"))
        .toPandas()
        .sort_values("i")["g"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    # COALESCE: DuckDB array_to_string([]) is NULL where Spark array_join
    # yields '' — a real cross-engine quirk, but one no registry oracle
    # depends on (they explode/unnest, where both engines emit zero rows);
    # the property under test here is the SPLIT parity.
    want = con.execute(
        """
        SELECT COALESCE(array_to_string(
                 list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                i -> w[i] || ' ' || w[i+1]), '|'), '') AS g
        FROM (SELECT i, regexp_split_to_array(trim(text), ' +') AS w FROM t)
        ORDER BY i
        """
    ).df()["g"].tolist()
    con.close()
    assert got == want, list(zip(cases, got, want))
