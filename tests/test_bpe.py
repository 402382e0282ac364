"""BPE merge learning (operators/bpe.py): greedy-application semantics,
multi-char symbol boundary safety, and the Spark↔DuckDB replace-parity
assumption the oracle rests on."""

from __future__ import annotations

import pytest

import duckdb

from dibimbing_case_study_etl_spark.operators.bpe import (
    SEP_L,
    SEP_R,
    bpe_token_stats,
    learn_bpe,
    learn_bpe_merges,
    sql_bpe_merges,
)


@pytest.mark.slow
def test_greedy_left_to_right_merge(spark):
    # "aaaa" under an (a,a) merge must become [aa][aa] (greedy non-overlap),
    # never [aa] a a. Pair counting counts every adjacent position: 3 per
    # "aaaa" occurrence.
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id bigint, text string")
    merges = learn_bpe_merges(df, "text", n_merges=2)
    assert merges == [(1, "a", "a", 6), (2, "aa", "aa", 2)]


def test_multichar_boundary_safety(spark):
    # After (a,b) merges, a word ending in 'a' must not false-match the
    # pattern mid-symbol: "xa b" contains no (a,b) pair — the 'a' is
    # inside symbol 'xa''s word with no following 'b' IN THE SAME WORD.
    df = spark.createDataFrame([(1, "xa b ab")], "doc_id bigint, text string")
    merges = learn_bpe_merges(df, "text", n_merges=2)
    # ties break lexicographically: (a,b) before (x,a)
    assert merges == [(1, "a", "b", 1), (2, "x", "a", 1)]


def test_replace_parity_python_vs_duckdb():
    # The oracle's correctness rests on replace() being greedy
    # left-to-right non-overlapping in BOTH engines (Spark's
    # UTF8String.replace and Python's str.replace share the algorithm;
    # this pins DuckDB against Python on the adversarial overlap shape).
    s = SEP_L + ("a" + SEP_R + SEP_L) * 4
    s = s[: -len(SEP_L)]  # \x01a\x02\x01a\x02\x01a\x02\x01a\x02
    pat = SEP_L + "a" + SEP_R + SEP_L + "a" + SEP_R
    rep = SEP_L + "aa" + SEP_R
    duck = duckdb.sql(
        "SELECT replace(?, ?, ?)", params=[s, pat, rep]
    ).fetchone()[0]
    assert duck == s.replace(pat, rep) == SEP_L + "aa" + SEP_R + SEP_L + "aa" + SEP_R


def test_token_stats_hand_computed(spark):
    # "aaaa aaaa" after 2 merges: [aa][aa] then [aaaa] — one word kind,
    # 2 occurrences, 1 symbol each, 4 chars each, vocab {aaaa}.
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id bigint, text string")
    merges, words = learn_bpe(df, "text", n_merges=2)
    row = bpe_token_stats(words).collect()[0]
    assert (
        row["n_words"],
        row["word_occurrences"],
        row["n_tokens"],
        row["vocab_size"],
        row["fertility"],
        row["chars_per_token"],
    ) == (1, 2, 2, 1, 1.0, 4.0)


@pytest.mark.slow
def test_oracle_layers_match_spark_at_depth(spark, tmp_path):
    # Deeper than the registry's 8 merges: at depth 12 merged symbols
    # re-merge (multi-char pairs), exercising the representation the
    # boundary test pins. Tiny corpus so the 12-layer SQL stays fast.
    rows = [(i, "the cat the hat the bat sat flat") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    merges = learn_bpe_merges(df, "text", n_merges=12)
    assert any(len(pa) > 1 or len(pb) > 1 for _, pa, pb, _ in merges)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    duck = [tuple(r) for r in con.execute(sql_bpe_merges(12)).fetchall()]
    con.close()
    assert [tuple(m) for m in merges] == duck


@pytest.mark.slow
def test_exhausted_merges_keep_oracle_layers_alive(spark, tmp_path):
    # A corpus so tiny the train split exhausts merge pairs before
    # n_merges: the layers past exhaustion are empty-argmax no-ops, not
    # collapses (a CROSS JOIN there would EMPTY every later w/h layer —
    # train stats and held-out stats would read zero/NULL while Spark's
    # shorter merge list reports real numbers).
    from dibimbing_case_study_etl_spark.operators.bpe import (
        apply_merges,
        bpe_token_stats,
        sql_bpe_heldout_stats,
        wrap_word_vocab,
    )

    rows = [(i, "ab ab cd") for i in range(4)]  # exhausts after ~3 merges
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    n_deep = 8  # far past exhaustion

    merges = learn_bpe_merges(df, "text", n_merges=n_deep)
    assert len(merges) < n_deep  # the degenerate premise: early exhaustion

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    # 1) merge list parity at the requested (too-deep) depth
    duck = [tuple(r) for r in con.execute(sql_bpe_merges(n_deep)).fetchall()]
    assert [tuple(m) for m in merges] == duck
    # 2) held-out stats stay real (non-zero) and match Spark end-to-end
    train_w, hold_w = "WHERE doc_id % 2 = 0", "WHERE doc_id % 2 = 1"
    sql = sql_bpe_heldout_stats(n_deep, train_w, hold_w)
    orc = con.execute(sql).fetchdf()
    con.close()
    assert int(orc["n_tokens_heldout"].iloc[0]) > 0
    train_merges = learn_bpe_merges(df.filter("doc_id % 2 = 0"), "text", n_merges=n_deep)
    held = apply_merges(wrap_word_vocab(df.filter("doc_id % 2 = 1"), "text"), train_merges)
    got = bpe_token_stats(held).collect()[0]
    assert got["n_tokens"] == int(orc["n_tokens_heldout"].iloc[0])
    assert float(got["fertility"]) == float(orc["fertility_heldout"].iloc[0])
