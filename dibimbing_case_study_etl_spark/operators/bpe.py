"""Distributed BPE merge learning — the tokenizer-TRAINING half of the
tokenizer surface (t15/t20 cover encoding with a fixed vocab; this learns
the vocab's merge table from the corpus).

Algorithm (Sennrich et al. 2016, the standard byte-pair-encoding loop):
start from characters, repeatedly (a) count adjacent symbol pairs across
the corpus weighted by word frequency, (b) merge the most frequent pair
everywhere, k times. The merge table IS the tokenizer.

Scale posture: the corpus is scanned ONCE into a word-frequency table —
the classic BPE compression — and every subsequent iteration runs on that
vocab-sized aggregate (millions of rows at 100 TB, not the corpus). Each
iteration is one partial-aggregable pair count plus a TakeOrdered(1);
the driver holds exactly one argmax row per iteration (bounded state,
like the Lloyd step in ``similarity.kmeans_seeded``).

Symbol-sequence representation: each word is a single string with every
symbol wrapped as ``\\x01<sym>\\x02``. A merge of pair (a, b) is then one
literal ``replace('\\x01a\\x02\\x01b\\x02' -> '\\x01ab\\x02')`` — and
because Spark (UTF8String.replace), DuckDB, and Python all scan
left-to-right replacing non-overlapping occurrences, the replace IS
greedy BPE application, bit-identical across engines (an ``aaaa`` word
under an ``(a,a)`` merge becomes ``[aa][aa]``, never ``[aa]a a``). The
wrappers make cross-symbol false matches impossible: a pattern always
starts at ``\\x01``, which only occurs at symbol starts.

Reference parity: the reference repo has no tokenizer surface at all
(pandas+Postgres ETL, caesarmario/dibimbing-case-study-etl); this is part
of the beyond-reference LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.functions.text import tokens

SEP_L = "\x01"
SEP_R = "\x02"


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Word-frequency table: lowercased whitespace tokens → (word, n).
    Words containing the sentinel bytes are dropped on both engines (the
    corpus is text; \\x01/\\x02 never appear in well-formed input)."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(
            (F.col("word") != "")
            & ~F.col("word").contains(SEP_L)
            & ~F.col("word").contains(SEP_R)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def wrap_word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Word-frequency table in wrapped-symbol form ``(s, n)`` — the BPE
    working representation, one character per ``\\x01…\\x02`` cell."""
    symstr = F.expr(
        "concat_ws('', transform(sequence(1, length(word)), "
        f"i -> concat('{SEP_L}', substr(word, i, 1), '{SEP_R}')))"
    )
    return _word_vocab(df, text_col).select(symstr.alias("s"), "n")


def apply_merges(words: DataFrame, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Apply a learned merge table to a wrapped word table ``(s, n)`` —
    tokenizer INFERENCE: the same greedy left-to-right literal replaces
    that training used, chained in merge-rank order inside one projection
    (no per-merge materialization; the whole chain is one codegen stage)."""
    s = F.col("s")
    for _, pa, pb, _ in sorted(merges):
        s = F.replace(
            s,
            F.lit(SEP_L + pa + SEP_R + SEP_L + pb + SEP_R),
            F.lit(SEP_L + pa + pb + SEP_R),
        )
    return words.select(s.alias("s"), "n")


def learn_bpe(
    df: DataFrame, text_col: str, n_merges: int = 6
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn the top ``n_merges`` BPE merges; returns ``(merges, words)``
    where ``merges`` is ``[(merge_rank, pa, pb, pair_count), ...]`` with
    rank 1 first and ``words`` is the POST-merge word-frequency table
    ``(s, n)`` (wrapped-symbol strings) — the tokenizer's full state, from
    which application stats (fertility, vocab size, compression) derive
    without re-scanning the corpus. ``words`` carries a LAZY
    localCheckpoint — the caller's first action materializes it; blocks
    are reclaimed by the ContextCleaner when the frame goes out of scope.

    Ties on pair count break lexicographically on (pa, pb) ascending —
    total and engine-neutral (symbols are lowercase ASCII, so binary and
    collation order agree)."""
    # wrap each character: "ab" -> "\x01a\x02\x01b\x02"
    #
    # Checkpoints are LAZY throughout the merge loop (r11): each rank's
    # table has exactly ONE downstream consumer before the next
    # checkpoint — the top-pair collect of the following rank — so that
    # collect both materializes the blocks and truncates the lineage;
    # an eager checkpoint per rank doubled the loop's job count (2 jobs
    # per merge instead of 1) for a working table that is O(word vocab).
    words = wrap_word_vocab(df, text_col).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP_R + SEP_L)
        pair = F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda x, y: F.struct(x.alias("pa"), y.alias("pb")),
        )
        top = (
            words.select(F.explode(pair).alias("p"), "n")
            .groupBy("p.pa", "p.pb")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "pa", "pb")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pa, pb, cnt = top[0]["pa"], top[0]["pb"], int(top[0]["cnt"])
        merges.append((rank, pa, pb, cnt))
        pat = F.lit(SEP_L + pa + SEP_R + SEP_L + pb + SEP_R)
        rep = F.lit(SEP_L + pa + pb + SEP_R)
        words = words.select(
            F.replace(F.col("s"), pat, rep).alias("s"), "n"
        ).localCheckpoint(eager=False)
    return merges, words


def learn_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 6
) -> list[tuple[int, str, str, int]]:
    """Merge table only (see :func:`learn_bpe`); the final word table's
    lazy checkpoint is simply never materialized."""
    merges, _ = learn_bpe(df, text_col, n_merges)
    return merges


def bpe_token_stats(words: DataFrame) -> DataFrame:
    """Tokenizer-application stats from the post-merge word table: what a
    tokenizer card publishes after training. ``sym_count`` per word is the
    number of ``\\x01`` wrappers (one per symbol); word char length is the
    string length minus both wrappers per symbol. Everything is a
    partial-aggregable sum over the VOCAB-sized table — the corpus is
    never rescanned — plus one distinct-count over the exploded symbol
    set (also vocab-sized), crossed in as a broadcast single-row agg.
    """
    sym_count = F.length("s") - F.length(F.replace(F.col("s"), F.lit(SEP_L)))
    chars = F.length("s") - 2 * sym_count
    base = words.select("n", sym_count.alias("k"), chars.alias("c"))
    totals = base.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n").alias("word_occurrences"),
        F.sum(F.col("n") * F.col("k")).alias("n_tokens"),
        F.sum(F.col("n") * F.col("c")).alias("n_chars"),
    )
    syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP_R + SEP_L)
    vocab = (
        words.select(F.explode(syms).alias("sym"))
        .agg(F.count_distinct("sym").alias("vocab_size"))
    )
    from dibimbing_case_study_etl_spark.functions.oracle_safe import iround

    return totals.crossJoin(F.broadcast(vocab)).select(
        "n_words",
        "word_occurrences",
        "n_tokens",
        "vocab_size",
        iround(F.col("n_tokens") / F.col("word_occurrences"), 4).alias("fertility"),
        iround(F.col("n_chars") / F.col("n_tokens"), 4).alias("chars_per_token"),
    )


def bpe_merges_df(spark: SparkSession, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, schema="merge_rank bigint, pa string, pb string, pair_count bigint"
    )


def _sql_bpe_parts(n_merges: int, where: str = "") -> list[str]:
    """The shared CTE layers ``w0 … w{n}`` (see :func:`sql_bpe_merges`).
    ``where`` optionally restricts the training corpus (e.g. a held-out
    split audit trains on ``WHERE doc_id % 10 <> 7``).

    Each apply layer is a LEFT JOIN on the (≤1-row) argmax ``m{i}`` with
    a no-op CASE when the row is absent: a corpus tiny enough to exhaust
    merge pairs before ``n_merges`` leaves later ``m{i}`` EMPTY, and a
    CROSS JOIN there would empty every later ``w``/``h`` layer — the
    Spark side (``learn_bpe`` breaks early, ``apply_merges`` applies the
    shorter list) would then diverge on exactly those degenerate
    inputs."""
    parts = [
        f"""tok AS (SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS word
               FROM documents {where}),
    words AS (SELECT word, COUNT(*) AS n FROM tok
              WHERE word <> '' AND word NOT LIKE '%' || chr(1) || '%'
                AND word NOT LIKE '%' || chr(2) || '%'
              GROUP BY word),
    w0 AS (SELECT list_reduce(list_prepend('', list_transform(
                    generate_series(1, length(word)),
                    i -> chr(1) || substr(word, i, 1) || chr(2))),
                  (a, b) -> a || b) AS s, n
           FROM words)"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""p{i} AS (
      SELECT l[g] AS pa, l[g + 1] AS pb, CAST(SUM(n) AS BIGINT) AS cnt
      FROM (
        SELECT l, n, unnest(generate_series(1, len(l) - 1)) AS g
        FROM (SELECT string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) AS l, n
              FROM w{i})
      )
      GROUP BY 1, 2
    ),
    m{i} AS (SELECT pa, pb, cnt FROM p{i} ORDER BY cnt DESC, pa, pb LIMIT 1),
    w{i + 1} AS (
      SELECT CASE WHEN m{i}.pa IS NULL THEN s
                  ELSE replace(s, chr(1) || pa || chr(2) || chr(1) || pb || chr(2),
                               chr(1) || pa || pb || chr(2)) END AS s, n
      FROM w{i} LEFT JOIN m{i} ON TRUE
    )"""
        )
    return parts


def sql_bpe_merges(n_merges: int = 6) -> str:
    """DuckDB twin of :func:`learn_bpe_merges` as one WITH query:
    ``n_merges`` generated CTE layers, each re-deriving the pair counts
    from the current symbol strings, taking the argmax, and applying the
    replace — identical representation, identical replace semantics."""
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank, pa, pb, cnt AS pair_count FROM m{i}"
        for i in range(n_merges)
    )
    return "WITH " + ",\n    ".join(_sql_bpe_parts(n_merges)) + f"\n    {union}"


def sql_bpe_heldout_stats(
    n_merges: int, train_where: str, holdout_where: str
) -> str:
    """DuckDB twin of the tokenizer GENERALIZATION audit: re-learn the
    merge table on the ``train_where`` split (the b01 layers, filtered),
    apply the learned merges ``m0…m{n-1}`` to the ``holdout_where``
    split's word vocabulary, and compare fertility plus the
    occurrence-weighted rate of held-out symbols absent from the trained
    symbol vocabulary (OOV under this merge table)."""
    from dibimbing_case_study_etl_spark.functions.oracle_safe import sql_iround

    parts = _sql_bpe_parts(n_merges, where=train_where)
    parts.append(
        f"""htok AS (SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS word
               FROM documents {holdout_where}),
    hwords AS (SELECT word, COUNT(*) AS n FROM htok
               WHERE word <> '' AND word NOT LIKE '%' || chr(1) || '%'
                 AND word NOT LIKE '%' || chr(2) || '%'
               GROUP BY word),
    h0 AS (SELECT list_reduce(list_prepend('', list_transform(
                    generate_series(1, length(word)),
                    i -> chr(1) || substr(word, i, 1) || chr(2))),
                  (a, b) -> a || b) AS s, n
           FROM hwords)"""
    )
    for i in range(n_merges):
        parts.append(
            f"""h{i + 1} AS (
      SELECT CASE WHEN m{i}.pa IS NULL THEN s
                  ELSE replace(s, chr(1) || pa || chr(2) || chr(1) || pb || chr(2),
                               chr(1) || pa || pb || chr(2)) END AS s, n
      FROM h{i} LEFT JOIN m{i} ON TRUE
    )"""
        )
    w, h = f"w{n_merges}", f"h{n_merges}"
    sym_split = "string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1))"
    parts.append(
        f"""tvocab AS (SELECT DISTINCT unnest({sym_split}) AS sym FROM {w}),
    tstats AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t_occ,
             CAST(SUM(n * (length(s) - length(replace(s, chr(1), '')))) AS BIGINT)
               AS t_tok
      FROM {w}
    ),
    hsym AS (SELECT n, unnest({sym_split}) AS sym FROM {h}),
    hoov AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN t.sym IS NULL THEN hsym.n END), 0) AS BIGINT)
               AS oov_occ,
             CAST(COUNT(DISTINCT CASE WHEN t.sym IS NULL THEN hsym.sym END) AS BIGINT)
               AS oov_symbols
      FROM hsym LEFT JOIN tvocab t ON hsym.sym = t.sym
    ),
    hstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_words_heldout,
             CAST(SUM(n) AS BIGINT) AS h_occ,
             CAST(SUM(n * (length(s) - length(replace(s, chr(1), '')))) AS BIGINT)
               AS h_tok
      FROM {h}
    )
    SELECT n_words_heldout,
           h_occ AS word_occurrences_heldout,
           h_tok AS n_tokens_heldout,
           {sql_iround("h_tok * 1.0 / h_occ", 4)} AS fertility_heldout,
           {sql_iround("t_tok * 1.0 / t_occ", 4)} AS fertility_train,
           {sql_iround("h_tok * 1.0 / h_occ - t_tok * 1.0 / t_occ", 4)} AS fertility_gap,
           oov_symbols,
           {sql_iround("oov_occ * 1.0 / h_tok", 6)} AS oov_token_rate
    FROM hstats CROSS JOIN tstats CROSS JOIN hoov"""
    )
    return "WITH " + ",\n    ".join(parts)


def sql_bpe_token_stats(n_merges: int = 6) -> str:
    """DuckDB twin of :func:`bpe_token_stats` over the same generated
    layers: re-learn the merges, then aggregate the final ``w{n}`` table.
    ``iround`` matches the Spark side's ``oracle_safe.iround``."""
    from dibimbing_case_study_etl_spark.functions.oracle_safe import sql_iround

    w = f"w{n_merges}"
    fert = sql_iround("SUM(n * k) * 1.0 / SUM(n)", 4)
    cpt = sql_iround("SUM(n * c) * 1.0 / SUM(n * k)", 4)
    final = f"""base AS (
      SELECT n, length(s) - length(replace(s, chr(1), '')) AS k,
             length(s) - 2 * (length(s) - length(replace(s, chr(1), ''))) AS c
      FROM {w}
    ),
    vocab AS (
      SELECT COUNT(DISTINCT sym) AS vocab_size FROM (
        SELECT unnest(string_split(substr(s, 2, length(s) - 2),
                                   chr(2) || chr(1))) AS sym
        FROM {w}
      )
    )
    SELECT COUNT(*) AS n_words,
           CAST(SUM(n) AS BIGINT) AS word_occurrences,
           CAST(SUM(n * k) AS BIGINT) AS n_tokens,
           (SELECT vocab_size FROM vocab) AS vocab_size,
           {fert} AS fertility,
           {cpt} AS chars_per_token
    FROM base"""
    return "WITH " + ",\n    ".join(_sql_bpe_parts(n_merges) + [final])
