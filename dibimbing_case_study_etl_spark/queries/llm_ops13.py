"""Round-6 additions III: incremental view maintenance on the commit log,
dedup-threshold sensitivity, and exact-size weighted sampling.

- ``u07`` closes the loop between the txlog table format (u06) and the
  incremental-rollup operator family (u01): a grouped rollup is
  maintained across table versions from the COMMIT DIFF ONLY — the
  files each commit added and removed — never re-reading carried-over
  data. Hash-equality against the oracle's full per-version recompute
  is the IVM correctness proof (incremental ≡ recompute).
- ``d20`` turns d02/d03's fixed 0.8 Jaccard cutoff into the measured
  knob it really is: ONE shared exact-Jaccard pair table (computed once
  at the loosest threshold) serves every candidate cutoff, reporting
  pair volume, affected-document count, and mean similarity per
  threshold — the sensitivity table an operator reads before choosing
  how aggressively to delete (the s17 one-assignment-many-settings
  pattern applied to dedup).
- ``t39`` is Efraimidis–Spirakis A-ES weighted reservoir sampling with
  a deterministic hash-derived uniform: key = ln(u)/w, keep the top-k —
  an EXACT-size weighted sample (t24's hash-Bernoulli gives expected
  rates, not exact counts) with no RNG state, reproducible on any
  cluster layout.

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl)
has none of these surfaces; beyond-reference warehouse/LLM-pipeline
mandate (u07 extends u06's re-expression of the reference's Postgres
transactional contract to derived-view maintenance).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.functions.text import fingerprint, sql_fingerprint
from dibimbing_case_study_etl_spark.operators.txlog import TxLogTable
from dibimbing_case_study_etl_spark.queries import query

# --- u07: incremental rollup maintenance over txlog version diffs ----------

_U07_BUCKETS = 7

_U07_ORACLE = f"""
    WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    v0 AS (SELECT CAST(0 AS BIGINT) AS version, k, p FROM o WHERE k % 4 <> 3),
    v1 AS (SELECT CAST(1 AS BIGINT), k,
                  CASE WHEN k % 2 = 1 THEN p + 10 ELSE p END FROM o),
    v2 AS (SELECT CAST(2 AS BIGINT), k,
                  CASE WHEN k % 2 = 1 THEN p + 10 ELSE p END
           FROM o WHERE k % 4 <> 2),
    allv AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT version, CAST(k % {_U07_BUCKETS} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round_even(p * 100, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM allv
    GROUP BY version, bucket
    ORDER BY version, bucket
"""


@query(
    "u07_txlog_incremental_rollup",
    oracle=_U07_ORACLE,
    tags=("warehouse", "acid", "incremental", "rollup"),
)
def u07_txlog_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance on the commit-log table: a per-bucket
    (count, cents) rollup is computed in full ONCE at version 0, then
    advanced to versions 1 and 2 from each commit's file DIFF alone —
    rows in added files count +1, rows in removed files count −1, summed
    into the running state. Carried-over files are never re-read (the
    payoff of u06's stats-pruned copy-on-write: a merge's delta IS its
    rewritten file set). The oracle recomputes every version from
    scratch, so the driver hash asserts incremental ≡ recompute — the
    IVM correctness contract.

    Scale: per version the work is proportional to the CHANGED data
    (one signed union-aggregate over added+removed files), not the
    table; rollup states are bucket-sized and combine by exact-BIGINT
    addition, so maintenance is associative and restartable."""
    t = register(spark, sf_dir, ("orders",))
    o = t["orders"].select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    root = tempfile.mkdtemp(prefix="txlog_u07_")
    try:
        table = TxLogTable.create(root)
        table.append(o.filter(F.col("k") % 4 != 3), key_col="k", target_files=4)
        table.merge(
            spark,
            o.filter(F.col("k") % 2 == 1).withColumn("p", F.col("p") + F.lit(10.0)),
            "k",
            target_files=4,
        )
        table.merge(
            spark, o.filter(F.col("k") % 4 == 2), "k", delete=True, target_files=4
        )

        bucket = (F.col("k") % _U07_BUCKETS).cast("bigint").alias("bucket")
        cents = F.call_function("rint", F.col("p") * 100).cast("bigint")

        def signed(paths: list[str], sign: int) -> DataFrame | None:
            if not paths:
                return None
            return spark.read.parquet(*[f"{root}/{p}" for p in paths]).select(
                bucket,
                F.lit(sign).cast("bigint").alias("d_rows"),
                (cents * sign).alias("d_cents"),
            )

        # full compute at version 0, then pure diffs
        state = (
            table.read(spark, as_of=0)
            .select(bucket, F.lit(1).cast("bigint").alias("d_rows"), cents.alias("d_cents"))
            .groupBy("bucket")
            .agg(F.sum("d_rows").alias("n_rows"), F.sum("d_cents").alias("cents"))
            .localCheckpoint(eager=True)
        )
        outs = [
            state.select(F.lit(0).cast("bigint").alias("version"), "bucket", "n_rows", "cents")
        ]
        for v in (1, 2):
            commit = table.commits(as_of=v)[-1]
            adds = [f["path"] for f in commit.get("added", ())]
            rems = commit.get("removed", [])
            parts = [
                d
                for d in (
                    state.select(
                        "bucket", F.col("n_rows").alias("d_rows"), F.col("cents").alias("d_cents")
                    ),
                    signed(adds, 1),
                    signed(rems, -1),
                )
                if d is not None
            ]
            delta = parts[0]
            for d in parts[1:]:
                delta = delta.unionByName(d)
            state = (
                delta.groupBy("bucket")
                .agg(F.sum("d_rows").alias("n_rows"), F.sum("d_cents").alias("cents"))
                .filter(F.col("n_rows") > 0)
                .localCheckpoint(eager=True)
            )
            outs.append(
                state.select(
                    F.lit(v).cast("bigint").alias("version"), "bucket", "n_rows", "cents"
                )
            )
        out = outs[0]
        for d in outs[1:]:
            out = out.unionByName(d)
        result = out.orderBy("version", "bucket").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return result


# --- d20: dedup threshold sensitivity --------------------------------------

_D20_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def _d20_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops import _SQL_SHINGLE_CTE

    ts = ", ".join(f"(CAST({t} AS DOUBLE))" for t in _D20_THRESHOLDS)
    return f"""
    WITH {_SQL_SHINGLE_CTE},
    pairs AS (
      SELECT doc_a, doc_b,
             n_common / (sa.n + sb.n - n_common) AS jacc
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n + sb.n - n_common) >= {_D20_THRESHOLDS[0]}
    ),
    th(threshold) AS (VALUES {ts}),
    base AS (
      SELECT th.threshold,
             CAST(COUNT(p.doc_a) AS BIGINT) AS n_pairs,
             COALESCE({sql_iround("CAST(SUM(CAST(round_even(p.jacc * 1000000, 0) AS BIGINT)) AS BIGINT) / 1000000.0 / COUNT(p.doc_a)", 6)}, 0.0)
               AS mean_jaccard
      FROM th LEFT JOIN pairs p ON p.jacc >= th.threshold
      GROUP BY th.threshold
    ),
    expl AS (
      SELECT th.threshold, p.doc_a AS d FROM th JOIN pairs p ON p.jacc >= th.threshold
      UNION ALL
      SELECT th.threshold, p.doc_b FROM th JOIN pairs p ON p.jacc >= th.threshold
    ),
    nd AS (SELECT threshold, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs
           FROM expl GROUP BY threshold)
    SELECT base.threshold, base.n_pairs,
           COALESCE(nd.n_docs, 0) AS n_docs,
           base.mean_jaccard
    FROM base LEFT JOIN nd ON base.threshold = nd.threshold
    ORDER BY base.threshold
    """


@query(
    "d20_dedup_threshold_sensitivity",
    oracle=_d20_oracle(),
    tags=("llm", "dedup", "audit"),
)
def d20_dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sensitivity for near-dup deletion: pair volume, distinct
    documents touched, and mean similarity at every candidate Jaccard
    cutoff — computed from ONE exact pair table built at the loosest
    threshold (the s17 one-assignment-many-settings pattern: the
    expensive candidate generation is shared; each cutoff is a filter).
    This is the table an operator reads before choosing how much of the
    corpus d07's keeper rule will delete.

    Scale: the shingle inverted-index self-join runs once; the per-
    threshold aggregates run over the pair table (|pairs| ≪ corpus),
    exploded ×|thresholds| only at pair grain. Distinct-doc counts
    shuffle (threshold, doc) — bounded by 2·|pairs|·|thresholds|."""
    from dibimbing_case_study_etl_spark.operators.dedup import jaccard_pairs

    t = register(spark, sf_dir, ("documents",))
    pairs = jaccard_pairs(
        t["documents"], "doc_id", "text", k=3, threshold=_D20_THRESHOLDS[0]
    ).localCheckpoint(eager=False)  # shared by every threshold's aggregate
    th = F.explode(
        F.array(*[F.lit(t).cast("double") for t in _D20_THRESHOLDS])
    ).alias("threshold")
    at_t = pairs.select(th, "doc_a", "doc_b", "jaccard").filter(
        F.col("jaccard") >= F.col("threshold")
    )
    base = at_t.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (
            F.sum(F.call_function("rint", F.col("jaccard") * 1_000_000).cast("bigint"))
            / F.lit(1_000_000.0)
            / F.count(F.lit(1))
        ).alias("_mj"),
    )
    docs_at_t = (
        at_t.select("threshold", F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .groupBy("threshold")
        .agg(F.count_distinct("d").cast("bigint").alias("n_docs"))
    )
    all_t = spark.range(1).select(th).select("threshold")
    return (
        all_t.join(base, "threshold", "left")
        .join(docs_at_t, "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(iround(F.col("_mj"), 6), F.lit(0.0)).alias("mean_jaccard"),
        )
        .orderBy("threshold")
    )


# --- t39: exact-size weighted reservoir sample (A-ES) ----------------------

_T39_K = 100
_FP_P = 2_147_483_647


def _t39_oracle() -> str:
    fp = sql_fingerprint("CAST(doc_id AS VARCHAR)")
    key = (
        f"ln((({fp}) + 1.0) / {_FP_P + 1}) / n_chars"
    )
    return f"""
    SELECT doc_id, n_chars AS weight,
           {sql_iround(key, 12)} AS sample_key,
           CAST(ROW_NUMBER() OVER (ORDER BY {sql_iround(key, 12)} DESC, doc_id)
                AS BIGINT) AS rank
    FROM documents
    WHERE n_chars > 0
    ORDER BY sample_key DESC, doc_id
    LIMIT {_T39_K}
    """


@query(
    "t39_weighted_reservoir_sample",
    oracle=_t39_oracle(),
    tags=("llm", "text", "sampling"),
)
def t39_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size weighted sample via Efraimidis–Spirakis A-ES: each
    document draws a deterministic uniform from its id's rolling
    fingerprint (u = (fp+1)/(P+1) ∈ (0,1]), gets key = ln(u)/weight
    (weight = characters, i.e. length-proportional inclusion), and the
    top-{k} keys ARE the sample — the distributed equivalent of
    sequential weighted reservoir sampling, with exact sample size
    (t24's Bernoulli buckets only hit target rates in expectation) and
    zero RNG state: any cluster, any partitioning, same sample.

    Scale: one map stage (fingerprint + key) and a
    TakeOrderedAndProject top-{k} — k rows per partition reach the
    driver-side heap merge; the corpus is never shuffled."""
    t = register(spark, sf_dir, ("documents",))
    key = iround(
        F.log((fingerprint("CAST(doc_id AS STRING)") + F.lit(1.0)) / F.lit(float(_FP_P + 1)))
        / F.col("n_chars"),
        12,
    )
    from pyspark.sql import Window as W

    ranked = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").alias("weight"), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(_T39_K)
        .withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.col("sample_key").desc(), "doc_id"))
            .cast("bigint"),
        )
    )
    return ranked


t39_weighted_reservoir_sample.__doc__ = t39_weighted_reservoir_sample.__doc__.format(
    k=_T39_K
)
