"""Round-5 late additions IV: anomaly detection, distribution-aware
filtering, hybrid retrieval, and graph structure audits.

- ``q77`` opens the time-series anomaly class: rolling z-scores over a
  trailing event window — the streaming-metrics outlier monitor every
  event pipeline runs, here as the batch-backfill shape.
- ``t30`` is distribution-aware quality filtering: per-source length
  winsorization (clip to the empirical P5/P95), the standard guard
  against boilerplate stubs and concatenation blobs that per-document
  rules (t02/t29) cannot see because the thresholds come from the
  corpus itself.
- ``r03`` fuses two retrieval models — r01's BM25 and a Dirichlet-smoothed
  query-likelihood ranking — with reciprocal-rank fusion (RRF, the
  standard hybrid/ensemble combiner in Elasticsearch and vector-DB hybrid
  search). No other registry query combines ranked lists.
- ``g02`` is a triangle census of the near-dup pair graph: transitive
  closure (d06) merges chains a-b-c even when a and c are NOT similar;
  the wedge-closure rate is the audit that says how clique-like the
  clusters actually are before a keeper rule deletes their members.

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl,
pandas+Postgres `scripts/`) has none of these surfaces; the family
belongs to the beyond-reference analytics / LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.functions.text import token_count, tokens
from dibimbing_case_study_etl_spark.operators.dedup import minhash_lsh_pairs
from dibimbing_case_study_etl_spark.queries import query
from dibimbing_case_study_etl_spark.queries.llm_ops7 import (
    _BM25_TERMS,
    _R01_ORACLE,
    r01_bm25_topk,
)

# --- q77: rolling z-score anomaly detection ------------------------------

_Q77_WIN = 100  # trailing events per type forming the reference window
_Q77_Z = 3.0


@query(
    "q77_rolling_zscore_anomaly",
    oracle=f"""
    WITH c AS (
      SELECT event_type, ts, CAST(ts AS DATE) AS d,
             CAST(round_even(value * 100, 0) AS BIGINT) AS c, event_id
      FROM events
    ),
    framed AS (
      SELECT event_type, d, c,
             COUNT(*)    OVER w AS n,
             SUM(c)      OVER w AS s1,
             SUM(c * c)  OVER w AS s2
      FROM c
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {_Q77_WIN} PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type, d,
             (CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / {_Q77_WIN}.0)
               / {_Q77_WIN - 1}.0 AS var,
             CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / {_Q77_WIN}.0 AS dev
      FROM framed WHERE n = {_Q77_WIN}
    ),
    z AS (
      SELECT event_type, d,
             CASE WHEN var > 0 THEN abs(dev) / sqrt(var) ELSE 0.0 END AS az
      FROM scored
    )
    SELECT event_type, d,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN az > {_Q77_Z} THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           {sql_iround("MAX(az)", 4)} AS max_abs_z
    FROM z
    GROUP BY event_type, d
    """,
    tags=("events", "anomaly", "window"),
)
def q77_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier detection: each event is scored against the
    mean/stddev of the previous {w} events of its type (a trailing ROWS
    frame, total-ordered by (ts, event_id)), and the per-(type, day)
    report counts events with |z| > {z} plus the worst score — the
    batch-backfill twin of a streaming metrics monitor.

    Cross-engine exactness: values become integer cents BEFORE the frame,
    so the windowed sums S1=Σc and S2=Σc² are exact BIGINTs regardless of
    the engine's sliding-sum algorithm (DuckDB's segment tree vs Spark's
    running fold — order-free over integers); mean/variance/z are then
    the same sequence of IEEE double ops on identical integer inputs, so
    even the z > {z} threshold decision is deterministic. A constant
    window (variance 0) scores z = 0 rather than ±inf.

    Scale — the HALO-BUCKETED window (the decisive shape choice): a
    window partitioned by bare ``event_type`` has one task per type — a
    hot type serializes its entire history through a single sort at
    100 TB, and AQE can split a skewed join but never a skewed WINDOW.
    Instead the frame runs inside ``(event_type, day)`` buckets with
    carry-in: each bucket imports, as flagged halo rows, the TAIL (≤{w}
    rows/day, ranked inside the same bounded bucket) of just enough
    preceding days that every own row sees ≥{w} predecessors — the walk
    over "enough days" happens on the types×days COUNT table (tiny,
    broadcast), exactly a streaming engine's ghost-cell/watermark shard.
    Halo rows feed frames but are never scored, so results are
    bit-identical to the global window (exact BIGINT frame sums) while
    parallelism scales with types×days instead of types; day granularity
    is the knob (hour for hotter feeds). The day report stays a
    partial-aggregable groupBy."""
    t = register(spark, sf_dir, ("events",))
    c = F.call_function("rint", F.col("value") * 100).cast("bigint")
    base = t["events"].select(
        "event_type",
        "ts",
        F.col("ts").cast("date").alias("d"),
        c.alias("c"),
        "event_id",
    )
    # tiny per-(type, day) census → which earlier days each bucket must
    # import: carry day S into bucket T while the days strictly between
    # them hold < W rows (cum is a running per-type total; the window runs
    # on a types×days table, never the corpus)
    wd = W.partitionBy("event_type").orderBy("d")
    cnt = (
        base.groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("m"))
        .withColumn("cum", F.sum("m").over(wd))
        # types×days rows; BOTH sides of the carry self-join read it — an
        # inlined lineage would aggregate the corpus once per side
        .localCheckpoint(eager=False)
    )
    s, tt = cnt.alias("s"), cnt.alias("tt")
    halo_days = F.broadcast(
        s.join(
            tt,
            (F.col("s.event_type") == F.col("tt.event_type"))
            & (F.col("s.d") < F.col("tt.d"))
            & (F.col("tt.cum") - F.col("tt.m") - F.col("s.cum") < _Q77_WIN),
        ).select(
            F.col("s.event_type").alias("event_type"),
            F.col("s.d").alias("sd"),
            F.col("tt.d").alias("bucket"),
        )
    )
    # only a day's last W rows can ever be needed downstream; rank inside
    # the same bounded (type, day) bucket the main frame uses
    wtail = W.partitionBy("event_type", "d").orderBy(F.desc("ts"), F.desc("event_id"))
    halo = (
        base.withColumn("__rt", F.row_number().over(wtail))
        .filter(F.col("__rt") <= _Q77_WIN)
        .drop("__rt")
        .join(halo_days.withColumnRenamed("sd", "d"), ["event_type", "d"])
        .withColumn("is_halo", F.lit(True))
    )
    own = base.withColumn("bucket", F.col("d")).withColumn("is_halo", F.lit(False))
    u = own.unionByName(halo)
    w = (
        W.partitionBy("event_type", "bucket")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Q77_WIN, -1)
    )
    framed = u.select(
        "event_type",
        "d",
        "c",
        "is_halo",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("c").over(w).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
    ).filter((~F.col("is_halo")) & (F.col("n") == _Q77_WIN))
    var = (
        F.col("s2").cast("double")
        - (F.col("s1").cast("double") * F.col("s1").cast("double")) / float(_Q77_WIN)
    ) / float(_Q77_WIN - 1)
    dev = F.col("c").cast("double") - F.col("s1").cast("double") / float(_Q77_WIN)
    az = F.when(var > 0, F.abs(dev) / F.sqrt(var)).otherwise(F.lit(0.0))
    return (
        framed.select("event_type", "d", az.alias("az"))
        .groupBy("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum((F.col("az") > _Q77_Z).cast("bigint")).alias("n_anomalies"),
            iround(F.max("az"), 4).alias("max_abs_z"),
        )
        # DuckDB renders a DATE projection as midnight datetime; cast so the
        # driver hash sees the same timestamp on both engines
        .withColumn("d", F.col("d").cast("timestamp"))
    )


# --- t30: per-source length winsorization --------------------------------

_T30_LO = 5   # percent
_T30_HI = 95  # percent


@query(
    "t30_source_length_winsorize",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    cuts AS (
      SELECT source,
             CAST(MAX(n) AS BIGINT) AS n_docs,
             CAST(MAX(CASE WHEN rn = CAST(floor((n * {_T30_LO} + 99) / 100.0) AS BIGINT)
                           THEN n_chars END) AS BIGINT) AS p05_chars,
             CAST(MAX(CASE WHEN rn = CAST(floor((n * {_T30_HI} + 99) / 100.0) AS BIGINT)
                           THEN n_chars END) AS BIGINT) AS p95_chars
      FROM ranked
      GROUP BY source
    )
    SELECT d.source, c.n_docs, c.p05_chars, c.p95_chars,
           CAST(SUM(CASE WHEN d.n_chars < c.p05_chars THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN d.n_chars > c.p95_chars THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           CAST(SUM(LEAST(GREATEST(d.n_chars, c.p05_chars), c.p95_chars)) AS BIGINT)
             AS winsorized_chars
    FROM documents d JOIN cuts c ON c.source = d.source
    GROUP BY d.source, c.n_docs, c.p05_chars, c.p95_chars
    """,
    tags=("llm", "text", "quality", "distribution"),
)
def t30_source_length_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-aware length filtering: per source, the empirical
    P{lo}/P{hi} document-length cut points (exact order statistics at rank
    ceil(p·n) — integer rank arithmetic, ties broken by doc_id so the cut
    is a real document's length on both engines) and the winsorization
    report — how many documents each tail clips and the char mass after
    clamping. Corpus-derived thresholds catch boilerplate stubs and
    concatenation blobs that fixed per-document rules (t02/t29) cannot.

    Scale: one shuffle per pass — rank window keyed by source, then the
    ~|sources|-row cut table broadcasts back onto the scan for the clip
    counters (partial-aggregable). Exact per-source order statistics put
    one source's lengths through one partition's sort; past that,
    q37's approx percentile sketches are the drop-in (same report,
    mergeable state)."""
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("source", "n_chars", "doc_id")
    wr = W.partitionBy("source").orderBy("n_chars", "doc_id")
    ws = W.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )

    def cut_rank(pct: int):
        return F.floor((F.col("n") * pct + 99) / 100.0).cast("bigint")

    cuts = ranked.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.max(F.when(F.col("rn") == cut_rank(_T30_LO), F.col("n_chars")))
        .cast("bigint")
        .alias("p05_chars"),
        F.max(F.when(F.col("rn") == cut_rank(_T30_HI), F.col("n_chars")))
        .cast("bigint")
        .alias("p95_chars"),
    )
    clamped = F.least(F.greatest(F.col("n_chars"), F.col("p05_chars")), F.col("p95_chars"))
    return (
        docs.join(F.broadcast(cuts), "source")
        .groupBy("source", "n_docs", "p05_chars", "p95_chars")
        .agg(
            F.sum((F.col("n_chars") < F.col("p05_chars")).cast("bigint")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("n_chars") > F.col("p95_chars")).cast("bigint")).alias(
                "n_clipped_high"
            ),
            F.sum(clamped).cast("bigint").alias("winsorized_chars"),
        )
    )


# --- r03: reciprocal-rank fusion of BM25 and query-likelihood ------------

_R03_MU = 2000.0  # Dirichlet smoothing mass (Zhai & Lafferty's default)
_R03_RRF_K = 60   # RRF rank offset (Cormack et al.'s default)
_R03_LIST = 50    # per-model candidate list length (= r01's top-k)
_R03_TOPK = 20


def _r03_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    nq = len(_BM25_TERMS)
    return f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    stats AS (SELECT CAST(SUM(len(w)) AS BIGINT) AS sum_dl FROM d),
    qt AS (SELECT unnest([{terms}]) AS tok),
    cf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf
      FROM (SELECT unnest(w) AS tok FROM d) JOIN qt USING (tok)
      GROUP BY tok
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(w) AS tok FROM d) JOIN qt USING (tok)
      GROUP BY doc_id, tok
    ),
    ql AS (
      SELECT d.doc_id,
             CAST(SUM(CAST(round_even(ln(
               (COALESCE(tf.tf, 0) + {_R03_MU} * (CAST(cf.cf AS DOUBLE) / s.sum_dl))
               / (len(d.w) + {_R03_MU})) * 10000, 0) AS BIGINT)) AS BIGINT) AS s_i
      FROM d
      CROSS JOIN cf
      LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.tok = cf.tok
      CROSS JOIN stats s
      GROUP BY d.doc_id
      HAVING COUNT(*) = {nq}
    ),
    ql_rank AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s_i DESC, doc_id) AS rb
      FROM ql QUALIFY rb <= {_R03_LIST}
    ),
    bm25_rank AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS ra
      FROM ({_R01_ORACLE})
    ),
    fused AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             CAST(COALESCE(a.ra, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(b.rb, 0) AS BIGINT) AS ql_rank,
             (CASE WHEN a.ra IS NULL THEN 0.0 ELSE 1.0 / ({_R03_RRF_K} + a.ra) END
              + CASE WHEN b.rb IS NULL THEN 0.0 ELSE 1.0 / ({_R03_RRF_K} + b.rb) END)
               AS rrf
      FROM bm25_rank a FULL OUTER JOIN ql_rank b USING (doc_id)
    )
    SELECT doc_id, bm25_rank, ql_rank, {sql_iround("rrf", 6)} AS rrf_score
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {_R03_TOPK}
    """


@query(
    "r03_rrf_hybrid_topk",
    oracle=_r03_oracle(),
    tags=("llm", "retrieval", "fusion"),
)
def r03_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: r01's BM25 ranking and
    a Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty's
    language-model retrieval, μ={mu}) each produce a top-{n} candidate
    list for the same query terms, and RRF (Σ 1/({k}+rank), the score-free
    combiner behind Elasticsearch/vector-DB hybrid search) merges them —
    score scales never have to be calibrated, which is the whole point of
    rank fusion. Documents missing from a list contribute 0 and report
    rank 0.

    Cross-engine exactness: each model's per-term log component rounds to
    a scaled BIGINT before the per-doc sum (r01's discipline), ranks
    break ties on doc_id, and the fused score is the same two-term double
    sum of exact rank reciprocals on both engines.

    Scale: BOTH rankers feed from ONE corpus explode — the shared
    ``bm25_term_freq`` table (term-filtered at the explode, so only
    query-term occurrences shuffle) is checkpointed and consumed four
    times (BM25's tf+df, QL's cf+tf); un-shared, r03 cost 3 corpus
    explodes and ran 4× r01 (10.5s vs 2.55s at sf1). cf is Σtf — no
    second pass. The per-term zero-tf baseline folds in by an explicitly
    broadcast left join (the checkpoint loses Catalyst stats, so without
    the hint the corpus side would sort-merge-shuffle on (doc_id, tok));
    the tf table is bounded by docs-matching-terms × |terms|. Both top
    lists are bounded windows; the fusion join touches ≤2·{n} rows."""
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import bm25_term_freq

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")

    stats = F.broadcast(docs.agg(F.sum(token_count(F.col("text"))).alias("sum_dl")))
    tf = bm25_term_freq(docs).localCheckpoint(eager=False)
    cf = tf.groupBy("tok").agg(F.sum("tf").alias("cf"))
    dense = (
        docs.select("doc_id", token_count(F.col("text")).alias("dl"))
        .join(F.broadcast(cf), F.lit(True))
        .join(F.broadcast(tf.drop("dl")), ["doc_id", "tok"], "left")
        .crossJoin(stats)
    )
    comp = F.log(
        (F.coalesce(F.col("tf"), F.lit(0)) + _R03_MU * (F.col("cf").cast("double") / F.col("sum_dl")))
        / (F.col("dl") + _R03_MU)
    )
    ql = (
        dense.select(
            "doc_id", F.call_function("rint", comp * 10000).cast("bigint").alias("s_i")
        )
        .groupBy("doc_id")
        .agg(F.sum("s_i").alias("s_i"), F.count(F.lit(1)).alias("nq"))
        .filter(F.col("nq") == len(_BM25_TERMS))
    )
    ql_rank = (
        ql.withColumn("rb", F.row_number().over(_gw().orderBy(F.desc("s_i"), F.asc("doc_id"))))
        .filter(F.col("rb") <= _R03_LIST)
        .select("doc_id", "rb")
    )
    bm25_rank = r01_bm25_topk(spark, sf_dir, tf_table=tf).select(
        "doc_id",
        F.row_number().over(_gw().orderBy(F.desc("score"), F.asc("doc_id"))).alias("ra"),
    )
    fused = bm25_rank.join(ql_rank, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("ra", F.lit(0)).cast("bigint").alias("bm25_rank"),
        F.coalesce("rb", F.lit(0)).cast("bigint").alias("ql_rank"),
        (
            F.when(F.col("ra").isNull(), F.lit(0.0)).otherwise(
                1.0 / (_R03_RRF_K + F.col("ra"))
            )
            + F.when(F.col("rb").isNull(), F.lit(0.0)).otherwise(
                1.0 / (_R03_RRF_K + F.col("rb"))
            )
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_R03_TOPK)
        .select("doc_id", "bm25_rank", "ql_rank", iround(F.col("rrf"), 6).alias("rrf_score"))
    )


# --- g02: triangle census of the near-dup graph --------------------------

# Orientation key: deg·2^40 + id gives a single BIGINT total order on
# (degree, id) — ids stay < 2^40 and degrees < 2^23 at any plausible corpus
# replication of this data.
_G02_KEY_SHIFT = 1 << 40


@query(
    "g02_neardup_triangle_census",
    oracle="""
    WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM tok
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.8
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b FROM pairs)
      GROUP BY node
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM pairs p1
      JOIN pairs p2 ON p2.doc_a = p1.doc_b
      JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(deg * (deg - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
           t.n_triangles,
           CASE WHEN (SELECT SUM(deg * (deg - 1) / 2) FROM deg) > 0
                THEN CAST(round_even((3 * t.n_triangles)
                       / CAST((SELECT SUM(deg * (deg - 1) / 2) FROM deg) AS DOUBLE)
                       * 1000000, 0) AS BIGINT) / 1000000.0
                ELSE 0.0 END AS closure_rate
    FROM tri t
    """,
    tags=("llm", "dedup", "graph", "audit"),
)
def g02_neardup_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup pair graph (edges = d03's LSH scale
    path, the same verified Jaccard ≥ 0.8 set the clustering consumes):
    nodes/edges/wedges/triangles and the wedge-closure rate 3·Δ/wedges.
    Transitive-closure clustering (d06) merges a chain a-b-c whether or
    not a-c are themselves similar; a closure rate near 1 says clusters
    are clone cliques (keeper deletion is safe), a low rate says chaining
    is merging documents that are NOT mutually similar — the one-number
    audit to check before d07/d17 delete cluster members.

    Scale: the classic degree-oriented node-iterator — every edge is
    oriented from its lower (degree, id) endpoint via a single BIGINT key
    (deg·2⁴⁰+id), wedges enumerate only ordered out-neighbor pairs (bounded
    by Σ outdeg² = O(m^1.5) on any graph — a hub's edges mostly point AT
    it, so no reducer sees a hub's full neighborhood), and the closing
    edge check is one equi-join back against the oriented edge set.
    The oracle counts the same triangles the id-ordered way; the counts
    agree because both enumerate each triangle exactly once."""
    t = register(spark, sf_dir, ("documents",))
    # The pair set feeds FIVE consumers (deg, two orientation joins, the
    # e1/e2/e3 self-joins, n_edges): checkpoint it once or Catalyst inlines
    # the whole LSH pipeline into every branch (the un-checkpointed plan
    # replayed the shingle/band/verify stages 9×).
    pairs = (
        minhash_lsh_pairs(t["documents"], "doc_id", "text", k=3, threshold=0.8)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # attach orientation keys to both endpoints, orient low-key -> high-key
    keyed = (
        pairs.join(deg.withColumnRenamed("node", "doc_a"), "doc_a")
        .withColumnRenamed("deg", "deg_a")
        .join(deg.withColumnRenamed("node", "doc_b"), "doc_b")
        .withColumnRenamed("deg", "deg_b")
        .select(
            (F.col("deg_a") * _G02_KEY_SHIFT + F.col("doc_a")).alias("ka"),
            (F.col("deg_b") * _G02_KEY_SHIFT + F.col("doc_b")).alias("kb"),
        )
    )
    # oriented is consumed three times (e1/e2/e3); checkpoint so the deg
    # joins run once, and re-spread afterwards (trap: checkpoint pins a
    # coalesced layout AND loses stats — the self-joins go sort-merge,
    # which is the right shape for an edge table at scale anyway).
    oriented = (
        keyed.select(F.least("ka", "kb").alias("src"), F.greatest("ka", "kb").alias("dst"))
        .localCheckpoint(eager=False)
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedge = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.dst") < F.col("e2.dst")),
    ).select(F.col("e1.dst").alias("x"), F.col("e2.dst").alias("y"))
    triangles = wedge.join(
        e3, (F.col("x") == F.col("e3.src")) & (F.col("y") == F.col("e3.dst"))
    ).agg(F.count(F.lit(1)).alias("n_triangles"))

    summary = F.broadcast(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("bigint").alias("n_wedges"),
        )
    )
    n_edges = F.broadcast(pairs.agg(F.count(F.lit(1)).alias("n_edges")))
    return (
        triangles.crossJoin(summary)
        .crossJoin(n_edges)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                iround((3 * F.col("n_triangles")) / F.col("n_wedges").cast("double"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("closure_rate"),
        )
    )


# --- q78: RFM customer segmentation --------------------------------------

_Q78_NT = 5  # quintiles


@query(
    "q78_rfm_segmentation",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, CAST(round_even(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
    ),
    per_user AS (
      SELECT user_id,
             MAX(CAST(ts AS DATE)) AS last_d,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(c) AS BIGINT) AS cents
      FROM p GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, freq, cents,
             NTILE({_Q78_NT}) OVER (ORDER BY last_d DESC, user_id) AS r_score,
             NTILE({_Q78_NT}) OVER (ORDER BY freq DESC, user_id) AS f_score,
             NTILE({_Q78_NT}) OVER (ORDER BY cents DESC, user_id) AS m_score
      FROM per_user
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS monetary_total,
           {sql_iround("SUM(freq) / CAST(COUNT(*) AS DOUBLE)", 4)} AS avg_frequency
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    tags=("events", "segmentation", "window"),
)
def q78_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: every purchasing user scored into
    recency / frequency / monetary quintiles (NTILE with user_id
    tiebreaks — identical bucket boundaries on both engines), then the
    segment report (users, revenue, mean purchase count per R×F×M cell)
    that drives lifecycle campaigns ("champions", "at-risk", ...).

    Scale: the corpus-sized work is one user-keyed partial agg of the
    purchase feed — ONE scan: recency ordering is last-purchase-date
    descending, so no corpus-wide anchor date (a second scan) is ever
    needed. The three NTILEs run on the per-USER table (orders of
    magnitude smaller than events — this is why the aggregation must come
    first, not a window over raw purchases). The quintile windows are
    unpartitioned (global sort of the user table); past ~10⁹ users the
    drop-in is q72's range-bucketed distributed prefix sum to derive
    ranks, with NTILE as ceil(NT·rank/n). Revenue stays integer cents
    until the report."""
    t = register(spark, sf_dir, ("events",))
    p = t["events"].filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.call_function("rint", F.col("value") * 100).cast("bigint").alias("c"),
    )
    per_user = p.groupBy("user_id").agg(
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("c").alias("cents"),
    )
    scored = per_user.select(
        "freq",
        "cents",
        F.ntile(_Q78_NT).over(_gw().orderBy(F.desc("last_d"), F.asc("user_id"))).alias("r_score"),
        F.ntile(_Q78_NT).over(_gw().orderBy(F.desc("freq"), F.asc("user_id"))).alias("f_score"),
        F.ntile(_Q78_NT).over(_gw().orderBy(F.desc("cents"), F.asc("user_id"))).alias("m_score"),
    )
    return (
        scored.groupBy(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (F.sum("cents") / F.lit(100.0)).alias("monetary_total"),
            iround(F.sum("freq") / F.count(F.lit(1)).cast("double"), 4).alias("avg_frequency"),
        )
    )


# --- t31: mixture annealing plan ------------------------------------------

_T31_EPOCHS = 4          # interpolation steps: epoch 0 (natural) .. E (uniform)
_T31_BUDGET = 1_000_000  # tokens sampled per epoch


@query(
    "t31_mixture_annealing_plan",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(regexp_split_to_array(trim(text), ' +'))) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS ns FROM s),
    e AS (SELECT unnest(generate_series(0, {_T31_EPOCHS})) AS epoch),
    plan AS (
      SELECT s.source, e.epoch, s.toks,
             CAST(s.toks * tot.ns * ({_T31_EPOCHS} - e.epoch) + tot.t * e.epoch AS BIGINT) AS num,
             CAST(tot.t * tot.ns * {_T31_EPOCHS} AS BIGINT) AS den
      FROM s CROSS JOIN e CROSS JOIN tot
    )
    SELECT source,
           CAST(epoch AS BIGINT) AS epoch,
           toks AS n_tokens,
           {sql_iround("CAST(num AS DOUBLE) / den", 6)} AS weight,
           CAST(floor({_T31_BUDGET} * (CAST(num AS DOUBLE) / den)) AS BIGINT)
             AS planned_tokens
    FROM plan
    """,
    tags=("llm", "mixing", "curriculum"),
)
def t31_mixture_annealing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-annealing schedule: per-epoch source sampling weights that
    interpolate linearly from the NATURAL mixture (each source's token
    share — epoch 0) to the UNIFORM mixture (1/|sources| — epoch {e}),
    the standard end-of-training anneal that upweights small high-quality
    sources as the learning rate decays; plus each source's planned token
    draw from a fixed per-epoch budget. Complements t12 (one static
    temperature-scaled mixture) with the full schedule.

    Cross-engine exactness: the interpolated weight is the exact integer
    rational [toks·S·(E−e) + T·e] / (T·S·E) — numerator and denominator
    are BIGINTs on both engines, so the published weight is one identical
    double division (rounded 6 dp) and the planned draw one identical
    floor. Per epoch the numerators sum to the denominator, so planned
    tokens sum to the budget up to |sources| floors.

    Scale: one source-keyed partial agg of the corpus; everything after
    runs on the |sources|×(E+1) plan table (broadcast totals, no second
    corpus pass — the per-source table is checkpointed so the totals
    aggregate reads it, not the corpus lineage twice)."""
    t = register(spark, sf_dir, ("documents",))
    s = (
        t["documents"]
        .groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).cast("bigint").alias("toks"))
        .localCheckpoint(eager=False)  # two consumers: totals + plan rows
    )
    tot = F.broadcast(
        s.agg(F.sum("toks").cast("bigint").alias("t"), F.count(F.lit(1)).alias("ns"))
    )
    epochs = spark.range(0, _T31_EPOCHS + 1).select(F.col("id").alias("epoch"))
    plan = s.crossJoin(F.broadcast(epochs)).crossJoin(tot).select(
        "source",
        F.col("epoch").cast("bigint").alias("epoch"),
        F.col("toks").alias("n_tokens"),
        (
            F.col("toks") * F.col("ns") * (F.lit(_T31_EPOCHS) - F.col("epoch"))
            + F.col("t") * F.col("epoch")
        ).alias("num"),
        (F.col("t") * F.col("ns") * _T31_EPOCHS).alias("den"),
    )
    ratio = F.col("num").cast("double") / F.col("den")
    return plan.select(
        "source",
        "epoch",
        "n_tokens",
        iround(ratio, 6).alias("weight"),
        F.floor(_T31_BUDGET * ratio).cast("bigint").alias("planned_tokens"),
    )


# --- t32: classifier calibration audit ------------------------------------

_T32_NBINS = 10
_T32_LABEL_MIN = 0.5  # heuristic-quality threshold defining the "true" label


def _t32_oracle() -> str:
    from dibimbing_case_study_etl_spark.functions.text import EN_STOPWORDS
    from dibimbing_case_study_etl_spark.queries.llm_ops import _sql_marker_score
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import _CLF_WRANGE

    qs = (
        "round_even((0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)"
        " + 0.5 * LEAST(1.0, n_tokens / 100.0)) * 10000, 0) / 10000.0"
    )
    return f"""
    WITH feats AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
        FROM documents
      )
    ),
    pred AS (
      SELECT doc_id,
             {sql_iround(f"1.0 / (1.0 + exp(-(SUM((CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_CLF_WRANGE}) - 1000) / (1000.0 * sqrt(COUNT(*))))))", 4)}
               AS score
      FROM feats GROUP BY doc_id
    ),
    lab AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tokens,
             {_sql_marker_score(EN_STOPWORDS)} AS n_stop
      FROM documents
    ),
    joined AS (
      SELECT p.score,
             CASE WHEN ({qs}) >= {_T32_LABEL_MIN} THEN 1 ELSE 0 END AS y
      FROM pred p JOIN lab ON lab.doc_id = p.doc_id
    ),
    binned AS (
      SELECT LEAST(CAST(floor(score * {_T32_NBINS}) AS BIGINT), {_T32_NBINS - 1})
               AS conf_bin,
             CAST(round_even(score * 10000, 0) AS BIGINT) AS s_i,
             y
      FROM joined
    )
    SELECT conf_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_positive,
           {sql_iround("SUM(s_i) / (10000.0 * COUNT(*))", 4)} AS avg_confidence,
           {sql_iround("SUM(y) / CAST(COUNT(*) AS DOUBLE)", 4)} AS positive_rate,
           {sql_iround("abs(SUM(s_i) / (10000.0 * COUNT(*)) - SUM(y) / CAST(COUNT(*) AS DOUBLE))", 4)}
             AS calibration_gap
    FROM binned
    GROUP BY conf_bin
    """


@query(
    "t32_classifier_calibration",
    oracle=_t32_oracle(),
    tags=("llm", "quality", "audit", "calibration"),
)
def t32_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the learned quality gate: t27's hashed
    linear classifier scores every document, the heuristic composite
    (p03's t02-style score ≥ {m}) stands in as the reference label, and
    each confidence decile reports predicted confidence vs realized
    positive rate plus the per-bin calibration gap — the table behind an
    expected-calibration-error (ECE) check, which is what decides whether
    a classifier's 0.9 actually means 90% before its threshold gates a
    corpus. No other registry query audits a model's probabilities
    against outcomes.

    Cross-engine exactness: predictions are t27's 4-dp-rounded sigmoid,
    so binning (floor(score·{b}), top bin closed) and the scaled-integer
    confidence sums are decisions on identical doubles; labels derive
    from exact integer token/stopword counts through one rounded
    composite. Scale: two corpus passes that fuse into map-side work — the
    explode→distinct→partial-agg dot product (t27's shape) and a
    flat label scan — joined on doc_id, then a {b}-row partial agg."""
    from dibimbing_case_study_etl_spark.functions.text import EN_STOPWORDS, marker_score
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import (
        t27_hashed_quality_classifier,
    )

    t = register(spark, sf_dir, ("documents",))
    pred = t27_hashed_quality_classifier(spark, sf_dir).select("doc_id", "score")
    n_tokens = token_count(F.col("text"))
    qs = iround(
        0.5 * (marker_score(F.col("text"), EN_STOPWORDS) / n_tokens)
        + 0.5 * F.least(F.lit(1.0), n_tokens / 100.0),
        4,
    )
    lab = t["documents"].select(
        "doc_id", (qs >= _T32_LABEL_MIN).cast("int").alias("y")
    )
    binned = pred.join(lab, "doc_id").select(
        F.least(
            F.floor(F.col("score") * _T32_NBINS).cast("bigint"),
            F.lit(_T32_NBINS - 1).cast("bigint"),
        ).alias("conf_bin"),
        F.call_function("rint", F.col("score") * 10000).cast("bigint").alias("s_i"),
        "y",
    )
    avg_conf = F.sum("s_i") / (10000.0 * F.count(F.lit(1)))
    pos_rate = F.sum("y") / F.count(F.lit(1)).cast("double")
    return binned.groupBy("conf_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("y").cast("bigint").alias("n_positive"),
        iround(avg_conf, 4).alias("avg_confidence"),
        iround(pos_rate, 4).alias("positive_rate"),
        iround(F.abs(avg_conf - pos_rate), 4).alias("calibration_gap"),
    )
