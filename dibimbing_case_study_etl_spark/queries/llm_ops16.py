"""Round-7 additions: user-level DP with contribution capping, a
physical-layout clustering audit, and signal statistics on the real
audio codec.

- ``v07`` extends the privacy family from event-level to USER-level
  differential privacy: every user's contribution is capped at K events
  before the histogram (bounded L1 sensitivity — the step v04's
  per-row-count release does not need but any user-keyed release does),
  then Laplace(K/ε) noise is drawn by the md5-seeded inverse-CDF idiom
  so both engines release the identical value.
- ``u12`` quantifies WHY a table should be clustered before a big scan:
  it simulates the same rows under a hash-scattered layout and a
  range-sorted layout (same md5 file assignment in both engines),
  measures per-file key-range overlap pairs and the expected number of
  files a point lookup must open — the decision metric behind
  OPTIMIZE/ZORDER-style maintenance, computed as two aggregations.
- ``m13`` runs on m04's REAL RIFF/WAVE blobs: container-parse each
  payload with the dependency-free codec, then report per-document
  signal statistics (peak, RMS, zero crossings). The oracle reconstructs
  every value from the text bytes, so codec + numpy signal path is
  value-checked end-to-end.

Reference parity: the reference treats payloads as opaque typed blobs
with metadata alongside (``scripts/extract_open_meteo_to_minio.py``);
these queries are the analytics the engine adds on top of that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.queries import query

# --- v07: user-contribution-capped DP histogram ------------------------------

_V07_EPS = 0.5
_V07_CAP = 8

_V07_ORACLE = f"""
    WITH ranked AS (
      SELECT event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    hist AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS true_count,
             CAST(SUM(CASE WHEN rn <= {_V07_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS capped_count
      FROM ranked GROUP BY event_type
    ),
    seeded AS (
      SELECT event_type, true_count, capped_count,
             CAST(('0x' || substr(md5('dp2:' || event_type), 1, 15)) AS BIGINT)
               / {float(2**60)!r} AS u
      FROM hist
    ),
    noised AS (
      SELECT event_type, true_count, capped_count,
             -(CAST({_V07_CAP} AS DOUBLE) / CAST({_V07_EPS} AS DOUBLE))
               * sign(u - 0.5) * ln(greatest(1.0 - 2.0 * abs(u - 0.5), 1e-15))
               AS noise
      FROM seeded
    )
    SELECT event_type, true_count, capped_count,
           {sql_iround("capped_count + noise", 4)} AS noisy_count,
           {sql_iround("abs(noise)", 4)} AS abs_noise,
           CAST({_V07_EPS} AS DOUBLE) AS epsilon,
           CAST({_V07_CAP} AS BIGINT) AS sensitivity
    FROM noised ORDER BY event_type
"""


@query(
    "v07_user_capped_dp_histogram",
    oracle=_V07_ORACLE,
    tags=("llm", "privacy"),
)
def v07_user_capped_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-level ε-DP event-type histogram (Dwork et al.'s user-level
    model): each user contributes at most K = 8 events in total (their K
    earliest by (ts, event_id) — deterministic), which bounds the
    histogram's L1 sensitivity to K, then each bucket adds Laplace(K/ε)
    noise drawn by inverse-CDF from an md5-seeded uniform (v04's
    reproducible-release idiom). Reports true vs capped counts so the
    bias introduced by capping is visible next to the noise magnitude —
    the two error terms a privacy budget has to trade off.

    Scale: one window partitioned BY USER (millions of small partitions,
    never a global sort) feeds one map-side-combinable aggregation over
    ≤ |event_type| groups; the noise math runs on the tiny histogram."""
    t = register(spark, sf_dir, ("events",))
    ranked = t["events"].select(
        "event_type",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    hist = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count"),
        F.sum((F.col("rn") <= _V07_CAP).cast("bigint")).alias("capped_count"),
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp2:"), F.col("event_type"))), 1, 15), 16, 10)
        .cast("bigint")
        / F.lit(float(2**60))
    )
    noise = (
        -(F.lit(float(_V07_CAP)) / F.lit(float(_V07_EPS)))
        * F.signum(u - 0.5)
        * F.log(F.greatest(1.0 - 2.0 * F.abs(u - 0.5), F.lit(1e-15)))
    )
    return (
        hist.withColumn("noise", noise)
        .select(
            "event_type",
            "true_count",
            "capped_count",
            iround(F.col("capped_count") + F.col("noise"), 4).alias("noisy_count"),
            iround(F.abs("noise"), 4).alias("abs_noise"),
            F.lit(float(_V07_EPS)).alias("epsilon"),
            F.lit(_V07_CAP).cast("bigint").alias("sensitivity"),
        )
        .orderBy("event_type")
    )


# --- u12: physical-layout clustering-depth audit ------------------------------

_U12_FILES = 16

_U12_ORACLE = f"""
    WITH keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    assigned AS (
      SELECT k,
             CAST(('0x' || substr(md5('u12:' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)
               % {_U12_FILES} AS f_hash,
             NTILE({_U12_FILES}) OVER (ORDER BY k) - 1 AS f_sorted
      FROM keys
    ),
    layouts AS (
      SELECT 'hash-scattered' AS layout, f_hash AS f, k FROM assigned
      UNION ALL
      SELECT 'range-sorted' AS layout, f_sorted AS f, k FROM assigned
    ),
    files AS (
      SELECT layout, f, MIN(k) AS lo, MAX(k) AS hi, COUNT(*) AS n
      FROM layouts GROUP BY layout, f
    ),
    olaps AS (
      SELECT a.layout, CAST(COUNT(*) AS BIGINT) AS overlap_pairs
      FROM files a JOIN files b
        ON a.layout = b.layout AND a.f < b.f AND a.lo <= b.hi AND b.lo <= a.hi
      GROUP BY a.layout
    ),
    amplification AS (
      SELECT l.layout, CAST(COUNT(*) AS BIGINT) AS key_file_hits,
             CAST(MAX(t.nk) AS BIGINT) AS n_keys
      FROM (SELECT DISTINCT layout, k FROM layouts) l
      JOIN files fl ON fl.layout = l.layout AND l.k BETWEEN fl.lo AND fl.hi
      CROSS JOIN (SELECT COUNT(*) AS nk FROM keys) t
      GROUP BY l.layout
    )
    SELECT f.layout,
           CAST({_U12_FILES} AS BIGINT) AS n_files,
           CAST(SUM(f.n) AS BIGINT) AS n_keys,
           COALESCE(MAX(o.overlap_pairs), 0) AS overlap_pairs,
           {sql_iround("MAX(a.key_file_hits) * 1.0 / MAX(a.n_keys)", 4)}
             AS avg_files_per_point_lookup
    FROM files f
    LEFT JOIN olaps o ON o.layout = f.layout
    JOIN amplification a ON a.layout = f.layout
    GROUP BY f.layout ORDER BY f.layout
"""


@query(
    "u12_layout_clustering_depth",
    oracle=_U12_ORACLE,
    tags=("warehouse", "maintenance", "layout"),
)
def u12_layout_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-depth audit — the metric behind OPTIMIZE/ZORDER-style
    layout maintenance: simulate the distinct order keys under (a) a
    hash-scattered file layout (arrival-order ingest: every file spans
    the whole key domain) and (b) a range-sorted layout (NTILE over the
    sorted keys), with the SAME md5 file assignment in both engines.
    Per layout it reports file key-range overlap pairs (sorted → 0,
    scattered → all C(F,2) pairs) and the expected number of files a
    point lookup's min/max pruning must still open — the measured
    justification for paying a clustering rewrite before big scans.

    Scale: distinct keys → one small files table (F rows per layout) →
    the amplification join probes keys against F broadcast ranges; no
    quadratic anywhere (the file self-join is F×F on a constant F)."""
    t = register(spark, sf_dir, ("lineitem",))
    keys = t["lineitem"].select(F.col("l_orderkey").alias("k")).distinct()
    assigned = keys.select(
        "k",
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("u12:"), F.col("k").cast("string"))), 1, 15), 16, 10)
            .cast("bigint")
            % _U12_FILES
        ).alias("f_hash"),
        # global ntile needs a total order; the input is the slim DISTINCT
        # key column only (ints), so the single partition is bounded by the
        # key-domain size, not the table
        (F.ntile(_U12_FILES).over(_gw().orderBy("k")) - 1).alias("f_sorted"),
    )
    layouts = assigned.select(
        F.lit("hash-scattered").alias("layout"), F.col("f_hash").alias("f"), "k"
    ).unionByName(
        assigned.select(
            F.lit("range-sorted").alias("layout"), F.col("f_sorted").alias("f"), "k"
        )
    )
    files = layouts.groupBy("layout", "f").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi"), F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)  # tiny (2·F rows); feeds three consumers
    fa, fb = files.alias("a"), files.alias("b")
    overlaps = (
        fa.join(
            fb,
            (F.col("a.layout") == F.col("b.layout"))
            & (F.col("a.f") < F.col("b.f"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .groupBy(F.col("a.layout").alias("layout"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_pairs"))
    )
    hits = (
        layouts.select("layout", "k")
        .distinct()
        .join(
            F.broadcast(files.select("layout", "f", "lo", "hi")),
            on=["layout"],
        )
        .filter(F.col("k").between(F.col("lo"), F.col("hi")))
        .groupBy("layout")
        .agg(F.count(F.lit(1)).cast("bigint").alias("key_file_hits"))
    )
    per_layout = files.groupBy("layout").agg(
        F.sum("n").cast("bigint").alias("n_keys")
    )
    return (
        per_layout.join(overlaps, "layout", "left")
        .join(hits, "layout")
        .select(
            "layout",
            F.lit(_U12_FILES).cast("bigint").alias("n_files"),
            "n_keys",
            F.coalesce("overlap_pairs", F.lit(0).cast("bigint")).alias("overlap_pairs"),
            iround(F.col("key_file_hits") / F.col("n_keys"), 4).alias(
                "avg_files_per_point_lookup"
            ),
        )
        .orderBy("layout")
    )


# --- m13: WAV signal statistics on the real codec -----------------------------

_M13_ORACLE = f"""
    WITH samples AS (
      SELECT doc_id,
             CASE WHEN length(text) = 0 THEN [0]
                  ELSE list_transform(
                    generate_series(1, CAST(length(text) AS BIGINT)),
                    i -> (unicode(substring(text, CAST(i AS INTEGER), 1)) - 128) * 256)
             END AS s
      FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(len(s) AS BIGINT) AS n_samples,
             CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
             CAST(COALESCE(list_sum(list_transform(
               generate_series(1, CAST(len(s) AS BIGINT) - 1),
               i -> CASE WHEN s[CAST(i AS INTEGER)] * s[CAST(i AS INTEGER) + 1] < 0
                         THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings,
             list_sum(list_transform(s, x -> CAST(x AS DOUBLE) * x)) AS sq
      FROM samples
    )
    SELECT doc_id, n_samples, peak, zero_crossings,
           {sql_iround("sqrt(sq / n_samples)", 4)} AS rms
    FROM stats ORDER BY doc_id
"""


@query(
    "m13_wav_signal_stats",
    oracle=_M13_ORACLE,
    tags=("llm", "multimodal", "audio", "decode"),
)
def m13_wav_signal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document signal statistics over REAL RIFF/WAVE payloads: each
    blob is container-parsed by the dependency-free 16-bit PCM codec
    (``functions/audio.py``) and reduced to peak amplitude, RMS level,
    and zero-crossing count — the triage stats an audio-data pipeline
    computes before any model sees a waveform (silence/clipping/noise
    screens). The oracle reconstructs all three from the text bytes the
    fixture encodes, so decode + numpy signal math is value-checked
    sample-exactly (m04 proves decimation; this proves the analysis
    path).

    Scale: one Arrow-batched ``mapInPandas`` pass, partition-spread
    first; per-doc cost is O(n_samples) numpy, output one row per doc."""
    from dibimbing_case_study_etl_spark.operators.multimodal import synth_wav_table

    t = register(spark, sf_dir, ("documents",))
    audio = synth_wav_table(t["documents"], "doc_id", "text", sample_rate=16000)
    audio = audio.repartition(
        audio.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )

    def stats(batches):
        import numpy as np
        import pandas as pd

        from dibimbing_case_study_etl_spark.functions.audio import decode_wav

        for pdf in batches:
            rows = {"doc_id": [], "n_samples": [], "peak": [], "zero_crossings": [], "sq": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                _, s = decode_wav(bytes(blob))
                s64 = s.astype("int64")
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(len(s))
                rows["peak"].append(int(np.abs(s64).max()))
                rows["zero_crossings"].append(int((s64[:-1] * s64[1:] < 0).sum()))
                rows["sq"].append(float((s64.astype("float64") ** 2).sum()))
            yield pd.DataFrame(rows)

    raw = audio.mapInPandas(
        stats,
        schema="doc_id bigint, n_samples bigint, peak bigint, zero_crossings bigint, sq double",
    )
    return raw.select(
        "doc_id",
        "n_samples",
        "peak",
        "zero_crossings",
        iround(F.sqrt(F.col("sq") / F.col("n_samples")), 4).alias("rms"),
    ).orderBy("doc_id")
