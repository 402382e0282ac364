"""Bloom prefilter contracts: zero false negatives (the property the d13
exact-parity guarantee rests on), bounded false-positive rate at the
design point, and end-to-end d13 ≡ d09 output equality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom,
    might_contain,
)

RNG = np.random.default_rng(7)


def test_no_false_negatives():
    members = RNG.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    state = build_bloom(members)
    assert might_contain(*state, members).all()


def test_fpr_near_design_point():
    members = RNG.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    bits, mask, k = build_bloom(members, bits_per_item=20, n_hashes=5)
    probes = RNG.integers(-(2**63), 2**63 - 1, size=200_000, dtype=np.int64)
    fresh = probes[~np.isin(probes, members)]
    fpr = might_contain(bits, mask, k, fresh).mean()
    # design point ≈1%; the power-of-two size rounding only ever lowers it.
    assert fpr < 0.03, fpr


def test_empty_member_set_rejects_everything_almost():
    state = build_bloom(np.array([], dtype=np.int64))
    probes = RNG.integers(-(2**63), 2**63 - 1, size=1000, dtype=np.int64)
    assert not might_contain(*state, probes).any()


def test_prefilter_dataframe_keeps_members(spark):
    df = spark.range(10_000).withColumn("h", F.xxhash64("id"))
    members = np.array([r.h for r in df.filter(F.col("id") % 10 == 0).collect()], dtype=np.int64)
    kept = bloom_prefilter(df, "h", build_bloom(members))
    kept_ids = {r.id for r in kept.collect()}
    member_ids = set(range(0, 10_000, 10))
    assert member_ids <= kept_ids  # no member dropped
    # false positives exist but are rare
    assert len(kept_ids - member_ids) < 10_000 * 0.03


@pytest.mark.slow
def test_d13_output_equals_d09(spark, sf_dir):
    from dibimbing_case_study_etl_spark.queries import load_all

    reg = load_all()
    a = reg["d09_decontamination"].build(spark, sf_dir).toPandas()
    b = reg["d13_bloom_decontamination"].build(spark, sf_dir).toPandas()
    key = ["train_doc", "test_doc"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
