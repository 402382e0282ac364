"""Declarative data-quality checks — generalization of the reference's
"Lightweight DQ at normalize" (`README.md:40, 263-267`): parallel-array
length match (`normalize:55-56`), non-empty result (`normalize:93-94`),
not-all-NaN temperature (`normalize:95-96`).

All row-level predicates evaluate in ONE aggregate pass (a single scan),
never via per-check ``count()`` actions.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DataQualityError(ValueError):
    """Raised when any declared expectation fails."""


def expect(
    df: DataFrame,
    row_checks: Mapping[str, Column] | None = None,
    require_nonempty: bool = True,
    require_some_nonnull: tuple[str, ...] = (),
) -> dict[str, int]:
    """Validate ``df``; raise :class:`DataQualityError` with every violation.

    - ``row_checks``: name → boolean Column that must hold for EVERY row.
    - ``require_nonempty``: dataset must have ≥1 row (Q2).
    - ``require_some_nonnull``: each named column must have ≥1 non-null (Q3).

    Returns the violation-count map (all zeros on success) so callers can log.
    """
    row_checks = dict(row_checks or {})
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in row_checks.items():
        aggs.append(F.sum(F.when(~pred | pred.isNull(), 1).otherwise(0)).alias(f"viol__{name}"))
    for col in require_some_nonnull:
        aggs.append(F.count(col).alias(f"nonnull__{col}"))

    row = df.agg(*aggs).first()
    failures: list[str] = []
    counts: dict[str, int] = {}
    n = row["__n"]
    if require_nonempty and n == 0:
        failures.append("dataset is empty")
    for name in row_checks:
        v = row[f"viol__{name}"] or 0
        counts[name] = v
        if v > 0:
            failures.append(f"check {name!r} violated by {v}/{n} rows")
    for col in require_some_nonnull:
        if n > 0 and (row[f"nonnull__{col}"] or 0) == 0:
            failures.append(f"column {col!r} is entirely null")

    if failures:
        raise DataQualityError("; ".join(failures))
    counts["__n"] = n
    return counts


def observe_checks(
    df: DataFrame,
    row_checks: Mapping[str, Column],
    name: str = "dq",
):
    """Attach the same expectations as :func:`expect` via the Observation
    API — metrics piggyback on whatever action the caller runs next (a
    write, a collect), so the checks cost ZERO extra scans. At 100 TB
    that's the difference between "DQ is free" and "DQ doubles the job".

    Returns ``(df_with_observation, observation)``; call
    :func:`assert_observed` with the observation AFTER the action.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for cname, pred in row_checks.items():
        aggs.append(F.sum(F.when(~pred | pred.isNull(), 1).otherwise(0)).alias(f"viol__{cname}"))
    return df.observe(obs, *aggs), obs


def assert_observed(obs, require_nonempty: bool = True) -> dict[str, int]:
    """Evaluate an :func:`observe_checks` observation after its action ran;
    raises :class:`DataQualityError` like :func:`expect`. Note the
    post-hoc trade-off: the action has already executed when violations
    surface, so pair it with an atomic sink (staging dir / dynamic
    partition overwrite) and promote only on success."""
    got = obs.get
    n = got["__n"]
    failures = []
    if require_nonempty and n == 0:
        failures.append("dataset is empty")
    counts: dict[str, int] = {}
    for key, v in got.items():
        if key.startswith("viol__"):
            counts[key[len("viol__"):]] = v or 0
            if v:
                failures.append(f"check {key[len('viol__'):]!r} violated by {v}/{n} rows")
    if failures:
        raise DataQualityError("; ".join(failures))
    counts["__n"] = n
    return counts
