"""Skew handling for cell-keyed joins (north rule: salted SMJ for dense-city
cells; SURVEY §2.2).

AQE's skew-join splitting (on by default, session.py) handles most runtime
skew; this module adds *explicit* salting for the case AQE cannot fix — a
shuffled aggregation or join where one cell holds orders of magnitude more
rows than the rest (a dense-city hex at res 7 can hold 10⁶ documents at the
10¹² design point).

Pattern: the big (fact) side splits each key into S salted sub-keys; the
small/replicated (dim) side is exploded S× so every salted sub-key still
finds its match.  Semantically identical to the unsalted join; the shuffle
spreads the hot key over S reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salt_facts(df: DataFrame, key: str, salts: int, row_key: str) -> DataFrame:
    """Add salted_key = key#(hash(row_key) % salts) on the big side."""
    return df.withColumn(
        "salted_key",
        F.concat_ws("#", F.col(key).cast("string"), F.pmod(F.xxhash64(row_key), F.lit(salts)).cast("string")),
    )


def explode_dims(df: DataFrame, key: str, salts: int) -> DataFrame:
    """Replicate the small side S× with every salt suffix."""
    return df.withColumn(
        "salted_key",
        F.explode(
            F.expr(
                f"transform(sequence(0, {salts - 1}), s -> concat(cast({key} as string), '#', cast(s as string)))"
            )
        ),
    )


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    salts: int = 8,
    row_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join facts⋈dims on `key` with the hot-key shuffle spread over
    `salts` reducers.  `row_key` (default: the fact key itself plus a
    monotonic fallback) determines the salt bucket — pass the fact table's
    natural id for even spread."""
    rk = row_key or key
    f = salt_facts(facts, key, salts, rk)
    d = explode_dims(dims.withColumnRenamed(key, f"__dim_{key}"), f"__dim_{key}", salts)
    out = f.join(d, "salted_key", how).drop("salted_key", f"__dim_{key}")
    return out


def top_heavy_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Diagnostic: keys whose row count exceeds `threshold` (candidates for
    salting) — run on a sample in production."""
    return df.groupBy(key).count().where(F.col("count") > threshold)
