"""Deterministic corpus splitting & stratified sampling (training-data ops).

A training pipeline needs reproducible, cluster-size-independent ways to
(a) carve a corpus into train/val/test and (b) downsample per stratum
(language, source, quality band).  Both are pure per-row projections over
the portable hash (functions.portable.prand) — no shuffle, no RNG state,
no dependence on partitioning or row order, and the DuckDB oracle
reproduces every assignment bit-for-bit.

Reference parity: the reference has no sampling surface (it converts whole
files); these exist for the 10^12-doc training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.portable import SPARK, concat_str, flit, prand

DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.9),
    ("val", 0.05),
    ("test", 0.05),
)


def split_expr(
    id_col: str,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    d: str = SPARK,
    salt: str = "split",
) -> str:
    """CASE expression assigning a split name from the hash fraction of the
    id — same string in either dialect.  Ranges are cumulative in the order
    given; weights must sum to 1 (the last split absorbs rounding)."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = prand(concat_str([f"'{salt}:'", id_col], d), d)
    branches, acc = [], 0.0
    for name, w in splits[:-1]:
        acc += w
        branches.append(f"WHEN {u} < {flit(acc)} THEN '{name}'")
    return f"(CASE {' '.join(branches)} ELSE '{splits[-1][0]}' END)"


def assign_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Add a `split` column — pure projection, stable under repartitioning."""
    return docs.withColumn("split", F.expr(split_expr(id_col, splits, SPARK)))


def sample_pred(id_col: str, fraction: float, d: str = SPARK, salt: str = "samp") -> str:
    """Deterministic Bernoulli-sample predicate: keeps ~`fraction` of rows,
    the SAME rows on every run and at every parallelism."""
    u = prand(concat_str([f"'{salt}:'", id_col], d), d)
    return f"({u} < {flit(fraction)})"


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    `fractions` maps stratum value → keep fraction; strata not listed keep
    `default_fraction`.  One projection + filter — the stratum map rides
    the plan as a literal CASE, so there is no join and no shuffle (unlike
    df.stat.sampleBy, this is reproducible across cluster sizes AND
    expressible to the SQL oracle)."""
    u = F.expr(prand(concat_str(["'samp:'", id_col], SPARK), SPARK))
    frac = F.lit(default_fraction)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(frac)
    return docs.where(u < frac)


def es_key_expr(id_col: str, weight_col: str, d: str = SPARK, salt: str = "wres") -> str:
    """Efraimidis-Spirakis weighted-reservoir key: ln(u)/w with u the
    portable hash fraction of the id (u in (0,1]: hash+1 over 2^60) and
    w >= 1.  Selecting the top-k rows by this key draws a weighted sample
    without replacement — P(row first) = w_i/Σw, exactly the reservoir
    semantics — yet is fully deterministic: no RNG state, stable under
    repartitioning and cluster size.

    ln is the single transcendental (correctly rounded in both engines'
    libm for these magnitudes); the key itself is never emitted, only the
    membership/rank it induces, and key ties are measure-zero under the
    60-bit hash."""
    from ..functions.portable import phash60

    h = phash60(concat_str([f"'{salt}:'", id_col], d), d)
    u = f"((({h}) + 1.0e0) / {flit(float(2**60))})"
    w = f"greatest(cast({weight_col} as double), 1.0e0)"
    return f"(ln({u}) / {w})"


def weighted_sample(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    stratum_col: str | None = None,
) -> DataFrame:
    """Top-k weighted sample (per stratum if given): (id, [stratum], rank).

    One window shuffle on the stratum key; with no stratum the global top-k
    plans as TakeOrderedAndProject (per-partition top-k + driver merge), so
    the full corpus is never sorted."""
    key = F.expr(es_key_expr(id_col, weight_col, SPARK))
    if stratum_col is None:
        out = (
            docs.select(F.col(id_col), key.alias("__k"))
            .orderBy(F.desc("__k"), F.col(id_col))
            .limit(k)
        )
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("__k"), F.col(id_col))
        return out.select(
            F.col(id_col), F.row_number().over(w).alias("rank")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(F.desc("__k"), F.col(id_col))
    return (
        docs.select(F.col(id_col), F.col(stratum_col), key.alias("__k"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("__k")
    )
