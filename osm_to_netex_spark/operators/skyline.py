"""Distributed 2-D skyline (Pareto frontier): minimize x, maximize y.

The multi-criteria shortlist query ("cheapest parts that are also largest",
"fastest routes that are also shortest") — no reference analogue (the
reference has no ranking operators at all); standard OLAP surface a
replacement engine must offer.

A point dominates another iff it is <= on x AND >= on y with at least one
strict inequality.  The skyline is the set of non-dominated (x, y) points.

Scale design — the naive formulation is an O(n²) self-join; this one is two
linear scans plus a tiny summary:

* **Distinct first.** Dominance only depends on the (x, y) pair, so the
  frontier is computed over ``groupBy(x, y).count()`` — one map-side-combined
  aggregate turns 10^12 rows into the value domain (bounded by price×size
  granularity), and the original multiplicity is carried as ``n_rows``.
* **Range-bucket prefix-max instead of a global sort.** Bucket by x range;
  per bucket compute max(y) (tiny summary, one row per bucket).  The running
  max of all strictly-cheaper buckets is a prefix scan over that summary —
  a few hundred rows, computed with a single-partition window that costs
  nothing — and is broadcast back.  A pair survives only if its y exceeds
  both (a) the prefix max of every earlier bucket and (b) the running max of
  strictly-preceding pairs inside its own bucket (a window PARTITIONED by
  bucket — parallel across buckets, never a global single-partition sort).
* **Exactness.** Within a bucket, the (x asc, y desc) running max over
  strictly-preceding rows flags dominance exactly (on distinct pairs any
  earlier row with max_y >= y dominates: strictly smaller x, or equal x with
  strictly larger y).  Cross-bucket dominance is exactly the prefix-max test
  because every pair in an earlier bucket has strictly smaller x.
  Bucket count only affects parallelism, not the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Distinct Pareto-frontier points (x, y, n_rows): minimal x, maximal y."""
    pairs = (
        df.groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # deterministic fixed-width buckets over the x extent (2-row summary agg)
    ext = pairs.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    pairs = pairs.crossJoin(F.broadcast(ext)).withColumn(
        "bkt",
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("x") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / n_buckets + 1e-12)).cast("int"),
        ),
    )
    # prefix max(y) of all strictly-earlier buckets (summary is tiny)
    summ = pairs.groupBy("bkt").agg(F.max("y").alias("bkt_max_y"))
    w_pre = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    summ = summ.withColumn("pre_max_y", F.max("bkt_max_y").over(w_pre))
    # in-bucket running max over strictly-preceding (x asc, y desc) pairs
    w_in = (
        Window.partitionBy("bkt")
        .orderBy(F.col("x").asc(), F.col("y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        pairs.join(F.broadcast(summ), "bkt")
        .withColumn("in_max_y", F.max("y").over(w_in))
        .withColumn(
            "dominated",
            (F.col("in_max_y") >= F.col("y"))
            | (F.col("pre_max_y") >= F.col("y")),
        )
    )
    return (
        flagged.where(~F.coalesce("dominated", F.lit(False)))
        .select("x", "y", "n_rows")
    )
