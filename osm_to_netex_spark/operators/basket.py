"""Frequent itemset pairs (a-priori market basket) over basket tables.

Co-occurrence mining: which item pairs appear together in the same basket
(order, document, session) at least ``min_support`` times, with lift.  No
reference analogue (the reference has no co-occurrence surface); standard
warehouse/recommender surface a replacement engine must offer, and the
shape behind "which tags co-occur on the same OSM way" style diagnostics.

Scale design (the naive pair explosion is Σ|basket|² — fine when baskets
are bounded, catastrophic on hub baskets):

* **Distinct first.** (basket, item) pairs are distinct-ed before anything
  else — duplicate lines never multiply the fan-out.
* **A-priori prefilter.** An item below ``min_support`` cannot participate
  in a frequent pair (downward closure), so singleton supports are computed
  first (one map-side-combined agg over the distinct pairs) and the basket
  table is semi-joined to the frequent-item set BEFORE the pair join.  On a
  Zipfian catalog this removes the long tail — most of the pair fan-out —
  for the cost of one broadcast.
* **Ordered pair join.** Pairs come from a self equi-join on the basket key
  with ``item_a < item_b`` — shuffle on basket key only, per-basket work
  |b|²/2 where b is the *filtered* basket.  Hub baskets (one basket holding
  a significant fraction of the catalog) are the residual risk: cap them
  upstream (`F.slice` after `collect_list` by support order) or let AQE
  split the skewed basket-key partitions.
* **Lift from broadcast singletons.** The final pair counts join the tiny
  singleton-support table twice (broadcast) — no extra pass over baskets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def frequent_pairs(
    lines: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 3,
) -> DataFrame:
    """(item_a, item_b, support, lift_q9) for pairs co-occurring in >=
    ``min_support`` baskets; lift quantized to 9 decimals (deterministic
    single-division arithmetic, order-free)."""
    # the distinct pair set feeds FOUR plan branches (singletons, basket
    # count, both self-join sides) — persist it once instead of re-scanning
    # the lines table per branch (measured 3.6s → ~1.3s at sf0.1).  Caller
    # releases via dedup.unpersist_intermediates(result).
    b = (
        lines.select(F.col(basket_col).alias("bk"), F.col(item_col).alias("it"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    singles = b.groupBy("it").agg(F.count(F.lit(1)).alias("s"))
    freq = singles.where(F.col("s") >= min_support)
    # 1-row basket count as a broadcast cross join — stays lazy, no
    # driver-side action, no recompute of b outside the one plan
    nb = b.select(F.countDistinct("bk").alias("nb"))
    fb = b.join(F.broadcast(freq.select("it")), "it", "left_semi")
    pairs = (
        fb.alias("a")
        .join(fb.alias("b"), on=[F.col("a.bk") == F.col("b.bk"),
                                 F.col("a.it") < F.col("b.it")])
        .groupBy(F.col("a.it").alias("item_a"), F.col("b.it").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    sa = freq.selectExpr("it as item_a", "s as sa")
    sb = freq.selectExpr("it as item_b", "s as sb")
    from .dedup import _attach_cached

    out = (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(nb))
        .selectExpr(
            "item_a", "item_b", "support",
            # lift = P(ab)/(P(a)P(b)) = support*n / (sa*sb): one division
            "cast(floor((cast(support as double) * cast(nb as double)"
            " / (cast(sa as double) * cast(sb as double)))"
            " * 1.0e9 + 0.5e0) as bigint) as lift_q9",
        )
    )
    return _attach_cached(out, [b])


def frequent_pairs_oracle_sql(
    table: str = "lineitem",
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 3,
) -> str:
    """DuckDB replay: same a-priori filter, same single-division lift."""
    return f"""
        with b as (select distinct {basket_col} as bk, {item_col} as it from {table}),
        singles as (select it, count(*) as s from b group by it),
        freq as (select it, s from singles where s >= {min_support}),
        nb as (select count(distinct bk) as n from b),
        fb as (select b.bk, b.it from b join freq on b.it = freq.it),
        pairs as (
            select a.it as item_a, b.it as item_b, count(*) as support
            from fb a join fb b on a.bk = b.bk and a.it < b.it
            group by 1, 2 having count(*) >= {min_support}
        )
        select item_a, item_b, support,
               cast(floor((cast(support as double) * cast(nb.n as double)
                    / (cast(sa.s as double) * cast(sb.s as double)))
                    * 1.0e9 + 0.5e0) as bigint) as lift_q9
        from pairs
        join freq sa on pairs.item_a = sa.it
        join freq sb on pairs.item_b = sb.it
        cross join nb"""
