"""kNN linking: each Quay → its k nearest StopPlaces (north rule, SURVEY §2.2).

Strategies:

* **broadcast-exact** (default): the StopPlace side is a dimension table
  (10⁵–10⁶ rows globally → tens of MB as (id, lat, lon)); broadcast it, join
  every quay against candidates sharing a coarse cell *plus* its k-ring, rank
  by haversine with a window, keep k.  The ring radius guarantees exactness:
  any true neighbour within ``guarantee_m`` of the quay is inside the ring;
  quays whose k-th hit is farther than the guarantee (or with < k hits) fall
  back to a brute-force pass — distributed, driven by data, no driver loop.
* **brute-force**: cross join + window (oracle path / small dims).

Ranking ties break deterministically on (distance, stop id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import geo
from ..functions.portable import SPARK, haversine_m


def _ranked(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("quay_id").orderBy(F.col("dist_m").asc(), F.col("stop_id").asc())
    return cand.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def knn_brute_force(
    quays: DataFrame,
    stops: DataFrame,
    k: int = 3,
    quay_id: str = "quay_id",
    stop_id: str = "stop_id",
) -> DataFrame:
    """(quay_id, stop_id, dist_m, rn) — exact, stop side broadcast."""
    q = quays.select(
        F.col(quay_id).alias("quay_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    )
    s = stops.select(
        F.col(stop_id).alias("stop_id"),
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
    )
    cand = q.crossJoin(F.broadcast(s)).withColumn(
        "dist_m", F.expr(haversine_m("qlat", "qlon", "slat", "slon", SPARK))
    )
    return _ranked(cand, k).select("quay_id", "stop_id", "dist_m", "rn")


def knn_cell_pruned(
    quays: DataFrame,
    stops: DataFrame,
    k: int = 3,
    res: int = 7,
    ring: int = 1,
    quay_id: str = "quay_id",
    stop_id: str = "stop_id",
    scheme: str = "hex",
) -> DataFrame:
    """Exact kNN with k-ring candidate pruning + brute-force remainder.

    The ring guarantee: with hex cells of circumradius R the k-ring of depth
    ``ring`` contains every point within ``ring · R·√3/2 · 2`` … conservatively
    we use ``guarantee = ring * inradius`` (inradius = R·√3/2 in degrees,
    converted via M_PER_DEG).  A quay whose k-th candidate lies beyond the
    guarantee (or that found < k candidates) is re-run brute-force; the two
    result sets are unioned.  Exact vs the brute-force oracle by construction.
    """
    cell_fn = geo.hex_cell if scheme == "hex" else geo.quad_cell
    ring_fn = geo.hex_kring if scheme == "hex" else geo.quad_kring
    if scheme == "hex":
        cell_deg = geo.hex_size_deg(res) * (3**0.5) / 2.0
    else:
        cell_deg = 180.0 / (2**res) / 2.0
    guarantee_m = ring * cell_deg * geo.M_PER_DEG

    q = quays.select(
        F.col(quay_id).alias("quay_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    ).withColumn("qcell", F.expr(cell_fn("qlat", "qlon", res, SPARK)))
    s = stops.select(
        F.col(stop_id).alias("stop_id"),
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
    ).withColumn("scell", F.expr(cell_fn("slat", "slon", res, SPARK)))

    q_ring = q.withColumn("cand_cell", F.explode(F.expr(ring_fn("qcell", res, ring, SPARK))))
    cand = q_ring.join(F.broadcast(s), q_ring.cand_cell == s.scell).withColumn(
        "dist_m", F.expr(haversine_m("qlat", "qlon", "slat", "slon", SPARK))
    )
    ranked = _ranked(cand.select("quay_id", "qlat", "qlon", "stop_id", "dist_m"), k)

    # resolution check: quays fully resolved inside the guarantee radius.
    # Computed as a second window over the SAME partitioning as the ranking
    # window (one shuffle, reused sort) — the quay side is corpus-sized, so
    # a groupBy + re-join (let alone a broadcast of quay ids) would add a
    # full extra shuffle (or an impossible broadcast) at the 10^12 design
    # point.
    wq = Window.partitionBy("quay_id")
    flagged = ranked.withColumn(
        "__resolved",
        (F.count("*").over(wq) == k) & (F.max("dist_m").over(wq) <= F.lit(guarantee_m)),
    )
    done = flagged.where(F.col("__resolved")).drop("__resolved")
    # unresolved = quays flagged false PLUS quays with zero candidates (absent
    # from `ranked` entirely) → anti-join of the quay table against resolved
    # ids; both sides big → shuffled hash anti-join, never a broadcast
    resolved_ids = flagged.where(F.col("__resolved")).select("quay_id")
    rest = q.join(resolved_ids, "quay_id", "left_anti").select(
        "quay_id", F.col("qlat").alias("lat"), F.col("qlon").alias("lon")
    )
    fallback = knn_brute_force(
        rest,
        stops.select(F.col(stop_id).alias("stop_id"), "lat", "lon"),
        k,
        "quay_id",
        "stop_id",
    )
    return done.select("quay_id", "stop_id", "dist_m", "rn").unionByName(
        fallback.select("quay_id", "stop_id", "dist_m", "rn")
    )


def knn_collect(knn: DataFrame) -> DataFrame:
    """(quay_id, stopplace_ids array ordered by distance) — knn_expected shape."""
    return (
        knn.groupBy("quay_id")
        .agg(F.array_sort(F.collect_list(F.struct("rn", "stop_id"))).alias("s"))
        .select("quay_id", F.expr("transform(s, x -> x.stop_id)").alias("stopplace_ids"))
    )
