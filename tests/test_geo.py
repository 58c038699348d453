"""Cell-index and PIP math vs an independent numpy oracle."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_to_netex_spark.functions import geo
from osm_to_netex_spark.functions.portable import SPARK


@pytest.fixture(scope="module")
def pts(spark):
    df = spark.range(400).selectExpr(
        "id",
        "59.0 + (cast(conv(substring(md5(concat('a', id)), 1, 15), 16, 10) as bigint) / 1152921504606846976.0e0) * 2.0e0 as lat",
        "9.0 + (cast(conv(substring(md5(concat('b', id)), 1, 15), 16, 10) as bigint) / 1152921504606846976.0e0) * 2.0e0 as lon",
    ).cache()
    df.count()
    return df


def test_quad_cell_matches_numpy(spark, pts):
    res = 12
    rows = pts.select(
        "lat", "lon", F.expr(geo.quad_cell("lat", "lon", res, SPARK)).alias("cell")
    ).collect()
    n = 2**res
    for r in rows:
        ix = min(max(int(math.floor((r.lon + 180.0) / 360.0 * n)), 0), n - 1)
        iy = min(max(int(math.floor((r.lat + 90.0) / 180.0 * n)), 0), n - 1)
        assert r.cell == res * 2**58 + iy * 2**29 + ix


def _hex_oracle(lat, lon, res):
    s = geo.hex_size_deg(res)
    qf = (math.sqrt(3.0) / 3.0 * lon - lat / 3.0) / s
    rf = (2.0 / 3.0 * lat) / s
    yf = -qf - rf
    # round-half-away-from-zero (SQL round), not banker's rounding
    rnd = lambda v: math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    rx, ry, rz = rnd(qf), rnd(yf), rnd(rf)
    dx, dy, dz = abs(rx - qf), abs(ry - yf), abs(rz - rf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        pass  # ry fixed; q=rx, r=rz unchanged
    else:
        rz = -rx - ry
    return res * 2**54 + (rx + 2**25) * 2**27 + (rz + 2**25)


def test_hex_cell_matches_numpy(spark, pts):
    res = 8
    rows = pts.select(
        "lat", "lon", F.expr(geo.hex_cell("lat", "lon", res, SPARK)).alias("cell")
    ).collect()
    for r in rows:
        assert r.cell == _hex_oracle(r.lat, r.lon, res), (r.lat, r.lon)


def test_hex_cells_are_contiguous_partition(spark, pts):
    """Every point maps to exactly one hex; neighbours of that hex do NOT
    contain the point's hex twice (k-ring uniqueness)."""
    res = 7
    rows = pts.select(
        F.expr(geo.hex_cell("lat", "lon", res, SPARK)).alias("cell"),
        F.expr(geo.hex_kring(geo.hex_cell("lat", "lon", res, SPARK), res, 2, SPARK)).alias(
            "ring"
        ),
    ).collect()
    for r in rows:
        assert r.cell in r.ring
        assert len(r.ring) == len(set(r.ring)) == 19  # hex k=2 ring size 1+6+12


def test_quad_kring_size_and_membership(spark, pts):
    res = 10
    rows = pts.select(
        F.expr(geo.quad_cell("lat", "lon", res, SPARK)).alias("cell"),
        F.expr(geo.quad_kring(geo.quad_cell("lat", "lon", res, SPARK), res, 1, SPARK)).alias(
            "ring"
        ),
    ).collect()
    for r in rows:
        assert r.cell in r.ring
        assert len(r.ring) == 9  # interior cells (bbox far from poles/antimeridian)


def test_quad_parent_hierarchy(spark, pts):
    res = 12
    rows = pts.select(
        F.expr(geo.quad_cell("lat", "lon", res, SPARK)).alias("child"),
        F.expr(geo.quad_parent(geo.quad_cell("lat", "lon", res, SPARK), res, SPARK)).alias(
            "parent"
        ),
        F.expr(geo.quad_cell("lat", "lon", res - 1, SPARK)).alias("direct"),
    ).collect()
    for r in rows:
        assert r.parent == r.direct


def _ray_cast(lat, lon, pl):
    npts = len(pl) // 2
    inside = False
    for i in range(npts - 1):
        yi, xi = pl[2 * i], pl[2 * i + 1]
        yj, xj = pl[2 * i + 2], pl[2 * i + 3]
        if (yi > lat) != (yj > lat):
            if lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
                inside = not inside
    return inside


@pytest.fixture(scope="module")
def ring():
    # concave star polygon, closed
    rng = np.random.RandomState(7)
    n = 12
    pts = []
    for j in range(n):
        a = 2 * math.pi * j / n
        r = 0.3 * (0.6 + 0.8 * rng.rand())
        pts.append((59.8 + r * math.cos(a), 10.1 + r * math.sin(a)))
    pts.append(pts[0])
    return [v for p in pts for v in p]


def test_pip_matches_numpy(spark, pts, ring):
    pl = "array(" + ",".join(repr(v) + "e0" for v in ring) + ")"
    rows = pts.select(
        "lat", "lon", F.expr(geo.point_in_polygon("lat", "lon", pl, SPARK)).alias("inside")
    ).collect()
    hits = 0
    for r in rows:
        expect = _ray_cast(r.lat, r.lon, ring)
        assert r.inside == expect, (r.lat, r.lon)
        hits += int(expect)
    assert hits > 0  # fixture actually exercises both branches


def test_cover_contains_member_cells(spark, pts, ring):
    """Superset property that makes PIP pruning safe: for every point inside
    the polygon, the point's cell is in the polygon's cover (both schemes)."""
    pl = "array(" + ",".join(repr(v) + "e0" for v in ring) + ")"
    for scheme, cell_fn, cover_fn in [
        ("quad", geo.quad_cell, geo.quad_cover_bbox),
        ("hex", geo.hex_cell, geo.hex_cover_bbox),
    ]:
        res = 8
        rows = pts.select(
            F.expr(geo.point_in_polygon("lat", "lon", pl, SPARK)).alias("inside"),
            F.expr(cell_fn("lat", "lon", res, SPARK)).alias("cell"),
            F.expr(cover_fn(pl, res, SPARK)).alias("cover"),
        ).collect()
        for r in rows:
            if r.inside:
                assert r.cell in r.cover, scheme


def test_haversine_sanity(spark):
    # Oslo → Bergen ≈ 305 km
    d = spark.sql(
        f"select {geo.haversine_m('59.9139e0', '10.7522e0', '60.3913e0', '5.3221e0', 'spark')} as d"
    ).collect()[0].d
    assert 300_000 < d < 310_000


def test_poly_stats_known_square(spark):
    """Unit square ring: area 1, centroid (.5,.5), perimeter 4."""
    from osm_to_netex_spark.functions import geo
    from osm_to_netex_spark.functions.portable import SPARK

    df = spark.createDataFrame(
        [([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0],)], ["pos_list"]
    )
    row = df.selectExpr(
        f"{geo.poly_area('pos_list', SPARK)} as a",
        f"{geo.poly_centroid_lat('pos_list', SPARK)} as cy",
        f"{geo.poly_centroid_lon('pos_list', SPARK)} as cx",
        f"{geo.poly_perimeter_deg('pos_list', SPARK)} as p",
    ).collect()[0]
    assert row["a"] == 1.0 and row["p"] == 4.0
    assert row["cy"] == 0.5 and row["cx"] == 0.5


def test_poly_stats_degenerate_ring_null_centroid(spark):
    from osm_to_netex_spark.functions import geo
    from osm_to_netex_spark.functions.portable import SPARK

    df = spark.createDataFrame(
        [([2.0, 3.0, 2.0, 3.0, 2.0, 3.0, 2.0, 3.0],)], ["pos_list"]
    )
    row = df.selectExpr(
        f"{geo.poly_area('pos_list', SPARK)} as a",
        f"{geo.poly_centroid_lat('pos_list', SPARK)} as cy",
    ).collect()[0]
    assert row["a"] == 0.0 and row["cy"] is None


def test_hll_estimate_accuracy_and_partition_invariance(spark):
    """m=256 → relative standard error ~6.5%; assert within 4 sigma, and the
    integer harmonic sum makes the estimate partitioning-independent."""
    from osm_to_netex_spark.functions import sketch
    from osm_to_netex_spark.functions.portable import SPARK as S

    n = 5000
    df = spark.range(n).selectExpr("cast(id % 1700 as string) as k")

    def est(frame):
        regs = frame.selectExpr(
            f"{sketch.hll_register('k', S)} as j", f"{sketch.hll_rho('k', S)} as rho"
        ).groupBy("j").agg(F.max("rho").alias("m"))
        row = regs.selectExpr(
            "count(*) as n_hit",
            "sum(shiftleft(cast(1 as bigint), 53 - m)) as s_int",
        ).collect()[0]
        total = row["s_int"] + (sketch.M_REGISTERS - row["n_hit"]) * 2**53
        return sketch.ALPHA_256 * sketch.M_REGISTERS**2 * float(2**53) / total

    e1 = est(df.coalesce(1))
    e2 = est(df.repartition(17))
    assert e1 == e2  # bit-identical across partitionings
    assert abs(e1 - 1700) / 1700 < 0.26  # 4 x RSE(m=256)


# --- geohash ----------------------------------------------------------------
def test_geohash_known_vectors(spark):
    """Canonical geohash test vectors (lon-first base32 encoding)."""
    from osm_to_netex_spark.sources import layout

    cases = [
        (57.64911, 10.40744, "u4pruydq"),
        (48.8583, 2.2945, "u09tunqu"),  # Eiffel tower
        (0.0, 0.0, "s0000000"),
        (-33.8568, 151.2153, "r3gx2ux9"),  # Sydney
    ]
    sel = ", ".join(
        layout.geohash_expr(repr(la) + "e0", repr(lo) + "e0", 8, "spark") + f" as g{i}"
        for i, (la, lo, _) in enumerate(cases)
    )
    row = spark.sql(f"select {sel}").first()
    for i, (_, _, want) in enumerate(cases):
        assert row[f"g{i}"] == want, (i, row[f"g{i}"], want)


def test_geohash_prefix_is_parent(spark):
    """Truncating to precision p-2 equals encoding at precision p-2 (strict
    hierarchy -> prefix joins give containment)."""
    from osm_to_netex_spark.sources import layout

    df = spark.createDataFrame(
        [(i, 40.0 + i * 0.37, -70.0 + i * 0.91) for i in range(50)],
        "id long, lat double, lon double",
    )
    bad = df.selectExpr(
        f"substring({layout.geohash_expr('lat', 'lon', 8, 'spark')}, 1, 6) as pre",
        f"{layout.geohash_expr('lat', 'lon', 6, 'spark')} as direct",
    ).where("pre != direct")
    assert bad.count() == 0


# --- Douglas-Peucker (depth-limited) ---------------------------------------
def _dp_ref(pts, eps, depth):
    """Pure-python depth-limited DP over [(lat, lon), ...] -> kept 1-based idx."""
    kept = {1, len(pts)}

    def rec(s, e, d):
        if d == 0 or e <= s + 1:
            return
        ys, xs = pts[s - 1]
        ye, xe = pts[e - 1]
        dx, dy = xe - xs, ye - ys
        len2 = dx * dx + dy * dy
        best_m, best_v = -1.0, None
        for v in range(s + 1, e):
            yv, xv = pts[v - 1]
            px, py = xv - xs, yv - ys
            if len2 == 0.0:
                m = px * px + py * py
            else:
                cr = dx * py - dy * px
                m = (cr * cr) / len2
            if m > best_m:
                best_m, best_v = m, v
        if best_m > eps * eps:
            kept.add(best_v)
            rec(s, best_v, d - 1)
            rec(best_v, e, d - 1)

    rec(1, len(pts), depth)
    return kept


def test_simplify_matches_python_reference(spark):
    from osm_to_netex_spark.operators import simplify

    # a noisy zigzag plus a straight run that must collapse
    pts = [(0.0, float(i)) for i in range(5)]
    pts += [(1.5, 5.0), (0.0, 6.0), (-2.0, 7.0), (0.1, 8.0), (0.0, 9.0)]
    pl = [c for p in pts for c in p]
    df = spark.createDataFrame([(1, pl)], "zone_id long, pos_list array<double>")
    for eps, k in ((0.5, 4), (0.05, 2), (3.0, 4)):
        got = {
            r["vertex_idx"]
            for r in simplify.simplify_dp(df, eps_deg=eps, k_rounds=k).collect()
        }
        assert got == _dp_ref(pts, eps, k), (eps, k)


def test_simplify_straight_line_collapses(spark):
    from osm_to_netex_spark.operators import simplify

    pl = [c for i in range(20) for c in (float(i) * 0.1, float(i) * 0.2)]
    df = spark.createDataFrame([(7, pl)], "zone_id long, pos_list array<double>")
    got = simplify.simplify_dp(df, eps_deg=1e-9, k_rounds=5).collect()
    assert {r["vertex_idx"] for r in got} == {1, 20}


# --- hilbert key --------------------------------------------------------------
def test_hilbert_canonical_order_and_adjacency(spark):
    """Spark evaluation of hilbert_expr matches the canonical xy2d reference
    on the full res-3 grid, is bijective, and consecutive indices are always
    Manhattan-distance-1 grid neighbors (the property Morton lacks — and the
    reason the layout prunes rounder file rectangles)."""
    from osm_to_netex_spark.sources import layout

    res, n = 3, 8

    def xy2d(n_, x, y):
        d = 0
        s = n_ // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - (x % s), s - 1 - (y % s)
                x, y = y % s, x % s
            else:
                x, y = x % s, y % s
            s //= 2
        return d

    # lat/lon chosen so quad_ixy yields exactly (ix, iy) on the res-3 grid
    rows = spark.sql(
        f"select ix, iy, {layout.hilbert_expr('lat', 'lon', res, 'spark')} as h "
        f"from (select ix, iy, -180.0e0 + (ix + 0.5e0) * (360.0e0 / {n}) as lon, "
        f"-90.0e0 + (iy + 0.5e0) * (180.0e0 / {n}) as lat "
        f"from (select explode(sequence(0, {n - 1})) as ix) "
        f"cross join (select explode(sequence(0, {n - 1})) as iy))"
    ).collect()
    got = {(r.ix, r.iy): r.h for r in rows}
    assert got == {(x, y): xy2d(n, x, y) for x in range(n) for y in range(n)}
    inv = {h: p for p, h in got.items()}
    assert len(inv) == n * n
    for h in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[h], inv[h + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
