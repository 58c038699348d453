"""Vector-tile cut: Python Sutherland–Hodgman replay, containment cases,
extent-grid bounds."""

import math

import pyspark.sql.functions as F
import pytest

from osm_to_netex_spark.functions import geo
from osm_to_netex_spark.operators import vectortile


def _run(spark, rings, res=3, extent=256):
    df = spark.createDataFrame(rings, "zone_id: long, pos_list: array<double>")
    return vectortile.tile_cut(df, res=res, extent=extent)


def _close(pts):
    return pts + [pts[0]]


def _flat(pts):
    return [c for p in pts for c in p]


def _sh_clip(pts, lo, hi, axis):
    """Python Sutherland–Hodgman over closed point list (lat, lon)."""
    for bound, keep_ge in ((lo, True), (hi, False)):
        out = []
        for i in range(len(pts) - 1):
            a, b = pts[i], pts[i + 1]
            va, vb = a[axis], b[axis]
            a_in = va >= bound if keep_ge else va <= bound
            b_in = vb >= bound if keep_ge else vb <= bound
            if a_in and b_in:
                out.append(b)
            elif a_in != b_in:
                t = (bound - va) / (vb - va)
                ip = [a[0] + (b[0] - a[0]) * t, a[1] + (b[1] - a[1]) * t]
                ip[axis] = bound
                if a_in:
                    out.append(tuple(ip))
                else:
                    out.append(tuple(ip))
                    out.append(b)
        pts = out + out[:1] if len(out) >= 3 else []
        if not pts:
            return []
    return pts


def test_matches_python_replay(spark):
    # a triangle straddling several res-3 tiles
    tri = [(5.0, 5.0), (40.0, 10.0), (10.0, 42.0)]
    out = _run(spark, [(1, _flat(_close(tri)))], res=3, extent=256)
    rows = out.collect()
    assert rows
    n = 2**3
    latstep, lonstep = 180.0 / n, 360.0 / n
    got_cells = {r["cell"] for r in rows}
    for cell in got_cells:
        rem = cell - 3 * 2**58
        iy, ix = divmod(rem, 2**29)
        lon_lo, lon_hi = ix * lonstep - 180.0, (ix + 1) * lonstep - 180.0
        lat_lo, lat_hi = iy * latstep - 90.0, (iy + 1) * latstep - 90.0
        pts = _close(tri)
        pts = _sh_clip(pts, lon_lo, lon_hi, 1)
        if pts:
            pts = _sh_clip(pts, lat_lo, lat_hi, 0)
        # SQL round() is half-away-from-zero; Python round() is banker's
        rha = lambda x: math.floor(x + 0.5)
        want = [
            (
                rha((lon - lon_lo) / lonstep * 256),
                rha((lat - lat_lo) / latstep * 256),
            )
            for lat, lon in pts
        ]
        have = sorted(
            (r["qx"], r["qy"]) for r in rows if r["cell"] == cell
        )
        assert have == sorted(want)


def test_inside_polygon_survives_whole(spark):
    # small square well inside one res-2 tile
    sq = [(10.0, 10.0), (10.0, 12.0), (12.0, 12.0), (12.0, 10.0)]
    out = _run(spark, [(1, _flat(_close(sq)))], res=2, extent=256).collect()
    cells = {r["cell"] for r in out}
    assert len(cells) == 1
    # 4 original corners + closing vertex, no clipping artifacts
    assert len(out) == 5
    assert len({(r["qx"], r["qy"]) for r in out}) == 4


def test_all_coords_within_extent(spark):
    tri = [(-50.0, -100.0), (60.0, 20.0), (-20.0, 150.0)]
    out = _run(spark, [(1, _flat(_close(tri)))], res=2, extent=256)
    bad = out.where("qx < 0 or qx > 256 or qy < 0 or qy > 256")
    assert bad.count() == 0
    assert out.count() > 0


@pytest.mark.parametrize("extent", [256, 4096])
def test_extent_scales(spark, extent):
    sq = [(10.0, 10.0), (10.0, 12.0), (12.0, 12.0), (12.0, 10.0)]
    out = _run(spark, [(1, _flat(_close(sq)))], res=2, extent=extent)
    mx = out.agg(F.max("qx"), F.max("qy")).collect()[0]
    assert mx[0] <= extent and mx[1] <= extent
