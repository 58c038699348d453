"""Property-based tests (hypothesis) for the portable expression library.

Strategy: properties are checked by evaluating the DUCK dialect of each
formula in DuckDB against an independent pure-Python reference.  The
Spark ≡ DuckDB leg is already value-hash-gated by the driver's oracle
harness for every query, so DuckDB ≡ Python closes the trust loop without
paying a JVM round-trip per hypothesis example.
"""

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from osm_to_netex_spark.functions import geo, text as tx
from osm_to_netex_spark.functions.portable import DUCK, haversine_m

CON = duckdb.connect()


def _dlit(v: float) -> str:
    # float literal as DOUBLE: bare repr() of a 16-digit float parses as
    # DECIMAL in DuckDB and fails to widen against larger magnitudes
    return f"cast({v!r} as double)"


def _eval(expr: str):
    return CON.sql(f"select {expr} as v").fetchone()[0]


lat_st = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False, width=64)
lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False, width=64)


@settings(max_examples=60, deadline=None)
@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=1, max_value=15))
def test_quad_pack_unpack_roundtrip(lat, lon, res):
    cell = _eval(geo.quad_cell(_dlit(lat), _dlit(lon), res, DUCK))
    ix, iy = geo.quad_unpack(str(cell), res, DUCK)
    gx, gy = _eval(ix), _eval(iy)
    n = 2**res
    ex = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    ey = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    assert (gx, gy) == (ex, ey)


@settings(max_examples=40, deadline=None)
@given(lat1=lat_st, lon1=lon_st, lat2=lat_st, lon2=lon_st)
def test_haversine_symmetry_and_bounds(lat1, lon1, lat2, lon2):
    d12 = _eval(haversine_m(_dlit(lat1), _dlit(lon1), _dlit(lat2), _dlit(lon2), DUCK))
    d21 = _eval(haversine_m(_dlit(lat2), _dlit(lon2), _dlit(lat1), _dlit(lon1), DUCK))
    assert d12 == pytest.approx(d21, rel=1e-9)
    assert 0.0 <= d12 <= math.pi * geo.EARTH_RADIUS_M * 1.0000001
    d_self = _eval(haversine_m(_dlit(lat1), _dlit(lon1), _dlit(lat1), _dlit(lon1), DUCK))
    assert d_self == 0.0


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5), max_size=12),
    n=st.integers(min_value=1, max_value=4),
)
def test_shingle_count_property(words, n):
    textv = " ".join(words)
    got = _eval(f"len({tx.word_shingles(repr(textv), n, DUCK)})")
    expect = max(0, len(words) - n + 1) if len(words) >= n else 0
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(words=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=10))
def test_fingerprint_whitespace_invariant(words):
    a = " ".join(words)
    b = "  " + "   ".join(words) + " "
    fa = _eval(tx.rolling_fingerprint(repr(a), DUCK))
    fb = _eval(tx.rolling_fingerprint(repr(b), DUCK))
    assert fa == fb  # tokenizer collapses whitespace → same token stream


@settings(max_examples=40, deadline=None)
@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=2, max_value=12), k=st.integers(min_value=1, max_value=3))
def test_quad_kring_contains_self_and_is_bounded(lat, lon, res, k):
    cell_expr = geo.quad_cell(_dlit(lat), _dlit(lon), res, DUCK)
    ring = CON.sql(
        f"select unnest({geo.quad_kring(cell_expr, res, k, DUCK)}) as c"
    ).fetchall()
    cells = {r[0] for r in ring}
    center = _eval(cell_expr)
    assert center in cells
    assert len(cells) <= (2 * k + 1) ** 2
