"""Multivariate ridge/OLS via exact normal equations + generated Cramer."""

import random

import numpy as np
from pyspark.sql import Row

from osm_to_netex_spark.operators import regression as R

XS = ["x1", "x2", "x3"]


def _fit(spark, rows, lam=0):
    spark.createDataFrame(rows).createOrReplaceTempView("pts_reg")
    sql = R.ridge_fit_sql("spark", "pts_reg", "g", XS, "y", lam=lam)
    return {r.grp: r for r in spark.sql(sql).collect()}


def test_exact_plane_recovery(spark):
    # y = 3 + 2*x1 - 5*x2 + 7*x3 with small ints: every determinant is
    # exactly representable, so the betas come back EXACT
    rng = random.Random(1)
    rows = [
        Row(g=1, x1=(x1 := rng.randint(0, 9)), x2=(x2 := rng.randint(0, 9)),
            x3=(x3 := rng.randint(0, 9)), y=3 + 2 * x1 - 5 * x2 + 7 * x3)
        for _ in range(40)
    ]
    got = _fit(spark, rows)[1]
    assert (got.beta0, got.beta1, got.beta2, got.beta3) == (3.0, 2.0, -5.0, 7.0)


def test_matches_numpy_lstsq(spark):
    rng = random.Random(2)
    rows = [
        Row(g=1, x1=rng.randint(0, 50), x2=rng.randint(0, 50),
            x3=rng.randint(0, 50), y=rng.randint(-1000, 1000))
        for _ in range(200)
    ]
    got = _fit(spark, rows)[1]
    X = np.array([[1, r.x1, r.x2, r.x3] for r in rows], dtype=float)
    yv = np.array([r.y for r in rows], dtype=float)
    beta = np.linalg.lstsq(X, yv, rcond=None)[0]
    np.testing.assert_allclose(
        [got.beta0, got.beta1, got.beta2, got.beta3], beta, rtol=1e-8
    )


def test_singular_group_yields_null(spark):
    # x2 = 2*x1 exactly -> XtX singular -> nullif gives null betas
    rows = [Row(g=1, x1=i, x2=2 * i, x3=0, y=i) for i in range(20)]
    got = _fit(spark, rows)[1]
    assert got.beta0 is None and got.beta3 is None


def test_ridge_shrinks_toward_zero(spark):
    rng = random.Random(3)
    rows = [
        Row(g=1, x1=(x1 := rng.randint(0, 9)), x2=rng.randint(0, 9),
            x3=rng.randint(0, 9), y=10 * x1 + rng.randint(-2, 2))
        for _ in range(60)
    ]
    ols = _fit(spark, rows, lam=0)[1]
    rid = _fit(spark, rows, lam=10_000)[1]
    assert abs(rid.beta1) < abs(ols.beta1)
