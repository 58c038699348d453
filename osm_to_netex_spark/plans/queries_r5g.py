"""Round-5 batch G (SURVEY §2.3 `(r5)` rows): CUPED variance reduction
and empirical-Bayes rate shrinkage — the two remaining staples of an
experimentation platform (joining `ab_test`, `sprt`,
`isotonic_calibration`).

Float discipline (the ab_test convention, plans/queries.py:2760): every
corpus fold is an exact integer moment; per-entity ratios are quantized
by integer division BEFORE any cross-entity aggregation (so no float sum
ever folds in engine order); the final statistic is ONE fixed float
sequence over exact operands, rounded to 1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK, concat_str, phash60

_CONV_THRESH = 50.0


# ---------------------------------------------------------------------------
# CUPED (controlled-experiment variance reduction, Deng et al. 2013)
# ---------------------------------------------------------------------------
def _cuped_sql(d: str) -> str:
    """CUPED-adjusted arm means: each user's timeline splits at its median
    event (pre-period covariate x = mean value of the first half, outcome
    y = mean value of the second half); θ = cov(x,y)/var(x) over users;
    the adjusted outcome is y − θ(x − x̄).  Per arm (the ab_test hash
    split) the output carries n, the raw and adjusted means, θ and the
    theoretical variance-reduction factor ρ² = θ²·var(x)/var(y).

    Exactness: per-user means are INTEGER-quantized ((Σq6 div n) div
    1000 → 1e-3 units) before any cross-user moment, so Σx, Σx², Σxy,
    Σy, Σy² are exact bigints; θ, the adjusted means, and ρ² are one
    fixed float sequence over those integers, rounded 1e-9.

    Scale: one user-keyed two-phase aggregate (median split via one
    ordered window), one global-moment aggregate broadcast back, one
    2-row arm aggregate — the corpus crosses a shuffle twice."""
    arm_key = concat_str(["'ab:'", "cast(user_id as string)"], d)
    arm = f"({phash60(arm_key, d)}) % 2"
    div = "div" if d == SPARK else "//"
    xq = "cast(floor(value * 1.0e6 + 0.5e0) as bigint)"
    return f"""
        with ranked as (
            select user_id, {arm} as arm, {xq} as v_q6,
                   row_number() over (partition by user_id
                                      order by ts, event_id) as i,
                   count(*) over (partition by user_id) as m
            from events
        ),
        per_user as (
            select user_id, arm,
                   ((sum(case when i * 2 <= m then v_q6 end)
                     {div} nullif(sum(case when i * 2 <= m then 1 end), 0))
                    {div} 1000) as x_q3,
                   ((sum(case when i * 2 > m then v_q6 end)
                     {div} nullif(sum(case when i * 2 > m then 1 end), 0))
                    {div} 1000) as y_q3
            from ranked
            group by user_id, arm
        ),
        u as (
            select user_id, arm, cast(x_q3 as bigint) as x,
                   cast(y_q3 as bigint) as y
            from per_user where x_q3 is not null and y_q3 is not null
        ),
        mom as (
            select cast(count(*) as bigint) as n,
                   cast(sum(x) as bigint) as sx,
                   cast(sum(y) as bigint) as sy,
                   cast(sum(x * x) as bigint) as sxx,
                   cast(sum(y * y) as bigint) as syy,
                   cast(sum(x * y) as bigint) as sxy
            from u
        ),
        theta as (
            select n, sx, sy,
                   (cast(n as double) * cast(sxy as double)
                    - cast(sx as double) * cast(sy as double))
                   / (cast(n as double) * cast(sxx as double)
                      - cast(sx as double) * cast(sx as double)) as th,
                   (cast(n as double) * cast(sxx as double)
                    - cast(sx as double) * cast(sx as double)) as vx_n2,
                   (cast(n as double) * cast(syy as double)
                    - cast(sy as double) * cast(sy as double)) as vy_n2
            from mom
        )
        select u.arm,
               cast(count(*) as bigint) as n_users,
               cast(sum(u.y) as bigint) as sum_y_q3,
               round(cast(sum(u.y) as double) / cast(count(*) as double)
                     - t.th * (cast(sum(u.x) as double)
                               / cast(count(*) as double)
                               - cast(t.sx as double) / cast(t.n as double)),
                     9) as adj_mean_q3,
               round(t.th, 9) as theta,
               round(t.th * t.th * t.vx_n2 / t.vy_n2, 9) as rho_sq
        from u cross join theta t
        group by u.arm, t.th, t.vx_n2, t.vy_n2, t.sx, t.n"""


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_cuped_sql(SPARK))


def q_cuped_oracle() -> str:
    return _cuped_sql(DUCK)


# ---------------------------------------------------------------------------
# Empirical-Bayes rate shrinkage (beta-binomial, method of moments)
# ---------------------------------------------------------------------------
def _eb_sql(d: str) -> str:
    """Per-user conversion rates shrunk toward a beta prior fit by the
    method of moments on the observed user rates (the standard
    small-sample stabilizer for leaderboards / CTR tables): α, β from the
    rate mean/variance, shrunk rate = (x + α)/(n + α + β).

    Exactness: user rates are integer 1e-6 quantities ((conv·10⁶) div n),
    so the rate moments Σr, Σr² are exact bigints; m, v, α, β and the
    shrunk rate are one fixed float sequence over exact integers, rounded
    1e-9.

    Scale: one user-keyed aggregate, one 1-row moment broadcast, one
    scoring projection — two corpus shuffles."""
    div = "div" if d == SPARK else "//"
    conv = f"case when value > {_CONV_THRESH!r}e0 then 1 else 0 end"
    return f"""
        with per_user as (
            select user_id,
                   cast(count(*) as bigint) as n,
                   cast(sum({conv}) as bigint) as x
            from events
            group by user_id
        ),
        rated as (
            select user_id, n, x,
                   cast((x * 1000000) {div} n as bigint) as r_q6
            from per_user
        ),
        mom as (
            select cast(count(*) as bigint) as g,
                   cast(sum(r_q6) as bigint) as sr,
                   cast(sum(r_q6 * r_q6) as bigint) as srr
            from rated
        ),
        prior as (
            select
                (cast(sr as double) / cast(g as double)) / 1.0e6 as m,
                ((cast(srr as double) - cast(sr as double)
                  * cast(sr as double) / cast(g as double))
                 / cast(g - 1 as double)) / 1.0e12 as v
            from mom
        ),
        ab as (
            select m, v,
                   m * (m * (1.0e0 - m) / v - 1.0e0) as alpha,
                   (1.0e0 - m) * (m * (1.0e0 - m) / v - 1.0e0) as beta
            from prior
        )
        select r.user_id, r.n, r.x, r.r_q6,
               round((cast(r.x as double) + a.alpha)
                     / (cast(r.n as double) + a.alpha + a.beta), 9)
                   as shrunk_rate,
               round(a.alpha, 9) as alpha,
               round(a.beta, 9) as beta
        from rated r cross join ab a"""


def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_eb_sql(SPARK))


def q_eb_shrinkage_oracle() -> str:
    return _eb_sql(DUCK)


def register_r5g(QUERIES: dict) -> None:
    QUERIES["cuped"] = (q_cuped, q_cuped_oracle)
    QUERIES["eb_shrinkage"] = (q_eb_shrinkage, q_eb_shrinkage_oracle)
