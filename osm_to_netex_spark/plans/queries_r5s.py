"""Round-5 batch S (SURVEY §2.3 `(r5)` rows): Tukey median polish of
the day-of-week × hour activity matrix, and a seasonal-naive forecast
backtest.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects, pure-integer decisions (LOWER medians are order-statistic
selections of integers; forecast errors are integer count differences),
identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

_EP_US = {
    SPARK: "(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts))",
    DUCK: "cast(epoch_us(ts) as bigint)",
}


# ---------------------------------------------------------------------------
# Median polish (Tukey 1977) of the dow × hour matrix
# ---------------------------------------------------------------------------
def _lower_median(part: str, val: str, alias: str) -> str:
    """LOWER median per group as an order-statistic selection — exact,
    deterministic, no float interpolation (the even-count convention is
    documented: element ⌈n/2⌉ in (value, tie) order)."""
    return f"""
            select {part}, {val} as {alias} from (
                select {part}, {val},
                       row_number() over (partition by {part}
                                          order by {val} asc) as rn,
                       count(*) over (partition by {part}) as cnt
                from __SRC__
            ) s where rn = (cnt + 1) {{div}} 2"""


def _median_polish_sql(d: str) -> str:
    """Two-sweep Tukey median polish of mean event value per (day-of-week
    × hour-of-day): alternately remove row (dow) and column (hour)
    LOWER-median effects, leaving a residual matrix robust to outlier
    cells — the calendar-effects decomposition mean-based models get
    wrong under heavy tails.  Cell means are truncated integer 1e-3
    quantities; every median is an exact order-statistic selection, so
    effects and residuals are exact integers end to end.

    Scale: one (dow, hour) aggregate off the corpus (168 cells), then
    four window selections over the tiny matrix — corpus crosses one
    shuffle."""
    div = "div" if d == SPARK else "//"
    ep = _EP_US[d]
    med = lambda part, val, alias, src: (
        _lower_median(part, val, alias).replace("__SRC__", src)
        .replace("{div}", div)
    )
    return f"""
        with cells as (
            select ((({ep} {div} 86400000000) + 4) % 7) as dow,
                   (({ep} {div} 3600000000) % 24) as hr,
                   cast((sum(cast(floor(value * 1.0e6 + 0.5e0) as bigint))
                         {div} count(*)) {div} 1000 as bigint) as v_q3
            from events
            group by (({ep} {div} 86400000000) + 4) % 7,
                     ({ep} {div} 3600000000) % 24
        ),
        r1 as ({med('dow', 'v_q3', 'r_eff1', 'cells')}),
        res1 as (
            select c.dow, c.hr, c.v_q3, r.r_eff1,
                   c.v_q3 - r.r_eff1 as v1
            from cells c join r1 r on r.dow = c.dow
        ),
        c1 as ({med('hr', 'v1', 'c_eff1', 'res1')}),
        res2 as (
            select a.dow, a.hr, a.v_q3, a.r_eff1, b.c_eff1,
                   a.v1 - b.c_eff1 as v2
            from res1 a join c1 b on b.hr = a.hr
        ),
        r2 as ({med('dow', 'v2', 'r_eff2', 'res2')}),
        res3 as (
            select a.dow, a.hr, a.v_q3, a.r_eff1, a.c_eff1, b.r_eff2,
                   a.v2 - b.r_eff2 as v3
            from res2 a join r2 b on b.dow = a.dow
        ),
        c2 as ({med('hr', 'v3', 'c_eff2', 'res3')})
        select cast(a.dow as bigint) as dow, cast(a.hr as bigint) as hr,
               a.v_q3,
               cast(a.r_eff1 + a.r_eff2 as bigint) as row_eff_q3,
               cast(a.c_eff1 + b.c_eff2 as bigint) as col_eff_q3,
               cast(a.v3 - b.c_eff2 as bigint) as residual_q3
        from res3 a join c2 b on b.hr = a.hr"""


def q_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_median_polish_sql(SPARK))


def q_median_polish_oracle() -> str:
    return _median_polish_sql(DUCK)


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------
def _backtest_sql(d: str) -> str:
    """Backtest of the two zero-parameter forecasting baselines on daily
    event counts per type — naive (ŷ_t = y_{t−1}) vs seasonal-naive
    (ŷ_t = y_{t−7}) — the sanity floor every forecasting deployment must
    beat before a model earns its keep.  Errors are exact integer count
    differences; the winner flag is an integer cross-comparison of the
    two absolute-error sums over the SAME evaluation days (both
    predecessors present).

    Scale: one (type, day) count aggregate + two self-joins on the
    integer day index (no window over a global sort) + a type-keyed
    fold."""
    div = "div" if d == SPARK else "//"
    ep = _EP_US[d]
    return f"""
        with daily as (
            select event_type, ({ep} {div} 86400000000) as day,
                   cast(count(*) as bigint) as y
            from events group by event_type, ({ep} {div} 86400000000)
        ),
        eval_days as (
            select t.event_type, t.day, t.y,
                   n.y as y_naive, s.y as y_seasonal
            from daily t
            join daily n on n.event_type = t.event_type
                 and n.day = t.day - 1
            join daily s on s.event_type = t.event_type
                 and s.day = t.day - 7
        )
        select event_type,
               cast(count(*) as bigint) as n_eval_days,
               cast(sum(abs(y - y_naive)) as bigint) as ae_naive,
               cast(sum(abs(y - y_seasonal)) as bigint) as ae_seasonal,
               cast(case when sum(abs(y - y_seasonal))
                              < sum(abs(y - y_naive)) then 1
                         when sum(abs(y - y_seasonal))
                              > sum(abs(y - y_naive)) then -1
                         else 0 end as bigint) as seasonal_wins
        from eval_days
        group by event_type"""


def q_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_backtest_sql(SPARK))


def q_backtest_oracle() -> str:
    return _backtest_sql(DUCK)


def register_r5s(QUERIES: dict) -> None:
    QUERIES["median_polish"] = (q_median_polish, q_median_polish_oracle)
    QUERIES["forecast_backtest"] = (q_backtest, q_backtest_oracle)
