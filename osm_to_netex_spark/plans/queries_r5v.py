"""Round-5 batch V (SURVEY §2.3 `(r5)` row): activity streaks — the
canonical gaps-and-islands shape (consecutive-day runs per user).

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects, integer day indexes from epoch micros, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

_EP_US = {
    SPARK: "(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts))",
    DUCK: "cast(epoch_us(ts) as bigint)",
}


def _streaks_sql(d: str) -> str:
    """Per user: longest and current consecutive-active-day streak plus
    the island count — the retention statistic product dashboards lead
    with, via the canonical gaps-and-islands identity (island id =
    day − dense_rank over distinct active days, constant within each
    consecutive run).  Day indexes are exact integers from epoch micros,
    so island membership is a pure integer equality; "current" means the
    island containing the user's last active day.

    Scale: one distinct (user, day) aggregate + ONE user-keyed ordered
    window + one island aggregate — the sessionize posture on the day
    grain."""
    div = "div" if d == SPARK else "//"
    ep = _EP_US[d]
    return f"""
        with days as (
            select distinct user_id, ({ep} {div} 86400000000) as day
            from events
        ),
        isl as (
            select user_id, day,
                   day - (row_number() over (
                       partition by user_id order by day asc)) as island
            from days
        ),
        runs as (
            select user_id, island,
                   cast(count(*) as bigint) as len,
                   cast(max(day) as bigint) as last_day
            from isl group by user_id, island
        ),
        last_active as (
            select user_id, cast(max(day) as bigint) as last_day
            from days group by user_id
        )
        select r.user_id,
               cast(count(*) as bigint) as n_streaks,
               cast(max(r.len) as bigint) as longest_streak,
               cast(sum(case when r.last_day = la.last_day
                        then r.len else 0 end) as bigint) as current_streak
        from runs r
        join last_active la on la.user_id = r.user_id
        group by r.user_id"""


def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_streaks_sql(SPARK))


def q_streaks_oracle() -> str:
    return _streaks_sql(DUCK)


def register_r5v(QUERIES: dict) -> None:
    QUERIES["user_streaks"] = (q_streaks, q_streaks_oracle)
