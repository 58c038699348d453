"""Round-5 batch O (SURVEY §2.3 `(r5)` rows): least-cost path
reconstruction (the corridor the cost surface implies) and the
language-ID confusion matrix (classifier eval against gold labels).

Landing discipline as everywhere (LANDING.md): pure-integer decisions
(the predecessor argmin is a packed-bigint min with deterministic
coordinate tie-breaks), iterative Spark rounds replayed by the oracle as
recursive/materialized CTEs, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK
from .queries_r5d import _raster
from .queries_r5c import _d8_offsets  # noqa: F401  (doc reference)
from .queries_r5d import _grid_bounds  # noqa: F401


# ---------------------------------------------------------------------------
# Least-cost path (predecessor tree + ancestor chain of the hardest cell)
# ---------------------------------------------------------------------------
_LCP_ROUNDS = 8  # doubling: 2^8 ≥ any path length on the bounded raster


def _lcp_pred_sql(d: str) -> str:
    """CTE chain ending in ``pred(ix, iy, p_ix, p_iy, cost)``: the
    shortest-path-tree predecessor of every non-source cell — the
    neighbor n minimizing cost(n) + w(n→c), ties broken by (cost, ix,
    iy) through one packed-bigint min (no nondeterministic arg_min)."""
    from .queries_r5d import _cd_edges_sql, _cd_iter_sql, _CD_SRC, _CD_ROUNDS

    mat = " materialized" if d == DUCK else ""
    ctes = [
        f"ras as{mat} ({_raster(d)})",
        f"e0 as{mat} ({_cd_edges_sql(d)})",
        f"s0 as{mat} ({_CD_SRC})",
    ]
    for t in range(_CD_ROUNDS):
        ctes.append(f"s{t + 1} as{mat} ({_cd_iter_sql('e0', f's{t}')})")
    fin = f"s{_CD_ROUNDS}"
    # packed argmin: cand_cost·1e10 + src_ix·1e5 + src_iy (all positive,
    # cand_cost ≤ ~1e9 ⇒ packed ≤ 1e19?  no: cost ≤ 6e8 ⇒ ≤ 6.1e18, safe)
    ctes.append(f"""cand as{mat} (
            select e.dst_ix as ix, e.dst_iy as iy,
                   (p.cost + e.w) * 10000000000 + e.src_ix * 100000
                       + e.src_iy as packed
            from e0 e join {fin} p on p.ix = e.src_ix and p.iy = e.src_iy
        )""")
    idiv = "div" if d == SPARK else "//"
    ctes.append(f"""pred as{mat} (
            select c.ix, c.iy,
                   cast((min(c.packed) % 10000000000) {idiv} 100000
                        as bigint) as p_ix,
                   cast((min(c.packed) % 100000) as bigint) as p_iy,
                   s.cost
            from cand c
            join {fin} s on s.ix = c.ix and s.iy = c.iy
            where not (c.ix = (select ix from s0) and c.iy = (select iy from s0))
            group by c.ix, c.iy, s.cost
        )""")
    return ", ".join(ctes)


def _lcp_target_sql() -> str:
    # the hardest-to-reach cell, ties by coordinates
    return (
        "select ix, iy from (select ix, iy, row_number() over "
        "(order by cost desc, ix asc, iy asc) as rn from pred) t "
        "where rn = 1"
    )


def q_lcp_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ix, iy, cost_q3, step): the least-cost PATH from the cost
    surface's source to its hardest-to-reach cell — the corridor the
    `cost_distance` surface implies, reconstructed from the
    shortest-path-tree predecessor pointers (packed-integer argmin, so
    the tree is deterministic), then the target's ancestor chain resolved
    by pointer doubling in ⌈log₂ L⌉ rounds (the watershed machinery —
    no per-step walk).  Steps number 0..L along the path by cost order
    (edge weights are strictly positive, so cost is strictly increasing
    along the chain).

    Scale: the cost rounds run iteratively with localCheckpoint barriers
    (the cost_distance discipline — a single SQL text would let Catalyst
    re-inline the K-round chain 2^K times); the predecessor table is one
    grouped argmin over the edge relation; the chain resolves in log
    rounds of lattice self-joins."""
    from . import queries as q
    from .queries_r5d import _cd_edges_sql, _cd_iter_sql, _CD_SRC, _CD_ROUNDS

    q.register_geometry_views(spark, sf_dir)
    spark.sql(_raster(SPARK)).localCheckpoint(
        eager=False
    ).createOrReplaceTempView("ras")
    spark.sql(_cd_edges_sql(SPARK)).localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__lcp_e0")
    spark.sql(_CD_SRC.replace("from ras", "from ras")).localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__lcp_src")
    cur = spark.table("__lcp_src")
    for t in range(_CD_ROUNDS):
        cur.localCheckpoint(eager=False).createOrReplaceTempView(
            f"__lcp_s{t}"
        )
        cur = spark.sql(_cd_iter_sql("__lcp_e0", f"__lcp_s{t}"))
    cur.localCheckpoint(eager=False).createOrReplaceTempView("__lcp_cost")
    spark.sql("""
        select c.ix, c.iy,
               cast((min(c.packed) % 10000000000) div 100000 as bigint)
                   as p_ix,
               cast((min(c.packed) % 100000) as bigint) as p_iy,
               s.cost
        from (
            select e.dst_ix as ix, e.dst_iy as iy,
                   (p.cost + e.w) * 10000000000 + e.src_ix * 100000
                       + e.src_iy as packed
            from __lcp_e0 e
            join __lcp_cost p on p.ix = e.src_ix and p.iy = e.src_iy
        ) c
        join __lcp_cost s on s.ix = c.ix and s.iy = c.iy
        where not exists (select 1 from __lcp_src z
                          where z.ix = c.ix and z.iy = c.iy)
        group by c.ix, c.iy, s.cost""").localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__lcp_pred")
    spark.sql(
        "select ix, iy from (select ix, iy, row_number() over "
        "(order by cost desc, ix asc, iy asc) as rn from __lcp_pred) t "
        "where rn = 1"
    ).localCheckpoint(eager=False).createOrReplaceTempView("__lcp_tgt")
    # ancestor closure of the predecessor forest by pointer DOUBLING
    # (T_{i+1} = T_i ∪ T_i∘T_i — all ancestor pairs after ⌈log₂ L⌉
    # rounds, the flow_accum machinery), then the target's chain
    cur = spark.sql(
        "select ix as cx, iy as cy, p_ix as ax, p_iy as ay from __lcp_pred"
    )
    for t in range(_LCP_ROUNDS):
        cur.localCheckpoint(eager=False).createOrReplaceTempView(
            f"__lcp_{t}"
        )
        cur = spark.sql(f"""
            select cx, cy, ax, ay from __lcp_{t}
            union
            select a.cx, a.cy, b.ax, b.ay
            from __lcp_{t} a
            join __lcp_{t} b on b.cx = a.ax and b.cy = a.ay""")
    cur.localCheckpoint(eager=False).createOrReplaceTempView("__lcp_anc")
    return spark.sql("""
        with onpath as (
            select t.ix, t.iy from __lcp_tgt t
            union
            select a.ax as ix, a.ay as iy
            from __lcp_anc a
            join __lcp_tgt t on t.ix = a.cx and t.iy = a.cy
        ),
        costs as (
            select o.ix, o.iy, coalesce(p.cost, 0) as cost
            from onpath o
            left join __lcp_pred p on p.ix = o.ix and p.iy = o.iy
        )
        select cast(ix as bigint) as ix, cast(iy as bigint) as iy,
               cast(cost as bigint) as cost_q3,
               cast(row_number() over (order by cost asc, ix asc, iy asc)
                    - 1 as bigint) as step
        from costs""")


def q_lcp_path_oracle() -> str:
    return f"""
        with recursive {_lcp_pred_sql(DUCK)},
        tgt as ({_lcp_target_sql()}),
        chain(ix, iy) as (
            select ix, iy from tgt
            union all
            select p.p_ix, p.p_iy
            from chain c join pred p on p.ix = c.ix and p.iy = c.iy
        ),
        onpath as (select distinct ix, iy from chain),
        costs as (
            select o.ix, o.iy, coalesce(p.cost, 0) as cost
            from onpath o
            left join pred p on p.ix = o.ix and p.iy = o.iy
        )
        select cast(ix as bigint) as ix, cast(iy as bigint) as iy,
               cast(cost as bigint) as cost_q3,
               cast(row_number() over (order by cost asc, ix asc, iy asc)
                    - 1 as bigint) as step
        from costs"""


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (classifier eval vs gold labels)
# ---------------------------------------------------------------------------
def _langid_confusion_sql(d: str) -> str:
    """Confusion matrix of the gated `nb_langid` stopword classifier
    against the corpus's gold ``lang`` column, with per-cell counts and
    the per-true-language recall — the eval that closes the classifier
    loop (predictions alone say nothing without gold confusion).

    Exactness: counts are exact integers; recall is the cross-multiplied
    integer pair (hits, total) plus one rounded division.

    Scale: the classifier is a scan projection (broadcast stopword
    arrays); the confusion aggregate is a tiny (true, pred) group."""
    from ..operators.textstats import lang_id_expr

    pred = lang_id_expr("text", d)
    return f"""
        with scored as (
            select lang as true_lang, ({pred}) as pred_lang from documents
        ),
        conf as (
            select true_lang, pred_lang, cast(count(*) as bigint) as n
            from scored group by true_lang, pred_lang
        ),
        tot as (
            select true_lang, cast(sum(n) as bigint) as n_true
            from conf group by true_lang
        )
        select c.true_lang, c.pred_lang, c.n, t.n_true,
               round(cast(c.n as double) / cast(t.n_true as double), 9)
                   as frac_of_true
        from conf c join tot t on t.true_lang = c.true_lang"""


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_langid_confusion_sql(SPARK))


def q_langid_confusion_oracle() -> str:
    return _langid_confusion_sql(DUCK)


def register_r5o(QUERIES: dict) -> None:
    QUERIES["lcp_path"] = (q_lcp_path, q_lcp_path_oracle)
    QUERIES["langid_confusion"] = (q_langid_confusion, q_langid_confusion_oracle)
