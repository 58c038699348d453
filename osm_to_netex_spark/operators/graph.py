"""Fixed-point PageRank over a deterministic hash-derived link graph.

Like operators.clustering, this iterative algorithm is NOT exempted from the
value-hash oracle gate: every arithmetic step is exact integer math, so the
T-iteration result is bit-identical across engines, partitionings, and
cluster sizes, and the DuckDB oracle replays it as T unrolled CTEs.

* **Graph.** Each doc emits K out-links; targets are portable-hash mod n
  (dense doc_id domain).  The last link is drawn from a small hub set
  (``% HUB_MOD``) so in-degree is deliberately skewed — dense-city-cell
  style — and the per-iteration aggregation exercises AQE skew handling
  rather than assuming uniform keys.
* **Integer ranks.** r0 = SCALE div n.  Per edge the contribution is
  ``r div K`` (exact — out-degree is the constant K); per iteration
  ``r' = (15·(SCALE div n)) div 100 + (85·Σ contrib) div 100`` with damping
  0.85 carried as integer 85/100.  Sums stay ≪ 2^53: Σ over all in-edges of
  r div K ≤ SCALE·skew, SCALE = 10^12.  Integer sums are order-free, so the
  shuffle schedule cannot perturb values.
* **Scale shape.** Two shuffles per iteration (ranks→src join, dst groupBy
  with map-side combine), T a small constant; no driver-side state at all —
  unlike k-means there is nothing to collect, the ranks table stays
  distributed.  Dangling nodes cannot exist (every doc has exactly K
  out-links); docs with no in-links keep the teleport term via the left
  join.  The reference has no graph surface; this is engine-side
  (SURVEY §2.3), the dedup-group connected-components' PageRank sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK, concat_str, phash60

SCALE = 10**12
K_LINKS = 3
HUB_MOD = 97
DAMP_NUM, DAMP_DEN = 85, 100


def _div(a: str, b: str, d: str) -> str:
    return f"({a}) div ({b})" if d == SPARK else f"({a}) // ({b})"


def edges_sql(d: str, table: str = "documents", n_expr: str | None = None) -> str:
    """(src, dst) rows: K_LINKS deterministic out-links per doc; the last one
    lands in the hub set (skewed in-degree)."""
    n = n_expr or f"(select count(*) from {table})"
    parts = []
    for j in range(K_LINKS):
        h = phash60(concat_str(["'lnk:'", "doc_id", f"':{j}'"], d), d)
        mod = f"least({HUB_MOD}, {n})" if j == K_LINKS - 1 else n
        parts.append(f"select doc_id as src, ({h}) % ({mod}) as dst from {table}")
    return " union all ".join(parts)


def _iter_sql(docs: str, edges: str, prev: str, n_expr: str, d: str) -> str:
    base = _div(f"15 * ({_div(str(SCALE), n_expr, d)})", "100", d)
    contrib = _div("rr.r", str(K_LINKS), d)
    inc = (
        f"select e.dst as doc_id, sum({contrib}) as inc "
        f"from {edges} e join {prev} rr on e.src = rr.doc_id group by e.dst"
    )
    newr = f"{base} + ({_div(f'{DAMP_NUM} * coalesce(i.inc, 0)', str(DAMP_DEN), d)})"
    return (
        f"select d.doc_id, {newr} as r "
        f"from {docs} d left join ({inc}) i on d.doc_id = i.doc_id"
    )


def pagerank(
    spark: SparkSession, docs: DataFrame, n_iter: int = 5
) -> DataFrame:
    """(doc_id, pagerank) after ``n_iter`` exact-integer iterations."""
    docs.select("doc_id").createOrReplaceTempView("__pr_docs")
    n_expr = "(select count(*) from __pr_docs)"
    spark.sql(
        f"select src, dst from ({edges_sql(SPARK, '__pr_docs', n_expr)})"
    ).createOrReplaceTempView("__pr_edges")
    ranks = spark.sql(
        f"select doc_id, {_div(str(SCALE), n_expr, SPARK)} as r from __pr_docs"
    )
    for t in range(n_iter):
        ranks.createOrReplaceTempView(f"__pr_r{t}")
        ranks = spark.sql(
            _iter_sql("__pr_docs", "__pr_edges", f"__pr_r{t}", n_expr, SPARK)
        )
    return ranks.selectExpr("doc_id", "r as pagerank")


def pagerank_oracle_sql(table: str = "documents", n_iter: int = 5) -> str:
    """The same T iterations unrolled as chained CTEs (DuckDB dialect)."""
    n_expr = "(select count(*) from d0)"
    ctes = [
        f"d0 as (select doc_id from {table})",
        f"e0 as ({edges_sql(DUCK, 'd0', n_expr)})",
        f"r0 as (select doc_id, {_div(str(SCALE), n_expr, DUCK)} as r from d0)",
    ]
    for t in range(n_iter):
        ctes.append(
            f"r{t + 1} as ({_iter_sql('d0', 'e0', f'r{t}', n_expr, DUCK)})"
        )
    return (
        "with " + ", ".join(ctes) + f" select doc_id, r as pagerank from r{n_iter}"
    )
