"""Round-5 TPC-H completion (SURVEY §2.3 `(r5)` rows).

The registry carried 12 of the 22 TPC-H query shapes through round 5;
this module lands the remaining 10 (Q2, Q8, Q9, Q11, Q13, Q16, Q19, Q20,
Q21, Q22), completing the suite.  "Shape" has the same meaning as the
existing rows (e.g. `tpch_q12`, plans/queries.py:5354): the query's
structural pattern — its join graph, subquery form, and aggregation
shape — adapted to the testdata's reduced column set.  The synthetic
tables have no partsupp, no l_commitdate/l_receiptdate, no
p_container/c_phone/comments, so:

* partsupp-based cost (Q2/Q9/Q11/Q16/Q20) is stood in by lineitem-derived
  per-(part,supplier) unit cost / revenue — the SHAPE (correlated min
  subquery, scalar-fraction threshold, NOT IN, nested semi-joins) is
  unchanged;
* Q21's receipt>commit lateness becomes ship-lag vs o_orderdate;
* Q22's phone country code becomes c_nationkey mod 10.

Landing discipline as everywhere (LANDING.md): one SQL text for both
dialects wherever syntax allows, integer-quantized money (1e4 → bigint
per row BEFORE any sum; 1e2 for acctbal), integer cross-multiplication
instead of float averages/fractions, `cast(sum(..) as bigint)` so the
DuckDB oracle never widens to HUGEINT, identical aliases both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

# per-row integer quantization of money expressions (exact IEEE-double
# product then floor — bit-identical across both engines)
_REV_Q4 = (
    "cast(floor(l_extendedprice * (1.0e0 - l_discount) * 1.0e4 + 0.5e0)"
    " as bigint)"
)
_PRICE_Q4 = "cast(floor(l_extendedprice * 1.0e4 + 0.5e0) as bigint)"


def _ep(d: str):
    # tz-free epoch seconds (see _sessionize_sql, plans/queries.py:547)
    if d == SPARK:
        return lambda c: (
            "(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
            f"{c}) / 1.0e6)"
        )
    return lambda c: f"epoch({c})"


def _year(d: str):
    if d == SPARK:
        return lambda c: f"cast(year({c}) as bigint)"
    return lambda c: f"cast(date_part('year', {c}) as bigint)"


def _spark_runner(sql_builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from . import queries as q

        q.register_geometry_views(spark, sf_dir)
        return spark.sql(sql_builder(SPARK))

    return run


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar MIN subquery)
# ---------------------------------------------------------------------------
def _tpch_q2_sql(d: str) -> str:
    """TPC-H Q2 shape — for each qualifying part, the region's suppliers
    achieving the MINIMUM supply cost, via a correlated scalar-min
    subquery re-scanning the cost relation.  Supply cost is stood in by
    the supplier's best observed unit price for the part
    (min l_extendedprice/l_quantity over their shipments), quantized to
    int 1e-4 per row before the min so the correlated comparison is an
    exact bigint equality.

    Scale: the cost relation is one map-side-combined aggregate of the
    fact keyed (part, supplier); Catalyst rewrites the correlated min as
    a per-part aggregate + join (no per-row re-execution); the dimension
    probes are broadcasts."""
    return """
        with cost as (
            select l_partkey as pk, l_suppkey as sk,
                   cast(min(cast(floor(l_extendedprice / l_quantity * 1.0e4
                        + 0.5e0) as bigint)) as bigint) as unit_cost_q4
            from lineitem
            group by l_partkey, l_suppkey
        ),
        rcost as (
            select c.pk, c.sk, c.unit_cost_q4, s_name, n_name, s_acctbal
            from cost c
            join supplier on s_suppkey = c.sk
            join nation on n_nationkey = s_nationkey
            join region on r_regionkey = n_regionkey
            where r_name = 'EUROPE'
        )
        select p_partkey, sk as s_suppkey, s_name, n_name, unit_cost_q4,
               cast(floor(s_acctbal * 1.0e2 + 0.5e0) as bigint) as s_acctbal_q2
        from part
        join rcost on pk = p_partkey
        where p_size between 10 and 20 and p_type = 'STANDARD'
          and unit_cost_q4 = (select min(r2.unit_cost_q4) from rcost r2
                              where r2.pk = p_partkey)"""


# ---------------------------------------------------------------------------
# Q8 — national market share (two-level conditional-share aggregate)
# ---------------------------------------------------------------------------
def _tpch_q8_sql(d: str) -> str:
    """TPC-H Q8 shape — a nation's share of a region's order volume for a
    part type, per year: the 8-table join chain (fact → part, →
    orders → customer → nation → region on the demand side, → supplier →
    nation on the supply side) feeding a conditional-share aggregate.
    Both share terms are exact bigint sums of per-row-quantized revenue;
    the share itself is one final division of exact operands.

    Scale: dimension chain is all broadcasts; one shuffle on the tiny
    (year) grouping after map-side partial aggregation."""
    yr = _year(d)("o_orderdate")
    return f"""
        with vol as (
            select {yr} as o_year, {_REV_Q4} as rev_q4, n2.n_name as supp_nation
            from lineitem
            join part on p_partkey = l_partkey
            join orders on o_orderkey = l_orderkey
            join customer on c_custkey = o_custkey
            join nation n1 on n1.n_nationkey = c_nationkey
            join region on r_regionkey = n1.n_regionkey
            join supplier on s_suppkey = l_suppkey
            join nation n2 on n2.n_nationkey = s_nationkey
            where r_name = 'ASIA' and p_type = 'PROMO'
              and o_orderdate >= timestamp '1996-01-01 00:00:00'
              and o_orderdate <  timestamp '1998-01-01 00:00:00'
        )
        select o_year,
               cast(sum(case when supp_nation = 'NATION_2' then rev_q4
                        else 0 end) as bigint) as nation_rev_q4,
               cast(sum(rev_q4) as bigint) as total_rev_q4,
               round(cast(sum(case when supp_nation = 'NATION_2' then rev_q4
                          else 0 end) as double)
                     / cast(sum(rev_q4) as double), 9) as mkt_share
        from vol
        group by o_year"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit (LIKE-filtered fact, two-sided money terms)
# ---------------------------------------------------------------------------
def _tpch_q9_sql(d: str) -> str:
    """TPC-H Q9 shape — profit by supplier nation and year over a
    LIKE-filtered part set: revenue minus cost where ps_supplycost·qty is
    stood in by p_retailprice·qty (no partsupp in the testdata).  Each
    money term is quantized per row; the difference and the sum are exact
    bigint arithmetic.

    Scale: part LIKE filter broadcast-prunes the fact before the
    supplier/nation/orders broadcasts; one (nation, year) shuffle."""
    yr = _year(d)("o_orderdate")
    cost = "cast(floor(p_retailprice * l_quantity * 1.0e4 + 0.5e0) as bigint)"
    return f"""
        select n_name as nation, {yr} as o_year,
               cast(sum({_REV_Q4} - {cost}) as bigint) as profit_q4
        from lineitem
        join part on p_partkey = l_partkey
        join supplier on s_suppkey = l_suppkey
        join nation on n_nationkey = s_nationkey
        join orders on o_orderkey = l_orderkey
        where p_name like '%red%'
        group by n_name, {yr}"""


# ---------------------------------------------------------------------------
# Q11 — important stock (scalar-fraction-of-total threshold)
# ---------------------------------------------------------------------------
def _tpch_q11_sql(d: str) -> str:
    """TPC-H Q11 shape — groups whose aggregate value exceeds a fixed
    fraction of the global total (scalar subquery over the same
    aggregate).  Stock value is stood in by per-part revenue.  TPC-H's
    fixed fraction scales with 1/SF; with a fixed part universe the
    scale-free equivalent is a mean-relative threshold — value > 1.2×
    the mean part value, i.e. value·n_parts·10 > total·12 — expressed as
    integer cross-multiplication, so no float threshold exists anywhere
    and the gate stays non-trivially selective at every SF (~17% of
    parts qualify).

    Scale: one map-side-combined per-part aggregate; the global total is
    a 1-row scalar broadcast back — the same two-pass plan TPC-H
    prescribes, with no re-scan of the fact."""
    return f"""
        with val as (
            select l_partkey as p_partkey,
                   cast(sum({_PRICE_Q4}) as bigint) as value_q4
            from lineitem
            group by l_partkey
        )
        select p_partkey, value_q4
        from val
        where value_q4 * (select cast(count(*) as bigint) from val) * 10
              > (select cast(sum(value_q4) as bigint) from val) * 12"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregate)
# ---------------------------------------------------------------------------
def _tpch_q13_sql(d: str) -> str:
    """TPC-H Q13 shape — the distribution of per-customer order counts:
    LEFT OUTER join with the filter in the join condition (so zero-order
    customers survive with count 0), then a second aggregate over the
    first.  The comment NOT LIKE filter is stood in by o_orderpriority.

    Scale: outer join shuffles on custkey with the filter pushed into the
    join; the histogram re-aggregation is over |customers| rows."""
    return """
        with c_orders as (
            select c_custkey, cast(count(o_orderkey) as bigint) as c_count
            from customer
            left join orders on o_custkey = c_custkey
                 and o_orderpriority <> '1-URGENT'
            group by c_custkey
        )
        select c_count, cast(count(*) as bigint) as custdist
        from c_orders
        group by c_count"""


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part group (NOT IN + COUNT DISTINCT)
# ---------------------------------------------------------------------------
def _tpch_q16_sql(d: str) -> str:
    """TPC-H Q16 shape — distinct suppliers per (brand, type, size band)
    excluding a NOT IN supplier subquery (complaint suppliers stood in by
    negative account balance) and an excluded brand list.  partsupp is
    stood in by the lineitem (part, supplier) incidence.

    Scale: the NOT IN set is a broadcast null-aware anti join (supplier
    is a dimension); count(distinct) expands to a two-level aggregate —
    both shuffles are keyed on the tiny group space."""
    return """
        with inc as (
            select distinct l_partkey as pk, l_suppkey as sk
            from lineitem
            where l_suppkey not in (
                select s_suppkey from supplier where s_acctbal < 0.0e0)
        )
        select p_brand, p_type,
               cast(case when p_size < 15 then 0 else 1 end as bigint)
                   as size_band,
               cast(count(distinct sk) as bigint) as supplier_cnt
        from inc
        join part on p_partkey = pk
        where p_brand not in ('Brand#1', 'Brand#2')
        group by p_brand, p_type, case when p_size < 15 then 0 else 1 end"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate join (OR of conjunct bands)
# ---------------------------------------------------------------------------
def _tpch_q19_sql(d: str) -> str:
    """TPC-H Q19 shape — revenue under an OR of three conjunctive
    (brand, size band, quantity band) predicates spanning the join: the
    classic disjunctive-pushdown test.  p_container is stood in by
    p_size bands.

    Scale: Catalyst extracts the common join key and pushes the
    per-branch constraints below the broadcast join; the OR does not
    force a cartesian."""
    return f"""
        select cast(count(*) as bigint) as n_lines,
               cast(sum({_REV_Q4}) as bigint) as revenue_q4
        from lineitem
        join part on p_partkey = l_partkey
        where (p_brand = 'Brand#11' and p_size between 1 and 5
               and l_quantity between 1.0e0 and 11.0e0)
           or (p_brand = 'Brand#12' and p_size between 1 and 10
               and l_quantity between 10.0e0 and 20.0e0)
           or (p_brand = 'Brand#13' and p_size between 1 and 15
               and l_quantity between 20.0e0 and 30.0e0)"""


# ---------------------------------------------------------------------------
# Q20 — excess-stock suppliers (nested IN semi-join chain)
# ---------------------------------------------------------------------------
def _tpch_q20_sql(d: str) -> str:
    """TPC-H Q20 shape — suppliers in given nations who shipped more than
    a threshold quantity of some LIKE-prefixed part: IN (grouped subquery
    with HAVING) nested over IN (dimension filter) — the two-level
    semi-join chain.  partsupp availability is stood in by shipped
    quantity per (supplier, part).

    Scale: both INs plan as semi joins; the inner part filter broadcasts,
    the grouped HAVING is one map-side-combined aggregate of the fact."""
    return """
        select s_suppkey, s_name
        from supplier
        join nation on n_nationkey = s_nationkey
        where n_name in ('NATION_3', 'NATION_4', 'NATION_5')
          and s_suppkey in (
              select l_suppkey
              from lineitem
              where l_partkey in (
                  select p_partkey from part where p_name like 'red%')
              group by l_suppkey, l_partkey
              having sum(cast(l_quantity as bigint)) > 50)"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------
def _tpch_q21_sql(d: str) -> str:
    """TPC-H Q21 shape — on multi-supplier finished orders, count per
    supplier the lines where THAT supplier was the unique latest shipper
    and shipped late: correlated EXISTS (another supplier participated)
    plus correlated NOT EXISTS (nobody shipped after them) on the same
    fact.  Lateness (receipt > commit in the reference schema) is stood
    in by ship-lag > 60 days after the order date.

    Scale: Catalyst plans EXISTS/NOT EXISTS as left-semi / null-aware
    anti joins shuffled on orderkey — co-partitioned with the fact scan,
    no per-row subquery execution."""
    ep = _ep(d)
    late = f"({ep('l1.l_shipdate')} - {ep('o_orderdate')}) > 5184000.0e0"
    return f"""
        select s_name, cast(count(*) as bigint) as numwait
        from supplier
        join lineitem l1 on l1.l_suppkey = s_suppkey
        join orders on o_orderkey = l1.l_orderkey
        where o_orderstatus = 'F'
          and {late}
          and exists (
              select 1 from lineitem l2
              where l2.l_orderkey = l1.l_orderkey
                and l2.l_suppkey <> l1.l_suppkey)
          and not exists (
              select 1 from lineitem l3
              where l3.l_orderkey = l1.l_orderkey
                and l3.l_suppkey <> l1.l_suppkey
                and l3.l_shipdate > l1.l_shipdate)
        group by s_name"""


# ---------------------------------------------------------------------------
# Q22 — global-avg threshold + anti join (scalar subquery over aggregate)
# ---------------------------------------------------------------------------
def _tpch_q22_sql(d: str) -> str:
    """TPC-H Q22 shape — customers above the positive-balance average of
    their country group with no recent orders: scalar subqueries for the
    global average plus a correlated NOT EXISTS anti join.  The phone
    country code is stood in by c_nationkey mod 10; "never ordered"
    (vacuous in this data — every customer has orders) becomes "no order
    since 2000-01-01".  The average test is integer cross-multiplication
    (bal_q2 · n_pos > sum_pos_q2): no float average exists.

    Scale: the scalar aggregate is a 1-row broadcast; NOT EXISTS plans as
    an anti join on custkey against the date-pruned orders scan."""
    return """
        with pos as (
            select cast(sum(cast(floor(c_acctbal * 1.0e2 + 0.5e0) as bigint))
                        as bigint) as sum_q2,
                   cast(count(*) as bigint) as n
            from customer
            where c_acctbal > 0.0e0 and (c_nationkey % 10) in (1, 3, 5, 7, 9)
        )
        select cast(c_nationkey % 10 as bigint) as cntrycode,
               cast(count(*) as bigint) as numcust,
               cast(sum(cast(floor(c_acctbal * 1.0e2 + 0.5e0) as bigint))
                    as bigint) as totacctbal_q2
        from customer
        where (c_nationkey % 10) in (1, 3, 5, 7, 9)
          and cast(floor(c_acctbal * 1.0e2 + 0.5e0) as bigint)
              * (select n from pos) > (select sum_q2 from pos)
          and not exists (
              select 1 from orders
              where o_custkey = c_custkey
                and o_orderdate >= timestamp '2000-01-01 00:00:00')
        group by c_nationkey % 10"""


_SHAPES = {
    "tpch_q2": _tpch_q2_sql,
    "tpch_q8": _tpch_q8_sql,
    "tpch_q9": _tpch_q9_sql,
    "tpch_q11": _tpch_q11_sql,
    "tpch_q13": _tpch_q13_sql,
    "tpch_q16": _tpch_q16_sql,
    "tpch_q19": _tpch_q19_sql,
    "tpch_q20": _tpch_q20_sql,
    "tpch_q21": _tpch_q21_sql,
    "tpch_q22": _tpch_q22_sql,
}


def register_r5b(QUERIES: dict) -> None:
    for name, builder in _SHAPES.items():
        QUERIES[name] = (
            _spark_runner(builder),
            (lambda b: lambda: b(DUCK))(builder),
        )
