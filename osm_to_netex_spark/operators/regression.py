"""Distributed multivariate linear regression via exact normal equations.

Generalizes the per-group OLS trend fit (temporal.trend_fit, d=1) to d
features + intercept: the model β solves (XᵀX + λI)β = Xᵀy.  At 10^12 rows
the ONLY distributed work is accumulating the moment matrix — (d+1)(d+2)/2
+ (d+1) sums — in one map-side-combined aggregate per group; the solve is
O(d³) per group and runs INSIDE the same SQL row via a generated Cramer
expansion, so the whole fit is one shuffle and stays value-hash-gateable.

Exactness discipline: features/targets must be pre-quantized integers, so
every moment is an exact bigint fold (order-free).  Determinants would
overflow int64, so moments are cast to double (exact for |m| < 2^53) and
each determinant is emitted as a FIXED-ORDER sum of permutation products —
the same IEEE op sequence in both engines, hence bit-identical results.
Singular groups (det = 0) yield null βs via nullif.

λ (ridge) is added to the feature diagonal in INTEGER space before the
cast; the intercept row is never regularized (standard practice).
"""

from __future__ import annotations

from itertools import permutations
from typing import Sequence


def _perm_sign(p: Sequence[int]) -> int:
    s, seen = 1, set()
    p = list(p)
    for i in range(len(p)):
        if i in seen:
            continue
        j, clen = i, 0
        while j not in seen:
            seen.add(j)
            j = p[j]
            clen += 1
        if clen % 2 == 0:
            s = -s
    return s


def _det(m: list[list[str]]) -> str:
    """Leibniz expansion with deterministic term order (sorted perms).

    Factors inside each product are SORTED: Spark's subexpression
    elimination treats commutative multiply chains as semantically equal
    regardless of association and reuses one evaluation, so two terms
    holding the same factor multiset in different orders would otherwise
    evaluate under different parenthesizations than the written text (and
    diverge from DuckDB in the last ulps).  With sorted factors every
    occurrence of a product is the same expression, every engine evaluates
    the same left-associated chain, and the result is bit-identical."""
    n = len(m)
    terms = []
    for p in sorted(permutations(range(n))):
        prod = " * ".join(sorted(m[i][p[i]] for i in range(n)))
        sign = "" if _perm_sign(p) == 1 else "- "
        terms.append(f"{sign}{prod}")
    return "(" + " + ".join(terms).replace("+ -", "-") + ")"


def ridge_fit_sql(
    d: str,
    table: str,
    group: str,
    xs: Sequence[str],
    y: str,
    lam: int = 0,
) -> str:
    """SQL for the per-group ridge fit.  ``xs``/``y`` are integer-valued SQL
    expressions over ``table``; returns (grp, n, beta0..beta{d}) with beta0
    the intercept.  Shared text for Spark and DuckDB — the generated
    expansion uses only portable arithmetic."""
    k = len(xs) + 1
    feats = ["cast(1 as bigint)"] + [f"cast({x} as bigint)" for x in xs]
    moments, names = [], {}
    for i in range(k):
        for j in range(i, k):
            nm = f"m_{i}_{j}"
            names[(i, j)] = names[(j, i)] = nm
            moments.append(f"sum({feats[i]} * {feats[j]}) as {nm}")
    bvec = []
    for i in range(k):
        nm = f"b_{i}"
        bvec.append(f"sum({feats[i]} * cast({y} as bigint)) as {nm}")
        names[("b", i)] = nm

    def a_cell(i: int, j: int) -> str:
        base = f"cast({names[(i, j)]} as double)"
        if i == j and i > 0 and lam:
            base = f"cast({names[(i, j)]} + {lam} as double)"
        return base

    A = [[a_cell(i, j) for j in range(k)] for i in range(k)]
    det_a = _det(A)
    sel = []
    for c in range(k):
        Ac = [
            [
                f"cast({names[('b', i)]} as double)" if j == c else A[i][j]
                for j in range(k)
            ]
            for i in range(k)
        ]
        sel.append(f"{_det(Ac)} / nullif({det_a}, 0.0e0) as beta{c}")
    return f"""
        select grp, n, {", ".join(sel)} from (
            select {group} as grp, count(*) as n,
                   {", ".join(moments)},
                   {", ".join(bvec)}
            from {table} group by {group}
        ) mom
    """
