"""Dual-dialect (Spark SQL / DuckDB SQL) expression snippets.

The driver's correctness gate runs each engine query against a DuckDB oracle
and value-hashes the results, so every deterministic formula the engine uses
(cell ids, hashes, haversine, ray-cast) is emitted here for BOTH dialects from
a single source of truth.  Spark evaluates these as Catalyst expressions
inside whole-stage codegen; no Python UDFs are involved.

Portability notes (verified on pyspark 4.1.2 / duckdb 1.0.0):
* md5() produces identical hex in both engines → 60-bit portable hash;
* higher-order list functions differ only in name (transform/list_transform,
  aggregate/list_reduce-with-prepended-init, sequence/generate_series);
* integer division & floor semantics are aligned by explicit casts.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duckdb"

TWO60 = float(2**60)


def flit(x: float) -> str:
    """Float literal forced to DOUBLE in both dialects.

    Spark 4 (ANSI) parses bare decimal literals (``0.5``) as DECIMAL, which
    silently switches whole expressions to decimal arithmetic and diverges
    from DuckDB; scientific notation (``0.5e0``) is an *approximate numeric*
    literal → DOUBLE in both engines.
    """
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"


def seq(a: str, b: str, d: str) -> str:
    """Inclusive integer sequence a..b as a list."""
    return f"sequence({a}, {b})" if d == SPARK else f"generate_series(cast({a} as bigint), cast({b} as bigint))"


def let_(bindings: dict[str, str], body: str, d: str, var: str = "__b") -> str:
    """SQL let-binding: evaluate each binding ONCE, expose as ``__b.name`` in
    ``body``.  Implemented as a single-element transform over a struct —
    ``transform(array(struct(...)), __b -> body)[0]`` — in both dialects.

    Why this exists: generated expressions nest higher-order functions whose
    *bound expressions* (sequence limits, least/greatest of reductions) get
    re-evaluated per outer lambda element during interpretation.  Binding
    them collapses O(outer × cost(bound)) to O(cost(bound))."""
    if d == SPARK:
        fields = ", ".join(f"'{k}', {v}" for k, v in bindings.items())
        return f"(transform(array(named_struct({fields})), {var} -> {body})[0])"
    fields = ", ".join(f"'{k}': {v}" for k, v in bindings.items())
    return f"(list_transform([{{{fields}}}], {var} -> {body})[1])"


def transform(lst: str, var: str, body: str, d: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({lst}, {var} -> {body})"


def filter_(lst: str, var: str, body: str, d: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({lst}, {var} -> {body})"


def exists_(lst: str, var: str, body: str, d: str) -> str:
    """True iff any element satisfies the predicate.  Spark short-circuits
    (ArrayExists); the DuckDB filter form evaluates all elements — fine for
    the oracle, which only needs the same boolean."""
    if d == SPARK:
        return f"exists({lst}, {var} -> {body})"
    return f"(len(list_filter({lst}, {var} -> {body})) > 0)"


def reduce_(lst: str, init: str, acc: str, var: str, body: str, d: str) -> str:
    """Fold with initial value. DuckDB's list_reduce lacks init → prepend it."""
    if d == SPARK:
        return f"aggregate({lst}, {init}, ({acc}, {var}) -> {body})"
    return f"list_reduce(list_prepend({init}, {lst}), ({acc}, {var}) -> {body})"


def size(lst: str, d: str) -> str:
    return f"size({lst})" if d == SPARK else f"len({lst})"


def element_at(lst: str, idx: str, d: str) -> str:
    """1-based element access."""
    return f"element_at({lst}, cast({idx} as int))" if d == SPARK else f"list_extract({lst}, cast({idx} as bigint))"


def shiftleft(x: str, n: int, d: str) -> str:
    return f"shiftleft({x}, {n})" if d == SPARK else f"({x} << {n})"


def bigint(x: str) -> str:
    return f"cast({x} as bigint)"


def floor_bigint(x: str) -> str:
    return f"cast(floor({x}) as bigint)"


def phash60(x: str, d: str) -> str:
    """Portable 60-bit non-negative hash of a string expression (md5-based).

    Identical in both engines: md5 hex → first 15 hex chars → int.
    """
    if d == SPARK:
        return f"cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
    return f"cast(('0x' || substring(md5({x}), 1, 15)) as bigint)"


def prand(x: str, d: str) -> str:
    """Deterministic uniform double in [0,1) keyed by a string expression."""
    return f"({phash60(x, d)} / {flit(TWO60)})"


def concat_str(parts: list[str], d: str) -> str:
    inner = ", ".join(f"cast({p} as string)" if d == SPARK else f"cast({p} as varchar)" for p in parts)
    return f"concat({inner})"


def round_half(x: str, d: str) -> str:
    """round-half-away-from-zero to integer (both engines' round())."""
    return f"cast(round({x}) as bigint)"


def haversine_m(lat1: str, lon1: str, lat2: str, lon2: str, d: str) -> str:
    """Great-circle distance in meters (R=6371008.8).

    Same formula both sides; note libm (DuckDB) and java.lang.Math (Spark)
    may differ in the last ulps of asin/sin/cos — queries exposing distances
    should round (≥6 decimals is sub-mm) before value-hash comparison.
    """
    hlat = f"sin(radians(({lat2}) - ({lat1})) / 2.0e0)"
    hlon = f"sin(radians(({lon2}) - ({lon1})) / 2.0e0)"
    return (
        f"(2.0e0 * 6371008.8e0 * asin(sqrt("
        f"{hlat} * {hlat} + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * {hlon} * {hlon})))"
    )
