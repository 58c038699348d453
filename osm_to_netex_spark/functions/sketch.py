"""Portable HyperLogLog building blocks (batch sketch, dual-dialect).

The streaming HLL (streaming/stateful.py) keeps registers in
applyInPandasWithState; this is the BATCH form: registers are rows —
``groupBy(key, register) → max(rho)`` — so the sketch is one map-side
combined shuffle at any corpus size, and sketches merge by construction
(max is associative/commutative — the same groupBy computes the union of
any number of partial sketches).

Everything is md5-keyed string/CASE arithmetic — no log2/bit tricks whose
libm implementations could differ between engines — so the DuckDB oracle
reproduces registers AND estimate bit-for-bit:

* register index = first 2 hex chars of md5 → 0..255 (m = 256);
* rho = leading-zero count of the next 13 hex chars (52 bits) + 1, via
  regexp-strip of leading '0' nibbles + a 16-way CASE on the first
  surviving nibble (4·k + per-nibble zeros + 1; all-zero window → 53).

The resulting estimator is the raw HLL harmonic mean (alpha_256·m²/Σ2^-M);
zero registers contribute 2^0, and the Σ over ≤256 dyadic rationals is
exact in double, so the only float ops are one division and one multiply —
deterministic and identical across engines.
"""

from __future__ import annotations

from .portable import SPARK

M_REGISTERS = 256
ALPHA_256 = 0.7213 / (1.0 + 1.079 / M_REGISTERS)  # Flajolet et al. 2007


def _md5(x: str, salt: str) -> str:
    return f"md5(concat('{salt}:', cast({x} as string)))"


def hll_register(x: str, d: str, salt: str = "hll") -> str:
    """Register index 0..255 from the first md5 hex byte."""
    h2 = f"substring({_md5(x, salt)}, 1, 2)"
    if d == SPARK:
        return f"cast(conv({h2}, 16, 10) as int)"
    return f"cast(('0x' || {h2}) as int)"


def hll_rho(x: str, d: str, salt: str = "hll") -> str:
    """rho = leading zero bits of the 52-bit window + 1 (1..53)."""
    w = f"substring({_md5(x, salt)}, 3, 13)"
    stripped = f"regexp_replace({w}, '^0+', '')"
    first = f"substring({stripped}, 1, 1)"
    nib = (
        f"(CASE WHEN {first} = '1' THEN 3 "
        f"WHEN {first} IN ('2', '3') THEN 2 "
        f"WHEN {first} IN ('4', '5', '6', '7') THEN 1 ELSE 0 END)"
    )
    return (
        f"(CASE WHEN length({stripped}) = 0 THEN 53 "
        f"ELSE 4 * (13 - length({stripped})) + {nib} + 1 END)"
    )


def hll_estimate(sum_col: str, d: str) -> str:
    """Raw HLL estimate from Σ 2^-M_j (`sum_col` already includes the
    2^0 = 1 contribution of every untouched register)."""
    return f"({ALPHA_256!r} * {M_REGISTERS} * {M_REGISTERS} / {sum_col})"


# ---------------------------------------------------------------------------
# Count-min sketch (CMS) — frequency estimation, pure integer arithmetic
# ---------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(x: str, depth_var: str, d: str) -> str:
    """Register column for hash row `depth_var` (0..CMS_DEPTH-1): an
    independent md5-keyed hash per row, bucketed to CMS_WIDTH.  Integer
    end to end, so build and probe are bit-exact in any engine."""
    from .portable import concat_str, phash60

    key = concat_str(["'cms'", depth_var, "':'", x], d)
    return f"({phash60(key, d)} % {CMS_WIDTH})"
