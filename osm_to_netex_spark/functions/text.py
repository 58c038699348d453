"""Text-processing expression snippets, dual-dialect (Spark SQL / DuckDB).

Used by the training-data operators (dedup, textstats).  Tokenization and
hashing are defined portably so the DuckDB oracle reproduces engine values
bit-for-bit.
"""

from __future__ import annotations

from .portable import DUCK, SPARK, element_at, phash60, reduce_, seq, size, transform


def arr_min_big(lst: str, d: str) -> str:
    """Min of a bigint list (NULL when empty) — portable."""
    if d == SPARK:
        return f"array_min({lst})"
    return f"list_aggregate({lst}, 'min')"


def arr_sum_big(lst: str, d: str) -> str:
    """Sum of a bigint list (NULL when empty) — portable.

    DuckDB's list_reduce cannot change accumulator type, so folds over
    string lists are expressed as transform-to-bigint + list_aggregate.
    """
    if d == SPARK:
        return f"aggregate({lst}, cast(0 as bigint), (acc, x) -> acc + x)"
    return f"cast(coalesce(list_aggregate({lst}, 'sum'), 0) as bigint)"

# Tokens = maximal runs of [a-z0-9]+ on the lowercased text (BPE-ish fallback
# regex tokenizer; whitespace tokenizer also provided).
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: str, d: str) -> str:
    """Array of non-empty lowercase word tokens."""
    if d == SPARK:
        split = f"split(lower({text}), '{TOKEN_SPLIT_RE}')"
        return f"filter({split}, t -> t <> '')"
    split = f"regexp_split_to_array(lower({text}), '{TOKEN_SPLIT_RE}')"
    return f"list_filter({split}, t -> t <> '')"


def ws_tokens(text: str, d: str) -> str:
    """Whitespace tokenization (token counting)."""
    if d == SPARK:
        return f"filter(split({text}, '\\\\s+'), t -> t <> '')"
    return f"list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')"


def word_shingles(text: str, n: int, d: str) -> str:
    """n-gram word shingles joined by single spaces (empty array if < n words)."""
    toks = tokens(text, d)
    if d == SPARK:
        join = f"array_join(slice(tk, i, {n}), ' ')"
        return (
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(1, size({toks}) - {n} + 1), i -> "
            f"array_join(slice({toks}, i, {n}), ' ')) "
            f"ELSE array() END"
        )
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n} + 1), i -> "
        f"array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')) "
        f"ELSE [] END"
    )


MINHASH_MOD = 2**31 - 1
MINHASH_SENTINEL = 2**60


def shingle_base_hashes(text: str, n_shingle: int, d: str) -> str:
    """Array of base hashes, ONE md5 per shingle (stage this as a column)."""
    shingles = word_shingles(text, n_shingle, d)
    base = f"({phash60('s', d)} % {MINHASH_MOD})"
    return transform(shingles, "s", base, d)


def minhash_from_base(base_col: str, n_perm: int, d: str) -> str:
    """Signature from a staged base-hash array column: the classic affine
    permutation family h_p(x) = (x·(2p+1) + 7919·p) mod 2^31-1 — every
    intermediate < 2^52 (portable under ANSI overflow checks).  Signature
    element = min over shingles (2^60 sentinel for empty docs)."""
    perm = f"((x * (2 * p + 1) + 7919 * p) % {MINHASH_MOD})"
    permuted = transform(base_col, "x", perm, d)
    inner = f"coalesce({arr_min_big(permuted, d)}, cast({MINHASH_SENTINEL} as bigint))"
    return transform(seq("0", str(n_perm - 1), d), "p", inner, d)


def minhash_signature(text: str, n_shingle: int, n_perm: int, d: str) -> str:
    """One-expression form (hot paths should stage shingle_base_hashes as a
    column first — inside a single expression the base array is recomputed
    per permutation since higher-order lambdas are not CSE'd)."""
    return minhash_from_base(shingle_base_hashes(text, n_shingle, d), n_perm, d)


def simhash64(text: str, d: str) -> str:
    """32-bit SimHash over word tokens (packed as bigint; 32 bits keeps the
    per-bit vote loop cheap while remaining collision-useful for near-dup).

    bit b of token t = parity of phash60(concat(b,'#',t)); the fingerprint bit
    is 1 iff the sum of (2·bit−1) votes over tokens is positive.
    """
    toks = tokens(text, d)
    styp = "string" if d == SPARK else "varchar"
    bit_hash = phash60(f"concat(cast(b as {styp}), '#', t)", d)
    vote = f"(CASE WHEN {bit_hash} % 2 = 1 THEN cast(1 as bigint) ELSE cast(-1 as bigint) END)"
    bitsum = arr_sum_big(transform(toks, "t", vote, d), d)
    two_b = "shiftleft(cast(1 as bigint), cast(b as int))" if d == SPARK else "(cast(1 as bigint) << b)"
    bitval = f"(CASE WHEN ({bitsum}) > 0 THEN {two_b} ELSE cast(0 as bigint) END)"
    return arr_sum_big(transform(seq("0", "31", d), "b", bitval, d), d)


def rolling_fingerprint(text: str, d: str) -> str:
    """Deterministic document fingerprint: polynomial rolling hash over word
    tokens (base 1000003, mod 2^31-1).  The modulus keeps every intermediate
    < 2^51, safe under Spark's ANSI bigint overflow checks and DuckDB alike.
    Folds token-level portable hashes (not chars) to keep the loop short.
    """
    mod = str(2**31 - 1)
    toks = tokens(text, d)
    th = phash60("t", d)
    hashed = transform(toks, "t", f"({th}) % 1000003", d)
    return reduce_(hashed, "cast(0 as bigint)", "acc", "h", f"(acc * 1000003 + h) % {mod}", d)
