"""Span-preserving training-chunk packing for interleaved text+media docs.

The step between a curated corpus and a training dataloader: split each
document into chunks of ≈ ``token_budget`` tokens WITHOUT ever splitting a
span (a media span is atomic by definition; splitting a text span would
break the span-sequence invariant the whole pipeline guarantees — BASELINE
input_hint: per-row span-sequence equality of (kind, text, media_ref,
order)).

Rule: spans keep their document order; span s goes to chunk
``floor(prefix_tokens(s) / budget)`` where prefix_tokens is the token count
of all EARLIER spans in the doc.  That is the streaming greedy packer with
the budget treated as a soft target (a chunk may overrun by the final span's
length — the standard "don't split, don't reorder" compromise), and it is a
pure window expression: one shuffle on doc_id, integer arithmetic only, so
the assignment is bit-identical across engines and partitionings.

Token costs: text spans = whitespace token count (functions.text.ws_tokens,
the same counter the textstats operator exposes); media spans = a flat
``media_token_cost`` (vision-tower patch budget), the convention multimodal
trainers use.

Invariant (pytested): concatenating a doc's chunks in chunk order, spans in
span order, reproduces the original span sequence exactly — the north-rule
per-row invariant survives chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as tx
from ..functions.portable import DUCK, SPARK


def _span_cost(kind: str, text: str, media_cost: int, d: str) -> str:
    n_ws = f"len({tx.ws_tokens(text, d)})" if d == DUCK else f"size({tx.ws_tokens(text, d)})"
    return (
        f"(CASE WHEN {kind} = 'media' THEN {media_cost} "
        f"ELSE coalesce({n_ws}, 0) END)"
    )


def chunk_documents(
    corpus: DataFrame,
    token_budget: int = 64,
    media_token_cost: int = 16,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """(doc_id, chunk_id, span_idx, kind, text, media_ref, n_tokens) — every
    span of every doc, chunk-assigned, order preserved via span_idx."""
    from pyspark.sql import Window

    exploded = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(spans_col).alias("span_idx", "span"),
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.expr(_span_cost("span.kind", "span.text", media_token_cost, SPARK))
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        exploded.withColumn(
            "prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .selectExpr(
            "doc_id",
            f"cast(prefix div {token_budget} as bigint) as chunk_id",
            "span_idx", "kind", "text", "media_ref", "n_tokens",
        )
    )


def chunk_documents_oracle_sql(
    corpus_parquet: str,
    token_budget: int = 64,
    media_token_cost: int = 16,
) -> str:
    """DuckDB replay: same cost expression, same prefix-sum window."""
    cost = _span_cost("s.kind", "s.text", media_token_cost, DUCK)
    return f"""
        with e as (
            select doc_id, t.i - 1 as span_idx,
                   spans[t.i] as s
            from read_parquet('{corpus_parquet}'),
                 unnest(generate_series(1, len(spans))) t(i)
        ),
        c as (
            select doc_id, span_idx, s.kind as kind, s.text as text,
                   s.media_ref as media_ref,
                   cast({cost} as bigint) as n_tokens
            from e
        )
        select doc_id,
               cast(coalesce(sum(n_tokens) over (
                   partition by doc_id order by span_idx
                   rows between unbounded preceding and 1 preceding), 0)
                   // {token_budget} as bigint) as chunk_id,
               span_idx, kind, text, media_ref, n_tokens
        from c"""


def pack_sequences_sql(
    d: str,
    table: str = "documents",
    capacity: int = 512,
    bucket: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Cross-document sequence packing (GPT-style dataloader layout): the
    corpus is laid out as one deterministic token stream (docs ordered by
    id) and cut at fixed ``capacity``-token boundaries; a document may
    straddle chunks, so the output is FRAGMENTS — (chunk_id, doc_id,
    doc_off_tok, frag_len, chunk_pos) — from which every chunk is exactly
    full (except the last) with zero padding.  This is the cross-document
    complement of :func:`chunk_documents` (which never splits a doc).

    The global prefix sum is HIERARCHICAL, not a single unpartitioned
    window: docs group into ``bucket``-sized id ranges; bucket token totals
    (corpus/bucket rows, e.g. 10^6 at the 10^12-doc design point) take the
    only ordered-global window — over the aggregated bucket table, the same
    "renumber over the small table" discipline as stay_points/trips — and
    per-doc offsets are the broadcast-joined bucket base plus an
    intra-bucket running sum partitioned by bucket.  Fragment fan-out is a
    scan-parallel explode (ceil(n/capacity)+1 rows per doc max).  All
    arithmetic is integer → bit-exact across engines and partitionings.

    Zero-token docs carry no fragments (nothing to train on).  1-based
    token positions, consistent with dup_spans.
    """
    toks = tx.tokens(text_col, d)
    C = int(capacity)
    B = int(bucket)
    if d == SPARK:
        idiv = "div"
        n_expr = f"cast(size({toks}) as bigint)"
        explode_from = (
            "from offs lateral view "
            f"explode(sequence(off {idiv} {C}, (off + n - 1) {idiv} {C})) "
            "t as chunk"
        )
    else:
        idiv = "//"
        n_expr = f"cast(len({toks}) as bigint)"
        explode_from = (
            "from offs, unnest(generate_series("
            f"cast(off {idiv} {C} as bigint), "
            f"cast((off + n - 1) {idiv} {C} as bigint))) t(chunk)"
        )
    return f"""
        with t as (
            select {id_col} as doc_id, {n_expr} as n from {table}
        ),
        b as (
            select doc_id, n, doc_id {idiv} {B} as bkt from t where n > 0
        ),
        bt as (
            select bkt, sum(n) as bn from b group by bkt
        ),
        bo as (
            select bkt,
                   coalesce(sum(bn) over (order by bkt asc
                                          rows between unbounded preceding
                                          and 1 preceding), 0) as base
            from bt
        ),
        offs as (
            select b.doc_id, b.n,
                   bo.base + coalesce(sum(b.n) over (
                       partition by b.bkt order by b.doc_id asc
                       rows between unbounded preceding and 1 preceding), 0)
                       as off
            from b join bo using (bkt)
        )
        select cast(chunk as bigint) as chunk_id,
               doc_id,
               cast(greatest(off, chunk * {C}) - off + 1 as bigint) as doc_off_tok,
               cast(least(off + n, (chunk + 1) * {C})
                   - greatest(off, chunk * {C}) as bigint) as frag_len,
               cast(greatest(off, chunk * {C}) - chunk * {C} + 1
                   as bigint) as chunk_pos
        {explode_from}
    """


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    bucket: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DataFrame wrapper for :func:`pack_sequences_sql` (Spark dialect)."""
    spark = docs.sparkSession
    docs.createOrReplaceTempView("__pack_docs")
    return spark.sql(
        pack_sequences_sql(
            SPARK, "__pack_docs", capacity=capacity, bucket=bucket,
            id_col=id_col, text_col=text_col,
        )
    )


def span_corruption_sql(
    d: str,
    table: str = "documents",
    block: int = 24,
    span_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """T5-style span-corruption pair generation (Raffel et al. 2020 shape):
    each document becomes one (input_text, target_text) training example —
    the input with masked spans replaced by ``<extra_id_k>`` sentinels, the
    target listing each sentinel followed by the tokens it hides.

    The paper's "sample spans until 15% masked" walk is serial per
    document; the deterministic parallel equivalent here partitions each
    doc's tokens into fixed ``block``-token blocks and masks ONE
    hash-placed ``span_len``-token span per FULL block (corruption rate =
    span_len/block, 12.5% at the defaults; the partial tail block is never
    masked, so sentinel k = block index needs no scan).  Every choice is a
    pure function of (doc_id, block) via the portable hash — no order
    dependence, bit-exact across engines and partitionings.

    Shape: ZERO shuffles — the whole rewrite is one projection of nested
    higher-order functions over the token array (position → (block, offset)
    struct → piece → filter '' → join), inside whole-stage codegen /
    vectorized DuckDB.  Output: (doc_id, n_tokens, n_masked_spans,
    input_text, target_text); docs shorter than one block pass through
    unmasked.
    """
    from ..functions.portable import (
        concat_str, filter_, let_, prand, seq, transform as tr,
    )

    toks = tx.tokens(text_col, d)
    B, S = int(block), int(span_len)
    if d == SPARK:
        sz, idiv, vc = "size(tk)", "div", "string"
        el = "element_at(tk, cast(__v.p as int))"
        mk = "named_struct('p', p, 'b', __b.b, 'q', p - __b.b * {B}, 'o', {o})"
    else:
        sz, idiv, vc = "len(tk)", "//", "varchar"
        el = "tk[__v.p]"
        mk = "{{'p': p, 'b': __b.b, 'q': p - __b.b * {B}, 'o': {o}}}"
    off_key = concat_str(["'sc:off:'", "doc_id", "':'", "__b.b"], d)
    off = f"(1 + cast(floor({prand(off_key, d)} * {B - S + 1}) as bigint))"
    # per position p: block b (0-based), q = 1-based pos within block,
    # o = the block's hash-placed span start
    mk_v = let_({"b": f"((p - 1) {idiv} {B})"}, mk.format(B=B, o=off), d)
    structs = tr(seq("1", "n", d), "p", mk_v, d)
    full = f"((__v.b + 1) * {B} <= n)"
    in_span = f"(__v.q >= __v.o and __v.q < __v.o + {S})"
    sentinel = f"concat('<extra_id_', cast(__v.b as {vc}), '>')"
    piece_in = (
        f"case when not {full} or not {in_span} then ({el}) "
        f"when __v.q = __v.o then {sentinel} else '' end"
    )
    piece_tgt = (
        f"case when not {full} or not {in_span} then '' "
        f"when __v.q = __v.o then concat({sentinel}, ' ', ({el})) "
        f"else ({el}) end"
    )

    def rewrite(piece: str) -> str:
        # coalesce: DuckDB's array_to_string of an empty list is NULL,
        # Spark's array_join is '' — pin both to ''
        arr = filter_(tr(structs, "__v", piece, d), "x", "x <> ''", d)
        if d == SPARK:
            return f"coalesce(array_join({arr}, ' '), '')"
        return f"coalesce(array_to_string({arr}, ' '), '')"

    return f"""
        with toks as (
            select {id_col} as doc_id, tk, cast({sz} as bigint) as n
            from (select {id_col}, {toks} as tk from {table}) s
        )
        select doc_id, n as n_tokens,
               cast(n {idiv} {B} as bigint) as n_masked_spans,
               {rewrite(piece_in)} as input_text,
               {rewrite(piece_tgt)} as target_text
        from toks
    """


def span_corruption(
    docs: DataFrame,
    block: int = 24,
    span_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DataFrame wrapper for :func:`span_corruption_sql` (Spark dialect)."""
    spark = docs.sparkSession
    docs.createOrReplaceTempView("__sc_docs")
    return spark.sql(
        span_corruption_sql(
            SPARK, "__sc_docs", block=block, span_len=span_len,
            id_col=id_col, text_col=text_col,
        )
    )
