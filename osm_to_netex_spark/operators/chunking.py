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
