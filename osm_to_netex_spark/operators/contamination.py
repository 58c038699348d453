"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation set.

The standard pretraining hygiene step (GPT-3 §C / Gopher §A.3 style): a
training document is contaminated when any of its n-gram shingles also
occurs in a held-out eval document.  Output is per-train-doc — the count of
DISTINCT shared shingles plus the contamination verdict — so the downstream
curation pipeline can drop or down-weight offenders.

Scale shape (the part that matters at 10^12 docs):

* The eval side is tiny relative to the corpus (benchmarks are thousands of
  documents, not billions).  Its distinct shingle-hash set is built once and
  BROADCAST — the train corpus is never shuffled by shingle.
* Shingles travel as 60-bit portable hashes (``phash60``), never as strings:
  the exploded train side carries (doc_id, bigint) rows only, and the
  broadcast set is one bigint column.  Hash collisions are deterministic and
  replayed identically by the oracle, so the gate is still bit-exact.
* Per-doc aggregation is a groupBy on doc_id over rows that survived the
  broadcast semi-join — map-side combinable, and the surviving row count is
  proportional to actual contamination, not corpus size.

The reference has no analogue (it is a format converter); this operator is
part of the engine's LLM-data-pipeline surface mandated by the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as tx
from ..functions.portable import DUCK, SPARK, phash60


def _shingle_hashes(text: str, n_shingle: int, d: str) -> str:
    """Array of 60-bit portable hashes of word n-gram shingles."""
    shingles = tx.word_shingles(text, n_shingle, d)
    if d == SPARK:
        return f"transform({shingles}, s -> {phash60('s', d)})"
    return f"list_transform({shingles}, s -> {phash60('s', d)})"


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n_shingle: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every training document.

    ``n_hits`` counts DISTINCT shingle hashes the doc shares with ANY eval
    document; ``contaminated`` is ``n_hits > 0``.  Clean docs appear with
    ``n_hits = 0`` so the result is a total annotation, not a filter.
    """
    sh = _shingle_hashes(text_col, n_shingle, SPARK)
    eval_set = (
        eval_docs.select(F.explode(F.expr(sh)).alias("h")).distinct()
    )
    train_sh = train.select(
        F.col(id_col).alias("doc_id"), F.explode(F.expr(sh)).alias("h")
    )
    hits = (
        train_sh.join(F.broadcast(eval_set), "h")
        .select("doc_id", "h")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    base = train.select(F.col(id_col).alias("doc_id"))
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate_oracle_sql(
    train_pred: str,
    eval_pred: str,
    n_shingle: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay: same shingle hashing, same distinct-hit counting."""
    sh = _shingle_hashes(text_col, n_shingle, DUCK)
    return f"""
        with train as (select {id_col} as doc_id, {text_col} as text
                       from {table} where {train_pred}),
        ev as (select {text_col} as text from {table} where {eval_pred}),
        eset as (select distinct unnest({sh}) as h from ev),
        tsh as (select doc_id, unnest({sh}) as h from train),
        hits as (select doc_id, count(distinct t.h) as n_hits
                 from tsh t join eset e on t.h = e.h
                 group by doc_id)
        select b.doc_id,
               cast(coalesce(h.n_hits, 0) as bigint) as n_hits,
               coalesce(h.n_hits, 0) > 0 as contaminated
        from train b left join hits h on b.doc_id = h.doc_id"""
