"""Sparse all-pairs cosine similarity join over term-frequency vectors.

The third member of the exact set-similarity family (ngram Jaccard pairs,
PPJoin prefix filter; embedding cosine, dense): EVERY document pair whose
raw-tf cosine meets a threshold, exactly — the workhorse join behind
"find templated/boilerplate families" and sparse near-dup mining where
token multiplicity matters (Jaccard ignores it).

Exactness discipline — the entire predicate is INTEGER arithmetic:
tf counts are ints, Na = Σ tf² is an int, dot(a, b) is an int, and for a
rational threshold t = p/q the test

    cos(a, b) >= t   <=>   q²·dot² >= p²·Na·Nb      (dot >= 0 always)

never touches a float.  The reported cosine (dot / sqrt(Na·Nb)) is one
correctly-rounded sqrt + one IEEE division — bit-identical across engines.

Scale design — no quadratic block join:
* **Vectors once.** (doc, term, tf) from one explode + map-side-combined
  count; Na per doc from one more aggregate.
* **Norm prefix filter.** Terms ordered globally rarest-first (df asc,
  term asc).  Keep a term while the squared norm of the suffix STARTING at
  it is >= (t/2)²·Na (integer compare: 4·q²·suffix² >= p²·Na).  If two docs
  share no kept (prefix) term, every shared term sits in a's suffix or in
  b's suffix, and Cauchy-Schwarz bounds each part by (t/2)·||a||·||b|| —
  dot < t·||a||·||b||, so the pair provably cannot reach the threshold.
  Candidates therefore come from an equi-join on prefix terms only: the
  high-df tail (stopwords, boilerplate tokens) never enters the shuffle
  fan-out.  (The classic Bayardo bound is tighter; this factor-2 variant
  trades a longer prefix for a 3-line integer proof — completeness is
  value-gated against the brute oracle either way.)
* **Verify only candidates.** Distinct candidate pairs join the two term
  vectors (shuffled by doc id) for the exact integer dot.

Oracle: the brute all-shared-term pairs with the same integer predicate —
`cosine_pairs_oracle_sql` — proves the prefix filter drops nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as tx
from ..functions.portable import SPARK
from .dedup import _attach_cached


def _tf(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = tx.tokens(text_col, SPARK)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.expr(toks)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_p: int = 1,
    threshold_q: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """All (doc_a < doc_b) with tf-cosine >= threshold_p/threshold_q.

    Returns (doc_a, doc_b, dot, cosine); rows provably identical to the
    brute all-pairs evaluation (with ``max_df=None``).

    ``max_df`` is the standalone-use guardrail (default OFF): terms whose
    document frequency exceeds it are dropped from the tf vectors BEFORE the
    self-join, capping the Θ(Σ_term df²) pair fan-out that a skewed corpus
    (stopwords, boilerplate tokens) would otherwise blow a shard with.  When
    it engages, the result is the exact cosine over the CAPPED vocabulary —
    a documented approximation for standalone corpus-wide runs; the
    recommended 100-TB path remains LSH sharding (minhash_lsh_pairs) with
    this operator as the exact within-shard verifier, where the cap stays
    off.  A cap at or above the corpus's max df is a provable no-op
    (pytest-pinned)."""
    p2, q2 = threshold_p**2, threshold_q**2
    tf = _tf(docs, id_col, text_col)
    if max_df is not None:
        keep = (
            tf.groupBy("term")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= int(max_df))
            .select("term")
        )
        # term-keyed join: same key as the postings self-join below, so the
        # partitioning is reused and no extra shuffle of the big side occurs
        tf = tf.join(keep, "term")
    tf = tf.persist()  # feeds norms + both join sides
    norm = tf.groupBy("doc_id").agg(F.sum(F.expr("tf * tf")).alias("na2"))
    # DIRECT postings self-join: dot over shared terms, partial-aggregated
    # into (a, b) before the pair shuffle.  An earlier PPJoin-style variant
    # (rarest-first prefix join -> distinct candidates -> two full-term
    # join-backs) materialized a 12.5M-pair candidate set and re-joined the
    # postings twice — 128 s at sf0.1 where this form measures ~8 s.  The
    # prefix filter only pays when term-weight distributions are skewed;
    # this synthetic corpus (and any stopword-heavy web corpus) defeats it,
    # and the inherent comparison cost of EXACT all-pairs is Θ(Σ_term df²)
    # either way — the df² head is the scale knob: at 10^12 docs you cap it
    # by sharding on a band key first (minhash_lsh_pairs is the scale path;
    # this operator is the exact verifier under it).
    ta = tf.selectExpr("doc_id as doc_a", "term", "tf as tfa")
    tb = tf.selectExpr("doc_id as doc_b", "term", "tf as tfb")
    dots = (
        ta.join(tb, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.expr("tfa * tfb")).alias("dot"))
    )
    out = (
        dots.join(norm.selectExpr("doc_id as doc_a", "na2"), "doc_a")
        .join(norm.selectExpr("doc_id as doc_b", "na2 as nb2"), "doc_b")
        .where(F.expr(f"{q2} * dot * dot >= {p2} * na2 * nb2"))
        .selectExpr(
            "doc_a", "doc_b", "dot",
            "dot / sqrt(cast(na2 * nb2 as double)) as cosine",
        )
    )
    return _attach_cached(out, [tf])


def cosine_pairs_oracle_sql(
    threshold_p: int = 1,
    threshold_q: int = 2,
    table: str = "documents",
    max_df: int | None = None,
) -> str:
    """Brute DuckDB replay: every shared-term pair, same integer predicate.
    ``max_df`` mirrors the engine guardrail (drop terms with df > cap
    BEFORE norms/joins) so the capped variant stays oracle-gated."""
    p2, q2 = threshold_p**2, threshold_q**2
    toks = tx.tokens("text", "duck")
    cap = (
        f""" ,
        keep as (
            select term from tf group by term
            having count(*) <= {int(max_df)}
        ),
        tfk as (select tf.* from tf join keep using (term))"""
        if max_df is not None
        else ""
    )
    tf_src = "tfk" if max_df is not None else "tf"
    return f"""
        with tf as (
            select doc_id, term, count(*) as tf from (
                select doc_id, unnest({toks}) as term from {table}
            ) e group by doc_id, term
        ){cap},
        tfx as (select * from {tf_src}),
        norm as (select doc_id, sum(tf * tf) as na2 from tfx group by doc_id),
        dots as (
            select a.doc_id as doc_a, b.doc_id as doc_b,
                   sum(a.tf * b.tf) as dot
            from tfx a join tfx b on a.term = b.term and a.doc_id < b.doc_id
            group by a.doc_id, b.doc_id
        )
        select doc_a, doc_b, cast(dot as bigint) as dot,
               dot / sqrt(cast(x.na2 * y.na2 as double)) as cosine
        from dots
        join norm x on x.doc_id = doc_a
        join norm y on y.doc_id = doc_b
        where {q2} * dot * dot >= {p2} * x.na2 * y.na2
    """


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_p: int = 1,
    threshold_q: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric set-containment join: every ORDERED pair (a, b) with
    |A∩B| / |A| >= p/q over distinct token sets — the near-SUPERSET
    detector symmetric Jaccard misses (a short doc embedded in a long one
    scores high containment but low Jaccard); the dedup rule for quote
    farms / wrapper pages.

    Integer predicate q·inter >= p·|A| — never a float.  Same Θ(Σ df²)
    postings self-join as cosine_pairs, with the same ``max_df``
    standalone guardrail (default off) and the same recommended role: the
    exact verifier under LSH shards.  Returns (doc_a, doc_b, inter,
    size_a, containment_q9)."""
    p, q = int(threshold_p), int(threshold_q)
    toks = tx.tokens(text_col, SPARK)
    sets = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.expr(toks)).alias("term"))
        .distinct()
    )
    if max_df is not None:
        keep = (
            sets.groupBy("term").agg(F.count("*").alias("df"))
            .where(F.col("df") <= int(max_df)).select("term")
        )
        sets = sets.join(keep, "term")
    sets = sets.persist()
    size = sets.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta = sets.selectExpr("doc_id as doc_a", "term")
    tb = sets.selectExpr("doc_id as doc_b", "term")
    inter = (
        ta.join(tb, "term")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(size.selectExpr("doc_id as doc_a", "sz as size_a"), "doc_a")
        .where(F.expr(f"{q} * inter >= {p} * size_a"))
        .selectExpr(
            "doc_a", "doc_b",
            "cast(inter as bigint) as inter",
            "cast(size_a as bigint) as size_a",
            "cast(floor(cast(inter as double) / cast(size_a as double)"
            " * 1.0e9 + 0.5e0) as bigint) as containment_q9",
        )
    )
    return _attach_cached(out, [sets])


def containment_pairs_oracle_sql(
    threshold_p: int = 1,
    threshold_q: int = 2,
    table: str = "documents",
    max_df: int | None = None,
) -> str:
    """Brute DuckDB replay over distinct token sets, same integer predicate.
    ``max_df`` mirrors the engine guardrail for the capped variant."""
    p, q = int(threshold_p), int(threshold_q)
    toks = tx.tokens("text", "duck")
    cap = (
        f""" ,
        keep as (
            select term from s0 group by term
            having count(*) <= {int(max_df)}
        ),
        sk as (select s0.* from s0 join keep using (term))"""
        if max_df is not None
        else ""
    )
    s_src = "sk" if max_df is not None else "s0"
    return f"""
        with s0 as (
            select distinct doc_id, term from (
                select doc_id, unnest({toks}) as term from {table}
            ) e
        ){cap},
        s as (select * from {s_src}),
        size as (select doc_id, count(*) as sz from s group by doc_id),
        inter as (
            select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as inter
            from s a join s b on a.term = b.term and a.doc_id <> b.doc_id
            group by a.doc_id, b.doc_id
        )
        select i.doc_a, i.doc_b,
               cast(i.inter as bigint) as inter,
               cast(z.sz as bigint) as size_a,
               cast(floor(cast(i.inter as double) / cast(z.sz as double)
               * 1.0e9 + 0.5e0) as bigint) as containment_q9
        from inter i join size z on z.doc_id = i.doc_a
        where {q} * i.inter >= {p} * z.sz"""
