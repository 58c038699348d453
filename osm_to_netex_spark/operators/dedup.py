"""Deduplication suite over document corpora (training-data operators).

All variants are shuffle-conscious:

* exact: one md5-keyed groupBy (map-side combined);
* MinHash+LSH: signature → band buckets → within-bucket self-join → exact
  Jaccard verify.  The self-join shuffles only (band, bucket) groups — never
  the full cross product; bucket skew is AQE-split;
* SimHash: 32-bit fingerprint equality clusters (band-free);
* n-gram Jaccard: exact verify path reusable standalone;
* embedding near-dup: cosine over LSH sign-buckets (deterministic
  hyperplanes from the portable hash) with brute-force verify.

Every formula lives in functions.text / functions.portable, so the DuckDB
oracle reproduces the exact hashes/signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as tx
from ..functions.portable import SPARK, flit, phash60


def unpersist_intermediates(df: DataFrame) -> int:
    """Release the cached intermediates attached to a result DataFrame.

    The pair-finding operators persist corpus-derived intermediates (shingle
    sets, signatures, staged norms) that are consumed by two plan branches.
    Callers own the cache lifetime: materialize the result, then call this —
    otherwise the cached datasets stay in executor storage memory for the
    session (they persist at MEMORY_AND_DISK, so they spill rather than OOM,
    but they still accumulate).  Returns the number of handles released.
    """
    n = 0
    for h in getattr(df, "_graft_cached", ()):
        h.unpersist()
        n += 1
    return n


def _attach_cached(out: DataFrame, handles: list[DataFrame]) -> DataFrame:
    out._graft_cached = handles  # type: ignore[attr-defined]
    return out


def normalize_expr(col: str, d: str = SPARK) -> str:
    """Lower, trim, collapse whitespace — the exact-dup equivalence class."""
    return f"regexp_replace(trim(lower({col})), '\\\\s+', ' ')" if d == SPARK else \
        f"regexp_replace(trim(lower({col})), '\\s+', ' ', 'g')"


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One survivor (min id) per normalized-text equivalence class.

    Returns (content_key, n_dupes, survivor_id) for classes only; callers
    semi-join to keep survivors.  groupBy on a hash key → partial aggregation
    map-side; no row ever carries the full text through the shuffle.
    """
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"md5({normalize_expr(text_col)})").alias("content_key"),
    )
    return keyed.groupBy("content_key").agg(
        F.count("*").alias("n_dupes"), F.min("doc_id").alias("survivor_id")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    n_perm: int = 16,
) -> DataFrame:
    """Staged: base hashes (1 md5/shingle) as a column, then the affine
    permutation family — keeps md5 out of the per-permutation loop."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(tx.shingle_base_hashes(text_col, n_shingle, SPARK)).alias("mh_base"),
    ).select(
        "doc_id",
        F.expr(tx.minhash_from_base("mh_base", n_perm, SPARK)).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    n_perm: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-dup pairs: LSH candidates + exact verify.

    rows-per-band = n_perm / bands; band key = md5 of the signature slice.
    """
    rows = n_perm // bands
    # the verify set is the distinct *hashed* shingles (bigints travel the
    # self-join shuffle far cheaper than n-gram strings; md5-collision error
    # in the Jaccard estimate is ~2^-31 — negligible, and mirrored exactly by
    # the oracle which uses the same hashed sets)
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.expr(tx.shingle_base_hashes(text_col, n_shingle, SPARK)).alias("mh_base"),
        )
        .select(
            "doc_id",
            F.expr(tx.minhash_from_base("mh_base", n_perm, SPARK)).alias("sig"),
            F.expr("array_distinct(mh_base)").alias("shingles"),
        )
        .persist()  # shingle+signature computed once; reused by band AND verify
    )  # released via unpersist_intermediates (callers own the lifetime)
    # the band join carries ONLY (doc_id, band, bucket) — the shingle arrays
    # (hundreds of bigints per doc) never ride the candidate shuffle; they
    # re-join on the (small) surviving pair set for the exact verify
    banded = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> named_struct("
                f"'band', b, 'bucket', md5(concat_ws(',', slice(sig, b * {rows} + 1, {rows})))))"
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = base.select("doc_id", "shingles")
    jac = (
        "cast(size(array_intersect(sh_a, sh_b)) as double) / "
        "cast(size(array_union(sh_a, sh_b)) as double)"
    )
    out = (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a"
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b"
        )
        .withColumn("jaccard", F.round(F.expr(jac), 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return _attach_cached(out, [base])


def lsh_band_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    n_perm: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.4,
) -> DataFrame:
    """Banding diagnostics over the SAME LSH machinery as minhash_lsh_pairs:
    one row (n_candidates, n_verified, banding_precision, n_buckets,
    max_bucket).

    Shares the production operator's candidate-shuffle discipline — the
    persisted base computes shingles+signature ONCE (a pure-SQL CTE form
    gets CollapseProject-inlined and recomputes the md5 shingle pipeline
    per permutation, the minhash_signature docstring trap: measured 141 s
    vs ~7 s at sf0.1); the band self-join carries only (doc_id, band,
    bucket); pairs dedup on ids; shingle arrays re-join on survivors.
    """
    rows = n_perm // bands
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.expr(tx.shingle_base_hashes(text_col, n_shingle, SPARK)).alias("mh_base"),
        )
        .select(
            "doc_id",
            F.expr(tx.minhash_from_base("mh_base", n_perm, SPARK)).alias("sig"),
            F.expr("array_distinct(mh_base)").alias("shingles"),
        )
        .persist()
    )
    banded = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> named_struct("
                f"'band', b, 'bucket', md5(concat_ws(',', slice(sig, b * {rows} + 1, {rows})))))"
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    bstats = (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("bsz"))
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.max("bsz").cast("long").alias("max_bucket"),
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = base.select("doc_id", "shingles")
    # intersect-based union (|A|+|B|-|A∩B|) mirrors the oracle expression
    jac = (
        "cast(size(array_intersect(sh_a, sh_b)) as double) / "
        "cast(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)) as double)"
    )
    cstats = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b")
        .select(
            F.when(F.expr(f"round({jac}, 6) >= {flit(jaccard_threshold)}"), 1)
            .otherwise(0)
            .alias("hit")
        )
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            # empty candidate set: sum over zero rows is NULL — coalesce to
            # 0 so the output stays scalar-only (gate discipline)
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_verified"),
        )
    )
    out = cstats.crossJoin(bstats).select(
        "n_candidates",
        "n_verified",
        # 0/0 on an empty candidate set → precision 0.0, not NULL
        F.when(F.col("n_candidates") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("n_verified").cast("double") / F.col("n_candidates").cast("double"),
                9,
            )
        )
        .alias("banding_precision"),
        "n_buckets",
        "max_bucket",
    )
    return _attach_cached(out, [base])


def simhash_clusters(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(simhash, n_docs, member_ids) clusters with ≥2 members (near-dup sets)."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"), F.expr(tx.simhash64(text_col, SPARK)).alias("simhash")
    )
    return (
        fp.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.array_sort(F.collect_list("doc_id")).alias("member_ids"))
        .where(F.col("n_docs") >= 2)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    threshold: float = 0.5,
    prefilter_key: str | None = "lang",
) -> DataFrame:
    """EXACT pairwise n-gram Jaccard ≥ threshold via a prefix-filtered
    set-similarity join (PPJoin-style) — no quadratic block join anywhere.

    Classic prefix-filter bound: order every doc's distinct shingle set by a
    global total order (portable hash, ties by value); if J(A, B) ≥ t then A
    and B must share at least one element within their prefixes of length
    |X| − ⌈t·|X|⌉ + 1.  So candidate pairs come from an equi-join on
    (block, prefix-shingle) — fan-out ∝ docs × prefix length, shuffled by
    shingle — followed by the exact intersection/union verify on the
    candidate set only.  A length filter (t·|B| ≤ |A| ≤ |B|/t, also exact)
    prunes candidates before the verify.  Same rows as the brute-force
    all-pairs oracle, provably.
    """
    blk = F.col(prefilter_key) if prefilter_key else F.lit("_")
    shingled = docs.select(
        F.col(id_col).alias("doc_id"),
        blk.alias("blk"),
        F.expr(
            f"array_distinct({tx.word_shingles(text_col, n_shingle, SPARK)})"
        ).alias("sh0"),
    ).persist()  # tokenize+shingle once (df-count AND re-agg); caller-released

    # document frequency per (block, shingle): the global prefix order is
    # RAREST-FIRST (df asc, shingle asc) — the canonical PPJoin ordering.
    # Template phrases shared by most docs land at the END of every sorted
    # set, so they never enter a prefix and the prefix join's per-key
    # fan-out (∝ Σ freq²) collapses to the rare-shingle tail.
    ex = shingled.select("doc_id", "blk", F.explode("sh0").alias("s"))
    dfreq = ex.groupBy("blk", "s").count().withColumnRenamed("count", "df")
    base = (
        ex.join(dfreq, ["blk", "s"])
        .groupBy("doc_id", "blk")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(df, s))), p -> p.s)").alias("sh")
        )
        .withColumn("n", F.expr("size(sh)"))
        .persist()
    )
    # prefix length: n - ceil(t*n) + 1 (0 for empty sets → no candidates,
    # matching the oracle: an empty shingle set has no Jaccard ≥ t > 0 pair).
    # ceil takes t*n MINUS an epsilon: when t·n is mathematically integral
    # but the float product rounds a hair high, a bare ceil would shorten
    # the prefix by one and drop exact-boundary pairs; the epsilon makes
    # ties round down — conservative lengthening only ever ADDS candidates
    pref = base.select(
        "doc_id",
        "blk",
        "n",
        F.expr(
            f"explode(slice(sh, 1, greatest(0, n - cast(ceil({threshold} * n - 1e-9) as int) + 1)))"
        ).alias("p_sh"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_sh") == F.col("b.p_sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # exact length filter: J >= t forces t·|B| <= |A| <= |B|/t;
            # epsilon guards the float product at the exact boundary
            & (F.col("a.n") * F.lit(threshold) - F.lit(1e-9) <= F.col("b.n"))
            & (F.col("b.n") * F.lit(threshold) - F.lit(1e-9) <= F.col("a.n")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = base.select("doc_id", "sh")
    jac = (
        "cast(size(array_intersect(a_sh, b_sh)) as double) / "
        "cast(size(array_union(a_sh, b_sh)) as double)"
    )
    out = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("a_sh")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("b_sh")), "doc_b")
        .withColumn("jaccard", F.round(F.expr(jac), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return _attach_cached(out, [shingled, base])


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------
def cosine_expr(a: str, b: str, d: str = SPARK) -> str:
    """Portable cosine over float-array columns (cast to double, fold l→r)."""
    if d == SPARK:
        dot = f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0.0e0, (s, v) -> s + v)"
        na = f"sqrt(aggregate({a}, 0.0e0, (s, x) -> s + cast(x as double) * cast(x as double)))"
        nb = f"sqrt(aggregate({b}, 0.0e0, (s, x) -> s + cast(x as double) * cast(x as double)))"
    else:
        dot = (
            f"list_reduce(list_prepend(0.0e0, list_transform(list_zip({a}, {b}), "
            f"p -> cast(p[1] as double) * cast(p[2] as double))), (s, v) -> s + v)"
        )
        na = f"sqrt(list_reduce(list_prepend(0.0e0, list_transform({a}, x -> cast(x as double) * cast(x as double))), (s, v) -> s + v))"
        nb = f"sqrt(list_reduce(list_prepend(0.0e0, list_transform({b}, x -> cast(x as double) * cast(x as double))), (s, v) -> s + v))"
    return f"(({dot}) / nullif(({na}) * ({nb}), 0.0e0))"


def hyperplane_bits(vec: str, n_bits: int, dim: int, d: str = SPARK, seed: str = "") -> str:
    """Deterministic LSH sign-signature: bit h = sign(vec · plane_h), planes
    from the portable hash (plane_h[i] = prand('h:i') - 0.5).  Same planes in
    both engines → same buckets.  ``seed`` derives an INDEPENDENT plane set
    (the ensemble recall knob); the default keeps the original planes."""
    styp = "string" if d == SPARK else "varchar"
    plane_key = f"concat('pl{seed}:', cast(h as {styp}), ':', cast(i as {styp}))"
    plane_i = f"({phash60(plane_key, d)} / {flit(float(2**60))} - 0.5e0)"
    if d == SPARK:
        dot = (
            f"aggregate(sequence(1, {dim}), 0.0e0, (s, i) -> "
            f"s + cast(element_at({vec}, cast(i as int)) as double) * {plane_i})"
        )
        bit = f"CASE WHEN ({dot}) > 0.0e0 THEN shiftleft(cast(1 as bigint), cast(h as int)) ELSE cast(0 as bigint) END"
        return f"aggregate(sequence(0, {n_bits - 1}), cast(0 as bigint), (acc, h) -> acc + ({bit}))"
    dot = (
        f"list_reduce(list_prepend(0.0e0, list_transform(generate_series(1, {dim}), i -> "
        f"cast(list_extract({vec}, i) as double) * {plane_i})), (s, v) -> s + v)"
    )
    bit = f"CASE WHEN ({dot}) > 0.0e0 THEN (cast(1 as bigint) << h) ELSE cast(0 as bigint) END"
    return (
        f"cast(coalesce(list_aggregate(list_transform(generate_series(0, {n_bits - 1}), "
        f"h -> {bit}), 'sum'), 0) as bigint)"
    )


def auto_n_bits(
    n_vectors: int, target_bucket_size: int = 1000, lo: int = 4, hi: int = 30
) -> int:
    """Bucketing width that keeps the per-bucket verify quadratic bounded:
    n_bits = ⌈log2(N / target)⌉ ⇒ expected bucket size ≤ target (uniform
    case), so verify work is N·target, linear in the corpus.

    Recall/threshold interaction: for random hyperplanes a pair at angle θ
    collides with probability (1 − θ/π)^n_bits, so raising n_bits trades
    recall at the threshold boundary for bounded buckets — at
    cos_threshold 0.95 (θ ≈ 18°) each extra bit keeps ~0.9 of the pairs,
    while near-identical vectors (θ → 0) survive any width.  Run multiple
    independent bucketings (different plane seeds) to recover recall if the
    boundary matters.
    """
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(1.0, n_vectors / target_bucket_size)))))


def embedding_near_dup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 32,
    n_bits: int | None = 8,
    cos_threshold: float = 0.95,
    target_bucket_size: int = 1000,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold, bucketed by LSH sign
    signature first (candidates must agree on all n_bits) then verified.

    n_bits=None derives the width from the corpus size via ``auto_n_bits``
    (one count() of the id column — cheap metadata-level job), keeping the
    bucket-size² verify bounded as the corpus grows; pass an explicit n_bits
    to pin the bucketing (e.g. for oracle replay)."""
    if n_bits is None:
        n_bits = auto_n_bits(embeddings.count(), target_bucket_size)
    # norms staged per VECTOR (O(N) work) so the per-PAIR verify — the part
    # that multiplies by bucket-size² — evaluates only the dot product.
    # Identical IEEE op sequence to the inline form: sqrt(Σx²) per side,
    # dot / (na·nb) — bit-for-bit the oracle's value.
    sig = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.expr(
            f"sqrt(aggregate({vec_col}, 0.0e0, (s, x) -> s + cast(x as double) * cast(x as double)))"
        ).alias("nrm"),
        F.expr(hyperplane_bits(vec_col, n_bits, dim, SPARK)).alias("bucket"),
    ).persist()  # caller-released via unpersist_intermediates
    a, b = sig.alias("a"), sig.alias("b")
    dot = (
        "aggregate(zip_with(a.vec, b.vec, (x, y) -> cast(x as double) * cast(y as double)), "
        "0.0e0, (s, v) -> s + v)"
    )
    cos = f"(({dot}) / nullif(a.nrm * b.nrm, 0.0e0))"
    out = (
        a.join(b, "bucket")
        .where(F.col("a.vid") < F.col("b.vid"))
        .withColumn("cos", F.round(F.expr(cos), 6))
        .where(F.col("cos") >= cos_threshold)
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"), "cos")
    )
    return _attach_cached(out, [sig])


def embedding_near_dup_ensemble(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 32,
    n_bits: int = 8,
    n_seeds: int = 3,
    cos_threshold: float = 0.95,
) -> DataFrame:
    """``embedding_near_dup`` with the recall mitigation SHIPPED as an
    operator (SCALE.md known-limit #2 closed in r5): ``n_seeds``
    independent hyperplane sets each produce a candidate bucketing; the
    union of their same-bucket pairs is verified ONCE against the exact
    cosine.  A pair at angle θ survives at least one of s independent
    bucketings with probability 1 − (1 − (1 − θ/π)^n_bits)^s, so recall at
    the threshold boundary rises geometrically in seeds while the verify
    stays bounded (expected extra candidates scale linearly in seeds, and
    duplicates collapse in the ids-only distinct BEFORE vectors re-join —
    the lsh_band_stats candidate-shuffle discipline).

    Scale: ONE corpus scan computes all seed signatures + the norm; per
    seed a (vid, bucket) self-join carries ids only; vectors cross the
    shuffle exactly twice (the two sides of the verify join)."""
    sig = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.expr(
            f"sqrt(aggregate({vec_col}, 0.0e0, (s, x) -> s + cast(x as double) * cast(x as double)))"
        ).alias("nrm"),
        *[
            F.expr(hyperplane_bits(vec_col, n_bits, dim, SPARK, seed=_seed_tag(s))).alias(
                f"bucket_{s}"
            )
            for s in range(n_seeds)
        ],
    ).persist()  # caller-released via unpersist_intermediates
    cand = None
    for s in range(n_seeds):
        ids = sig.select("vid", F.col(f"bucket_{s}").alias("bucket"))
        a, b = ids.alias("a"), ids.alias("b")
        pairs = (
            a.join(b, "bucket")
            .where(F.col("a.vid") < F.col("b.vid"))
            .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    dot = (
        "aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), "
        "0.0e0, (s, v) -> s + v)"
    )
    cos = f"(({dot}) / nullif(na * nb, 0.0e0))"
    out = (
        cand.join(
            sig.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")),
            "id_a",
        )
        .join(
            sig.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")),
            "id_b",
        )
        .withColumn("cos", F.round(F.expr(cos), 6))
        .where(F.col("cos") >= cos_threshold)
        .select("id_a", "id_b", "cos")
    )
    return _attach_cached(out, [sig])


def _seed_tag(s: int) -> str:
    """Plane-set tag for seed ``s``: seed 0 keeps the original planes (the
    single-seed operator's buckets are the ensemble's first member)."""
    return "" if s == 0 else f"s{s}"


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(doc_id, component) for every vertex of the pair graph; component =
    min vertex id reachable from the vertex.  Turns near-dup PAIRS into
    dedup GROUPS (keep the component representative, drop the rest) — the
    step that makes the pair-finders actionable at corpus scale.

    Alternating large-star / small-star (the DataFrame form of Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14 —
    reimplemented from the paper's algorithm statement, no code):

    * large-star: every node points its STRICTLY LARGER neighbors at the
      minimum of its closed neighborhood;
    * small-star: every node points its not-larger neighbors (and itself)
      at that minimum.

    Each half-round is one groupBy (min per node) + one join back to the
    adjacency — two shuffles, no driver-side vertex data; the paper proves
    O(log n) rounds to a forest of stars rooted at each component's min.
    Real near-dup clusters are dense and finish in 2-3 rounds.  The edge
    multiset is distinct-ed and localCheckpoint-ed per round, so the plan
    depth and the shuffle volume both stay bounded; convergence is an edge
    multiset fixpoint (count + order-free checksum — both already computed
    by one tiny agg on the checkpointed frame).  Skewed high-degree roots
    (one giant dup cluster) are exactly the AQE skew-join / salting case
    documented in operators/skew.py.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star(e: DataFrame, large: bool) -> DataFrame:
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
        joined = sym.join(mins, "a")
        kept = joined.where(F.col("b") > F.col("a")) if large else (
            joined.where(F.col("b") <= F.col("a"))
        )
        out = kept.select(F.col("b").alias("a"), F.col("m").alias("b"))
        if not large:
            out = out.union(mins.select(F.col("a"), F.col("m").alias("b")))
        return out.where(F.col("a") != F.col("b")).distinct()

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("chk"),
        ).collect()[0]
        return row["n"], row["chk"]

    fp = fingerprint(edges)
    for _ in range(max_rounds):
        edges = star(star(edges, large=True), large=False).localCheckpoint(eager=True)
        nfp = fingerprint(edges)
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # converged: every edge is (v, component_min) with v > min; roots close over
    roots = edges.select(F.col("b").alias("doc_id")).distinct()
    return (
        edges.select(F.col("a").alias("doc_id"), F.col("b").alias("component"))
        .union(roots.withColumn("component", F.col("doc_id")))
    )


def dup_spans_sql(
    d: str,
    table: str = "documents",
    min_len: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Exact substring deduplication, span-detection stage (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a token
    position is *duplicated* when it is covered by any ``min_len``-token
    window whose exact text occurs >= ``min_count`` times corpus-wide
    (across docs OR repeated inside one doc — the paper's criterion).
    Covered positions merge into maximal duplicate runs per document.

    One dual-dialect SQL string; the reference paper's suffix-array pass is
    replaced by the shuffle-friendly equivalent: every window travels the
    corpus-wide aggregation as a 60-bit portable hash (24-byte rows), never
    as text, and the run merge is the same gaps-and-islands pattern as
    trips/stay_points — windows at positions p, p' overlap or touch iff
    p' - p <= min_len, so a run's coverage is [min(pos), max(pos)+min_len-1]
    with no holes.  Hash collisions (~2^-60 per distinct-window pair) could
    mark a non-duplicate span; the oracle replays identical hashes so the
    gate stays exact.

    Output: (doc_id, span_seq, start_tok, end_tok, n_tokens, n_windows),
    token positions 1-based, span_seq 1-based per doc in position order.
    Docs shorter than min_len tokens yield no windows and no spans.

    Scale shape: window generation is scan-parallel (explode, no shuffle);
    one map-side-combined groupBy on the 60-bit hash (the corpus's distinct
    window vocabulary); one hash-keyed semi join back; the islands window
    partitions by doc over the *duplicated* positions only (<= corpus
    tokens, typically a small fraction).  No all-pairs stage anywhere.
    Reference has no text surface; engine-side (SURVEY §2.3).
    """
    from ..functions import text as _tx

    L = int(min_len)
    toks = _tx.tokens(text_col, d)
    if d == SPARK:
        win_txt = "array_join(slice(tk, pos, {L}), ' ')".format(L=L)
        explode_from = (
            f"from sized lateral view explode(case when n >= {L} then "
            f"sequence(1, n - {L} + 1) else array() end) t as pos"
        )
        size_fn = "size"
    else:
        win_txt = f"array_to_string(list_slice(tk, pos, pos + {L} - 1), ' ')"
        explode_from = (
            f"from sized, unnest(case when n >= {L} then "
            f"generate_series(1, n - {L} + 1) else [] end) t(pos)"
        )
        size_fn = "len"
    wh = phash60(win_txt, d)
    return f"""
        with toks as (
            select {id_col} as doc_id, {toks} as tk from {table}
        ),
        sized as (
            select doc_id, tk, cast({size_fn}(tk) as bigint) as n from toks
        ),
        wins as (
            select doc_id, cast(pos as bigint) as pos, {wh} as wh
            {explode_from}
        ),
        dup as (
            select wh from wins group by wh having count(*) >= {int(min_count)}
        ),
        dwin as (
            select w.doc_id, w.pos from wins w join dup using (wh)
        ),
        flagged as (
            select doc_id, pos,
                   case when lag(pos) over w is null
                             or pos - lag(pos) over w > {L}
                        then 1 else 0 end as brk
            from dwin
            window w as (partition by doc_id order by pos asc)
        ),
        runs as (
            select doc_id, pos,
                   cast(sum(brk) over (partition by doc_id order by pos asc
                                       rows between unbounded preceding
                                       and current row) as bigint) as run_id
            from flagged
        ),
        spans as (
            select doc_id, run_id,
                   min(pos) as start_tok,
                   max(pos) + {L} - 1 as end_tok,
                   cast(count(*) as bigint) as n_windows
            from runs group by doc_id, run_id
        )
        select doc_id,
               cast(row_number() over (partition by doc_id
                                       order by start_tok asc) as bigint)
                   as span_seq,
               start_tok, end_tok,
               end_tok - start_tok + 1 as n_tokens,
               n_windows
        from spans
    """


def dup_spans(
    docs: DataFrame,
    min_len: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DataFrame wrapper for :func:`dup_spans_sql` (Spark dialect)."""
    spark = docs.sparkSession
    docs.createOrReplaceTempView("__dup_span_docs")
    return spark.sql(
        dup_spans_sql(
            SPARK,
            "__dup_span_docs",
            min_len=min_len,
            min_count=min_count,
            id_col=id_col,
            text_col=text_col,
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via embedding-cluster pruning
# ---------------------------------------------------------------------------
def _semdedup_dot(a: str, b: str, d: str) -> str:
    """Integer dot product of two quantized vectors (dual-dialect)."""
    if d == SPARK:
        prods = f"zip_with({a}, {b}, (x, y) -> x * y)"
        return f"aggregate({prods}, 0L, (s, v) -> s + v)"
    prods = f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])"
    return f"list_reduce(list_prepend(cast(0 as bigint), {prods}), (s, v) -> s + v)"


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    p: int = 1,
    q: int = 4,
    bits: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): prune semantically
    redundant items by clustering embeddings (k-means) and dropping, within
    each cluster, every item whose cosine to a SMALLER-ID cluster-mate is
    >= p/q (keep-first representative rule — deterministic, order-free).

    Exactness: vectors are quantized to integers (2^bits scale) and the
    cosine test runs as pure integer algebra — cos >= p/q iff dot > 0 and
    q²·dot² >= p²·|a|²·|b|² — so the threshold is never float-rounded and
    both engines agree bit-for-bit.  With bits=9, dim<=64, |x|<=1 every
    intermediate fits int64 (dot² <= 2^48, p²·Na·Nb <= p²·2^48).

    Scale: the pair join is CLUSTER-keyed — O(Σ c_i²), never corpus² — and
    SemDeDup's own recipe (k grows with n, cluster size stays ~constant)
    bounds c_i; the k-means step is the fixed-point operator whose shuffles
    are one groupBy per iteration.  Returns (vec_id, cluster, keep).
    """
    from .clustering import _quant_expr, kmeans_fixed_point

    if p * p > (1 << 14):
        raise ValueError("p too large for the int64 overflow budget")
    assigned = kmeans_fixed_point(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    qv = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(_quant_expr(vec_col, bits, SPARK)).alias("qv"),
    ).withColumn("n2", F.expr(_semdedup_dot("qv", "qv", SPARK)))
    v = assigned.join(qv, "vid")
    a = v.select(
        F.col("cluster"), F.col("vid").alias("vid_a"),
        F.col("qv").alias("qv_a"), F.col("n2").alias("n2_a"),
    )
    b = v.select(
        F.col("cluster"), F.col("vid").alias("vid_b"),
        F.col("qv").alias("qv_b"), F.col("n2").alias("n2_b"),
    )
    dot = _semdedup_dot("qv_a", "qv_b", SPARK)
    pruned = (
        a.join(b, "cluster")
        .where(F.col("vid_a") < F.col("vid_b"))
        .where(F.expr(
            f"({dot}) > 0 and {q * q} * ({dot}) * ({dot}) >= {p * p} * n2_a * n2_b"
        ))
        .select(F.col("vid_b").alias("vid"))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    return (
        assigned.join(pruned, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            F.coalesce(~F.col("__pruned"), F.lit(True)).alias("keep"),
        )
    )


def semdedup_oracle_sql(
    k: int = 8,
    iters: int = 3,
    p: int = 1,
    q: int = 4,
    bits: int = 9,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay: the k-means oracle as a derived table + the same
    integer cosine keep-first rule."""
    from .clustering import _quant_expr, kmeans_oracle_sql

    from ..functions.portable import DUCK

    km = kmeans_oracle_sql(
        k=k, iters=iters, dim=dim, table=table, id_col=id_col, vec_col=vec_col
    )
    quant = _quant_expr(vec_col, bits, DUCK)
    n2 = _semdedup_dot("qv", "qv", DUCK)
    dot = _semdedup_dot("a.qv", "b.qv", DUCK)
    return f"""
        with km as ({km}),
        qv as (select {id_col} as vid, {quant} as qv from {table}),
        v as (select km.vid, km.cluster, qv.qv, {n2} as n2
              from km join qv using (vid)),
        pruned as (
            select distinct b.vid as vid
            from v a join v b on a.cluster = b.cluster and a.vid < b.vid
            where ({dot}) > 0
              and {q * q} * ({dot}) * ({dot}) >= {p * p} * a.n2 * b.n2
        )
        select v.vid as {id_col}, v.cluster as cluster,
               (pruned.vid is null) as keep
        from v left join pruned on v.vid = pruned.vid
    """


def keep_best_dedup(
    docs: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-aware near-dup deduplication: (doc_id, grp, quality_q6, kept)
    where grp is the near-duplicate component (singletons are their own
    group) and ``kept`` marks exactly ONE survivor per group — the highest
    quality, ties to the smallest id.  This is what production pipelines
    actually do with duplicate groups: keep the best copy, not an arbitrary
    one (min-id) nor all.

    Quality is the gated textstats composite, half-up-quantized to bigint
    1e-6 units so the ranking key is integer-exact cross-engine.

    Scale: pairs/components from the banded-LSH + alternating-star
    machinery (their bounds apply); the ranking window partitions by group
    — group sizes are near-dup family sizes, never corpus-scale."""
    from pyspark.sql import Window

    from .textstats import quality_score_expr

    pairs = minhash_lsh_pairs(
        docs, n_perm=n_perm, bands=bands, jaccard_threshold=jaccard_threshold
    )
    comp = connected_components(pairs)
    q = docs.selectExpr(
        f"{id_col} as doc_id",
        f"cast(floor(({quality_score_expr(text_col)}) * 1.0e6 + 0.5e0)"
        " as bigint) as quality_q6",
    )
    lab = q.join(comp, "doc_id", "left").selectExpr(
        "doc_id",
        "cast(coalesce(component, doc_id) as bigint) as grp",
        "quality_q6",
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("quality_q6").desc(), F.col("doc_id").asc()
    )
    out = (
        lab.withColumn("rk", F.row_number().over(w))
        .selectExpr("doc_id", "grp", "quality_q6", "(rk = 1) as kept")
    )
    return _attach_cached(out, [pairs])
