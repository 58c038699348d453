"""Perceptual-hash media near-dup: the SQL phash must equal the sign-bit
quantization of the Arrow-decoded feature vectors (closing the loop between
the mapInPandas plumbing and the Catalyst/DuckDB expression), the banded
candidate join must be complete vs brute force, and rows must be invariant
to input partitioning."""

import pyspark.sql.functions as F

from osm_to_netex_spark.operators import media


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_phash_equals_quantized_features(corpus):
    """bit i of the SQL phash == (features[i] >= 0.5) from the real
    mapInPandas decode — the quantization is the same number both ways."""
    feats = media.decode_media(media.extract_media_refs(corpus))
    from_features = feats.select(
        "media_ref",
        F.expr(
            "aggregate(zip_with(features, sequence(0, size(features) - 1), "
            "(f, i) -> case when f >= 0.5e0 then cast(shiftleft(1, cast(i as int)) as bigint) else 0L end), "
            "0L, (acc, x) -> acc + x)"
        ).alias("phash_feat"),
    ).distinct()
    from_sql = media.media_phash(corpus)
    joined = from_sql.join(from_features, "media_ref")
    n = joined.count()
    assert n == from_sql.count() > 0
    assert joined.where(F.col("phash") != F.col("phash_feat")).count() == 0


def test_banded_pairs_complete_vs_brute(corpus):
    ph = media.media_phash(corpus)
    a = ph.selectExpr("media_ref as ref_a", "phash as ph_a")
    b = ph.selectExpr("media_ref as ref_b", "phash as ph_b")
    brute = (
        a.join(b, F.col("ref_a") < F.col("ref_b"))
        .withColumn("hamming", F.expr("cast(bit_count(ph_a ^ ph_b) as int)"))
        .where(F.col("hamming") <= 3)
        .select("ref_a", "ref_b", "hamming")
    )
    banded = media.media_neardup_pairs(corpus, max_hamming=3)
    assert _rows(banded) == _rows(brute)
    assert banded.count() > 0


def test_partition_invariance(corpus):
    base = media.media_neardup_pairs(corpus)
    shuffled = media.media_neardup_pairs(corpus.repartition(13))
    assert _rows(base) == _rows(shuffled)


def test_max_hamming_guard(corpus):
    import pytest

    with pytest.raises(ValueError):
        media.media_neardup_pairs(corpus, max_hamming=media.PHASH_BANDS)
