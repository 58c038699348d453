"""Fuzzy record linkage: blocked edit-distance join against a name dictionary.

The entity-resolution step of a data-curation pipeline: match dirty /
OCR-corrupted / user-typed strings back to a canonical dictionary under a
bounded Levenshtein distance.  The reference resolves entities by exact OSM
id (`OsmToNetexMapper.java` joins relation members to ways by ref id); this
is the approximate analogue a web-scale corpus needs when keys are gone and
only noisy surface forms remain.

Scale design (probe side = the corpus, 10^12 rows; dictionary = dimension):

* **Broadcast dictionary.** The clean-name dictionary is a true dimension
  table (thousands to low millions of rows) — broadcast it; the corpus is
  never shuffled, the whole match is scan-parallel map-side work.
* **Length-band prefilter.** ``levenshtein(a, b) >= abs(len(a) - len(b))``,
  so the join predicate carries ``abs(length(dirty) - length(clean)) <=
  max_dist`` — a cheap integer test that eliminates most candidate pairs
  before any O(|a|·|b|) distance evaluation.  With a pre-bucketed dictionary
  (group names by length) the candidate set per probe is only the
  2·max_dist+1 adjacent length buckets.
* **Bounded-distance reject.** Spark's ``levenshtein(l, r, threshold)``
  3-arg form (Spark 3.5+) early-abandons the DP once the running minimum
  exceeds the bound — O(max_dist·len) per pair instead of O(len²).
* **Argmin without a second shuffle.** Best match per probe is resolved with
  ``min_by`` over a deterministic (dist, name) pair — a hash aggregate on
  the probe key that AQE map-side-combines; no window sort needed.
* **If the dictionary outgrows broadcast** (>~1 GB) flip to an equi-join on
  the length-bucket key (probe emits its 2·max_dist+1 bucket keys via
  explode) — same dual strategy as pip.py's cell join; candidates stay
  linear in corpus size either way.

Degenerate inputs: a probe with no dictionary name within ``max_dist`` is
dropped (inner join) — callers wanting unmatched rows use a left join on the
returned keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_match(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_key: str = "rec_id",
    dirty_col: str = "dirty_name",
    clean_col: str = "name",
    max_dist: int = 2,
    strategy: str = "broadcast",
) -> DataFrame:
    """(dirty_key, dirty_col, match_name, dist): the closest dictionary name
    within ``max_dist`` edits of each dirty string; ties broken by the
    lexicographically smallest name (deterministic across partitionings).

    strategy="broadcast": dictionary broadcast, non-equi length-band join —
    the probe corpus never shuffles.  strategy="bucket": the dictionary is
    keyed by string length and each probe explodes its 2·max_dist+1
    candidate lengths into an EQUI-join key — a plain hash join that scales
    past the broadcast threshold (the pip.py dual-strategy shape).  Both
    strategies produce identical rows (the length band is exactly the
    bucket set)."""
    d = dirty.select(F.col(dirty_key), F.col(dirty_col))
    c = clean.select(F.col(clean_col).alias("__clean")).distinct()
    if strategy == "bucket":
        probe = d.withColumn(
            "__blen",
            F.explode(
                F.sequence(
                    F.length(F.col(dirty_col)) - max_dist,
                    F.length(F.col(dirty_col)) + max_dist,
                )
            ),
        ).where(F.col("__blen") >= 1)
        dic = c.withColumn("__blen", F.length(F.col("__clean")))
        cand = probe.join(dic, "__blen").drop("__blen")
    else:
        cand = d.join(
            F.broadcast(c),
            F.abs(F.length(F.col(dirty_col)) - F.length(F.col("__clean"))) <= max_dist,
            "inner",
        )
    cand = cand.withColumn(
        # 3-arg form early-abandons the DP past the bound and returns -1
        "__dist",
        F.levenshtein(F.col(dirty_col), F.col("__clean"), max_dist),
    )
    cand = cand.where(F.col("__dist") >= 0)
    # argmin by (dist, name): encode as a struct so one min_by resolves both
    best = cand.groupBy(dirty_key, dirty_col).agg(
        F.min(F.struct(F.col("__dist"), F.col("__clean"))).alias("__best")
    )
    return best.select(
        F.col(dirty_key),
        F.col(dirty_col),
        F.col("__best.__clean").alias("match_name"),
        F.col("__best.__dist").alias("dist"),
    )
