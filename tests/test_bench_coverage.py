"""Structural guard: no registry query lands without a bench timing row.

lsh_band_stats shipped at 172.7 s in round 3 because the last five commits
never saw a bench run — the per-query list in bench.py is the timing
record the driver snapshots, so every QUERIES entry must appear there
unless it is on the documented exclusion list below (with the reason).
"""

from __future__ import annotations

import re


# name -> why it is not in the per-query bench list
BENCH_EXCLUDED = {
    # conversion pipeline: fixture-corpus queries (tests/fixtures/), timed
    # end-to-end by the flagship, not by the sf-dir per-query loop
    "zone_mapping": "fixture corpus",
    "convert_tariffzone": "fixture corpus",
    "convert_farezone": "fixture corpus",
    "convert_farezone_groups": "fixture corpus",
    "doc_tile_assign": "fixture corpus",
    "conversion_metrics": "fixture corpus",
    # exact Θ(Σ df²) verifiers: bench runs the capped scale-posture rows
    # (cosine_pairs_capped / containment_capped); uncapped rows stay in
    # the oracle suite as the LSH-shard verifiers (SCALE.md)
    "cosine_pairs": "capped variant benched",
    "containment": "capped variant benched",
    # streaming queries: micro-batch trigger latency dominates any sf0.1
    # timing (they measure the trigger, not the operator); correctness is
    # oracle/pytest-gated, throughput posture documented in SCALE.md
    "streaming_dedup": "trigger-latency-dominated",
    "streaming_sessions": "trigger-latency-dominated",
    "streaming_topk": "trigger-latency-dominated",
    "streaming_interval_join": "trigger-latency-dominated",
    "streaming_tiles": "trigger-latency-dominated",
    "streaming_trend": "trigger-latency-dominated",
    "streaming_hist": "trigger-latency-dominated",
    "stream_enrich": "trigger-latency-dominated",
}


def test_every_registry_query_has_a_bench_row():
    from osm_to_netex_spark.plans import queries as Q

    src = open("bench.py").read()
    m = re.search(r"bench_queries = \[(.*?)\n    \]", src, re.S)
    assert m, "bench_queries list not found in bench.py"
    bench = set(re.findall(r'"([a-z0-9_]+)"', m.group(1)))

    unknown = bench - set(Q.QUERIES)
    assert not unknown, f"bench times unknown queries: {sorted(unknown)}"

    missing = set(Q.QUERIES) - bench - set(BENCH_EXCLUDED)
    assert not missing, (
        f"registry queries with no bench timing row and no documented "
        f"exclusion: {sorted(missing)} — add to bench.py bench_queries "
        f"(LANDING.md step 8) or document the exclusion here"
    )

    stale = set(BENCH_EXCLUDED) - set(Q.QUERIES)
    assert not stale, f"exclusions for unknown queries: {sorted(stale)}"

    double = set(BENCH_EXCLUDED) & bench
    assert not double, f"excluded AND benched: {sorted(double)}"
