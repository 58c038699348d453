"""Structural guard: no registry query lands without a SCALE.md posture row.

The bench-coverage discipline applied to the scale story (VERDICT r4
task 5): every QUERIES / ROWS_ONLY name must appear in SCALE.md — either
verbatim inside a strategy row (underscores match spaces/hyphens too,
e.g. ``ks_drift`` ↔ "KS drift") or in the per-query scale index at the
bottom of the file.  A query with no row has no recorded partition /
shuffle posture at 100 TB, which is how map_match shipped 2× over the
bench budget with nothing on file in round 4.

No exemption list: the fixture-corpus conversion queries have their own
index row (flagship-timed), so coverage is total by construction.
"""

from __future__ import annotations


def _normalize(text: str) -> str:
    return text.lower().replace("-", " ").replace("_", " ")


def test_every_registry_query_has_a_scale_row():
    from osm_to_netex_spark.plans import queries as Q

    scale = open("SCALE.md").read().lower()
    norm = _normalize(scale)
    names = sorted(set(Q.QUERIES) | set(Q.ROWS_ONLY))

    missing = [
        n for n in names if n not in scale and n.replace("_", " ") not in norm
    ]
    assert not missing, (
        f"registry queries with no SCALE.md posture row: {missing} — add a "
        f"strategy row or a per-query index line (LANDING.md step 8)"
    )
