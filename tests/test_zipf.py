"""Zipf fit: decreasing rank-frequency slope, exact Python replay."""

import math

from osm_to_netex_spark.operators import textstats


def test_zipf_slope_matches_replay(spark):
    # skewed synthetic corpus: term k appears ~ N/k times
    rows = []
    doc = 0
    for k in range(1, 40):
        for _ in range(200 // k):
            rows.append((doc, f"w{k:02d}"))
            doc += 1
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = textstats.zipf_fit(df, top_n=30).collect()[0]
    assert got["n"] == 30
    assert got["slope"] < 0

    # exact replay with the same 1e-6 quantization
    from collections import Counter

    c = Counter(t for _, t in rows)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    q = lambda x: round(math.log(x) * 1e6)
    pts = [(q(i + 1), q(f)) for i, (_, f) in enumerate(ranked)]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got["slope"] == slope
