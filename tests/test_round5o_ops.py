"""Round-5 batch O vs exact Python replays (LANDING.md step 5):
least-cost path reconstruction, language-ID confusion matrix.
"""

import heapq
import math
from collections import defaultdict

import pyarrow.parquet as pq

from osm_to_netex_spark.plans import queries as Q
from osm_to_netex_spark.plans import queries_r5c as R5C

from tests.test_round5c_ops import _raster

SF = "/root/testdata/sf0.001"


def test_lcp_path_matches_python_dijkstra_backtrack(spark):
    got = [
        (r["ix"], r["iy"], r["cost_q3"])
        for r in sorted(
            Q.QUERIES["lcp_path"][0](spark, SF).collect(),
            key=lambda r: r["step"],
        )
    ]
    ras = _raster()
    src = min(ras, key=lambda c: (ras[c], c[0], c[1]))
    offs = R5C._d8_offsets()
    dist = {src: 0}
    pq_ = [(0, src)]
    while pq_:
        d0, u = heapq.heappop(pq_)
        if d0 > dist[u]:
            continue
        for _, dx, dy, step_m in offs:
            v = (u[0] + dx, u[1] + dy)
            if v not in ras:
                continue
            w = math.floor(
                (step_m + 10.0 * abs(ras[v] - ras[u])) * 1.0e3 + 0.5
            )
            if d0 + w < dist.get(v, 1 << 62):
                dist[v] = d0 + w
                heapq.heappush(pq_, (d0 + w, v))

    def pred(c):
        # packed argmin replay: min over (cand_cost, src_ix, src_iy)
        best = None
        for _, dx, dy, step_m in offs:
            n = (c[0] - dx, c[1] - dy)  # n + (dx,dy) = c
            if n not in ras:
                continue
            w = math.floor(
                (step_m + 10.0 * abs(ras[c] - ras[n])) * 1.0e3 + 0.5
            )
            key = (dist[n] + w, n[0], n[1])
            if best is None or key < best:
                best = key
        return (best[1], best[2])

    target = max(dist.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))[0]
    path = [target]
    while path[-1] != src:
        path.append(pred(path[-1]))
    path.reverse()
    want = [(c[0], c[1], dist[c]) for c in path]
    assert got == want
    # path sanity: starts at source, strictly increasing cost, 8-connected
    assert got[0][:2] == src and got[0][2] == 0
    for a, b in zip(got, got[1:]):
        assert b[2] > a[2]
        assert max(abs(b[0] - a[0]), abs(b[1] - a[1])) == 1


def test_langid_confusion_matches_python_replay(spark):
    rows = Q.QUERIES["langid_confusion"][0](spark, SF).collect()
    got = {
        (r["true_lang"], r["pred_lang"]): (r["n"], r["n_true"])
        for r in rows
    }
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    from osm_to_netex_spark.operators.textstats import STOPWORDS

    conf = defaultdict(int)
    totals = defaultdict(int)
    for doc in docs:
        toks = doc["text"].lower().split()
        hits = {
            lang: sum(1 for t in toks if t in set(ws))
            for lang, ws in STOPWORDS.items()
        }
        best = max(hits.values())
        pred = (
            "und" if best == 0
            else sorted(l for l, h in hits.items() if h == best)[0]
        )
        conf[(doc["lang"], pred)] += 1
        totals[doc["lang"]] += 1
    want = {
        (t, p): (n, totals[t]) for (t, p), n in conf.items()
    }
    assert got == want
