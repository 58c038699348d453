"""Span-corruption semantics: lossless round-trip (input + target rebuild
the token stream), per-block mask accounting, short-doc passthrough, and
partition invariance."""

import re

from osm_to_netex_spark.operators import chunking

SENT = re.compile(r"^<extra_id_(\d+)>$")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _tokens(text):
    return [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


def _rebuild(input_text, target_text):
    """Substitute each sentinel in input with its target span."""
    spans = {}
    cur = None
    for tok in target_text.split():
        m = SENT.match(tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out = []
    for tok in input_text.split():
        m = SENT.match(tok)
        out.extend(spans[int(m.group(1))] if m else [tok])
    return out


def test_round_trip_rebuilds_every_doc(spark):
    rows = [
        (i, " ".join(f"tok{i}w{j}" for j in range(5 + (i * 17) % 80)))
        for i in range(1, 25)
    ]
    out = chunking.span_corruption(_docs(spark, rows), block=24, span_len=3).collect()
    assert len(out) == 24
    for r in out:
        original = _tokens(dict(rows)[r.doc_id])
        assert _rebuild(r.input_text, r.target_text) == original
        assert r.n_tokens == len(original)


def test_mask_accounting_and_sentinel_numbering(spark):
    n = 50  # two full 24-blocks + 2-token tail
    rows = [(1, " ".join(f"w{j}" for j in range(n)))]
    r = chunking.span_corruption(_docs(spark, rows), block=24, span_len=3).collect()[0]
    assert r.n_masked_spans == 2
    in_toks = r.input_text.split()
    sentinels = [t for t in in_toks if SENT.match(t)]
    assert sentinels == ["<extra_id_0>", "<extra_id_1>"]
    # 3 tokens masked per full block: 50 - 6 visible + 2 sentinels
    assert len(in_toks) == n - 6 + 2
    tgt = r.target_text.split()
    assert tgt[0] == "<extra_id_0>" and "<extra_id_1>" in tgt and len(tgt) == 8
    # masked spans stay inside their own block
    rebuilt = _rebuild(r.input_text, r.target_text)
    assert rebuilt == [f"w{j}" for j in range(n)]


def test_short_doc_passes_through_unmasked(spark):
    rows = [(1, "only seven little words live right here")]
    r = chunking.span_corruption(_docs(spark, rows), block=24, span_len=3).collect()[0]
    assert r.n_masked_spans == 0
    assert r.input_text == "only seven little words live right here"
    assert r.target_text == ""


def test_partition_invariance(spark):
    rows = [(i, " ".join(f"p{i}q{j}" for j in range(60))) for i in range(1, 17)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, chunking.span_corruption(df).collect()))
    b = sorted(map(tuple, chunking.span_corruption(df.repartition(5)).collect()))
    assert a == b
