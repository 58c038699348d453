"""Cross-document sequence packing: full chunks with zero padding, correct
straddle splits, hierarchical-prefix-sum invariance to the bucket size,
and partition invariance."""

from collections import defaultdict

from osm_to_netex_spark.operators import chunking


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _words(doc_id, n):
    return " ".join(f"w{doc_id}x{i}" for i in range(n))


def test_chunks_tile_exactly_with_zero_padding(spark):
    # token counts 7, 10, 3, 12 over capacity 8 -> 32 tokens, 4 chunks
    counts = {1: 7, 2: 10, 3: 3, 4: 12}
    rows = [(i, _words(i, n)) for i, n in counts.items()]
    frags = chunking.pack_sequences(_docs(spark, rows), capacity=8).collect()
    assert sum(f.frag_len for f in frags) == 32
    by_chunk = defaultdict(list)
    for f in frags:
        by_chunk[f.chunk_id].append(f)
    assert set(by_chunk) == {0, 1, 2, 3}
    for cid, fs in by_chunk.items():
        fs.sort(key=lambda f: f.chunk_pos)
        # fragments tile the chunk contiguously from position 1
        pos = 1
        for f in fs:
            assert f.chunk_pos == pos
            pos += f.frag_len
        assert pos - 1 == 8  # every chunk exactly full (32 = 4*8, no tail)
    # doc 2 (tokens 8..17 of the stream) straddles chunks 0 and 1
    d2 = sorted((f for f in frags if f.doc_id == 2), key=lambda f: f.chunk_id)
    assert [(f.chunk_id, f.doc_off_tok, f.frag_len) for f in d2] == [
        (0, 1, 1),
        (1, 2, 8),
        (2, 10, 1),
    ]


def test_doc_fragments_cover_doc_in_order(spark):
    rows = [(i, _words(i, 5 + (i * 3) % 11)) for i in range(1, 20)]
    frags = chunking.pack_sequences(_docs(spark, rows), capacity=16).collect()
    by_doc = defaultdict(list)
    for f in frags:
        by_doc[f.doc_id].append(f)
    for i in range(1, 20):
        fs = sorted(by_doc[i], key=lambda f: f.doc_off_tok)
        pos = 1
        for f in fs:
            assert f.doc_off_tok == pos
            pos += f.frag_len
        assert pos - 1 == 5 + (i * 3) % 11  # full doc covered, in order


def test_empty_docs_yield_no_fragments_and_tail_partial(spark):
    rows = [(1, _words(1, 5)), (2, "   "), (3, _words(3, 4))]
    frags = chunking.pack_sequences(_docs(spark, rows), capacity=8).collect()
    assert {f.doc_id for f in frags} == {1, 3}
    tail = [f for f in frags if f.chunk_id == 1]
    assert sum(f.frag_len for f in tail) == 1  # 9 tokens -> 8 + 1


def test_bucket_size_invariance_and_partition_invariance(spark):
    rows = [(i, _words(i, 1 + (i * 7) % 13)) for i in range(1, 40)]
    df = _docs(spark, rows)
    base = sorted(map(tuple, chunking.pack_sequences(df, capacity=32, bucket=64).collect()))
    for bucket in (1, 5):
        alt = sorted(
            map(tuple, chunking.pack_sequences(df, capacity=32, bucket=bucket).collect())
        )
        assert alt == base
    repart = sorted(
        map(tuple, chunking.pack_sequences(df.repartition(7), capacity=32, bucket=64).collect())
    )
    assert repart == base
