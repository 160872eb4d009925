"""Sequence-packing stage: slot invariants and the no-blob-shuffle plan.

The packing index is only useful if a loader can reconstruct contiguous
ctx_len-token sequences from it, so the tests verify the reconstruction
invariants directly: per-shard slots are a gapless token stream, offsets
stay inside a context, span counts match the arithmetic, and the text
column never rides the shuffle feeding the per-shard window.
"""

from __future__ import annotations

from pyspark.sql import Row

from fa_spark.stages.pack import pack_sequences

CTX = 16


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


def _collect(spark, rows, **kw):
    out = pack_sequences(_docs(spark, rows), ctx_len=CTX, n_shards=2, **kw)
    return sorted(out.collect(), key=lambda r: (r.shard, r.doc_id))


def test_per_shard_stream_is_gapless(spark):
    rows = [(i, " ".join(["w"] * (i % 7))) for i in range(1, 41)]
    got = _collect(spark, rows)
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 2
    for shard_rows in by_shard.values():
        # doc_id order within a shard IS the concatenation order
        pos = 0
        for r in shard_rows:
            assert r.seq_id == pos // CTX, r
            assert r.seq_offset == pos % CTX, r
            if r.n_tokens == 0:
                assert r.n_seqs_spanned == 0, r
            else:
                last = pos + r.n_tokens - 1
                assert r.n_seqs_spanned == last // CTX - pos // CTX + 1, r
            pos += r.n_tokens


def test_offsets_bounded_and_totals_conserved(spark):
    rows = [(i, " ".join(["tok"] * (3 * i % 23))) for i in range(1, 60)]
    got = _collect(spark, rows)
    assert all(0 <= r.seq_offset < CTX for r in got)
    assert sum(r.n_tokens for r in got) == sum(3 * i % 23 for i in range(1, 60))


def test_long_doc_spans_many_sequences(spark):
    got = _collect(spark, [(1, " ".join(["x"] * (CTX * 5 + 3)))])
    (r,) = got
    assert r.seq_id == 0 and r.seq_offset == 0
    assert r.n_seqs_spanned == 6  # 83 tokens over 16-token contexts


def test_text_never_shuffled(spark):
    """The only Exchange hash-partitions (doc_id, n_tokens, shard) scalars;
    the text column must be projected away map-side before it."""
    df = pack_sequences(_docs(spark, [(i, "a b c") for i in range(20)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_null_text_counts_zero_tokens(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text=None),
         Row(doc_id=3, text="d e")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pack_sequences(docs, ctx_len=4).collect()}
    assert got[2].n_tokens == 0 and got[2].n_seqs_spanned == 0
    # the NULL row must not shift later offsets by the sentinel -1
    assert sum(r.n_tokens for r in got.values()) == 5
