"""Sequence packing: tokenized documents -> fixed-length training contexts.

Beyond-reference LLM-data-pipeline operator (the reference analyzer stops at
per-file analysis; a pre-training pipeline must then pack the surviving text
into model contexts). Implements the standard concat-then-split packing:
documents are hash-assigned to shards, deterministically ordered within each
shard, logically concatenated, and cut every ``ctx_len`` tokens. Each doc
reports which context sequence it starts in, at what token offset, and how
many sequences it spans — exactly the index a loader needs to materialize
packed batches without re-reading the corpus.

Scale design (10^12 docs): the only shuffle is the hash exchange feeding the
per-shard window, and the window input is (doc_id, n_tokens, shard) — three
scalars per doc, never the text (the token count is computed map-side before
the exchange, so the blob dies at the scan). Shards are md5-balanced, so a
window partition holds ~|corpus|/n_shards rows regardless of host/domain
skew; pick ``n_shards`` ~ corpus_rows / 10^7 so a shard's scalar triples fit
one task comfortably. The prefix sum is per-shard by construction — there is
no global window (a single-task sort) anywhere in the plan. Real pipelines
pack per-shard for exactly this reason: sequence ids only need to be unique
and reproducible, not globally dense.

Determinism: shard = md5(doc_id) bucket and within-shard order = doc_id, so
the packing is identical across engines, cluster sizes, and reruns — the
same property dataset_split (queries.py) relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_bucket(col: Column, mod: int) -> Column:
    """Engine-portable hash bucket: first 4 md5 hex digits mod ``mod``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % mod
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document a (shard, seq_id, seq_offset) packing slot.

    Tokens are whitespace tokens (the corpus-standard ``n_tokens_ws``
    definition shared with doc_token_counts). Within a shard, documents are
    concatenated in ``id_col`` order and the stream is cut every ``ctx_len``
    tokens; a document starting at global shard offset ``s`` with ``n``
    tokens therefore starts in sequence ``s // ctx_len`` at offset
    ``s % ctx_len`` and spans ``(s + n - 1) // ctx_len - s // ctx_len + 1``
    sequences (0 for empty docs).
    """
    # coalesce first: size(regexp_extract_all(NULL)) is -1 in Spark,
    # which would silently corrupt every later offset in the shard
    n_tok = F.size(
        F.expr(f"regexp_extract_all(coalesce({text_col}, ''), '\\\\S+', 0)")
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        _md5_bucket(F.col(id_col), n_shards).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_start")
    d = d.select("doc_id", "shard", "n_tokens", start)
    end_seq = F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / ctx_len)
    seq_id = F.floor(F.col("tok_start") / ctx_len)
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        seq_id.cast("long").alias("seq_id"),
        (F.col("tok_start") % ctx_len).cast("int").alias("seq_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(end_seq - seq_id + 1)
        .cast("int")
        .alias("n_seqs_spanned"),
    )
