"""BM25 ranked retrieval over the document corpus.

Beyond-reference LLM-data-pipeline operator: the reference analyzer's
content search (ripgrep surface, `src/core/analyzer.py` search mode) stops
at boolean match counts; a corpus at pre-training scale also needs RANKED
retrieval — "the k most relevant documents for these terms" — for
decontamination triage, eval-set mining, and targeted quality audits.
Implements Okapi BM25 with the Lucene idf variant
(idf = ln(1 + (N - df + 0.5)/(df + 0.5)), always positive).

Scale design (10^12 docs):
- The query-term table is a driver-side literal of a few dozen rows —
  broadcast everywhere it joins; the token stream is filtered to query
  terms FIRST (broadcast semi-join), so every downstream relation is
  proportional to candidate postings, not the corpus.
- Corpus stats (N, avgdl, per-term df) are partial aggregates: doc length
  is a map-side count per doc; N/avgdl reduce to ONE row that attaches by
  broadcast cross join; df reduces to one row per distinct query term.
- Top-k is TWO-PHASE: phase 1 ranks inside (query_id, hash-salt cell) so
  no task ever sorts more than ~candidates/salt_cells rows; phase 2 ranks
  the surviving salt_cells*k rows per query — a bounded relation no matter
  the corpus size. A per-query global window over raw candidates (the
  naive shape) would put every posting for a hot query in one task.
- Ordering ties break on ROUND(score, 6) then doc_id in BOTH phases, so
  the result is deterministic and engine-portable (sub-1e-6 float drift
  between summation orders cannot reorder ranks except on exact rounded
  ties, which doc_id then settles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_cells: int = 16,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 -> (query_id, doc_id, rank,
    score). ``queries`` is [(query_id, [lowercase terms]), ...]; terms are
    matched against the corpus-standard [a-z0-9]+ tokenization."""
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in sorted(set(terms))],
        "query_id string, t string",
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("t"),
    )
    # corpus stats: one row, from a map-side per-doc count
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # candidate postings only: broadcast semi-join on the distinct terms
    hits = toks.join(F.broadcast(qterms.select("t").distinct()), "t")
    tf = hits.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("t").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(qterms), "t")
        .join(F.broadcast(df_t), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 6).alias("score_r")
    )
    # two-phase top-k: per-salt-cell rank, then rank the bounded survivors
    cell = F.pmod(F.xxhash64("doc_id"), F.lit(salt_cells))
    w1 = Window.partitionBy("query_id", "_cell").orderBy(
        F.desc("score_r"), F.asc("doc_id")
    )
    phase1 = (
        scored.withColumn("_cell", cell)
        .withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("score_r"), F.asc("doc_id")
    )
    return (
        phase1.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.round("score_r", 3).alias("score"),
        )
    )
