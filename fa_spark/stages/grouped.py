"""Grouped-map analytics (`groupBy(...).applyInPandas` — the GROUPED_MAP
pattern reserved in SURVEY.md §2.9).

Per-source vocabulary-growth profile: walking a group's documents in
deterministic (doc_id) order, track cumulative distinct-token count after
each document and fit a Heaps-law exponent (vocab ≈ K · tokens^beta).
The cumulative-order dependency is what makes this a grouped-map op —
no native aggregate sees per-group running state.

Scale notes: one group = one source/host; groups process independently and
in parallel (shuffle on the group key). A pathological mega-host is bounded
by ``max_docs`` per group (explicit cap, same drop philosophy as the MinHash
bucket cap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fa_spark import pure

VOCAB_PROFILE = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
        T.StructField("vocab", T.LongType()),
        T.StructField("heaps_beta", T.DoubleType()),
        T.StructField("capped", T.BooleanType()),
    ]
)


def _profile_fn(max_docs: int = 10_000):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        capped = len(pdf) > max_docs
        if capped:
            pdf = pdf.iloc[:max_docs]
        seen: set[str] = set()
        tokens_cum: list[int] = []
        vocab_cum: list[int] = []
        total = 0
        for text in pdf["text"]:
            toks = pure.tokenize(text or "")
            total += len(toks)
            seen.update(toks)
            tokens_cum.append(total)
            vocab_cum.append(len(seen))
        # Heaps fit in log space over the cumulative curve (>= 2 points)
        beta = 0.0
        pts = [(t, v) for t, v in zip(tokens_cum, vocab_cum) if t > 0 and v > 0]
        if len(pts) >= 2:
            x = np.log(np.array([p[0] for p in pts], dtype=np.float64))
            y = np.log(np.array([p[1] for p in pts], dtype=np.float64))
            vx = x - x.mean()
            denom = float((vx * vx).sum())
            beta = float((vx * (y - y.mean())).sum() / denom) if denom > 0 else 0.0
        return pd.DataFrame(
            [
                {
                    "source": pdf["source"].iloc[0] if len(pdf) else None,
                    "n_docs": len(pdf),
                    "total_tokens": total,
                    "vocab": len(seen),
                    "heaps_beta": round(beta, 6),
                    "capped": capped,
                }
            ]
        )

    return fn


def vocab_profile(
    df: DataFrame, group_col: str = "source", id_col: str = "doc_id",
    text_col: str = "text", max_docs: int = 10_000,
) -> DataFrame:
    src = df.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return src.groupBy("source").applyInPandas(
        _profile_fn(max_docs), schema=VOCAB_PROFILE
    )
