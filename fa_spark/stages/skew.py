"""Skew-defeating aggregation (north_rule: 'salted-hash shuffle to defeat
host-domain skew').

Zipf-distributed host keys put one host's 10^6 pages in one reducer. The
two-phase salted aggregate splits every hot key across ``salt`` reducers
(phase 1: group by (key, salt_bucket), partial agg), then merges the partials
(phase 2: group by key — at most ``salt`` rows per key, never hot).

Only associative/commutative aggregates compose this way; count/sum/min/max
are provided. Results are EXACTLY equal to the naive groupBy — proven by the
`salted_source_stats` oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_counts(
    df: DataFrame,
    key_col: str,
    sum_cols: tuple[str, ...] = (),
    salt: int = DEFAULT_SALT,
    salt_source: str | None = None,
) -> DataFrame:
    """groupBy(key).agg(count, sum(cols)) via a two-phase salted shuffle.

    ``salt_source``: a high-cardinality column whose hash spreads the rows.
    Default (None): xxhash64 over the key + every sum column — deterministic
    and row-content-based, so a hot key concentrated in few input partitions
    still fans out across ``salt`` reducers. Caveat: rows whose key AND sum
    columns are all identical hash to one bucket; pass an id-like
    ``salt_source`` when the aggregated columns carry no entropy.
    """
    if salt_source:
        bucket = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt))
    else:
        cols = [F.col(key_col)] + [F.col(c) for c in sum_cols]
        bucket = F.pmod(F.xxhash64(*cols), F.lit(salt))
    partial = (
        df.withColumn("_salt", bucket)
        .groupBy(key_col, "_salt")
        .agg(
            F.count("*").alias("_cnt"),
            *[F.sum(c).alias(f"_sum_{c}") for c in sum_cols],
        )
    )
    return partial.groupBy(key_col).agg(
        F.sum("_cnt").alias("n_rows"),
        *[F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
