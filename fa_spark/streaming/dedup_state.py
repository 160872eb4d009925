"""Stateful streaming dedup: emit only the FIRST occurrence of each content
hash per host, across micro-batches.

This is the streaming form of batch exact-dedup (stages/dedup.py): batch mode
elects a canonical row with a window over the full corpus; a stream cannot
see the full corpus, so per-host first-seen state (the set of sha prefixes
already emitted) lives in Spark's state store, keyed by host.

Implementation: `applyInPandasWithState` (GroupState, timeout disabled) —
the custom-stateful-operator escape hatch for semantics windowed aggs can't
express. State is bounded per host by `max_state` hashes (beyond it the host
is treated as saturated and further rows pass through flagged, never
dropped silently — the drop rule is explicit, like the MinHash bucket cap).

Scale notes: state is partitioned by host (the natural shuffle key for a
crawl); sha64 prefixes (8 bytes) keep per-host state small; a 10^6-page host
costs ~8 MB of state, and `max_state` caps it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("sha", T.StringType()),
        T.StructField("first_seen", T.BooleanType()),
        T.StructField("state_saturated", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("shas", T.ArrayType(T.StringType()))]
)

MAX_STATE = 100_000


def _dedup_fn(max_state: int = MAX_STATE):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        seen: set[str] = set(state.get[0]) if state.exists else set()
        out_rows = []
        for pdf in pdfs:
            # deterministic order within the batch: by url
            pdf = pdf.sort_values("url")
            for url, sha in zip(pdf["url"], pdf["sha"]):
                saturated = len(seen) >= max_state
                first = sha not in seen
                if first and not saturated:
                    seen.add(sha)
                out_rows.append(
                    {
                        "host": host,
                        "url": url,
                        "sha": sha,
                        "first_seen": first,
                        "state_saturated": saturated,
                    }
                )
        state.update((sorted(seen),))
        yield pd.DataFrame(out_rows, columns=[f.name for f in DEDUP_OUT.fields])

    return fn


def host_expr(url_col: str = "url"):
    return F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)/", 1)


def streaming_first_seen(
    pages_stream: DataFrame, max_state: int = MAX_STATE
) -> DataFrame:
    """pages stream -> (host, url, sha, first_seen, state_saturated) rows.
    Downstream keeps `first_seen` rows for the analysis stage and counts the
    rest as dedup savings."""
    keyed = pages_stream.select(
        host_expr().alias("host"),
        "url",
        F.sha2("html", 256).alias("sha"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _dedup_fn(max_state),
        outputStructType=DEDUP_OUT,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
