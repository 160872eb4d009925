"""Driver-side render sink (reference S7,
/root/reference/src/cli/utils/render.py:169-229) and environment preflight
(reference A7 verification matrix, /root/reference/src/core/analyzer.py:879-944).

Render is a pure function over a collected row so tests are byte-stable;
only ever applied to `df.limit(k).collect()` — never a distributed op.
"""

from __future__ import annotations

import json
from typing import Any


def render_analysis(row: dict[str, Any], fmt: str = "md") -> str:
    """One analysis row -> md / json / pretty text.

    The markdown shape (## Description / ## Tags sections) mirrors the
    reference's CLI contract (tests/test_cli_essential.py expects those
    headers in --md output)."""
    if fmt == "json":
        return json.dumps(row, sort_keys=True, default=str)
    ex = row.get("extract") or {}
    title = ex.get("title") or row.get("url", "")
    text = ex.get("text") or ""
    tags = row.get("tags") or []
    if fmt == "md":
        lines = [
            f"# {title}",
            "",
            "## Description",
            "",
            text[:1000],  # display truncation (reference W4)
            "",
            "## Tags",
            "",
            ", ".join(tags) if tags else "(none)",
            "",
            f"**url:** {row.get('url','')}  ",
            f"**type:** {ex.get('doc_type','')} · **status:** {ex.get('status','')} · "
            f"**slug:** {row.get('slug','')}",
        ]
        return "\n".join(lines)
    if fmt == "pretty":
        return (
            f"{title}\n{'=' * max(len(title), 1)}\n"
            f"url:    {row.get('url','')}\n"
            f"type:   {ex.get('doc_type','')}\n"
            f"status: {ex.get('status','')}\n"
            f"tags:   {', '.join(tags)}\n\n{text[:1000]}"
        )
    raise ValueError(f"unknown format: {fmt}")


def render_sample(df, k: int = 5, fmt: str = "md") -> list[str]:
    """Render the first k rows (by url — deterministic) of an analysis df."""
    rows = df.orderBy("url").limit(k).collect()
    return [render_analysis(r.asDict(recursive=True), fmt) for r in rows]


def preflight(spark) -> dict[str, str]:
    """Environment verification matrix, logged before a run (reference runs
    tool --version checks; here: library versions + the Spark confs the
    pipeline depends on)."""
    import numpy
    import pandas
    import pyarrow
    import pyspark

    return {
        "spark": pyspark.__version__,
        "arrow": pyarrow.__version__,
        "pandas": pandas.__version__,
        "numpy": numpy.__version__,
        "master": spark.sparkContext.master,
        "arrow_enabled": spark.conf.get(
            "spark.sql.execution.arrow.pyspark.enabled", "false"
        ),
        "aqe_enabled": spark.conf.get("spark.sql.adaptive.enabled", "false"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions", ""),
        "session_tz": spark.conf.get("spark.sql.session.timeZone", ""),
    }
