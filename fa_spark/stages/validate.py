"""Post-hoc analysis validation (reference ``fa validate schema``,
/root/reference/src/cli/validate/main.py:43-185).

The pipeline's own outputs are schema-correct by construction
(fa_spark/schema.py) — a malformed row can only become a typed fallback
struct. This operator covers the reference's OTHER validation surface:
checking a FOREIGN analysis table (an older engine version, a partner
export, a hand-edited parquet) against ``schema.ANALYSIS`` and emitting
one violation struct per broken rule per row.

Rule mapping to the reference CLI:
  jsonschema.validate        -> column presence + type equality
                                (structural; computed ONCE on the driver
                                from df.schema, emitted as constant
                                columns — no per-row cost)
  required-property check    -> per-row NULL checks on required fields
  enum constraint            -> extract.status ∈ STATUS_ENUM
                                (schema.json:26-29 pattern)
  empty-property warnings    -> per-row '' / [] / {} warnings
  --strict                   -> warnings also flip ``valid``

Scale: every per-row rule is a native Catalyst expression inside one
projection — no shuffle, no UDF, whole-stage codegen; validating 100 TB
costs one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fa_spark import schema as S

# every status the extraction cascade can emit (pure.extract_main_text /
# extract_pdf_text); the reference pins its status enums the same way
STATUS_ENUM = ("success", "success_lenient", "skipped", "empty")

# fields a usable analysis row cannot lack (reference "required" list)
REQUIRED_FIELDS = ("url", "sha")

# columns the engine itself appends after the fused analysis stage
# (lineage partitioning; dedup canonical election) — their presence in a
# read-back table is expected, not a violation, but a foreign table
# without them is also fine
_ENGINE_COLS = ("run_id", "bucket", "dup_count", "is_canonical", "dup_of")

VIOLATION = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("kind", T.StringType()),  # 'error' | 'warning'
        T.StructField("message", T.StringType()),
    ]
)


def _v(cond, path: str, kind: str, message: str):
    """A violation cell: the struct when ``cond`` holds, else NULL (the
    NULLs are compacted out of the final array)."""
    return F.when(
        cond,
        F.struct(
            F.lit(path).alias("path"),
            F.lit(kind).alias("kind"),
            F.lit(message).alias("message"),
        ),
    )


def validate_analysis(
    df: DataFrame, strict: bool = False, expected: T.StructType = S.ANALYSIS
) -> DataFrame:
    """Per-row violation report for a foreign analysis table.

    Returns (url, violations array<struct<path,kind,message>>, n_errors,
    n_warnings, valid). Structural problems (missing column, wrong type)
    appear on every row — the reference CLI fails the whole file for
    those; keeping them per-row lets one report serve both granularities
    (``valid`` aggregates to the file verdict).
    """
    have = {f.name: f.dataType for f in df.schema.fields}
    exp = {f.name: f.dataType for f in expected.fields}

    cells = []
    for name, dtype in exp.items():
        if name not in have:
            cells.append(
                _v(F.lit(True), name, "error", f"required column '{name}' is missing")
            )
        elif have[name] != dtype:
            cells.append(
                _v(
                    F.lit(True),
                    name,
                    "error",
                    f"column '{name}' has type {have[name].simpleString()}, "
                    f"expected {dtype.simpleString()}",
                )
            )
    for name in have:
        if name not in exp and name not in _ENGINE_COLS:
            cells.append(
                _v(F.lit(True), name, "warning", f"unexpected column '{name}'")
            )

    for name in REQUIRED_FIELDS:
        if name in have and have[name] == exp[name]:
            cells.append(
                _v(
                    F.col(name).isNull(),
                    name,
                    "error",
                    f"required field '{name}' is null",
                )
            )

    if have.get("extract") == exp["extract"]:
        status = F.col("extract.status")
        cells.append(
            _v(
                F.col("extract").isNull() | status.isNull(),
                "extract.status",
                "error",
                "required field 'extract.status' is null",
            )
        )
        cells.append(
            _v(
                status.isNotNull() & ~status.isin(*STATUS_ENUM),
                "extract.status",
                "error",
                f"status not one of {list(STATUS_ENUM)}",
            )
        )
        # a 'success' row with no text is the reference's empty-property
        # warning shape: present but vacuous
        cells.append(
            _v(
                (status == "success")
                & (F.coalesce(F.col("extract.text"), F.lit("")) == ""),
                "extract.text",
                "warning",
                "property 'extract.text' is empty on a success row",
            )
        )
    if have.get("tags") == exp["tags"]:
        cells.append(
            _v(
                F.col("tags").isNotNull() & (F.size("tags") == 0),
                "tags",
                "warning",
                "property 'tags' is empty",
            )
        )
    if have.get("meta") == exp["meta"]:
        cells.append(
            _v(
                F.col("meta").isNotNull() & (F.size(F.map_keys("meta")) == 0),
                "meta",
                "warning",
                "property 'meta' is empty",
            )
        )
    if have.get("html_bytes") == exp["html_bytes"]:
        cells.append(
            _v(
                F.col("html_bytes") < 0,
                "html_bytes",
                "error",
                "property 'html_bytes' is negative",
            )
        )

    if cells:
        viol = F.filter(F.array(*cells), lambda x: x.isNotNull())
    else:
        viol = F.array().cast(T.ArrayType(VIOLATION))

    url = F.col("url") if have.get("url") == exp["url"] else F.lit(None).cast("string")
    out = df.select(
        url.alias("url"),
        viol.alias("violations"),
    ).select(
        "url",
        "violations",
        F.size(F.filter("violations", lambda x: x.kind == "error")).alias(
            "n_errors"
        ),
        F.size(F.filter("violations", lambda x: x.kind == "warning")).alias(
            "n_warnings"
        ),
    )
    valid = F.col("n_errors") == 0
    if strict:
        valid = valid & (F.col("n_warnings") == 0)
    return out.withColumn("valid", valid)


def validation_summary(report: DataFrame) -> DataFrame:
    """File-level verdict the reference CLI prints: one row of totals."""
    # coalesce: SUM over zero rows is NULL, and an empty file must verdict
    # as rows=0 / invalid_rows=0 / success=true, not success=null
    n_invalid = F.coalesce(
        F.sum(F.when(F.col("valid"), 0).otherwise(1)), F.lit(0)
    )
    return report.agg(
        F.count("*").alias("rows"),
        n_invalid.alias("invalid_rows"),
        F.coalesce(F.sum("n_errors"), F.lit(0)).alias("n_errors"),
        F.coalesce(F.sum("n_warnings"), F.lit(0)).alias("n_warnings"),
        (n_invalid == 0).alias("success"),
    )
