"""StructTypes for every stage (SURVEY.md §1.3 Spark mapping).

Schema is enforced *by construction* at the pandas-UDF boundary — the
reference validates post-hoc with jsonschema
(/root/reference/src/cli/validate/main.py:43-130); here a malformed row can
only become a typed fallback struct with a ``status`` column, never a
malformed record (reference status enums:
/root/reference/schemas/analyzer/v1.0/schema.json:26-29).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

EMBEDDED = T.ArrayType(
    T.StructType(
        [
            T.StructField("offset", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
)

SNIFF = T.StructType(
    [
        T.StructField("content_type", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("embedded", EMBEDDED),
        T.StructField("interesting", T.BooleanType()),
    ]
)

EXTRACT = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)

META = T.MapType(T.StringType(), T.StringType())

QUALITY = T.StructType(
    [
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("uniq_ratio", T.DoubleType()),
        T.StructField("alpha_ratio", T.DoubleType()),
        T.StructField("digit_ratio", T.DoubleType()),
        T.StructField("punct_ratio", T.DoubleType()),
        T.StructField("stopword_ratio", T.DoubleType()),
        T.StructField("mean_word_len", T.DoubleType()),
    ]
)

# one row per page out of the fused analysis stage (FIXTURES.md §4)
ANALYSIS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("sniff", SNIFF),
        T.StructField("meta", META),
        T.StructField("extract", EXTRACT),
        T.StructField("sigs", T.ArrayType(T.StringType())),
        T.StructField("sha", T.StringType()),
        T.StructField("simhash", T.LongType()),
        T.StructField("minhash", T.ArrayType(T.LongType())),
        T.StructField("quality", QUALITY),
        T.StructField("detected_lang", T.StringType()),
        T.StructField("n_tokens_ws", T.LongType()),
        T.StructField("n_tokens_bpe", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("slug", T.StringType()),
        T.StructField("html_bytes", T.LongType()),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("input_rows", T.LongType()),
        T.StructField("output_rows", T.LongType()),
        T.StructField("bytes", T.LongType()),
        # multimodal stub accounting (round 5): rows whose sniffed type is
        # a recognized container with no pure-Python codec (decode_status
        # would be `stubbed`), plus the per-content-type breakdown — makes
        # the 100-TB drop rule auditable the way dedup bucket-cap drops are
        T.StructField("stubbed_rows", T.LongType()),
        T.StructField("stubbed_types", T.MapType(T.StringType(), T.LongType())),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)

PROCESSED = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sha", T.StringType()),
        T.StructField("run_id", T.StringType()),
    ]
)
