"""Structured Streaming ingest mode (beyond the strictly-batch reference —
SURVEY.md §2.8 reserves this slot; the batch checkpoint/lineage path is the
primary resumability mechanism)."""
