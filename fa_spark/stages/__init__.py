"""Vectorized pandas-UDF stages (the rebuild's extension surface, SURVEY.md §2.9).

Each stage is Arrow-batched — never per-row Python UDFs (mandated by
BASELINE.json input_hint). Heavy per-batch state (compiled regexes, signature
tables) is initialized once per Python worker at module import, the Spark
analogue of the reference's "load model once per process" concern
(/root/reference/src/models/fastvlm/adapter.py:127-175).
"""
