"""End-to-end training-corpus builder: funnel monotonicity, dedup actually
removes the planted duplicates, accounting adds up, determinism."""

from __future__ import annotations

import pyarrow.parquet as pq

from fa_spark.corpus import CorpusConfig, build_corpus


def test_corpus_funnel(spark, pages_df, pages_path):
    pages = pages_df.select("url", "warc_ts", "html", "text", "lang")
    corpus, report = build_corpus(pages, CorpusConfig(langs=("en", "und")))
    r = report.collect()[0]

    n = pq.ParquetFile(pages_path).metadata.num_rows
    assert r["n_input"] == n
    # funnel is monotone non-increasing
    seq = [
        r["n_input"], r["n_extracted"], r["n_lang"], r["n_quality"],
        r["n_exact_canonical"], r["n_corpus"],
    ]
    assert all(a >= b for a, b in zip(seq, seq[1:])), seq
    # fixtures plant exact dups and near dups: both stages must bite
    assert r["n_exact_canonical"] < r["n_quality"]
    assert r["n_corpus"] >= 1
    assert r["tokens_ws"] > 0 and r["chars"] > 0
    # transitive cluster accounting (round 3): every cluster keeps exactly
    # its canonical member, so the drop count is members - clusters
    assert r["n_near_dup_members"] >= r["n_near_dup_clusters"] >= 1
    assert r["n_corpus"] == r["n_exact_canonical"] - (
        r["n_near_dup_members"] - r["n_near_dup_clusters"]
    )

    rows = corpus.collect()
    assert len(rows) == r["n_corpus"]
    # no duplicate content survives
    shas = [row["sha"] for row in rows]
    assert len(shas) == len(set(shas))


def test_corpus_deterministic(spark, pages_df):
    pages = pages_df.select("url", "warc_ts", "html", "text", "lang").limit(300)
    c1, _ = build_corpus(pages)
    c2, _ = build_corpus(pages.repartition(11))
    a = sorted(r["url"] for r in c1.collect())
    b = sorted(r["url"] for r in c2.collect())
    assert a == b


def test_corpus_optional_gates(spark, pages_df):
    """Round 3: repetition + decontamination compose into the funnel.
    Thresholds forced low so the wiring provably bites; the metrics
    themselves are oracle-checked via doc_repetition / decontamination."""
    from pyspark.sql import functions as F

    pages = pages_df.select("url", "warc_ts", "html", "text", "lang").limit(400)
    base_corpus, base_report = build_corpus(pages, CorpusConfig(langs=("en", "und")))
    base_rows = {r["url"]: r["text"] for r in base_corpus.collect()}
    br = base_report.collect()[0]
    assert br["n_repetitious"] == 0 and br["n_contaminated"] == 0

    # eval item = 12-token prefix of one surviving corpus doc
    victim_url, victim_text = sorted(base_rows.items())[0]
    prefix = " ".join(victim_text.split()[:12])
    eval_df = spark.createDataFrame([(1, prefix)], "eval_id long, text string")

    cfg = CorpusConfig(
        langs=("en", "und"), max_top2gram_frac=0.001, max_dup10gram_frac=0.001
    )
    corpus, report = build_corpus(pages, cfg, eval_df=eval_df)
    r = report.collect()[0]
    assert r["n_contaminated"] >= 1
    assert r["n_repetitious"] >= 1  # threshold low enough to catch anything
    urls = {row["url"] for row in corpus.collect()}
    assert victim_url not in urls
    assert r["n_corpus"] == len(urls) <= br["n_corpus"]


def test_corpus_passage_strip_gate(spark, pages_df):
    """Round 4: the ExactSubstr passage strip composes into the funnel —
    duplicated passages vanish from the corpus text, token counts are
    recomputed post-strip, and the report carries the dropped-token sum."""
    from pyspark.sql import functions as F

    pages = pages_df.select("url", "warc_ts", "html", "text", "lang").limit(300)
    base_corpus, _ = build_corpus(pages, CorpusConfig(langs=("en", "und")))
    base_rows = {r["url"]: r for r in base_corpus.collect()}
    # every corpus doc's full text survives with the gate off
    assert all(r["n_tokens_ws"] > 0 for r in base_rows.values())

    cfg = CorpusConfig(langs=("en", "und"), dup_passage_window=8)
    corpus, report = build_corpus(pages, cfg)
    rows = {r["url"]: r for r in corpus.collect()}
    rep = report.collect()[0]
    assert set(rows) == set(base_rows)  # strip never drops whole docs
    dropped = sum(
        len(base_rows[u]["text"].split()) - len(rows[u]["text"].split())
        for u in rows
    )
    assert rep["n_passage_tokens_dropped"] >= 0
    # the report figure equals the observed token difference
    base_toks = {
        u: [t.lower() for t in base_rows[u]["text"].split()] for u in rows
    }
    # untouched docs keep their original text and counts verbatim;
    # stripped docs get a token-rebuilt text with recomputed ws count
    import re

    for u, r in rows.items():
        if r["text"] == base_rows[u]["text"]:
            assert r["n_tokens_ws"] == base_rows[u]["n_tokens_ws"]
        else:
            assert r["n_tokens_ws"] == len(re.findall(r"\S+", r["text"]))
    if rep["n_passage_tokens_dropped"] == 0:
        assert all(rows[u]["text"] == base_rows[u]["text"] for u in rows)
    else:
        assert dropped > 0


def test_passage_strip_survives_duplicate_urls(spark, pages_df):
    """Round-5 ADVICE (medium): the same url recrawled with different
    content survives exact sha-dedup as two rows. The ExactSubstr stage
    must key on a per-row unique id, not url — a url-keyed inner join
    would n x n-blow-up the colliding rows and cross-apply one doc's
    spans to the other's token stream."""
    import datetime as dt

    shared = " ".join(f"passage{i}" for i in range(14))
    fill_a = " ".join(f"alpha{i} brown{i} castle{i}" for i in range(12))
    fill_b = " ".join(f"omega{i} silver{i} harbor{i}" for i in range(12))

    def page(body, title):
        return (
            f"<html><head><title>{title}</title></head><body>"
            f"<main><h1>{title}</h1><p>{body}</p></main></body></html>"
        ).encode()

    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("http://dup.example/x", ts, page(f"{fill_a} {shared}", "First crawl"),
         None, "en"),
        ("http://dup.example/x", ts, page(f"{fill_b} {shared}", "Second crawl"),
         None, "en"),
        ("http://other.example/y", ts, page(f"{shared} plus tail words here "
         "that make this quality gate pass easily with enough unique tokens",
         "Third doc"), None, "en"),
    ]
    pages = pages_df.select("url", "warc_ts", "html", "text", "lang").limit(
        60
    ).unionByName(
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
            "text string, lang string"
        )
    )
    cfg = CorpusConfig(langs=("en", "und"), dup_passage_window=8)
    corpus, report = build_corpus(pages, cfg)
    out = corpus.collect()
    rep = report.collect()[0]
    # no row blow-up: the corpus count equals the report's funnel count,
    # and each colliding row survives exactly once
    assert len(out) == rep["n_corpus"]
    dup_rows = [r for r in out if r["url"] == "http://dup.example/x"]
    assert len(dup_rows) == 2
    assert len({r["sha"] for r in dup_rows}) == 2
    # the planted shared passage is stripped from each independently;
    # each row keeps its OWN filler (no cross-applied spans)
    for r in dup_rows:
        assert "passage3" not in r["text"]
    texts = {r["text"] for r in dup_rows}
    assert any("alpha3" in t for t in texts)
    assert any("omega3" in t for t in texts)
