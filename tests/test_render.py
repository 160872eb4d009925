from __future__ import annotations

import json

from fa_spark.render import preflight, render_analysis, render_sample

ROW = {
    "url": "https://host1.example/a/1.html",
    "extract": {
        "title": "My Page",
        "text": "word " * 300,
        "doc_type": "article",
        "status": "success",
    },
    "tags": ["spark", "parquet"],
    "slug": "my-page",
}


def test_render_md_contract():
    md = render_analysis(ROW, "md")
    assert "## Description" in md and "## Tags" in md
    assert "spark, parquet" in md
    # display truncation at 1000 chars (reference W4)
    assert len(md) < 1300


def test_render_json_parses():
    out = json.loads(render_analysis(ROW, "json"))
    assert out["slug"] == "my-page"


def test_render_pretty_and_unknown():
    assert "My Page" in render_analysis(ROW, "pretty")
    try:
        render_analysis(ROW, "xml")
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_render_sample_and_preflight(spark, pages_df):
    from fa_spark.pipeline import analyze_pages

    df = analyze_pages(pages_df.select("url", "warc_ts", "html", "text", "lang").limit(20))
    outs = render_sample(df, k=3)
    assert len(outs) == 3 and all("## Description" in o for o in outs)

    pf = preflight(spark)
    assert pf["arrow_enabled"] == "true" and pf["aqe_enabled"] == "true"
    assert pf["spark"].startswith("4.")
