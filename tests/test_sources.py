from __future__ import annotations

import os

from fa_spark.sources import (
    capped,
    extension_filter,
    glob_filter,
    globs_to_regex,
    read_loose_files,
)


def _mktree(root):
    files = {
        "a/page1.html": b"<html><body><p>" + b"alpha " * 20 + b"</p></body></html>",
        "a/page2.HTML": b"<html><body><p>" + b"beta " * 20 + b"</p></body></html>",
        "a/skip.tmp": b"temp",
        "b/doc.pdf": b"%PDF-1.4 fake",
        "b/image.png": b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,
        "b/notes.txt": b"plain text notes here",
    }
    for rel, data in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)
    return files


def test_loose_files_and_filters(spark, tmp_path):
    root = str(tmp_path / "tree")
    files = _mktree(root)

    df = read_loose_files(spark, root)
    assert df.count() == len(files)
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}

    # S2: include/exclude globs
    inc = glob_filter(df, include=["*.html", "*.HTML", "*.pdf"])
    assert inc.count() == 3
    exc = glob_filter(df, exclude=["*.tmp", "*/b/*"])
    assert exc.count() == 2

    # S3: extension filter is case-insensitive
    assert extension_filter(df, {"html"}).count() == 2
    assert extension_filter(df, {"png", "pdf"}).count() == 2

    # S4: deterministic cap
    urls1 = [r["url"] for r in capped(df, 3).collect()]
    urls2 = [r["url"] for r in capped(df.repartition(5), 3).collect()]
    assert urls1 == urls2 == sorted(r for r in urls1)


def test_glob_translation_matches_fnmatch():
    import re

    rx = re.compile(globs_to_regex(["*.html", "page?.txt"]))
    assert rx.match("x/deep/file.html".replace("/", "_")) or rx.match("file.html")
    assert rx.match("page1.txt")
    assert not rx.match("page12.txt")


def test_loose_files_feed_pipeline(spark, tmp_path):
    from pyspark.sql import functions as F

    from fa_spark.pipeline import analyze_pages

    root = str(tmp_path / "tree2")
    _mktree(root)
    df = read_loose_files(spark, root)
    out = analyze_pages(df)
    got = {
        os.path.basename(r["url"]): r["ct"]
        for r in out.select("url", F.col("sniff.content_type").alias("ct")).collect()
    }
    assert got["doc.pdf"] == "pdf"
    assert got["image.png"] == "png"
    assert got["page1.html"] == "html"
