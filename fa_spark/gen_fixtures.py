"""Deterministic synthetic `pages` table generator (FIXTURES.md §1).

seed=42, numpy Generator only — no Python ``hash()``, no wall clock
(the reference's nondeterminism pitfalls at
/root/reference/src/cli/benchmark/samples.py:176-178,200 are NOT copied).

Schema matches BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
plus generator-ground-truth columns used only by tests:
    gt_case string          -- which content-mix case produced the row
    gt_text string          -- the main text the generator embedded (oracle target)

Host ids follow a Zipf(1.2) distribution so host-domain skew is real
(exercises the salted dedup shuffle, SURVEY.md §2.4 J1).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

WORDS = (
    "crawl spark parquet shuffle partition executor arrow batch schema column "
    "vector codegen catalyst iceberg snapshot lineage checkpoint broadcast "
    "skew salt bucket window aggregate join filter project scan limit sort "
    "hash merge text page host domain article content block density link "
    "token corpus quality language model training data pipeline extract"
).split()

NAV_LINKS = ("home", "about", "products", "contact", "login", "register",
             "privacy", "terms", "sitemap", "careers", "blog", "support")

# Content-mix shares per FIXTURES.md §1 (cumulative over 100).
# Round 2: 2% of the former non-HTML share became REAL single-page PDFs —
# a CC-scale corpus is several percent PDF and the extractor now parses them
# (north_rule "PDF/layout parse").
CASES = (
    ("article", 60),
    ("boiler_heavy", 10),
    ("truncated", 8),
    ("spam", 6),
    ("non_html", 3),
    ("pdf", 2),
    ("bad_charset", 4),
    ("exact_dup", 3),
    ("near_dup", 2),
    ("empty", 1),
    ("embedded_img", 1),
)

_MAGICS = (b"%PDF-1.7\n%fake", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,
           b"GIF89a" + b"\x00" * 10, b"PK\x03\x04" + b"\x00" * 10,
           b"\x1f\x8b\x08" + b"\x00" * 10)


def _sentence(rng: np.random.Generator, n: int) -> str:
    idx = rng.integers(0, len(WORDS), size=n)
    words = [WORDS[i] for i in idx]
    return " ".join(words).capitalize() + "."


def _paragraph(rng: np.random.Generator) -> str:
    # >= MIN_CONTENT_WORDS words guaranteed (min 12 per sentence)
    return " ".join(_sentence(rng, int(rng.integers(12, 24))) for _ in range(int(rng.integers(1, 4))))


def _nav_html(rng: np.random.Generator) -> str:
    k = int(rng.integers(4, 9))
    items = "".join(
        f'<li><a href="/{NAV_LINKS[int(rng.integers(0, len(NAV_LINKS)))]}">'
        f"{NAV_LINKS[int(rng.integers(0, len(NAV_LINKS)))]}</a></li>"
        for _ in range(k)
    )
    return f"<nav><ul>{items}</ul></nav>"


def _sidebar_html(rng: np.random.Generator) -> str:
    k = int(rng.integers(5, 12))
    links = "".join(
        f'<p><a href="/x/{i}">{_sentence(rng, 3)}</a></p>' for i in range(k)
    )
    return f'<aside class="sidebar">{links}</aside>'


def _pdf_page(title: str, paras: list[str]) -> bytes:
    """Minimal real single-page PDF: catalog/pages/page objects, an
    uncompressed content stream (title + one Tj line per paragraph), and an
    /Info dict. ASCII-only by construction (WORDS vocabulary)."""
    lines = [title] + paras
    content = "BT /F1 12 Tf 72 720 Td " + " 0 -14 Td ".join(
        f"({ln}) Tj" for ln in lines
    ) + " ET"
    return (
        "%PDF-1.4\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        f"4 0 obj << /Length {len(content)} >>\nstream\n{content}\nendstream\nendobj\n"
        f"5 0 obj << /Title ({title}) >> endobj\n"
        "trailer << /Root 1 0 R /Info 5 0 R >>\n%%EOF\n"
    ).encode("ascii")


def _article_html(rng: np.random.Generator, title: str, paras: list[str]) -> str:
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        "<!DOCTYPE html><html><head>"
        f"<meta charset=\"utf-8\"><meta name=\"description\" content=\"{title}\">"
        f"<title>{title}</title></head><body>"
        f"{_nav_html(rng)}<header><p>{_sentence(rng, 4)}</p></header>"
        f"<main><h1>{title}</h1>{body}</main>"
        f"{_sidebar_html(rng)}"
        f"<footer><p>copyright example corp {_sentence(rng, 3)}</p></footer>"
        "</body></html>"
    )


def gen_pages(n_rows: int, seed: int = SEED, n_hosts: int = 200) -> pa.Table:
    rng = np.random.default_rng(seed)
    # Zipf(1.2) host skew, clipped to n_hosts
    hosts = np.minimum(rng.zipf(1.2, size=n_rows), n_hosts) - 1

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    tss: list[dt.datetime] = []
    cases: list[str] = []
    gt_texts: list[str] = []

    lang_choices = np.array(["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"])
    dup_pool: list[tuple[bytes, str]] = []  # (html, gt_text) of earlier articles

    for i in range(n_rows):
        r = int(rng.integers(0, 100))
        acc = 0
        case = "article"
        for name, share in CASES:
            acc += share
            if r < acc:
                case = name
                break
        host = int(hosts[i])
        url = f"https://host{host}.example/p{host % 7}/{i}.html"
        lang = str(lang_choices[int(rng.integers(0, len(lang_choices)))])
        title = _sentence(rng, int(rng.integers(3, 7)))[:-1]

        if case == "article":
            paras = [_paragraph(rng) for _ in range(int(rng.integers(2, 6)))]
            html = _article_html(rng, title, paras).encode("utf-8")
            gt = "\n\n".join([title] + paras)
            if len(dup_pool) < 64:
                dup_pool.append((html, gt))
        elif case == "boiler_heavy":
            paras = [_paragraph(rng)]
            boiler = "".join(
                f"<footer><p>{_sentence(rng, 20)}</p></footer>" for _ in range(6)
            )
            html = (
                f"<html><head><title>{title}</title></head><body>"
                f"{_nav_html(rng)}{boiler}<main><h1>{title}</h1>"
                f"<p>{paras[0]}</p></main>{boiler}</body></html>"
            ).encode("utf-8")
            gt = "\n\n".join([title, paras[0]])
        elif case == "truncated":
            paras = [_paragraph(rng) for _ in range(2)]
            full = _article_html(rng, title, paras)
            cut = int(len(full) * 0.6)
            html = full[:cut].encode("utf-8")
            gt = ""  # oracle decides; tests compare spark==oracle, not vs gt
        elif case == "spam":
            phrase = _sentence(rng, 3)
            paras = [" ".join([phrase[:-1]] * 100) + "."]
            html = _article_html(rng, title, paras).encode("utf-8")
            gt = "\n\n".join([title] + paras)
        elif case == "non_html":
            html = bytes(_MAGICS[int(rng.integers(0, len(_MAGICS)))]) + bytes(
                rng.integers(0, 256, size=int(rng.integers(64, 512))).astype(np.uint8)
            )
            gt = ""
        elif case == "pdf":
            paras = [_paragraph(rng) for _ in range(int(rng.integers(1, 4)))]
            html = _pdf_page(title, paras)
            gt = "\n".join([title] + paras)
            url = url[: -len(".html")] + ".pdf"
        elif case == "bad_charset":
            para = _paragraph(rng) + " café naïve résumé"
            html = (
                "<html><head><meta charset=\"utf-8\"><title>"
                + title
                + "</title></head><body><main><h1>"
                + title
                + "</h1><p>"
                + para
                + "</p></main></body></html>"
            ).encode("latin-1")  # declared utf-8, actually latin-1
            gt = ""
        elif case == "exact_dup" and dup_pool:
            j = int(rng.integers(0, len(dup_pool)))
            html, gt = dup_pool[j]
        elif case == "near_dup" and dup_pool:
            j = int(rng.integers(0, len(dup_pool)))
            base_html, base_gt = dup_pool[j]
            extra = _sentence(rng, 12)
            html = base_html.replace(
                b"</main>", f"<p>{extra}</p></main>".encode("utf-8"), 1
            )
            gt = base_gt + "\n\n" + extra
        elif case == "empty":
            choice = int(rng.integers(0, 3))
            html = (b"", b"<html></html>", b"<html><body></body></html>")[choice]
            gt = ""
        elif case == "embedded_img":
            paras = [_paragraph(rng)]
            # data-uri JPEG with APP1 EXIF marker bytes, base64 of a fake header
            fake = "/9j/4AAQSkZJRgABAQAAAQABAAD/4QBiRXhpZgAATU0AKg" + "A" * 32
            html = (
                f"<html><head><title>{title}</title></head><body><main>"
                f"<h1>{title}</h1><p>{paras[0]}</p>"
                f'<img src="data:image/jpeg;base64,{fake}"></main></body></html>'
            ).encode("utf-8")
            gt = "\n\n".join([title, paras[0]])
        else:  # dup cases with empty pool degrade to article
            paras = [_paragraph(rng) for _ in range(2)]
            html = _article_html(rng, title, paras).encode("utf-8")
            gt = "\n\n".join([title] + paras)
            case = "article"

        urls.append(url)
        htmls.append(html)
        texts.append(gt)
        langs.append(lang)
        tss.append(EPOCH + dt.timedelta(seconds=i))
        cases.append(case)
        gt_texts.append(gt)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "gt_case": pa.array(cases, pa.string()),
            "gt_text": pa.array(gt_texts, pa.string()),
        }
    )


def write_pages(path: str, n_rows: int, seed: int = SEED) -> str:
    tbl = gen_pages(n_rows, seed)
    pq.write_table(tbl, path, compression="zstd")
    return path


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else "fixtures/pages.parquet"
    import os

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    print(write_pages(out, n), n, "rows")
