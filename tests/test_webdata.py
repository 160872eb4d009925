"""Web structured data (round 6): JSON-LD, robots.txt, feeds, sitemaps.

The CC-pipeline companions to the main-content extractor; parsers must
be total over hostile input (return empty, never raise).
"""

import random

from fa_spark import pure


# ---------------------------------------------------------------------------
# JSON-LD
# ---------------------------------------------------------------------------


def test_jsonld_blocks_arrays_and_repair():
    html = (
        '<script type="application/ld+json">{"@type": "Article", "name": "a"}'
        "</script>"
        '<script type="application/ld+json">[{"@type": "Person"}, 42]</script>'
        '<script type="application/ld+json">{"@type": "Broken",</script>'
        '<script type="text/javascript">{"@type": "NotLd"}</script>'
    )
    got = pure.extract_jsonld(html)
    types = [b.get("@type") for b in got]
    assert types[:2] == ["Article", "Person"]
    assert "NotLd" not in types


def test_jsonld_cap_and_empty():
    many = '<script type="application/ld+json">{"a": 1}</script>' * 40
    assert len(pure.extract_jsonld(many, max_blocks=16)) == 16
    assert pure.extract_jsonld("") == []
    assert pure.extract_jsonld("<html>no scripts</html>") == []


# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------

ROBOTS = """# comment
User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /*.zip$
Crawl-delay: 10

User-agent: botA
User-agent: botB
Disallow: /
"""


def test_robots_longest_match_and_wildcards():
    g = pure.parse_robots(ROBOTS)
    cases = [
        ("/", True),
        ("/public", True),
        ("/private/x", False),
        ("/private/pub/x", True),  # longer Allow overrides
        ("/a/b/c.zip", False),  # anchored wildcard
        ("/a/b/c.zipper", True),  # $ anchor must not match mid-path
    ]
    for path, exp in cases:
        assert pure.robots_allowed(g, path) == exp, path


def test_robots_group_sharing_and_agent_fallback():
    g = pure.parse_robots(ROBOTS)
    # consecutive User-agent lines share one rule block
    assert pure.robots_allowed(g, "/anything", "botA") is False
    assert pure.robots_allowed(g, "/anything", "BOTB") is False
    # unknown agent falls back to *
    assert pure.robots_allowed(g, "/private/x", "other") is False


def test_robots_allow_wins_length_tie():
    g = pure.parse_robots("User-agent: *\nDisallow: /d/\nAllow: /d/\n")
    assert pure.robots_allowed(g, "/d/x") is True


def test_robots_empty_and_garbage_total():
    assert pure.robots_allowed(pure.parse_robots(""), "/x") is True
    garbage = "\x00\xff binary \n no colons \n :::\nDisallow /oops\n"
    g = pure.parse_robots(garbage)
    assert pure.robots_allowed(g, "/x") is True
    # hostile wildcard patterns must not raise
    g2 = pure.parse_robots("User-agent: *\nDisallow: /" + "*" * 500 + "$\n")
    pure.robots_allowed(g2, "/" + "a" * 200)


# ---------------------------------------------------------------------------
# feeds + sitemaps
# ---------------------------------------------------------------------------


def test_feed_rss_cdata_entities_and_atom_links():
    rss = (
        "<rss><channel><title>T &amp; U</title>"
        "<item><title><![CDATA[one <b>]]></title><link>http://a/1</link>"
        "<pubDate>Wed, 01 Jan 2026</pubDate></item>"
        "<item><title>two</title></item></channel></rss>"
    )
    f = pure.parse_feed(rss)
    assert f["kind"] == "rss" and f["title"] == "T & U"
    assert [i["title"] for i in f["items"]] == ["one <b>", "two"]
    assert f["items"][0]["link"] == "http://a/1"
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>AF</title>'
        '<entry><title>e1</title><link href="http://b/1"/>'
        "<updated>2026-01-02</updated></entry></feed>"
    )
    a = pure.parse_feed(atom)
    assert a["kind"] == "atom" and a["items"][0]["link"] == "http://b/1"
    assert a["title"] == "AF"  # feed title, not the entry title


def test_feed_non_feed_and_cap():
    assert pure.parse_feed("<html>nope</html>") is None
    assert pure.parse_feed("") is None
    many = "<rss><channel>" + "<item><title>x</title></item>" * 300
    assert len(pure.parse_feed(many, max_items=256)["items"]) == 256


def test_sitemap_urlset_and_index():
    sm = pure.parse_sitemap(
        "<urlset><url><loc>http://a/1</loc><lastmod>2026-01-03</lastmod>"
        "</url><url><loc>http://a/2</loc></url></urlset>"
    )
    assert sm["kind"] == "urlset" and len(sm["urls"]) == 2
    assert sm["urls"][0]["lastmod"] == "2026-01-03"
    idx = pure.parse_sitemap(
        "<sitemapindex><sitemap><loc>http://a/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert idx["kind"] == "sitemapindex" and len(idx["urls"]) == 1
    assert pure.parse_sitemap("<notasitemap/>") is None


def test_webdata_fuzz_never_raises():
    rnd = random.Random(613)
    seeds = [
        ROBOTS,
        "<rss><channel><item><title>t</title></item></channel></rss>",
        "<urlset><url><loc>http://a</loc></url></urlset>",
        '<script type="application/ld+json">{"@type": "A"}</script>',
    ]
    for seed in seeds:
        for _ in range(80):
            b = list(seed)
            for _ in range(rnd.randint(1, 6)):
                b[rnd.randrange(len(b))] = chr(rnd.randrange(1, 0x500))
            s = "".join(b)
            pure.extract_jsonld(s)
            pure.robots_allowed(pure.parse_robots(s), "/x")
            pure.parse_feed(s)
            pure.parse_sitemap(s)


def test_page_meta_extraction():
    html = (
        "<html><head><title> Ex &amp;\n co </title>"
        '<link href="https://ex.com/canon" rel="canonical">'
        '<meta property="og:type" content="article">'
        "<meta content='t 1' property=\"og:title\">"
        '<meta property="og:type" content="dup-ignored">'
        '<meta name="Description" content="d &quot;q&quot;">'
        '<meta name="empty" content="">'
        "<meta charset=utf-8>"
        "</head></html>"
    )
    m = pure.extract_page_meta(html)
    assert m["title"] == "Ex & co"  # entity + whitespace normalization
    assert m["canonical"] == "https://ex.com/canon"  # attr order agnostic
    assert m["og"] == {"type": "article", "title": "t 1"}  # first og wins
    assert m["meta"] == {"description": 'd "q"'}  # name lowercased
    assert pure.extract_page_meta("") == {
        "title": "", "canonical": "", "og": {}, "meta": {},
    }
    # rel is a token list (round-7 ADVICE)
    multi = '<link rel="canonical nofollow" href="https://ex.com/c2">'
    assert pure.extract_page_meta(multi)["canonical"] == "https://ex.com/c2"
    # link scan honors the same tag-count cap as meta
    flood = '<link rel="x" href="h">' * (pure.PAGE_META_MAX_TAGS + 5) + multi
    assert pure.extract_page_meta(flood)["canonical"] == ""


def test_page_meta_hostile_is_total_and_bounded():
    # unterminated tags, megabyte attribute bodies, tag floods
    pure.extract_page_meta("<meta " + "a" * (1 << 20))
    flood = '<meta name="n" content="c">' * 10_000
    m = pure.extract_page_meta(flood)
    assert m["meta"] == {"n": "c"}
    rnd = random.Random(99)
    seed = '<head><title>t</title><meta property="og:a" content="b"></head>'
    for _ in range(100):
        b = list(seed)
        for _ in range(rnd.randint(1, 5)):
            b[rnd.randrange(len(b))] = chr(rnd.randrange(1, 0x500))
        pure.extract_page_meta("".join(b))


def test_zstd_raw_roundtrip_and_gates():
    for n in (0, 1, 255, 256, 70000, 200000):
        payload = bytes((i * 37) & 0xFF for i in range(n))
        frame = pure.zstd_raw_encode(payload)
        assert pure.decode_zstd_raw(frame) == payload
        assert pure.sniff_bytes(frame)["content_type"] == "zstd"
        meta = pure._parse_zstd_meta(frame)
        assert meta["zstd:content_size"] == str(n)
    # RLE block
    rle = pure.ZSTD_MAGIC + bytes([0x20, 9]) + (
        ((9 << 3) | (1 << 1) | 1).to_bytes(3, "little") + b"z"
    )
    assert pure.decode_zstd_raw(rle) == b"z" * 9
    # compressed block type stays envelope-only
    comp = pure.ZSTD_MAGIC + bytes([0x20, 5]) + (
        ((5 << 3) | (2 << 1) | 1).to_bytes(3, "little") + b"abcde"
    )
    assert pure.decode_zstd_raw(comp) is None
    # declared size disagreement rejected
    bad = bytearray(pure.zstd_raw_encode(b"abc"))
    bad[5] = 9
    assert pure.decode_zstd_raw(bytes(bad)) is None


def test_zstd_multi_frame_stream():
    """Round-7 ADVICE: concatenated data frames append, skippable
    frames are hopped, and trailing garbage rejects the whole decode."""
    a, b = pure.zstd_raw_encode(b"hello "), pure.zstd_raw_encode(b"world")
    skip = (
        (pure.ZSTD_SKIP_MAGIC_LO + 7).to_bytes(4, "little")
        + (4).to_bytes(4, "little")
        + b"meta"
    )
    assert pure.decode_zstd_raw(a + b) == b"hello world"
    assert pure.decode_zstd_raw(a + skip + b) == b"hello world"
    # round-8 ADVICE: LEADING skippable frames are valid RFC 8878 —
    # writers emit metadata frames before the first data frame
    assert pure.decode_zstd_raw(skip + a) == b"hello "
    assert pure.decode_zstd_raw(skip + skip + a + b) == b"hello world"
    assert pure.decode_zstd_raw(skip) is None  # all-skippable: no content
    assert pure.decode_zstd_raw(skip + skip) is None
    assert pure.decode_zstd_raw(skip + b"garbage") is None
    assert pure.decode_zstd_raw(skip[:6]) is None  # truncated leading skip
    assert pure.decode_zstd_raw(a + b"garbage") is None
    assert pure.decode_zstd_raw(a + skip[:6]) is None  # truncated skippable
    # skippable declaring more bytes than remain
    over = pure.ZSTD_SKIP_MAGIC_LO.to_bytes(4, "little") + (99).to_bytes(
        4, "little"
    )
    assert pure.decode_zstd_raw(a + over) is None
    # per-frame declared-size check still holds on the SECOND frame
    bad = bytearray(b)
    bad[5] = 9
    assert pure.decode_zstd_raw(a + bytes(bad)) is None


def test_zstd_hostile_total():
    d = pure.zstd_raw_encode(b"payload " * 64)
    for cut in range(len(d)):
        pure.decode_zstd_raw(d[:cut])
    rnd = random.Random(65)
    for _ in range(400):
        b = bytearray(d)
        for _ in range(4):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        pure.decode_zstd_raw(bytes(b))


def test_xz_sniffed():
    assert pure.sniff_bytes(b"\xfd7zXZ\x00\x00\x04" + b"\0" * 32)[
        "content_type"
    ] == "xz"


def test_webp_envelope_three_layouts():
    """Round 7: WebP envelope — the modern web's dominant image
    container; all three layouts parse (payload decode stays the
    documented envelope-only tier)."""
    lossy = pure.webp_encode_envelope("lossy", 320, 240)
    assert pure.sniff_bytes(lossy)["content_type"] == "webp"
    m = pure.extract_metadata(lossy)
    assert m["webp:format"] == "lossy"
    assert (m["webp:width"], m["webp:height"]) == ("320", "240")
    m = pure.extract_metadata(pure.webp_encode_envelope("lossless", 16, 9, alpha=1))
    assert m["webp:format"] == "lossless"
    assert (m["webp:width"], m["webp:height"], m["webp:alpha"]) == ("16", "9", "1")
    m = pure.extract_metadata(
        pure.webp_encode_envelope("extended", 4096, 2160, alpha=1, animation=1)
    )
    assert m["webp:format"] == "extended"
    assert (m["webp:width"], m["webp:height"]) == ("4096", "2160")
    assert (m["webp:alpha"], m["webp:animation"]) == ("1", "1")
    # a WAVE riff must NOT be retyped
    w = pure.wav_encode([0] * 160, 16000)
    assert pure.sniff_bytes(w)["content_type"] == "riff"
    # interframe-first / missing start code stay kind-only
    bad = bytearray(pure.webp_encode_envelope("lossy", 32, 32))
    bad[20] |= 1  # frame tag: interframe
    mm = pure._parse_webp_meta(bytes(bad))
    assert mm["webp:kind"] == "VP8" and "webp:width" not in mm


def test_webp_hostile_total():
    import random

    rnd = random.Random(31)
    base = pure.webp_encode_envelope("extended", 100, 50)
    for cut in range(len(base)):
        pure._parse_webp_meta(base[:cut])
        pure.sniff_bytes(base[:cut])
    for _ in range(300):
        b = bytearray(base)
        for _ in range(4):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        pure.extract_metadata(bytes(b))
