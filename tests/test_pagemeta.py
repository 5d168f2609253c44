"""Head-metadata and sitemap kernel fixtures."""

from boilerplate_buster_spark.core.htmlmeta import extract_meta
from boilerplate_buster_spark.core.sitemapparse import parse_sitemap


def test_extract_meta_fields_and_first_wins():
    html = (
        '<html lang="en-US"><head>'
        "<title>  First   Title </title><title>Second</title>"
        '<meta charset="UTF-8">'
        '<meta name="Description" content="a &amp; b">'
        '<meta property="og:title" content="OG name">'
        '<link rel="stylesheet canonical" href="https://c.example/x">'
        '<link rel="canonical" href="https://c.example/y">'
        "</head><body></body></html>"
    )
    m = extract_meta(html)
    assert m["title"] == "First Title"
    assert m["description"] == "a & b"
    assert m["og_title"] == "OG name"
    assert m["canonical"] == "https://c.example/x"  # rel token list matches
    assert m["lang"] == "en-US"
    assert m["charset"] == "UTF-8"
    # http-equiv charset path
    m2 = extract_meta(
        '<meta http-equiv="content-type" '
        'content="text/html; charset=windows-1251">'
    )
    assert m2["charset"] == "windows-1251"
    assert extract_meta(None)["title"] == ""


def test_parse_sitemap_urlset_and_index():
    is_idx, es = parse_sitemap(
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/x">'
        "<url><loc>https://a/1</loc><lastmod>2026-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc> https://a/2 </loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    assert not is_idx
    assert es == [
        {"loc": "https://a/1", "lastmod": "2026-01-02",
         "changefreq": "daily", "priority": "0.8"},
        {"loc": "https://a/2", "lastmod": "", "changefreq": "", "priority": ""},
    ]
    is_idx2, es2 = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert is_idx2 and es2[0]["loc"] == "https://a/s1.xml"
    assert parse_sitemap(b"not xml at all") == (False, [])


def test_extract_tables_kernel():
    from boilerplate_buster_spark.core.htmltables import extract_tables

    html = (
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1<td>2</tr>"  # implied </td> closes
        "<tr><td>x &amp; y</td><td>z</td></tr></table>"
        "<table><td>loose</table>"  # implied row, unterminated-ish
    )
    t = extract_tables(html)
    assert t[0] == [
        [("A", True), ("B", True)],
        [("1", False), ("2", False)],
        [("x & y", False), ("z", False)],
    ]
    assert t[1] == [[("loose", False)]]
    # nested table is its own result (emitted first - it closes first)
    t2 = extract_tables(
        "<table><tr><td>pre<table><tr><td>in</td></tr></table></td></tr></table>"
    )
    assert t2[0] == [[("in", False)]]
    assert t2[1] == [[("pre", False)]]
    assert extract_tables(None) == []
    assert extract_tables("<p>no tables</p>") == []


def test_extract_jsonld(spark):
    from boilerplate_buster_spark.operators.pagemeta import extract_jsonld

    pages = spark.createDataFrame(
        [
            (
                "u1",
                '<html><script type="application/ld+json">'
                '{"@type":"Article","name":"N1","author":{"name":"A1"}}'
                "</script><body>x</body></html>",
            ),
            (
                "u2",
                '<script type="application/ld+json">{"@type":"A","name":"a"}'
                '</script><script type="application/ld+json">'
                '{"@type":"BreadcrumbList","name":"b"}</script>',
            ),
            ("u3", '<script type="application/ld+json">{oops</script>'),
            ("u4", "<html><body>no blocks</body></html>"),
        ],
        ["url", "html"],
    )
    rows = extract_jsonld(pages).collect()
    by = {(r["url"], r["block_idx"]): r for r in rows}
    assert by[("u1", 0)]["jtype"] == "Article"
    assert by[("u1", 0)]["name"] == "N1"
    assert by[("u1", 0)]["author_name"] == "A1"
    assert by[("u2", 0)]["jtype"] == "A" and by[("u2", 1)]["jtype"] == "BreadcrumbList"
    assert by[("u2", 0)]["author_name"] is None
    # malformed json -> NULL fields, never an error (PERMISSIVE)
    assert by[("u3", 0)]["jtype"] is None and by[("u3", 0)]["name"] is None
    # pages with no blocks emit no rows
    assert not any(u == "u4" for u, _ in by)
    assert len(rows) == 4


def test_parse_feed_rss_and_atom():
    from boilerplate_buster_spark.core.feedparse import parse_feed

    rss = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        "<title>c</title>"
        "<item><title>A</title><link>https://x/a</link>"
        "<pubDate>Mon, 01 Jan 2026 00:00:00 GMT</pubDate></item>"
        "<item><title>B</title><link>https://x/b</link></item>"
        "</channel></rss>"
    )
    assert parse_feed(rss) == [
        ("A", "https://x/a", "Mon, 01 Jan 2026 00:00:00 GMT"),
        ("B", "https://x/b", ""),
    ]
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>'
        '<entry><title>E1</title><link rel="self" href="https://x/self"/>'
        '<link rel="alternate" href="https://x/e1"/>'
        "<published>2026-01-02</published></entry>"
        '<entry><title>E2</title><link href="https://x/e2"/>'
        "<updated>2026-01-03</updated></entry></feed>"
    )
    assert parse_feed(atom) == [
        ("E1", "https://x/e1", "2026-01-02"),
        ("E2", "https://x/e2", "2026-01-03"),
    ]
    assert parse_feed("<html>not a feed</html>") == []
    assert parse_feed("<rss><channel><item>") == []  # malformed -> skip


def test_feed_entries_operator(spark):
    from boilerplate_buster_spark.operators.pagemeta import feed_entries

    rows = [
        ("https://a/feed", '<rss version="2.0"><channel>'
         "<item><title>t0</title><link>https://a/0</link></item>"
         "<item><title>t1</title><link>https://a/1</link></item>"
         "</channel></rss>"),
        ("https://b/feed", "broken <xml"),
    ]
    df = spark.createDataFrame(rows, ["feed_url", "xml"])
    got = [
        (r["feed_url"], r["item_idx"], r["title"], r["link"])
        for r in feed_entries(df).orderBy("feed_url", "item_idx").collect()
    ]
    assert got == [
        ("https://a/feed", 0, "t0", "https://a/0"),
        ("https://a/feed", 1, "t1", "https://a/1"),
    ]


def test_parse_feed_never_crashes_on_garbage():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from boilerplate_buster_spark.core.feedparse import parse_feed

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def run(s):
        out = parse_feed(s)
        assert isinstance(out, list)
        for t in out:
            assert len(t) == 3 and all(isinstance(x, str) for x in t)

    run()


def test_parse_feed_never_crashes_on_mutated_feed():
    import random

    from boilerplate_buster_spark.core.feedparse import parse_feed

    base = (
        '<rss version="2.0"><channel><item><title>A</title>'
        "<link>https://x/a</link><pubDate>d</pubDate></item>"
        "</channel></rss>"
    )
    rng = random.Random(7)
    for _ in range(300):
        s = list(base)
        for _ in range(rng.randrange(1, 5)):
            i = rng.randrange(len(s))
            op = rng.randrange(3)
            if op == 0:
                del s[i]
            elif op == 1:
                s.insert(i, rng.choice("<>/&;\"' abc"))
            else:
                s[i] = rng.choice("<>/&;\"' abc")
        out = parse_feed("".join(s))
        assert isinstance(out, list)


def test_heading_outline_parenting_and_malformed(spark):
    from boilerplate_buster_spark.core.htmlmeta import extract_outline
    from boilerplate_buster_spark.operators.pagemeta import heading_outline

    # level jumps down AND up; h4 after h2 parents to the h2
    html = ("<body><h1>A</h1><h3>B</h3><h2>C</h2><h4>D</h4>"
            "<h1>E</h1><h6>F</h6></body>")
    got = extract_outline(html)
    assert got == [
        (0, 1, "A", -1), (1, 3, "B", 0), (2, 2, "C", 0),
        (3, 4, "D", 2), (4, 1, "E", -1), (5, 6, "F", 4),
    ]
    # unclosed heading never emits; nested markup text concatenates
    assert extract_outline("<h2>one <b>two</b></h2><h3>never") == [
        (0, 2, "one two", -1)
    ]
    assert extract_outline(None) == [] and extract_outline(b"<h1>x</h1>") == [
        (0, 1, "x", -1)
    ]
    # distributed path: one row per heading
    pages = spark.createDataFrame([("u1", html)], ["url", "html"])
    assert heading_outline(pages).count() == 6


def test_outline_parser_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from boilerplate_buster_spark.core.htmlmeta import extract_outline

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=400))
    def run(s):
        out = extract_outline(s)
        # structural invariants hold on ANY input
        for pos, (p, level, text, parent) in enumerate(out):
            assert p == pos and 1 <= level <= 6 and parent < pos
            assert parent == -1 or out[parent][1] < level

    run()

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=300))
    def run_bytes(b):
        extract_outline(b)

    run_bytes()

    # structured mutation: shuffle/truncate real heading markup
    import random

    rng = random.Random(9)
    base = "<h1>a</h1><h2>b</h2><h3>c</h3><h2>d</h2><h6>e</h6>"
    for _ in range(200):
        cut = rng.randrange(len(base))
        mutated = base[:cut] + base[cut + rng.randrange(1, 4):]
        extract_outline(mutated)  # must not raise
