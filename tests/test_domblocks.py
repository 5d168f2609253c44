"""DOM block-statistics kernel + heuristic extraction operator.

Pins: block-boundary equivalence with html_to_text (the Stage-1 parse),
link-char accounting, skip regions, misnesting tolerance, and the
Catalyst-side Boilerpipe/jusText-style classifier end-to-end."""

import pyspark.sql.functions as F
import pytest

from boilerplate_buster_spark.core.domblocks import html_to_blocks
from boilerplate_buster_spark.core.htmlparse import html_to_text
from boilerplate_buster_spark.operators.domheuristics import (
    dom_blocks,
    extract_by_heuristics,
)
from boilerplate_buster_spark.sources.pages import generate_pages_local

PAGE = (
    '<html><head><title>x</title><style>p{}</style></head><body>'
    '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
    "<h1>Doc 42</h1>"
    "<p>some long paragraph of real content here</p>"
    '<div><a href="#">share</a> like</div>'
    '<footer><a href="#">Privacy</a> copyright 2026</footer>'
    "</body></html>"
)


def test_blocks_and_stats():
    b = html_to_blocks(PAGE)
    assert [x["tag"] for x in b] == ["nav", "h1", "p", "div", "footer"]
    assert [x["link_chars"] for x in b] == [9, 0, 0, 5, 7]
    assert b[0]["text"] == "Home About" and b[0]["n_chars"] == 10
    assert all(x["depth"] == 1 for x in b)


def test_join_equals_html_to_text():
    # the block boundaries must be EXACTLY Stage 1's, on adversarial pages
    cases = [
        PAGE,
        "<div><div>nested <b>bold</b></div>tail</div>",
        "<p>mis</i>nested</div></p><li>item",
        "plain text no tags at all",
        "<ul><li>a<li>b</ul>after",  # unclosed li
        "<table><tr><td>c1<td>c2</table>",
    ]
    for html in cases:
        got = "\n".join(x["text"] for x in html_to_blocks(html))
        assert got == html_to_text(html), html


def test_generated_pages_roundtrip():
    rows, _golden = generate_pages_local(40, seed=7)
    for r in rows:
        got = "\n".join(x["text"] for x in html_to_blocks(r["html"]))
        assert got == html_to_text(r["html"])


def test_skip_and_entities_and_bytes():
    b = html_to_blocks("<p>a &amp; b</p><script>var x = '<p>no</p>'</script>")
    assert [x["text"] for x in b] == ["a & b"]
    # bytes path goes through the BOM-sniffing decoder
    b16 = html_to_blocks("<p>héllo</p>".encode("utf-16"))
    assert [x["text"] for x in b16] == ["héllo"]
    assert html_to_blocks(None) == []


def test_nested_depth_and_link_in_parent():
    b = html_to_blocks('<div>pre <a href="#">ln</a><p>inner</p>post</div>')
    # "pre ln" flushed when <p> opens: enclosing tag div, depth 1
    assert b[0] == {
        "text": "pre ln", "tag": "div", "depth": 1, "n_chars": 6,
        "link_chars": 2,
    }
    assert b[1]["tag"] == "p" and b[1]["depth"] == 2
    assert b[2]["tag"] == "div" and b[2]["text"] == "post"


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(
        [
            ("u1", PAGE),
            ("u2", "<p>short</p>"),  # < 3 tokens -> dropped entirely
            ("u3", "<p>first good paragraph kept</p><nav>x y z w</nav>"
                   "<p>second good paragraph kept</p>"),
        ],
        "url string, html string",
    )


def test_dom_blocks_operator(spark, pages_df):
    rows = dom_blocks(pages_df).where(F.col("url") == "u1").collect()
    assert [r.tag for r in rows] == ["nav", "h1", "p", "div", "footer"]
    assert [r.link_chars for r in rows] == [9, 0, 0, 5, 7]
    assert [r.block_id for r in rows] == list(range(5))


def test_extract_by_heuristics(spark, pages_df):
    got = {r.url: r.extracted_text
           for r in extract_by_heuristics(pages_df).collect()}
    # u1: nav/footer = bad tag, h1 = 2 tokens, div = 50% links -> only <p>
    assert got["u1"] == "some long paragraph of real content here"
    assert got["u2"] == ""  # all-boilerplate page keeps its row
    assert got["u3"] == "first good paragraph kept\nsecond good paragraph kept"


def test_parse_is_a_pure_map(spark, pages_df):
    # no Exchange below the Arrow parse; extraction has exactly one shuffle
    plan = dom_blocks(pages_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    eplan = (
        extract_by_heuristics(pages_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert eplan.count("Exchange") == 1


def test_extract_one_row_per_url_even_all_boilerplate(spark):
    """ADVICE round-3: a page whose every block is boilerplate (or with no
    text blocks) must still yield a row with extracted_text='' - downstream
    one-row-per-url joins rely on it."""
    from boilerplate_buster_spark.operators.domheuristics import (
        extract_by_heuristics,
    )

    pages = spark.createDataFrame(
        [
            ("u1", "<html><body><nav><a href='/'>Home nav here</a></nav></body></html>"),
            ("u2", "<html><body></body></html>"),
            ("u3", "<html><body><p>real content body three tokens</p></body></html>"),
        ],
        ["url", "html"],
    )
    rows = {r["url"]: r["extracted_text"] for r in extract_by_heuristics(pages).collect()}
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u1"] == "" and rows["u2"] == ""
    assert rows["u3"] == "real content body three tokens"
