"""Link-extraction kernel + web-graph operator fixtures."""

from boilerplate_buster_spark.core.weblinks import extract_links_html
from boilerplate_buster_spark.operators.weblinks import (
    extract_links,
    link_graph_degrees,
)


def test_kernel_resolution_and_anchor_text():
    html = (
        '<html><body><a href="/x">Go  <b>deep</b>\nnow</a>'
        '<a href="https://abs.example/y">abs &amp; more</a>'
        '<a href="sub/page">rel</a>'
        "<a>no href</a>"
        '<script>var a = \'<a href="https://fake/">nope</a>\';</script>'
        "</body></html>"
    )
    got = extract_links_html(html, base_url="https://host.com/dir/page")
    assert got == [
        ("https://host.com/x", "Go deep now"),
        ("https://abs.example/y", "abs & more"),
        ("https://host.com/dir/sub/page", "rel"),
    ]


def test_kernel_edge_cases():
    # nested <a> closes the outer; unterminated trailing <a> still emits
    html = '<a href="/a">one <a href="/b">two</a> <a href="/c">tail'
    got = extract_links_html(html, base_url="https://h.io/")
    assert got == [
        ("https://h.io/a", "one"),
        ("https://h.io/b", "two"),
        ("https://h.io/c", "tail"),
    ]
    assert extract_links_html(None) == []
    assert extract_links_html(b'<a href="/p">bytes</a>', "https://b.co/") == [
        ("https://b.co/p", "bytes")
    ]


def test_operator_edges_and_degrees(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/1", '<a href="https://b.com/">B</a><a href="/self">S</a>'),
            ("https://b.com/", '<a href="https://a.com/1">back</a>'),
            ("https://c.com/", "<p>no links</p>"),
        ],
        ["url", "html"],
    )
    edges = {
        (r["url"], r["href"], r["anchor"])
        for r in extract_links(pages).collect()
    }
    assert edges == {
        ("https://a.com/1", "https://b.com/", "B"),
        ("https://a.com/1", "https://a.com/self", "S"),
        ("https://b.com/", "https://a.com/1", "back"),
    }
    deg = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in link_graph_degrees(extract_links(pages)).collect()
    }
    assert deg["https://a.com/1"] == (2, 1)
    assert deg["https://b.com/"] == (1, 1)
    assert deg["https://a.com/self"] == (0, 1)
    assert "https://c.com/" not in deg  # no edges either way


def test_pagerank_integer_semantics(spark):
    from boilerplate_buster_spark.operators.weblinks import pagerank_scaled

    # star graph: hub links to 3 leaves, leaves link back to hub
    rows = [("hub", f"leaf{i}", "") for i in range(3)] + [
        (f"leaf{i}", "hub", "") for i in range(3)
    ]
    links = spark.createDataFrame(rows, ["url", "href", "anchor"])
    base = 1_000_000_000
    pr = {r["node"]: r["pr"] for r in pagerank_scaled(links, iters=3).collect()}
    # 4 nodes; symmetric leaves must tie exactly; hub collects 3 whole
    # leaf contributions vs a leaf's third of the hub -> hub ranks highest
    assert len(pr) == 4
    assert pr["leaf0"] == pr["leaf1"] == pr["leaf2"]
    assert pr["hub"] > pr["leaf0"]
    # hand-rolled integer replica, 3 sweeps
    n = 4
    p = {v: base // n for v in pr}
    for _ in range(3):
        inflow = {v: 0 for v in pr}
        for u, v, _a in rows:
            inflow[v] += p[u] // 3 if u == "hub" else p[u] // 1
        p = {
            v: (15 * (base // n)) // 100 + (85 * inflow[v]) // 100 for v in pr
        }
    assert pr == p


def test_anchor_text_index(spark):
    from boilerplate_buster_spark.operators.weblinks import anchor_text_index

    edges = spark.createDataFrame(
        [
            ("p1", "https://t.com/x", "Click"),
            ("p1", "https://t.com/x", "Here"),
            ("p2", "https://t.com/x", "Click"),
            ("p2", "https://t.com/y", "Other"),
        ],
        ["url", "href", "anchor"],
    )
    got = {r["href"]: r for r in anchor_text_index(edges).collect()}
    x = got["https://t.com/x"]
    assert x["n_links"] == 3 and x["n_sources"] == 2
    assert x["anchors"] == "Click|Here"
    y = got["https://t.com/y"]
    assert y["n_links"] == 1 and y["n_sources"] == 1 and y["anchors"] == "Other"


def test_triangle_count_known_and_bruteforce(spark):
    import itertools
    import random

    from boilerplate_buster_spark.operators.weblinks import triangle_count

    # K4 has 4 triangles; a pendant edge adds none; duplicate/reversed/
    # self-loop edges must collapse
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(b, a) for a, b in k4] + [(0, 0), (3, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    [r] = triangle_count(df).collect()
    assert (r.n_edges, r.n_triangles) == (7, 4)

    # brute-force cross-check on a seeded random graph
    rng = random.Random(7)
    es = {(min(a, b), max(a, b))
          for a, b in (sorted(rng.sample(range(12), 2)) for _ in range(30))}
    df2 = spark.createDataFrame(sorted(es), ["src", "dst"])
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = sum(
        1 for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    [r2] = triangle_count(df2).collect()
    assert r2.n_triangles == expected
