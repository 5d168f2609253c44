"""URL featurization / blocklist filtering / PII redaction fixtures."""

from boilerplate_buster_spark.operators.urls import (
    redact_pii,
    url_blocklist_filter,
    url_features,
)


def test_url_features_parse(spark):
    urls = [
        ("https://www.shop.example.co/a/b/c?x=1&y=2&z=3",),
        ("http://example.com/",),
        ("https://sub.deep.site.org/path",),
        ("http://host.net/page?q=1",),
    ]
    df = spark.createDataFrame(urls, ["url"])
    got = {r["url"]: r for r in url_features(df).collect()}
    r = got[urls[0][0]]
    assert r["scheme"] == "https"
    assert r["host"] == "www.shop.example.co"
    assert r["domain"] == "example.co"
    assert r["path_depth"] == 3
    assert r["n_query_params"] == 3
    assert r["is_https"]
    r = got[urls[1][0]]
    assert r["host"] == "example.com" and r["domain"] == "example.com"
    assert r["path_depth"] == 0 and r["n_query_params"] == 0
    assert not r["is_https"]
    assert got[urls[2][0]]["domain"] == "site.org"
    assert got[urls[3][0]]["n_query_params"] == 1


def test_url_blocklist_exact_domain(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.bad.com/x"),
            (2, "https://good.com/x"),
            (3, "http://notbad.com/y"),  # 'bad.com' must NOT match notbad.com
            (4, "https://sub.bad.com/z"),  # registrable domain is bad.com
        ],
        ["doc_id", "url"],
    )
    kept = {
        r["doc_id"]
        for r in url_blocklist_filter(df, ["bad.com"], url_col="url").collect()
    }
    assert kept == {2, 3}


def test_redact_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@my-site.io or 10.0.0.1 thanks"),
            # an @host that LOOKS like an ip+domain: email pass must claim it
            # first so the ip pass never sees those octets
            (2, "x user@10.1.2.3.example.com y"),
            (3, "no pii here"),
            (4, "two ips 1.2.3.4 5.6.7.8 one mail z@q.de"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"]) == (1, 1)
    assert got[1]["redacted_text"] == "mail me at <EMAIL> or <IP> thanks"
    assert (got[2]["n_emails"], got[2]["n_ips"]) == (1, 0)
    assert got[2]["redacted_text"] == "x <EMAIL> y"
    assert (got[3]["n_emails"], got[3]["n_ips"]) == (0, 0)
    assert got[3]["redacted_text"] == "no pii here"
    assert (got[4]["n_emails"], got[4]["n_ips"]) == (1, 2)
    assert got[4]["redacted_text"] == "two ips <IP> <IP> one mail <EMAIL>"


def test_robots_parse_and_longest_match():
    from boilerplate_buster_spark.core.robots import is_allowed, parse_robots

    txt = (
        "# policy\n"
        "User-agent: Alpha\n"
        "User-agent: Beta\n"
        "Disallow: /private/\n"
        "Allow: /private/pub/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /tmp/\n"
        "Disallow: *.gif$\n"        # wildcard extension: must be DROPPED
        "Crawl-delay: 10\n"         # unknown directive: skipped
        "Disallow:\n"               # empty disallow = allow all
    )
    rules = parse_robots(txt)
    assert ("alpha", "disallow", "/private/") in rules
    assert ("beta", "allow", "/private/pub/") in rules
    assert ("*", "disallow", "/tmp/") in rules
    assert not any("*.gif$" in r for r in rules)
    # longest-match precedence with allow override
    assert not is_allowed(rules, "Alpha", "/private/x")
    assert is_allowed(rules, "Alpha", "/private/pub/x")
    assert is_allowed(rules, "Alpha", "/tmp/x")       # alpha group, no /tmp rule
    assert not is_allowed(rules, "Other", "/tmp/x")   # falls to * group
    assert is_allowed(rules, "Other", "/ok")


def test_robots_filter_rule_bearing_host_without_match(spark):
    from boilerplate_buster_spark.operators.urls import (
        parse_robots_df,
        robots_filter,
    )

    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /x/\n")], ["host", "robots_txt"]
    )
    urls = spark.createDataFrame(
        [
            ("https://h.com/x/a",),   # blocked
            ("https://h.com/ok",),    # host HAS rules, none match -> allowed
            ("https://none.com/x/a",),  # no rules at all -> allowed
        ],
        ["url"],
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, parse_robots_df(robots), "bot").collect()
    }
    assert got == {
        "https://h.com/x/a": False,
        "https://h.com/ok": True,
        "https://none.com/x/a": True,
    }


def test_normalize_urls_rules(spark):
    from boilerplate_buster_spark.operators.urls import normalize_urls

    cases = {
        "HTTP://WWW.Ex.COM:80/a/b/../c/./d.html#frag":
            "http://www.ex.com/a/c/d.html",
        "https://Site.com:443/x/../../y?utm_source=tw&a=1&utm_medium=m":
            "https://site.com/y?a=1",
        "https://site.com?utm_campaign=x": "https://site.com/",
        "http://h.com/p/q/r/../../s": "http://h.com/p/s",
        "https://h.com/./a/./": "https://h.com/a/",
        "http://h.com:8080/a#x": "http://h.com:8080/a",  # non-default port kept
        "https://h.com/a/b/c/../../../d": "https://h.com/d",
        "https://h.com/.git/../a": "https://h.com/.git/../a",  # documented subset
        "http://h.com/..": "http://h.com/",
        "https://h.com:80/a": "https://h.com:80/a",  # :80 is not https default
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r["url"]: r["norm_url"] for r in normalize_urls(df).collect()}
    for u, want in cases.items():
        assert got[u] == want, (u, got[u], want)


def test_normalize_urls_spark_matches_duckdb(spark):
    # the two dialect renderings of normalize_url_stages must agree on a
    # url corpus that exercises every rule
    import duckdb

    from boilerplate_buster_spark.operators.urls import (
        normalize_url_stages,
        normalize_urls,
    )

    urls = [
        f"HTTP://A{i}.Ex.com:{p}/a/./b{i}/../c?utm_source=s&k={i}#f"
        for i, p in zip(range(12), [80, 443, 8080] * 4)
    ] + ["https://x.com", "http://x.com/?utm_campaign=only"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["norm_url"] for r in normalize_urls(df).collect()}

    con = duckdb.connect()
    vals = ", ".join("('" + u + "')" for u in urls)
    q = f"(SELECT * FROM (VALUES {vals}) t(url))"
    for i, (name, expr) in enumerate(normalize_url_stages("url", "duckdb")):
        q = f"(SELECT *, {expr} AS {name} FROM {q} s{i})"
    want = dict(con.sql(f"SELECT url, norm_url FROM {q} f").fetchall())
    assert got == want


def test_host_stats_integer_surfaces(spark):
    rows = [
        # host a.com: 3 docs, one duplicated text, two urls
        ("https://a.com/x", "hello world"),
        ("https://a.com/x", "hello world"),
        ("https://a.com/y", "different page"),
        # host b.com: 1 doc
        ("http://b.com/", "solo"),
    ]
    df = spark.createDataFrame(rows, ["url", "text"])
    from boilerplate_buster_spark.operators.urls import host_stats

    got = {
        r["host"]: (
            r["n_docs"], r["n_urls"], r["n_uniq_texts"],
            r["dup_frac_e6"], r["mean_len"],
        )
        for r in host_stats(df).collect()
    }
    assert got["a.com"] == (3, 2, 2, 1000000 // 3, (11 + 11 + 14) // 3)
    assert got["b.com"] == (1, 1, 1, 0, 4)


def test_spam_host_filter_thresholds(spark):
    rows = (
        [(f"https://spam.com/{i}", "same text") for i in range(4)]
        + [(f"https://ok.com/{i}", f"unique text number {i}") for i in range(4)]
        + [("https://tiny.com/0", "x")]
    )
    df = spark.createDataFrame(rows, ["url", "text"])
    from boilerplate_buster_spark.operators.urls import spam_host_filter

    # dup threshold drops spam.com (dup_frac 750000)
    kept = {
        r["url"]
        for r in spam_host_filter(df, max_dup_frac_e6=500000).collect()
    }
    assert kept == {u for u, _ in rows if "spam.com" not in u}
    # mean-len threshold drops tiny.com too
    kept2 = {
        r["url"]
        for r in spam_host_filter(
            df, max_dup_frac_e6=500000, min_mean_len=2
        ).collect()
    }
    assert kept2 == {u for u, _ in rows if "ok.com" in u}
    # no thresholds -> everything survives
    assert spam_host_filter(df).count() == len(rows)


def test_date_mentions_extraction(spark):
    from boilerplate_buster_spark.operators.urls import date_mentions

    docs = spark.createDataFrame(
        [
            (1, "posted 2023-11-05, updated 2024-01-02 and 2022-06-30"),
            (2, "no dates at all"),
            (3, "almost 2024-1-02 and 20240102 but 2024-01-02 counts"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.n_dates, r.first_date, r.last_date)
           for r in date_mentions(docs).collect()}
    assert got[1] == (3, "2022-06-30", "2024-01-02")
    assert got[2] == (0, "", "")
    assert got[3] == (1, "2024-01-02", "2024-01-02")
