"""robots.txt parser: group selection, Disallow/Allow prefixes with
RFC 9309 longest-match precedence, crawl-delay, and the Spark kernel
feeding the politeness rules table."""

from hyperion_crawler_spark.functions.robots import (
    is_path_allowed,
    parse_robots_txt,
    rules_from_robots,
)

BASIC = """
# comments ignored
User-agent: *
Disallow: /private
Disallow: /tmp
Allow: /private/open
Crawl-delay: 5
"""

GROUPS = """
User-agent: googlebot
Disallow: /nogoogle

User-agent: hyperion-crawler
Disallow: /nohyperion
Allow: /nohyperion/except
Crawl-delay: 2

User-agent: *
Disallow: /noall
"""


def test_basic_wildcard_group():
    dis, allow, delay = parse_robots_txt(BASIC)
    assert dis == ["/private", "/tmp"]
    assert allow == ["/private/open"]
    assert delay == 5.0


def test_specific_agent_beats_wildcard():
    dis, allow, delay = parse_robots_txt(GROUPS, agent="hyperion")
    assert dis == ["/nohyperion"]
    assert allow == ["/nohyperion/except"]
    assert delay == 2.0


def test_unknown_agent_falls_back_to_wildcard():
    dis, allow, delay = parse_robots_txt(GROUPS, agent="otherbot")
    assert dis == ["/noall"]
    assert allow == []
    assert delay == 0.0


def test_empty_disallow_means_allow_all():
    dis, _allow, _delay = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert dis == []


def test_malformed_lenient():
    dis, _allow, delay = parse_robots_txt(
        "garbage\nUser-agent: *\nCrawl-delay: soon\nDisallow: /x\n")
    assert dis == ["/x"]
    assert delay == 0.0


def test_none_and_empty():
    assert parse_robots_txt("") == ([], [], 0.0)
    assert parse_robots_txt(None) == ([], [], 0.0)


def test_longest_match_precedence():
    # RFC 9309 §2.2.2: longest matching prefix wins, tie → allow
    assert not is_path_allowed("/private/x", ["/private"], ["/private/open"])
    assert is_path_allowed("/private/open/x", ["/private"], ["/private/open"])
    assert is_path_allowed("/other", ["/private"], [])
    assert is_path_allowed("/p", ["/p"], ["/p"])          # tie → allow
    assert not is_path_allowed("/p/deep/x", ["/p/deep"], ["/p"])


def test_rules_from_robots_kernel(spark):
    df = spark.createDataFrame(
        [("a.ex", BASIC), ("b.ex", ""), ("c.ex", GROUPS)],
        "host string, robots_txt string")
    rules = {r["host"]: r for r in rules_from_robots(df, agent="hyperion").collect()}
    assert rules["a.ex"]["disallow_prefixes"] == ["/private", "/tmp"]
    assert rules["a.ex"]["allow_prefixes"] == ["/private/open"]
    assert rules["a.ex"]["crawl_delay_s"] == 5.0
    assert rules["b.ex"]["disallow_prefixes"] == []
    assert rules["c.ex"]["disallow_prefixes"] == ["/nohyperion"]
    assert rules["c.ex"]["max_per_round"] == 60


def test_rules_feed_politeness_with_allow_override(spark, crawl_cfg):
    from hyperion_crawler_spark.operators.politeness import with_robots

    rules = rules_from_robots(spark.createDataFrame(
        [("a.ex", BASIC)], "host string, robots_txt string"))
    frontier = spark.createDataFrame(
        [(1, "http://a.ex/private/x", "a.ex", "i", 0, 0.5, "queued", 0, 0, 0),
         (2, "http://a.ex/ok", "a.ex", "i", 0, 0.5, "queued", 0, 0, 0),
         (3, "http://a.ex/private/open/x", "a.ex", "i", 0, 0.5, "queued", 0, 0, 0)],
        "urlhash long, url string, host string, image_id string, shard int, priority double,"
        "status string, retry_count int, next_fetch_ts long, discovered_round int")
    ann = {r["urlhash"]: r for r in with_robots(frontier, rules, crawl_cfg).collect()}
    assert ann[1]["robots_allowed"] is False
    assert ann[2]["robots_allowed"] is True
    assert ann[3]["robots_allowed"] is True   # Allow overrides Disallow
    assert ann[2]["budget"] == 12  # floor(60 / crawl_delay 5)


def test_legacy_rules_without_allow_column(spark, crawl_cfg):
    from hyperion_crawler_spark.operators.politeness import with_robots

    rules = spark.createDataFrame(
        [("a.ex", ["/private"], 0.0, 10)],
        "host string, disallow_prefixes array<string>, crawl_delay_s double, max_per_round int")
    frontier = spark.createDataFrame(
        [(1, "http://a.ex/private/x", "a.ex", "i", 0, 0.5, "queued", 0, 0, 0)],
        "urlhash long, url string, host string, image_id string, shard int, priority double,"
        "status string, retry_count int, next_fetch_ts long, discovered_round int")
    row = with_robots(frontier, rules, crawl_cfg).first()
    assert row["robots_allowed"] is False


def test_catalyst_allow_matches_scalar_fuzz(spark, crawl_cfg):
    """Property bridge: the Catalyst longest-match expression in
    with_robots must agree with the scalar is_path_allowed on randomized
    rule sets and paths (seeded, deterministic)."""
    import random

    from hyperion_crawler_spark.operators.politeness import with_robots

    rng = random.Random(42)
    # includes RFC 9309 wildcard/anchor rules and regex metacharacters
    # so the Catalyst regex branch is exercised, not just the prefix
    # fast path (r5)
    segs = ["/a", "/b", "/private", "/private/open", "/private/open/x",
            "/p", "/p/deep", "/x/y", "/*.pdf", "/p*deep", "/private$",
            "/a.b", "/*/leaf$", "/", ""]
    rows, want = [], {}
    rules_rows = []
    for h in range(25):
        host = f"h{h}.ex"
        dis = rng.sample(segs[:-2], rng.randint(0, 4))
        allow = rng.sample(segs[:-2], rng.randint(0, 3))
        rules_rows.append((host, dis, allow, 0.0, 10))
        for i in range(8):
            path = rng.choice(segs[:-1]) + rng.choice(["", "/leaf", "/d/e"])
            url = f"http://{host}{path if path.startswith('/') else '/' + path}"
            uh = h * 100 + i
            rows.append((uh, url, host, "img", 0, 0.5, "queued", 0, 0, 0))
            from hyperion_crawler_spark.functions.robots import is_path_allowed
            p = url.split(host, 1)[1]
            want[uh] = is_path_allowed(p, dis, allow)
    rules = spark.createDataFrame(
        rules_rows, "host string, disallow_prefixes array<string>, "
                    "allow_prefixes array<string>, crawl_delay_s double, max_per_round int")
    frontier = spark.createDataFrame(
        rows, "urlhash long, url string, host string, image_id string, shard int, "
              "priority double, status string, retry_count int, next_fetch_ts long, "
              "discovered_round int")
    got = {r["urlhash"]: r["robots_allowed"]
           for r in with_robots(frontier, rules, crawl_cfg).collect()}
    assert got == want


def test_empty_agent_line_does_not_shadow_wildcard():
    # malformed 'User-agent:' (empty value) must not become a
    # matches-everyone specific group (r5 review finding)
    dis, allow, delay = parse_robots_txt(
        "User-agent:\nDisallow: /\n\nUser-agent: *\nDisallow: /private\n")
    assert dis == ["/private"] and allow == []


def test_repeated_groups_merge():
    # RFC 9309 §2.2.1: multiple matching groups combine
    dis, allow, delay = parse_robots_txt(
        "User-agent: *\nDisallow: /a\nCrawl-delay: 1\n\n"
        "User-agent: *\nDisallow: /b\nAllow: /b/ok\nCrawl-delay: 3\n")
    assert sorted(dis) == ["/a", "/b"] and allow == ["/b/ok"]
    assert delay == 3.0  # most conservative of the declared delays
    # specific groups merge too, and still beat the fallback
    dis2, _, _ = parse_robots_txt(
        "User-agent: hyperion\nDisallow: /h1\n\n"
        "User-agent: *\nDisallow: /star\n\n"
        "User-agent: hyperion\nDisallow: /h2\n")
    assert sorted(dis2) == ["/h1", "/h2"]


def test_wildcard_and_anchor_rules():
    # RFC 9309 §2.2.3: '*' spans any chars, trailing '$' anchors
    assert not is_path_allowed("/x.pdf", ["/*.pdf"], [])
    assert not is_path_allowed("/a/b/file.pdf", ["/*.pdf"], [])
    assert is_path_allowed("/x.pdfs", ["/*.pdf$"], [])
    assert not is_path_allowed("/x.pdf", ["/*.pdf$"], [])
    assert not is_path_allowed("/private", ["/private$"], [])
    assert is_path_allowed("/private/x", ["/private$"], [])
    # precedence counts raw rule octets, wildcards included:
    # '/*.pdf' is 6 octets vs allow '/a/' at 3 → disallow wins; a
    # longer allow flips it
    assert not is_path_allowed("/a/z.pdf", ["/*.pdf"], ["/a/"])
    assert is_path_allowed("/a/z.pdf", ["/*.pdf"], ["/a/z.pdf"])
    # regex metacharacters in rules stay literal
    assert not is_path_allowed("/a.b/x", ["/a.b/"], [])
    assert is_path_allowed("/aXb/x", ["/a.b/"], [])
