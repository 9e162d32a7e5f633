"""robots.txt (RFC 9309) kernel tests."""

import random

from sparktika.kernels.robots import parse_robots
from sparktika.synth import build_robots


def test_groups_rules_and_extensions():
    r = parse_robots("""# comment
User-agent: *
Disallow: /private/   # trailing comment
Allow: /private/pub/
Crawl-delay: 2.5

User-agent: goodbot
User-agent: otherbot
Disallow: /no-bots/
Sitemap: https://e.com/s.xml
""")
    assert len(r.groups) == 2
    g = r.group_for("*")
    assert g.disallows == ["/private/"]
    assert g.allows == ["/private/pub/"]
    assert g.crawl_delay == 2.5
    assert r.groups[1].agents == ["goodbot", "otherbot"]
    assert r.sitemaps == ["https://e.com/s.xml"]
    assert not r.disallows_all()


def test_agent_matching_longest_substring():
    r = parse_robots("User-agent: *\nDisallow: /\n\n"
                     "User-agent: examplebot\nDisallow: /a/\n\n"
                     "User-agent: example\nDisallow: /b/\n")
    assert r.group_for("mozilla examplebot/2.0").disallows == ["/a/"]
    assert r.group_for("example-fetcher").disallows == ["/b/"]
    assert r.group_for("unknown").disallows == ["/"]
    assert r.disallows_all("unknown")


def test_empty_disallow_means_allow_all():
    r = parse_robots("User-agent: *\nDisallow:\n")
    g = r.group_for("*")
    assert g is not None and g.disallows == []
    assert not r.disallows_all()


def test_rules_before_any_group_and_unknown_directives():
    r = parse_robots("Disallow: /early/\nUser-agent: *\nNoindex: /x/\n"
                     "Crawl-delay: soon\n")
    assert r.n_unknown_directives == 3
    assert r.group_for("*").disallows == []


def test_never_raises_on_junk():
    rnd = random.Random(19)
    parse_robots("")
    parse_robots("\x00\x01\x02 no colons here\n" * 50)
    base = bytearray(build_robots(3))
    for _ in range(60):
        i = rnd.randrange(len(base))
        orig = base[i]
        base[i] = rnd.randrange(256)
        parse_robots(bytes(base).decode("latin-1"))
        base[i] = orig


def test_synth_parity():
    for i in (0, 1, 3, 7, 21):
        r = parse_robots(build_robots(i).decode())
        assert len(r.groups) == 2
        assert r.disallows_all() == (i % 7 == 0)
        g = r.group_for("*")
        assert (g.crawl_delay is not None) == (i % 3 == 0)
        assert r.sitemaps == [f"https://site{i}.example.com/sitemap.xml"]


def test_frontier_filter_semantics(spark_session=None):
    """RFC 9309 precedence end-to-end: longest match wins, allow beats
    disallow on ties, unmatched URLs pass."""
    from sparktika.pipeline.frontier import robots_filter, rules_from_robots
    from sparktika.pipeline.session import build_session

    spark = build_session(master="local[2]", shuffle_partitions=2)
    rules = rules_from_robots(
        [("h1", "User-agent: *\nDisallow: /a/\nAllow: /a/pub/\n"),
         ("h2", "User-agent: *\nDisallow: /\n")], spark)
    urls = spark.createDataFrame(
        [("u1", "h1", "/a/secret"), ("u2", "h1", "/a/pub/ok"),
         ("u3", "h1", "/open"), ("u4", "h2", "/anything"),
         ("u5", "h3", "/no-robots-host")],
        "url string, host string, path string")
    kept = {r.url for r in robots_filter(urls, rules).collect()}
    assert kept == {"u2", "u3", "u5"}
    denied = {r.url: r.allowed for r in
              robots_filter(urls, rules, keep_denied=True).collect()}
    assert denied == {"u1": False, "u2": True, "u3": True,
                      "u4": False, "u5": True}


def test_frontier_filter_wildcards_and_anchors():
    """RFC 9309 §2.2.3 special characters: '*' spans any octets, a
    trailing '$' anchors at end-of-path; regex metacharacters in rule
    paths stay literal (r7 advice: literal startswith failed OPEN on
    wildcard rules)."""
    from sparktika.pipeline.frontier import robots_filter, rules_from_robots
    from sparktika.pipeline.session import build_session

    spark = build_session(master="local[2]", shuffle_partitions=2)
    rules = rules_from_robots(
        [("h1", "User-agent: *\nDisallow: /*.php$\n"),
         ("h2", "User-agent: *\nDisallow: /a/*/c\n"),
         ("h3", "User-agent: *\nDisallow: /dl/\nAllow: /dl/*.html$\n"),
         ("h4", "User-agent: *\nDisallow: /p(1)+/\n")], spark)
    urls = spark.createDataFrame(
        [("w1", "h1", "/x.php"), ("w2", "h1", "/x.php?q=1"),
         ("w3", "h1", "/x.phpx"), ("w4", "h1", "/deep/y.php"),
         ("w5", "h2", "/a/b/c"), ("w6", "h2", "/a/c"),
         ("w7", "h3", "/dl/a.html"), ("w8", "h3", "/dl/a.zip"),
         ("w9", "h4", "/p(1)+/f"), ("wA", "h4", "/p1/f")],
        "url string, host string, path string")
    denied = {r.url: r.allowed for r in
              robots_filter(urls, rules, keep_denied=True).collect()}
    assert denied == {"w1": False, "w2": True, "w3": True, "w4": False,
                      "w5": False, "w6": True, "w7": True, "w8": False,
                      "w9": False, "wA": True}


def test_frontier_filter_preserves_duplicate_urls():
    """Duplicate frontier rows with the same url string must each
    survive (precedence ranks per input row, not per url value)."""
    from sparktika.pipeline.frontier import robots_filter, rules_from_robots
    from sparktika.pipeline.session import build_session

    spark = build_session(master="local[2]", shuffle_partitions=2)
    rules = rules_from_robots(
        [("h1", "User-agent: *\nDisallow: /a/\nAllow: /a/pub/\n")], spark)
    urls = spark.createDataFrame(
        [("dup", "h1", "/a/pub/x")] * 3 + [("solo", "h1", "/open")],
        "url string, host string, path string")
    out = robots_filter(urls, rules).collect()
    assert sorted(r.url for r in out) == ["dup", "dup", "dup", "solo"]


def test_frontier_filter_wildcard_bomb_widens_not_hangs():
    """Backtracking guard: a rule with many '*'s must not become a
    sequential-.* regex (O(n^k) against long paths). Runs of '*'
    collapse; > 3 wildcards widen to the literal-head prefix — a
    SUPERSET of the true rule, so the evil rule still denies, and the
    whole filter returns promptly even against a 4k-char path."""
    import time

    from sparktika.pipeline.frontier import robots_filter, rules_from_robots
    from sparktika.pipeline.session import build_session

    spark = build_session(master="local[2]", shuffle_partitions=2)
    evil = "Disallow: /evil/" + "a*" * 40 + "b\n"
    rules = rules_from_robots(
        [("h", "User-agent: *\n" + evil
          + "Disallow: /x/***/y\n")], spark)
    long_path = "/evil/" + "a" * 4000          # almost-matches
    urls = spark.createDataFrame(
        [("u1", "h", long_path), ("u2", "h", "/evil/zzz"),
         ("u3", "h", "/safe/a"), ("u4", "h", "/x/q/y"),
         ("u5", "h", "/x/y")],
        "url string, host string, path string")
    t0 = time.monotonic()
    got = {r.url: r.allowed for r in
           robots_filter(urls, rules, keep_denied=True).collect()}
    assert time.monotonic() - t0 < 60
    # the evil rule widens to its literal head '/evil/a' (superset of
    # the true rule: still denies u1, leaves the non-head u2 alone);
    # collapsed /x/*/y behaves exactly like a single '*'
    assert got == {"u1": False, "u2": True, "u3": True,
                   "u4": False, "u5": True}
