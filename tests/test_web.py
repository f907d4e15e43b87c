"""ext.web unit coverage: one crafted violator per extraction rule (the
Gopher-battery pattern), mojibake detect/repair edge cases, and the RFC
3986 normalizer against the spec's own examples."""

import pytest
from pyspark.sql import functions as F

from klogs_spark.ext import web


def _extract(spark, html: str):
    return (
        spark.range(1)
        .select(web.html_extract(F.lit(html)).alias("h"))
        .collect()[0]["h"]
    )


LONG = "this block carries plenty of genuine readable prose content"


class TestHtmlExtractRules:
    def test_link_farm_dropped_by_density(self, spark):
        # >= 25 chars of text, but every char inside anchors
        html = ('<div><a href="/a">first linked phrase here</a> '
                '<a href="/b">second linked phrase</a></div>'
                f"<p>{LONG}</p>")
        r = _extract(spark, html)
        assert (r["n_blocks"], r["n_kept"]) == (2, 1)
        assert r["extracted"] == LONG

    def test_exactly_half_density_dropped(self, spark):
        # link chars == half the text chars -> density 1/2 is NOT < 1/2
        body = "x" * 20
        html = f'<p><a href="/x">{body}</a>{body}</p>'
        r = _extract(spark, html)
        assert r["n_kept"] == 0

    def test_just_under_half_density_kept(self, spark):
        body = "x" * 20
        html = f'<p><a href="/x">{body[:-1]}</a>{body}</p>'
        r = _extract(spark, html)
        assert r["n_kept"] == 1
        assert r["extracted"] == body[:-1] + body

    def test_short_block_dropped_by_length(self, spark):
        html = f"<p>too short to keep</p><p>{LONG}</p>"
        r = _extract(spark, html)
        assert (r["n_blocks"], r["n_kept"]) == (2, 1)

    def test_inline_link_stripped_not_dropped(self, spark):
        html = f'<p>{LONG} with <a href="/t">one link</a> inside</p>'
        r = _extract(spark, html)
        assert r["n_kept"] == 1
        assert r["extracted"] == f"{LONG} with one link inside"

    def test_head_title_block_dropped(self, spark):
        html = ("<html><head><title>Doc 7</title></head><body>"
                f"<p>{LONG}</p></body></html>")
        r = _extract(spark, html)
        assert (r["n_blocks"], r["n_kept"]) == (2, 1)
        assert r["extracted"] == LONG

    def test_kept_blocks_join_in_document_order(self, spark):
        a = "alpha " + LONG
        b = "beta " + LONG
        html = f"<p>{a}</p><div>nav x</div><p>{b}</p>"
        r = _extract(spark, html)
        assert r["n_kept"] == 2
        assert r["extracted"] == f"{a} {b}"


class TestMojibake:
    def test_corrupt_then_repair_is_identity(self, spark):
        rows = spark.createDataFrame(
            [("café",), ("naïve — déjà ✓ №42",), ("plain",)], "s string"
        ).select(
            "s",
            web.repair_latin1(web.corrupt_latin1(F.col("s"))).alias("r"),
        ).collect()
        for r in rows:
            assert r["r"] == r["s"]

    def test_detector_flags_corrupted_only(self, spark):
        rows = spark.createDataFrame(
            [("corrupt", "café"), ("clean", "café"), ("ascii", "plain")],
            "kind string, s string",
        ).select(
            "kind",
            web.looks_mojibake(
                F.when(F.col("kind") == "corrupt",
                       web.corrupt_latin1(F.col("s")))
                .otherwise(F.col("s"))
            ).alias("m"),
        ).collect()
        flags = {r["kind"]: r["m"] for r in rows}
        assert flags == {"corrupt": True, "clean": False, "ascii": False}

    def test_fix_encoding_passthrough_on_clean(self, spark):
        rows = spark.createDataFrame(
            [("héllo wörld",)], "s string"
        ).select(web.fix_encoding(F.col("s")).alias("f")).collect()
        assert rows[0]["f"] == "héllo wörld"


class TestUrlNormalize:
    @pytest.mark.parametrize("messy,expect", [
        ("HTTP://WWW.Ex.COM:80/a?b=2&a=1", "http://www.ex.com/a?a=1&b=2"),
        ("https://h.ex:443/x", "https://h.ex/x"),
        ("https://h.ex:8443/x", "https://h.ex:8443/x"),
        ("http://h.ex", "http://h.ex/"),
        ("http://h.ex/a/b/./c", "http://h.ex/a/b/c"),
        ("http://h.ex/a/x/../c", "http://h.ex/a/c"),
        ("http://h.ex/a/b/..", "http://h.ex/a/"),
        ("http://h.ex/a/.", "http://h.ex/a/"),
        ("http://h.ex/../a", "http://h.ex/a"),
        ("http://h.ex/a//b", "http://h.ex/a//b"),
        ("http://h.ex/a?z=1&z=0&a=2", "http://h.ex/a?a=2&z=0&z=1"),
        ("http://h.ex/a?flag=&b=1", "http://h.ex/a?b=1&flag="),
    ])
    def test_rfc3986_cases(self, messy, expect):
        assert web.normalize_url_py(messy) == expect

    def test_udf_matches_scalar(self, spark):
        urls = ["HTTP://A.B:80/x/./y?b=2&a=1", "https://Q.W:9/p/../q"]
        rows = spark.createDataFrame([(u,) for u in urls], "u string").select(
            "u", web.normalize_url(F.col("u")).alias("n")
        ).collect()
        for r in rows:
            assert r["n"] == web.normalize_url_py(r["u"])

    def test_domain_extraction(self, spark):
        rows = spark.createDataFrame(
            [("http://www.ex.com:8080/a?q=1",)], "u string"
        ).select(web.url_domain(F.col("u")).alias("d")).collect()
        assert rows[0]["d"] == "www.ex.com"


class TestReviewFindings:
    def test_malformed_urls_pass_through_unchanged(self):
        for bad in ["http://h.ex:bad/x", "http://h.ex:99999999/x",
                    "http://[::1"]:
            assert web.normalize_url_py(bad) == bad

    def test_malformed_url_does_not_kill_the_job(self, spark):
        rows = spark.createDataFrame(
            [("http://h.ex:bad/x",), ("HTTP://OK.ex:80/y",)], "u string"
        ).select(web.normalize_url(F.col("u")).alias("n")).collect()
        got = {r["n"] for r in rows}
        assert got == {"http://h.ex:bad/x", "http://ok.ex/y"}

    def test_uppercase_tags_split_and_count(self, spark):
        long = "this block carries plenty of genuine readable prose text"
        html = ('<DIV><A HREF="/a">first linked phrase here</A> '
                '<A HREF="/b">second linked phrase</A></DIV>'
                f"<P>{long}</P>")
        r = _extract(spark, html)
        assert (r["n_blocks"], r["n_kept"]) == (2, 1)
        assert r["extracted"] == long

    def test_nested_markup_inside_anchor_counts_as_link_text(self, spark):
        # a pure link farm whose anchor text hides behind <b> tags must
        # still be dropped by the density rule
        html = ('<div><a href="/x"><b>first linked phrase here</b></a> '
                '<a href="/y"><i>second linked phrase</i></a></div>')
        r = _extract(spark, html)
        assert r["n_kept"] == 0

    def test_null_url_survives_the_udf(self, spark):
        rows = spark.createDataFrame(
            [(None,), ("HTTP://OK.ex:80/y",)], "u string"
        ).select(web.normalize_url(F.col("u")).alias("n")).collect()
        got = {r["n"] for r in rows}
        assert got == {None, "http://ok.ex/y"}

    def test_non_string_passthrough_scalar(self):
        assert web.normalize_url_py(None) is None


class TestDomainSuffixes:
    def test_suffix_chain(self, spark):
        rows = spark.createDataFrame(
            [("www.a.example.com",), ("example.com",), ("localhost",)],
            "d string",
        ).select(web.domain_suffixes(F.col("d")).alias("s")).collect()
        assert rows[0]["s"] == [
            "www.a.example.com", "a.example.com", "example.com"]
        assert rows[1]["s"] == ["example.com"]
        assert rows[2]["s"] == ["localhost"]


class TestRobots:
    def test_parser_groups_comments_empty_disallow(self):
        txt = ("# policy\n"
               "User-agent: a\n"
               "User-agent: b\n"
               "Disallow: /x\n"
               "Allow: /x/ok  # inline comment\n"
               "\n"
               "User-agent: *\n"
               "Disallow:\n"          # empty -> allow-all, no rule
               "Disallow: /y\n")
        rules = web.parse_robots_txt(txt)
        assert ("a", False, "/x") in rules and ("b", False, "/x") in rules
        assert ("a", True, "/x/ok") in rules
        assert ("*", False, "/y") in rules
        assert not any(r for r in rules if r[2] == "")

    def _eval(self, spark, rules, urls, agent="bot"):
        rdf = spark.createDataFrame(
            rules, "domain string, agent string, allow boolean, prefix string")
        udf_ = spark.createDataFrame(urls, "doc_id long, domain string, path string")
        out = web.robots_evaluate(udf_, rdf, agent).collect()
        return {r["doc_id"]: r["allowed"] for r in out}

    def test_group_exclusivity_and_longest_match(self, spark):
        rules = [
            ("d1", "bot", False, "/p/"),
            ("d1", "bot", True, "/p/pub/"),
            ("d1", "*", False, "/q/"),      # must NOT apply to bot on d1
            ("d2", "*", False, "/q/"),
        ]
        urls = [(1, "d1", "/p/x"), (2, "d1", "/p/pub/x"),
                (3, "d1", "/q/x"), (4, "d2", "/q/x"), (5, "d2", "/p/x")]
        got = self._eval(spark, rules, urls)
        assert got == {1: False, 2: True, 3: True, 4: False, 5: True}

    def test_allow_wins_length_tie_and_no_match_allowed(self, spark):
        rules = [("d", "*", False, "/a/"), ("d", "*", True, "/a/")]
        urls = [(1, "d", "/a/x"), (2, "d", "/zzz")]
        got = self._eval(spark, rules, urls)
        assert got == {1: True, 2: True}

    def test_prefix_semantics_no_boundary(self, spark):
        rules = [("d", "*", False, "/tmp")]
        urls = [(1, "d", "/tmp-files/x"), (2, "d", "/tm")]
        got = self._eval(spark, rules, urls)
        assert got == {1: False, 2: True}

    def test_wildcard_and_end_anchor_patterns(self, spark):
        rules = [
            ("d", "*", False, "/private*"),
            ("d", "*", False, "/*.pdf$"),
        ]
        urls = [(1, "d", "/private/x"), (2, "d", "/privateX"),
                (3, "d", "/a/b.pdf"), (4, "d", "/a/b.pdfx"),
                (5, "d", "/ok")]
        got = self._eval(spark, rules, urls)
        assert got == {1: False, 2: False, 3: False, 4: True, 5: True}

    def test_dangling_rules_before_any_group_are_ignored(self):
        txt = "Disallow: /\n\nUser-agent: *\nAllow: /docs/\n"
        rules = web.parse_robots_txt(txt)
        assert rules == [("*", True, "/docs/")]

    def test_carry_through_columns_never_collide(self, spark):
        rdf = spark.createDataFrame(
            [("d", "*", False, "/x/")],
            "domain string, agent string, allow boolean, prefix string")
        udf_ = spark.createDataFrame(
            [(1, "d", "/x/a", "payload", True)],
            "doc_id long, domain string, path string, prefix string, allow boolean")
        out = web.robots_evaluate(udf_, rdf, "bot").collect()
        assert out[0]["allowed"] is False
