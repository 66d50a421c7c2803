"""Unit gates for robots.txt parsing / frontier decisions and the
key-skew profiler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

ROBOTS = """# policy file
User-agent: bot
Disallow: /

User-agent: aux
User-agent: *
Disallow: /priv   # private tree
Allow: /priv/pub
Disallow:
Allow:

User-agent: other
Allow: /everything
"""


def _rules(spark, txt=ROBOTS, host="ex.com"):
    from spanluke_spark.etl.robots import parse_robots

    df = spark.createDataFrame([(host, txt)], "host string, robots_txt string")
    return parse_robots(df)


def test_parse_robots_star_groups_only(spark):
    got = sorted(
        (r["allow"], r["prefix"]) for r in _rules(spark).collect()
    )
    # the bot-only and other-only groups are excluded; empty-value rules
    # dropped; comments stripped
    assert got == [(False, "/priv"), (True, "/priv/pub")]


def test_parse_robots_multi_ua_group_shared(spark):
    txt = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    got = [(r["allow"], r["prefix"]) for r in _rules(spark, txt).collect()]
    assert got == [(False, "/x")]


def test_parse_robots_ua_line_resets_group(spark):
    # rules BEFORE any * group and rules in a following non-* group must
    # not leak into the * group
    txt = (
        "User-agent: bot\nDisallow: /bot-only\n"
        "User-agent: *\nDisallow: /star\n"
        "User-agent: bot2\nDisallow: /bot2-only\n"
    )
    got = [(r["allow"], r["prefix"]) for r in _rules(spark, txt).collect()]
    assert got == [(False, "/star")]


def test_frontier_decisions_longest_match_and_defaults(spark):
    from spanluke_spark.etl.robots import frontier_decisions

    rules = _rules(spark)
    frontier = spark.createDataFrame(
        [
            ("http://ex.com/priv/x",),       # blocked by /priv
            ("http://ex.com/priv/pub/y",),   # /priv/pub allow beats /priv
            ("http://ex.com/open/z",),       # host has rules, none match
            ("http://ex.com/private",),      # prefix match is raw-prefix
            ("http://other.com/priv/x",),    # unlisted host -> allowed
        ],
        "url string",
    )
    got = {r["url"]: r["allowed"]
           for r in frontier_decisions(frontier, rules).collect()}
    assert got == {
        "http://ex.com/priv/x": False,
        "http://ex.com/priv/pub/y": True,
        "http://ex.com/open/z": True,
        "http://ex.com/private": False,  # '/private'.startswith('/priv')
        "http://other.com/priv/x": True,
    }
    assert len(got) == 5  # every frontier URL gets exactly one decision


def test_frontier_decisions_equal_length_allow_wins(spark):
    from spanluke_spark.etl.robots import frontier_decisions

    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /a/b\n"
    frontier = spark.createDataFrame([("http://ex.com/a/b/c",)], "url string")
    got = frontier_decisions(frontier, _rules(spark, txt)).collect()
    assert got[0]["allowed"] is True


def test_key_skew_profile_values(spark):
    from spanluke_spark.textops.profile import key_skew_profile

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_profile(df, "k", top_k=3).collect()
    assert [(r["rank"], r["key"], r["n"]) for r in got] == [
        (1, "hot", 60), (2, "warm", 30), (3, "a", 5)  # tie a<b by key
    ]
    assert got[0]["share"] == pytest.approx(0.6)
    assert got[0]["x_mean"] == pytest.approx(60 * 4 / 100)  # 2.4x the mean


def test_key_skew_profile_plan_is_take_ordered(spark):
    from spanluke_spark.textops.profile import key_skew_profile

    df = spark.range(1000).select((F.col("id") % 13).alias("k"))
    plan = (
        key_skew_profile(df, "k", top_k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # not a global Sort + window
