"""Feed-parsing gates (etl/feeds.py): RFC-822 / ISO-8601 timestamp
parity against Python's own email/datetime parsers, Atom link-relation
preference, XML entity unescaping, multi-entry explosion, and the
tag-soup NULL discipline (missing fields and unparseable dates must
yield NULL, never a task-killing error).
"""

from datetime import datetime, timedelta, timezone
from email.utils import parsedate_to_datetime

from spanluke_spark.etl.feeds import parse_feeds


def _parse(spark, rows):
    df = spark.createDataFrame(rows, "url string, xml string")
    return parse_feeds(df).collect()


def _utc_naive(dt):
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def test_rss_rfc822_parity_with_email_utils(spark):
    dates = [
        "Tue, 5 Mar 2024 08:30:00 +0530",
        "Mon, 01 Jan 2024 00:10:00 GMT",
        "Sat, 31 Aug 2024 23:59:59 -0800",
        "1 Feb 2024 12:00:00 +0000",  # weekday is optional in RFC 822
    ]
    xml = "<rss><channel>" + "".join(
        f"<item><guid>g{i}</guid><pubDate>{d}</pubDate></item>"
        for i, d in enumerate(dates)
    ) + "</channel></rss>"
    got = {r.entry_id: r.published_ts for r in _parse(spark, [("u", xml)])}
    for i, d in enumerate(dates):
        assert got[f"g{i}"] == _utc_naive(parsedate_to_datetime(d)), d


def test_atom_iso_parity_with_fromisoformat(spark):
    dates = ["2024-03-05T08:30:00+05:30", "2024-01-01T00:10:00Z",
             "2024-12-31T23:59:59-08:00", "2024-06-15T06:07:08.123Z"]
    xml = '<feed xmlns="http://www.w3.org/2005/Atom">' + "".join(
        f"<entry><id>e{i}</id><published>{d}</published></entry>"
        for i, d in enumerate(dates)
    ) + "</feed>"
    got = {r.entry_id: r.published_ts for r in _parse(spark, [("u", xml)])}
    for i, d in enumerate(dates):
        want = _utc_naive(datetime.fromisoformat(d.replace("Z", "+00:00")))
        # engine intentionally drops fractional seconds
        want = want.replace(microsecond=0)
        assert got[f"e{i}"] == want, d


def test_atom_link_preference_and_fallbacks(spark):
    xml = (
        '<feed><entry><id>a</id>'
        '<link rel="self" href="https://self"/>'
        '<link rel="alternate" href="https://alt"/></entry>'
        '<entry><id>b</id><link href="https://plain"/></entry>'
        '<entry><id>c</id><link rel="enclosure" href="https://enc"/></entry>'
        '<entry><id>d</id><updated>2024-01-02T03:04:05Z</updated></entry>'
        "</feed>"
    )
    rows = {r.entry_id: r for r in _parse(spark, [("u", xml)])}
    assert rows["a"].entry_link == "https://alt"
    assert rows["b"].entry_link == "https://plain"
    # no alternate/rel-less link: fall back to the first link at all
    assert rows["c"].entry_link == "https://enc"
    # <published> missing: <updated> supplies the timestamp
    assert rows["d"].published_ts == datetime(2024, 1, 2, 3, 4, 5)
    assert rows["d"].entry_link is None


def test_entities_and_missing_fields_null(spark):
    xml = (
        "<rss><channel><item>"
        "<title>A &amp;&lt;B&gt; &quot;C&apos;</title>"
        "<link>https://h/?a=1&amp;b=2</link></item>"
        "<item><description>only desc</description></item>"
        "<item><pubDate>not a date</pubDate><guid>g</guid></item>"
        "</channel></rss>"
    )
    rows = _parse(spark, [("u", xml)])
    assert len(rows) == 3
    by_title = {r.entry_title: r for r in rows}
    t = "A &<B> \"C'"
    assert by_title[t].entry_link == "https://h/?a=1&b=2"
    assert by_title[t].published_ts is None and by_title[t].entry_id is None
    only = by_title[None]
    assert only.summary == "only desc" or only.entry_id == "g"
    bad = [r for r in rows if r.entry_id == "g"][0]
    assert bad.published_ts is None  # unparseable date -> NULL, no error


def test_feed_type_detection_and_rss_dc_date_fallback(spark):
    rss = ("<rss><channel><item><guid>r</guid>"
           "<dc:date>2024-05-06T07:08:09Z</dc:date></item></channel></rss>")
    atom = "<feed><entry><id>a</id></entry></feed>"
    rows = {r.entry_id: r for r in _parse(spark, [("u1", rss), ("u2", atom)])}
    assert rows["r"].feed_type == "rss"
    assert rows["r"].published_ts == datetime(2024, 5, 6, 7, 8, 9)
    assert rows["a"].feed_type == "atom"


def test_discover_feeds(spark):
    from spanluke_spark.etl.feeds import discover_feeds

    rows = [
        ("https://a/x/p", '<link rel="alternate" type="application/rss+xml" '
                          'title="R &amp; B" href="/f.xml">'
                          "<link type='application/atom+xml' href='a.xml'>"
                          '<link rel="stylesheet" type="text/css" href="/c">'),
        ("https://b/p", "<p>no feeds</p>"),
        ("https://c/p", '<link type="application/rss+xml" href="//cdn/f">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {(r.url, r.feed_type, r.feed_url, r.feed_title)
           for r in discover_feeds(df).collect()}
    assert got == {
        ("https://a/x/p", "rss", "https://a/f.xml", "R & B"),
        ("https://a/x/p", "atom", "https://a/x/a.xml", None),  # path-relative
        ("https://c/p", "rss", "https://cdn/f", None),  # protocol-relative
    }
