"""WHATWG-behavior table tests for the URL kernel (SURVEY.md §5.1)."""

from crawler_spark.functions.urls import (
    get_hostname,
    has_proto,
    is_bad_extension,
    is_fetchable,
    normalize_url,
    path_extension,
    remove_hash,
)


def test_lowercase_host_and_scheme():
    assert normalize_url("HTTP://ExAmple.COM/Path") == "http://example.com/Path"


def test_empty_path_becomes_slash():
    assert normalize_url("http://example.com") == "http://example.com/"


def test_default_ports_stripped():
    assert normalize_url("http://example.com:80/a") == "http://example.com/a"
    assert normalize_url("https://example.com:443/a") == "https://example.com/a"
    assert normalize_url("http://example.com:8080/a") == "http://example.com:8080/a"


def test_fragment_stripped():
    assert normalize_url("http://example.com/a#frag") == "http://example.com/a"
    assert normalize_url("http://example.com/#x") == "http://example.com/"


def test_relative_resolution():
    base = "http://example.com/dir/page.html"
    assert normalize_url("other.html", base) == "http://example.com/dir/other.html"
    assert normalize_url("/abs.html", base) == "http://example.com/abs.html"
    assert normalize_url("../up.html", base) == "http://example.com/up.html"
    assert normalize_url("#frag", base) == "http://example.com/dir/page.html"


def test_dot_segments_removed():
    assert normalize_url("http://example.com/a/../b") == "http://example.com/b"
    assert normalize_url("http://example.com/a/./b") == "http://example.com/a/b"
    assert normalize_url("http://example.com/a/..") == "http://example.com/"


def test_query_param_sort_superset():
    # north-rule superset: params sorted (NOT reference behavior; flagged)
    assert (
        normalize_url("http://example.com/p?b=2&a=1&c=3")
        == "http://example.com/p?a=1&b=2&c=3"
    )
    # stable for duplicate keys
    assert (
        normalize_url("http://example.com/p?a=2&a=1")
        == "http://example.com/p?a=1&a=2"
    )
    # sort disabled → preserved
    assert (
        normalize_url("http://example.com/p?b=2&a=1", sort_query=False)
        == "http://example.com/p?b=2&a=1"
    )


def test_parse_failure_returns_empty():
    assert normalize_url("not a url") == ""
    assert normalize_url("example.com/no-scheme") == ""
    assert normalize_url("http://") == ""


def test_non_special_schemes_pass_through():
    # mailto/javascript parse under WHATWG (reference utils.ts:56-63 quirk)
    assert normalize_url("mailto:bob@example.com") == "mailto:bob@example.com"
    assert has_proto("mailto:bob@example.com")
    assert has_proto("javascript:void(0)")
    assert not is_fetchable("mailto:bob@example.com")
    assert not is_fetchable("javascript:void(0)")
    assert is_fetchable("https://example.com/")


def test_space_percent_encoded():
    assert normalize_url("http://example.com/a b") == "http://example.com/a%20b"
    # existing escapes not double-encoded
    assert normalize_url("http://example.com/a%20b") == "http://example.com/a%20b"


def test_hostname():
    assert get_hostname("http://ExAmple.COM:8080/x") == "example.com"
    assert get_hostname("mailto:x") == ""
    assert get_hostname("not a url") == ""


def test_remove_hash():
    assert remove_hash("http://example.com/a?q=1#z") == "http://example.com/a?q=1"


def test_bad_extension_faithful_noop():
    # reference bug preserved: extname has a leading dot, deny list doesn't
    # (utils.ts:6-10, 99-104) → faithful mode never matches
    assert path_extension("http://x.com/data.json") == ".json"
    assert not is_bad_extension("http://x.com/data.json")
    assert is_bad_extension("http://x.com/data.json", corrected=True)
    assert not is_bad_extension("http://x.com/page.html", corrected=True)
    assert not is_bad_extension("http://x.com/noext", corrected=True)


def test_strip_tracking_params(spark):
    from crawler_spark.functions.urls import strip_tracking_params

    cases = [
        # (input, expected)
        ("https://a.test/p", "https://a.test/p"),
        ("https://a.test/p?utm_source=x", "https://a.test/p"),
        ("https://a.test/p?utm_source=x&id=7", "https://a.test/p?id=7"),
        ("https://a.test/p?id=7&gclid=abc&b=2", "https://a.test/p?id=7&b=2"),
        # bare tracker without '=' still matches the anchored regex
        ("https://a.test/p?fbclid", "https://a.test/p"),
        # ambiguous names stay (conservative list)
        ("https://a.test/p?ref=home", "https://a.test/p?ref=home"),
        # tracker-ish substring inside a value is NOT a tracker param
        ("https://a.test/p?q=utm_source%3Dx", "https://a.test/p?q=utm_source%3Dx"),
        ("https://a.test/p?myutm_source=1", "https://a.test/p?myutm_source=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(strip_tracking_params("url").alias("c")).collect()]
    assert got == [want for _, want in cases]
