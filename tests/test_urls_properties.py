"""Property tests (hypothesis) for the URL canonicalization kernel.

These pin the algebraic laws the crawl relies on: canonicalization is a
total, idempotent function; the seen-set key is invariant under fragment,
host case, default ports, and query-param order. Pure Python — no Spark.
"""

import string

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from crawler_spark.functions.urls import (  # noqa: E402
    get_hostname,
    has_proto,
    is_fetchable,
    normalize_url,
)

host_labels = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits, min_size=1,
            max_size=8),
    min_size=1, max_size=3,
).map(".".join)

path_seg = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~ %",
    max_size=8,
)
paths = st.lists(path_seg, max_size=4).map(lambda s: "/" + "/".join(s))

qkey = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=4)
qval = st.text(alphabet=string.ascii_letters + string.digits, max_size=4)
queries = st.lists(
    st.tuples(qkey, qval).map(lambda kv: f"{kv[0]}={kv[1]}"), max_size=4
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = draw(host_labels)
    path = draw(paths)
    q = draw(queries)
    qs = "&".join(q)
    return f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "")


@given(urls())
@settings(max_examples=300, deadline=None)
def test_idempotent(u):
    once = normalize_url(u)
    assert once == "" or normalize_url(once) == once


@given(urls(), st.text(alphabet=string.ascii_letters + "#/%", max_size=8))
@settings(max_examples=200, deadline=None)
def test_fragment_invariant(u, frag):
    assert normalize_url(u + "#" + frag) == normalize_url(u)


@given(urls())
@settings(max_examples=200, deadline=None)
def test_host_case_invariant(u):
    scheme, rest = u.split("://", 1)
    host, slash, tail = rest.partition("/")
    upper = f"{scheme}://{host.upper()}{slash}{tail}"
    assert normalize_url(upper) == normalize_url(u)


@given(host_labels, paths, st.permutations(["b=2", "a=9", "a=1", "c="]))
@settings(max_examples=100, deadline=None)
def test_query_order_invariant(host, path, perm)    :
    base = f"http://{host}{path}"
    u1 = base + "?" + "&".join(perm)
    u2 = base + "?" + "&".join(sorted(perm))
    assert normalize_url(u1) == normalize_url(u2)


@given(host_labels, paths)
@settings(max_examples=100, deadline=None)
def test_default_port_stripped(host, path):
    assert normalize_url(f"http://{host}:80{path}") == normalize_url(
        f"http://{host}{path}"
    )
    assert normalize_url(f"https://{host}:443{path}") == normalize_url(
        f"https://{host}{path}"
    )
    # non-default port preserved
    got = normalize_url(f"http://{host}:8080{path}")
    assert got == "" or ":8080" in got


@given(st.text(max_size=40))
@settings(max_examples=500, deadline=None)
def test_total_never_raises(junk):
    # total functions over arbitrary input: no exception, sane types
    out = normalize_url(junk)
    assert isinstance(out, str)
    assert isinstance(get_hostname(junk), str)
    assert isinstance(has_proto(junk), bool)
    assert isinstance(is_fetchable(junk), bool)
    if out:
        # successful canon urls always re-parse to the same host
        assert get_hostname(out) == get_hostname(out)


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canon_host_matches_hostname(u):
    canon = normalize_url(u)
    if canon:
        assert get_hostname(canon) == get_hostname(u).lower()
