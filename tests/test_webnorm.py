"""URL canonicalization rules, case by case (pipelines/webnorm.py — the
rule list in its docstring is the spec the DuckDB oracle re-derives)."""

import pyarrow as pa

from markdown_query_ray.pipelines.webnorm import (
    canonical_url_batch,
    registered_domain_batch,
)


def canon(url: str) -> str:
    t = pa.table({"url": pa.array([url], pa.string())})
    return canonical_url_batch(t).column("canon_url")[0].as_py()


def test_scheme_host_lowercased():
    assert canon("HTTPS://WWW.Example.COM/Path") == "https://example.com/Path"


def test_path_case_preserved():
    assert canon("https://a.example/CaseSensitive") == \
        "https://a.example/CaseSensitive"


def test_default_ports_stripped():
    assert canon("https://a.example:443/x") == "https://a.example/x"
    assert canon("http://a.example:80/x") == "http://a.example/x"
    assert canon("https://a.example:8443/x") == "https://a.example:8443/x"


def test_fragment_dropped():
    assert canon("https://a.example/x#frag") == "https://a.example/x"


def test_tracking_params_dropped_rest_sorted():
    assert canon("https://a.example/x?b=2&utm_source=f&a=1&fbclid=z") == \
        "https://a.example/x?a=1&b=2"
    assert canon("https://a.example/x?utm_campaign=c") == \
        "https://a.example/x"


def test_trailing_slash_and_empty_path():
    assert canon("https://a.example/x/") == "https://a.example/x"
    assert canon("https://a.example/") == "https://a.example/"
    assert canon("https://a.example") == "https://a.example/"


def test_unparseable_passthrough():
    assert canon("not a url") == "not a url"


def test_registered_domain():
    t = pa.table({"canon_url": pa.array(
        ["https://a.b.example.com/x", "https://example.org/",
         "not a url"], pa.string())})
    assert registered_domain_batch(t).column("domain").to_pylist() == \
        ["example.com", "example.org", ""]


def test_registered_domain_public_suffix():
    """Hosts ending in a public suffix register at the third label; plain
    gTLD hosts at the second; a bare public suffix or single label falls
    back gracefully."""
    import pyarrow as pa

    from markdown_query_ray.pipelines.webnorm import registered_domain_batch

    urls = [
        "https://news.bbc.co.uk/story",       # PSL: 3 labels
        "https://example.com/x",               # gTLD: 2 labels
        "https://a.b.example.com/x",           # deep host, gTLD
        "https://shop.foo.com.au/x",           # PSL: 3 labels
        "https://co.uk/",                      # bare suffix: fallback 2
        "https://localhost/x",                 # single label: host itself
    ]
    t = pa.table({"canon_url": pa.array(urls, pa.string())})
    got = registered_domain_batch(t).column("domain").to_pylist()
    assert got == ["bbc.co.uk", "example.com", "example.com",
                   "foo.com.au", "co.uk", "localhost"]


def test_registered_domain_full_psl_rules():
    """The vendored full public-suffix list drives the rule engine:
    wildcard (*.kawasaki.jp, *.ck), exception (!city.kawasaki.jp,
    !www.ck), 3-label normal rules, and the implicit * default for
    unknown TLDs."""
    import pyarrow as pa

    from markdown_query_ray.pipelines.webnorm import registered_domain_batch

    cases = {
        "https://foo.city.kawasaki.jp/x": "city.kawasaki.jp",  # exception
        "https://x.y.kawasaki.jp/x": "x.y.kawasaki.jp",        # wildcard
        "https://www2.www.ck/x": "www.ck",                     # exception
        "https://shop.foo.ck/x": "shop.foo.ck",                # wildcard
        "https://ck/": "ck",                    # bare wildcard base
        "https://pref.aichi.jp/x": "pref.aichi.jp",  # 2-label normal rule
        "https://unknown.tld.zzz/": "tld.zzz",       # implicit * default
    }
    t = pa.table({"canon_url": pa.array(list(cases), pa.string())})
    got = registered_domain_batch(t).column("domain").to_pylist()
    assert got == list(cases.values())


def test_registered_domain_private_section_opt_in():
    """ICANN-only by default (github.io registers at github.io); the
    PRIVATE section promotes operator suffixes when opted in."""
    import pyarrow as pa

    from markdown_query_ray.pipelines.webnorm import registered_domain_batch

    t = pa.table({"canon_url": pa.array(
        ["https://user.github.io/x", "https://a.user.github.io/x"],
        pa.string())})
    assert registered_domain_batch(t).column("domain").to_pylist() == \
        ["github.io", "github.io"]
    assert registered_domain_batch(
        t, include_private=True).column("domain").to_pylist() == \
        ["user.github.io", "user.github.io"]
