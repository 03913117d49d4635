"""Unit tests for the tokenization pipeline and HTML parse."""

from spaghettisearch_tpu.config import META_POSITION
from spaghettisearch_tpu.text.htmlparse import (
    extract_summary_text,
    resolve_href,
    tokenize_page,
)
from spaghettisearch_tpu.text.laundry import laundry, term_stats
from spaghettisearch_tpu.text.page import parse_page

HTML = b"""
<html><head>
<title>  Department of Computing </title>
<meta name="description" content="Computer science research and education">
<meta name="keywords" content="algorithms, systems">
<meta name="robots" content="noindex">
</head>
<body>
<h1>Welcome to the Department</h1>
<script>var x = "ignore me";</script>
<style>.c { color: red }</style>
<noscript>enable scripts</noscript>
<p>We study search engines and ranked retrieval.</p>
<a href="/research">Our research directions</a>
<a href="http://example.com/people/">People pages</a>
<a href="#top">Top anchor</a>
<a href="mailto:x@y.z">mail</a>
<a href="javascript:void(0)">js</a>
<a href="files/report.PDF">media link</a>
<nav><a href="/nav-only">Navigation entry</a></nav>
</body></html>
"""

BASE = "https://www.cse.ust.hk"


def test_laundry_pipeline():
    # strip non-alnum, lowercase, stem, drop stopwords (after stemming)
    assert laundry("The Quick-Brown Foxes; jumped!") == ["quick", "brown", "fox", "jump"]
    assert laundry("") == []
    # stopwords are checked post-stem: "running" -> "run" (not a stopword)
    assert laundry("running the tests") == ["run", "test"]
    # numbers survive
    assert laundry("lecture 4321b") == ["lectur", "4321b"]


def test_term_stats_positions_and_meta():
    freq, pos = term_stats(["a", "b", "a"], ["b", "c"])
    assert freq == {"a": 2, "b": 2, "c": 1}
    assert pos["a"] == [0.0, 2.0]
    assert pos["b"] == [1.0, META_POSITION]
    assert pos["c"] == [META_POSITION]


def test_tokenize_page_sections():
    page = tokenize_page(HTML, BASE)
    assert page.title == "Department of Computing"
    joined = " ".join(page.words)
    assert "Welcome to the Department" in joined
    assert "search engines" in joined
    assert "ignore me" not in joined
    assert "enable scripts" not in joined
    assert "color" not in joined
    # anchor text is body text too (reference: parser.go:148 appends it)
    assert "Our research directions" in joined
    assert page.meta == ["Computer science research and education", "algorithms, systems"]


def test_tokenize_page_links():
    page = tokenize_page(HTML, BASE)
    assert f"{BASE}/research" in page.links
    # trailing slash stripped
    assert "http://example.com/people" in page.links
    # anchors/mailto/javascript/media skipped
    assert not any("#" in u or "mailto" in u or "javascript" in u for u in page.links)
    assert not any(u.lower().endswith(".pdf") for u in page.links)
    fancy_urls = {u for u, _ in page.fancy}
    assert f"{BASE}/research" in fancy_urls
    texts = {t for _, t in page.fancy}
    assert "Our research directions" in texts


def test_resolve_href():
    assert resolve_href("/a b", BASE) == f"{BASE}/ab"  # spaces removed
    assert resolve_href("sub/page", BASE) == f"{BASE}/sub/page"
    assert resolve_href("", BASE) is None
    assert resolve_href("#frag", BASE) is None
    assert resolve_href("http://other.org/x/", BASE) == "http://other.org/x"
    assert resolve_href(BASE, BASE) is None  # self-link in absolute form
    assert resolve_href("www.other.org/y", BASE) == "www.other.org/y"


def test_parse_page_stats():
    pp = parse_page(HTML, BASE)
    assert pp.title_text == "Department of Computing"
    # title terms: "depart" "comput"; meta adds sentinel positions
    assert "depart" in pp.title.freq
    assert "comput" in pp.title.freq
    assert META_POSITION in pp.title.pos["comput"]  # meta "Computer" stems to comput
    assert pp.body.freq["research"] >= 1
    # fancy keyed by md5 of target url
    from spaghettisearch_tpu.utils.hashing import md5_hex

    research_hash = md5_hex(f"{BASE}/research")
    assert pp.fancy[research_hash].freq == {"research": 1, "direct": 1}


def test_summary_text_prunes_subtrees():
    words = extract_summary_text(HTML)
    joined = " ".join(words)
    assert "search engines" in joined
    # <a> and <nav> subtrees pruned entirely for summaries
    assert "research directions" not in joined
    assert "Navigation entry" not in joined


def test_empty_and_broken_html():
    assert tokenize_page(b"", BASE).words == []
    page = tokenize_page(b"<p>unclosed <b>bold", BASE)
    assert "unclosed" in " ".join(page.words)
