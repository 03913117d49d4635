"""Crawler + ODP scraper over offline fixture sites."""

import asyncio

import pytest

from spaghettisearch_tpu.crawl.fetch import DictFetcher
from spaghettisearch_tpu.crawl.frontier import crawl
from spaghettisearch_tpu.crawl.odp import parse_odp
from spaghettisearch_tpu.store.tables import Database
from spaghettisearch_tpu.utils.hashing import md5_hex

BASE = "http://site.local"


def make_site() -> dict[str, bytes]:
    def page(title, body, links):
        anchors = "".join(f'<a href="{u}">{t}</a>' for u, t in links)
        return f"<html><head><title>{title}</title></head><body><p>{body}</p>{anchors}</body></html>".encode()

    return {
        BASE: page("Home", "welcome to the fixture site", [("/a", "alpha section"), ("/b", "beta section")]),
        BASE + "/a": page("Alpha", "alpha contains crawling words", [("/b", "beta link"), ("/c", "gamma page")]),
        BASE + "/b": page("Beta", "beta contains ranking words", [("http://other.example/x", "external")]),
        BASE + "/c": page("Gamma", "gamma page deep content", []),
        "http://other.example/x": page("External", "should not be crawled in domainOnly", []),
    }


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_bfs_crawl_domain_only():
    db = Database()
    fetcher = DictFetcher(make_site())
    stats = run(crawl(db, BASE, num_pages=10, domain_only=True, fetcher=fetcher, log=lambda *a: None))
    assert stats.indexed == 4  # home, /a, /b, /c — external excluded
    assert md5_hex(BASE + "/c") in db.doc_info
    # external page: stub DocInfo exists (anchor target) but never crawled
    ext = db.doc_info.get(md5_hex("http://other.example/x"))
    assert ext is not None and ext.is_stub
    # BFS order: home at depth 0, /a /b depth 1, /c depth 2
    assert fetcher.fetched[0] == BASE
    assert set(fetcher.fetched[1:3]) == {BASE + "/a", BASE + "/b"}
    assert fetcher.fetched[3] == BASE + "/c"


def test_crawl_page_budget():
    db = Database()
    fetcher = DictFetcher(make_site())
    stats = run(crawl(db, BASE, num_pages=2, domain_only=True, fetcher=fetcher, log=lambda *a: None))
    assert stats.indexed <= 3  # budget checked per depth round


def test_crawl_error_recredits_budget():
    pages = make_site()
    # reroute so /c hangs off /b, then 404 /a: the error must re-credit the
    # 3-page budget so /c still gets crawled
    pages[BASE + "/b"] = pages[BASE + "/b"].replace(
        b"</body>", b'<a href="/c">gamma</a></body>'
    )
    del pages[BASE + "/a"]
    db = Database()
    fetcher = DictFetcher(pages)
    stats = run(crawl(db, BASE, num_pages=3, domain_only=True, fetcher=fetcher, log=lambda *a: None))
    assert stats.errors == 1
    # visited: home, /a(err), /b at depths 0-1 exhausts the budget of 3;
    # the re-credit admits /c at depth 2
    assert stats.indexed == 3


def test_crawl_cross_domain():
    db = Database()
    fetcher = DictFetcher(make_site())
    stats = run(crawl(db, BASE, num_pages=10, domain_only=False, fetcher=fetcher, log=lambda *a: None))
    assert stats.indexed == 5


ODP = "http://odp.local"


def make_odp_site() -> dict[str, bytes]:
    seed = f"""<html><body><div class="container">
    <ul id="triple">
      <li><a href="{ODP}/Science">Science</a></li>
      <li><a href="{ODP}/Arts">Arts</a></li>
    </ul></div></body></html>"""
    science = f"""<html><body><div class="container">
    <ul id="triple"><li><a href="/Science/Physics">Physics</a></li></ul>
    <ul><li class="listings"><h4><a href="http://ext.example/quantum">Quantum</a></h4></li></ul>
    </div></body></html>"""
    physics = f"""<html><body><div class="container">
    <ul><li class="listings"><h4><a href="http://ext.example/particles">Particles</a></h4></li></ul>
    </div></body></html>"""
    arts = f"""<html><body><div class="container">
    <ul><li class="listings"><h4><a href="http://ext.example/painting">Painting</a></h4></li></ul>
    </div></body></html>"""
    ext = lambda title: f"<html><head><title>{title}</title></head><body>text</body></html>"  # noqa: E731
    return {
        ODP: seed.encode(),
        f"{ODP}/Science": science.encode(),
        f"{ODP}/Science/Physics": physics.encode(),
        f"{ODP}/Arts": arts.encode(),
        "http://ext.example/quantum": ext("quantum computing research").encode(),
        "http://ext.example/particles": ext("particle physics experiments").encode(),
        "http://ext.example/painting": ext("painting masterpieces gallery").encode(),
    }


def test_parse_odp():
    db = Database()
    fetcher = DictFetcher(make_odp_site())
    results = run(parse_odp(db, fetcher, seed_url=ODP, log=lambda *a: None))
    assert {r.category for r in results} == {"Science", "Arts"}

    sci = db.topic_meta.get("Science")
    # Science: topic page + Physics subcat + 2 external resources = 4 requests
    assert sci["numPages"] == 4.0
    assert sci["wordCount"] > 0
    # title terms of external pages aggregated under the category, keyed by hash
    row = db.inv_topic.get(md5_hex("quantum"))
    assert row == {"Science": 1}
    paint = db.inv_topic.get(md5_hex("paint"))  # stemmed
    assert paint == {"Arts": 1}


def test_parse_odp_dead_seed():
    db = Database()
    fetcher = DictFetcher({})
    results = run(parse_odp(db, fetcher, seed_url=ODP, log=lambda *a: None))
    assert results == []
    assert len(db.topic_meta) == 0
