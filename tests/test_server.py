"""HTTP API: route compatibility with the reference server."""

import json
import urllib.request

import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.retrieval.engine import QueryEngine
from spaghettisearch_tpu.serve.server import SearchServer


@pytest.fixture(scope="module")
def server():
    db = build_corpus_db(n_pages=15, seed=2)
    srv = SearchServer(QueryEngine(db))
    host, port = srv.start_background(port=0)
    yield f"http://{host}:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_post_query(server):
    status, results = _post(server + "/query", {"query": "algorithm database"})
    assert status == 200
    assert isinstance(results, list)
    if results:
        assert "Url" in results[0] and "FinalRank" in results[0]
        ranks = [r["FinalRank"] for r in results]
        assert ranks == sorted(ranks, reverse=True)


def test_get_query(server):
    status, results = _post(server + "/query", {"query": "algorithm"})
    status2, results2 = _get(server + "/query/algorithm")
    assert status2 == 200
    assert [r["Url"] for r in results2] == [r["Url"] for r in results]


def test_query_batch(server):
    status, results = _post(
        server + "/query_batch", {"queries": ["algorithm", "quantum"]}
    )
    assert status == 200
    assert len(results) == 2


def test_wordlist(server):
    status, words = _get(server + "/wordlist/a")
    assert status == 200
    assert all(w.startswith("a") for w in words)


def test_static_ui(server):
    with urllib.request.urlopen(server + "/", timeout=120) as r:
        body = r.read().decode()
    assert r.status == 200
    assert "SpaghettiSearch" in body


def test_healthz(server):
    status, payload = _get(server + "/healthz")
    assert status == 200 and payload["ok"]


def test_refresh_picks_up_new_docs():
    """POST /refresh swaps in a rebuilt snapshot: docs indexed after server
    start become searchable without a restart."""
    import random
    from datetime import datetime, timezone

    from corpus import make_page
    from spaghettisearch_tpu.index.indexer import index_page
    from spaghettisearch_tpu.ops.weighting import update_term_weights
    from spaghettisearch_tpu.ops.pagerank import update_pagerank

    db = build_corpus_db(n_pages=10, seed=7)
    srv = SearchServer(QueryEngine(db), batching=False)
    host, port = srv.start_background(port=0)
    base = f"http://{host}:{port}"
    try:
        _, h0 = _get(base + "/healthz")
        assert h0["docs"] == 10

        html = (b"<html><head><title>zzuniquetitleword</title></head>"
                b"<body>zzuniquetitleword appears in this body too</body></html>")
        index_page(db, html, "http://test.local/new-doc",
                   last_modified=datetime(2026, 2, 1, tzinfo=timezone.utc))
        update_pagerank(db)
        update_term_weights(db, "title")
        update_term_weights(db, "body")

        _, before = _post(base + "/query", {"query": "zzuniquetitleword"})
        assert before == []  # old snapshot still live

        _, ref = _post(base + "/refresh", {})
        assert ref["ok"] and ref["docs"] == 11

        _, h1 = _get(base + "/healthz")
        assert h1["docs"] == 11
        _, after = _post(base + "/query", {"query": "zzuniquetitleword"})
        assert len(after) == 1
        assert after[0]["Url"] == "http://test.local/new-doc"
    finally:
        srv.shutdown()
