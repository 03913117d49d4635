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
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
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
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        body = r.read().decode()
    assert r.status == 200
    assert "SpaghettiSearch" in body


def test_healthz(server):
    status, payload = _get(server + "/healthz")
    assert status == 200 and payload["ok"]
