"""Full-pipeline integration: HTTP fixture site -> crawl CLI -> offline rank
jobs -> query server -> ranked results (the reference's bin/crawl + bin/server
flow, cmd/crawl/start_crawl.go + cmd/server/server.go)."""

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from corpus import make_page
from spaghettisearch_tpu.cli.crawl import main as crawl_main
from spaghettisearch_tpu.retrieval.engine import QueryEngine
from spaghettisearch_tpu.serve.server import SearchServer
from spaghettisearch_tpu.store.tables import Database


@pytest.fixture(scope="module")
def site():
    import random

    rng = random.Random(42)
    pages = {}
    n = 12
    for i in range(n):
        url, html = make_page(rng, i, n, "http://placeholder")
        # guarantee a connected crawl graph: each page links to the next
        html = html.replace(
            b"</body>", b'<a href="/page%d">next page</a></body>' % ((i + 1) % n)
        )
        pages[f"/page{i}"] = html
    pages["/"] = (
        b"<html><head><title>Fixture Home</title></head><body>"
        b'<p>fixture home entry</p><a href="/page0">zero</a><a href="/page1">one</a></body></html>'
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = pages.get(self.path.rstrip("/") or "/")
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Last-Modified", "Wed, 01 Jan 2026 00:00:00 GMT")
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_crawl_cli_end_to_end(site, tmp_path, capsys):
    db_path = str(tmp_path / "db_data")
    crawl_main(
        [
            "--startURL", site,
            "--numPages", "20",
            "--db", db_path,
            "--skipODP",
        ]
    )
    out = capsys.readouterr().out
    assert "Total visited length" in out

    db = Database(db_path)
    assert len(db.doc_info) >= 13  # 13 crawled pages (+ any stub children)
    assert len(db.doc_rank) == len(db.doc_info)
    assert len(db.doc_magnitude) > 0

    engine = QueryEngine(db)
    srv = SearchServer(engine)
    host, port = srv.start_background(port=0)
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/query",
            data=json.dumps({"query": "fixture home"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            results = json.loads(r.read())
        assert results, "query over crawled corpus returned nothing"
        assert results[0]["Url"].startswith("http://127.0.0.1")
        assert results[0]["FinalRank"] > 0
        # the home page matches both terms in the title -> should rank first
        assert results[0]["Page_title"] == "Fixture Home"
        # parent/child hydration present on some result
        assert any(r["Children"] or r["Parents"] for r in results)
    finally:
        srv.shutdown()
        db.close()


def test_concurrent_queries_and_refresh(site, tmp_path):
    """Race-safety: parallel queries while the snapshot swaps underneath."""
    db_path = str(tmp_path / "db2")
    crawl_main(["--startURL", site, "--numPages", "20", "--db", db_path, "--skipODP"])
    db = Database(db_path)
    engine = QueryEngine(db)
    errors: list[Exception] = []

    def worker():
        try:
            for _ in range(5):
                engine.query("fixture home entry")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for _ in range(3):
        engine.refresh()
    for t in threads:
        t.join()
    assert not errors
    db.close()


def test_refresh_under_load_native_backend(tmp_path):
    """Regression: /refresh reopens the native C++ store while the batcher
    hydrates results through it — without shared locking this segfaulted
    the server (use-after-free through ctypes)."""
    import threading
    import time

    from corpus import build_corpus_db
    from spaghettisearch_tpu.retrieval.engine import QueryEngine
    from spaghettisearch_tpu.serve.server import SearchServer

    db = build_corpus_db(n_pages=12, seed=3, root=str(tmp_path / "ndb"))
    assert db.backend_kind in ("native", "log")
    srv = SearchServer(QueryEngine(db), batching=True, max_wait_ms=0.5)
    errors: list[str] = []
    stop = time.time() + 4.0

    def q():
        # keyword AND phrase traffic: phrases ride the fused mixed lane,
        # whose posT planes swap with the live tuple on every refresh
        qs = ("algorithm database", '"algorithm database"', 'x "algorithm"')
        i = 0
        while time.time() < stop:
            try:
                srv.handle_query(qs[i % len(qs)])
                i += 1
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    def refresh():
        while time.time() < stop:
            try:
                srv.handle_refresh()
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))
            time.sleep(0.05)

    threads = [threading.Thread(target=q) for _ in range(4)] + [
        threading.Thread(target=refresh)
    ]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert errors == []
    assert srv.handle_query("algorithm")  # still serving, still correct
    srv.batcher.shutdown()
