"""Serving micro-batcher: concurrent requests coalesce into device batches."""

import threading

import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.retrieval.engine import QueryEngine
from spaghettisearch_tpu.serve.batcher import MicroBatcher


@pytest.fixture(scope="module")
def engine():
    return QueryEngine(build_corpus_db(n_pages=15, seed=8))


def test_batched_results_match_direct(engine):
    batcher = MicroBatcher(engine, max_batch=8, max_wait_ms=20)
    try:
        queries = ["algorithm", "quantum physics", "poetry", "database ranking"] * 3
        results = [None] * len(queries)

        def issue(i):
            results[i] = batcher.query(queries[i])

        threads = [threading.Thread(target=issue, args=(i,)) for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for q, res in zip(queries, results):
            direct = engine.query(q)
            assert [r["Url"] for r in res] == [r["Url"] for r in direct], q
        # coalescing actually happened
        assert batcher.stats.batches < batcher.stats.queries
        assert batcher.stats.queries == len(queries)
    finally:
        batcher.shutdown()


def test_batcher_propagates_errors(engine):
    batcher = MicroBatcher(engine, max_batch=4, max_wait_ms=1)
    try:
        class Boom(Exception):
            pass

        orig_rank, orig_async = engine.rank, engine.rank_async

        def boom(*a, **k):
            raise Boom()

        # the batcher prefers rank_async; patch both so either path raises
        engine.rank = engine.rank_async = boom
        with pytest.raises(Boom):
            batcher.query("anything")
        engine.rank, engine.rank_async = orig_rank, orig_async
        assert batcher.query("algorithm") is not None
    finally:
        batcher.shutdown()
