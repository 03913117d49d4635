"""Serving micro-batcher: concurrent requests coalesce into device batches."""

import threading
import time

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


def test_segregated_batches_are_class_pure(engine):
    """With phrase-class segregation ON, every dispatched batch is class
    pure (all keyword-only or all phrase-bearing) and results still match
    the direct engine path."""
    recorded = []
    orig_async = engine.rank_async

    def recording_async(parsed, *a, **k):
        recorded.append([bool(p.phrase_hashes) for p in parsed])
        return orig_async(parsed, *a, **k)

    engine.rank_async = recording_async
    # patience high enough that no stale cohort ever merges mid-test (a
    # merge is legal but would make batch purity nondeterministic here)
    batcher = MicroBatcher(
        engine, max_batch=8, max_wait_ms=20, segregate="on",
        ph_patience_ms=10_000,
    )
    try:
        queries = ["algorithm", '"quantum physics"', "poetry",
                   '"database ranking"'] * 4
        results = [None] * len(queries)

        def issue(i):
            results[i] = batcher.query(queries[i])

        threads = [threading.Thread(target=issue, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert recorded, "no batches dispatched"
        for comp in recorded:
            assert len(set(comp)) == 1, f"mixed-class batch: {comp}"
        for q, res in zip(queries, results):
            direct = engine.query(q)
            assert [r["Url"] for r in res] == [r["Url"] for r in direct], q
        assert batcher.stats.ph_batches >= 1
    finally:
        batcher.shutdown()
        engine.rank_async = orig_async


def test_segregation_pick_policy():
    """Unit-test the class-pick rules on a stopped batcher."""
    b = MicroBatcher(object(), max_batch=4, segregate="on", ph_patience_ms=50)
    b.shutdown()
    now = time.monotonic()
    kw = ("a", None, False, now)
    ph = ("p", None, True, now)
    # only keywords waiting -> keyword class
    b._queue, b._n_ph = [kw], 0
    assert b._pick_class_locked(now) is False
    # only phrases waiting -> dispatch immediately (light load)
    b._queue, b._n_ph = [ph], 1
    assert b._pick_class_locked(now) is True
    # both, phrase batch not full and fresh -> keyword work first
    b._queue, b._n_ph = [ph, kw], 1
    assert b._pick_class_locked(now) is False
    # patience expired -> the stale cohort MERGES into one arrival-order
    # batch (an under-filled pure phrase batch pays the per-batch base
    # for few rows and loses; phrase cost is per-row wherever it rides)
    b._queue, b._n_ph = [("p", None, True, now - 1.0), kw], 1
    assert b._pick_class_locked(now) is None
    merged = b._slice_locked()
    assert len(merged) == 2 and b._n_ph == 0
    # pool floor: once ph_pool_min phrases pooled the cohort merges NOW
    # (device cost rides rows — waiting out patience only adds latency)
    b.ph_pool_min = 2
    b._queue, b._n_ph = [ph, ph, kw], 2
    assert b._pick_class_locked(now) is None
    b.ph_pool_min = 16
    # a FULL phrase batch dispatches even with keyword work pending
    b._queue, b._n_ph = [ph] * 4 + [kw], 4
    assert b._pick_class_locked(now) is True
    # slice is class-pure FIFO; the other class stays queued in order
    batch = b._slice_locked()
    assert [e[0] for e in batch] == ["p"] * 4 and b._n_ph == 0
    assert [e[0] for e in b._queue] == ["a"]


def test_segregation_auto_asks_engine():
    """segregate='auto' defers to engine.class_batching_pays; engines
    without the method (or that decline) get arrival-order slicing."""

    class Advises:
        def class_batching_pays(self):
            return True

    class Declines:
        def class_batching_pays(self):
            return False

    for eng, expect in ((Advises(), True), (Declines(), False), (object(), False)):
        b = MicroBatcher(eng, max_batch=4, segregate="auto")
        b.shutdown()
        now = time.monotonic()
        b._queue = [("p", None, True, now), ("a", None, False, now)]
        b._n_ph = 1
        picked = b._pick_class_locked(now)
        if expect:
            assert picked is False  # segregating: keyword first
        else:
            assert picked is None  # arrival order


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


def test_stale_cohort_pure_policy():
    """ph_stale='pure': a patience-expired phrase cohort dispatches as its
    own pure batch instead of merging (the latency end of the trade)."""
    b = MicroBatcher(object(), max_batch=4, segregate="on",
                     ph_patience_ms=50, ph_stale="pure")
    b.shutdown()
    now = time.monotonic()
    kw = ("a", None, False, now)
    stale = ("p", None, True, now - 1.0)
    b._queue, b._n_ph = [stale, kw, ("p2", None, True, now - 1.0)], 2
    assert b._pick_class_locked(now) is True
    batch = b._slice_locked()
    assert [e[0] for e in batch] == ["p", "p2"] and b._n_ph == 0
    assert [e[0] for e in b._queue] == ["a"]


def test_phrase_b32_bucket_matches_default(engine):
    """engine.phrase_b32: a 17..32-row pure-phrase fused batch rides the
    (B_PHRASE, Q_BASE) program and matches the default-bucket results."""
    import dataclasses

    from spaghettisearch_tpu.retrieval.engine import parse_query

    if not (getattr(engine.model, "supports_mixed", None)
            and engine.model.supports_mixed(engine.index)):
        pytest.skip("fused mixed lane inactive on this fixture")
    eng32 = dataclasses.replace(engine, phrase_b32=True)
    queries = [
        '"quantum physics"', '"database ranking"', '"algorithm database"',
        '"poetry novel"', '"galaxy planet"',
    ] * 4  # 20 rows: B_SMALL < n <= B_PHRASE
    parsed = [parse_query(q) for q in queries]
    assert all(p.phrase_hashes for p in parsed)
    s_want, i_want = engine.rank(parsed)
    s_got, i_got = eng32.rank(parsed)
    import numpy as np

    assert np.array_equal(i_want, i_got)
    assert np.allclose(s_want, s_got, rtol=1e-6, equal_nan=True)
    # a mixed-composition 20-row batch must NOT take the phrase bucket
    # (only pure-phrase cohorts ride it) — results again identical
    mixed_q = parsed[:10] + [parse_query("algorithm database")] * 10
    s2w, i2w = engine.rank(mixed_q)
    s2g, i2g = eng32.rank(mixed_q)
    assert np.array_equal(i2w, i2g)
    assert np.allclose(s2w, s2g, rtol=1e-6, equal_nan=True)
