"""Snapshot save/load roundtrip + micro-bench smoke + GC daemon."""

import numpy as np
import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.index.persist import load_snapshot, save_snapshot
from spaghettisearch_tpu.index.snapshot import build_snapshot
from spaghettisearch_tpu.retrieval.engine import QueryEngine
from spaghettisearch_tpu.store.tables import Database


def test_snapshot_roundtrip(tmp_path):
    db = build_corpus_db(n_pages=12, seed=4)
    snap = build_snapshot(db)
    save_snapshot(snap, str(tmp_path / "snap"))
    again = load_snapshot(str(tmp_path / "snap"))

    assert again.doc_hashes == snap.doc_hashes
    assert again.word_hashes == snap.word_hashes
    assert again.categories == snap.categories
    for name in ("title", "body"):
        a, b = getattr(snap, name), getattr(again, name)
        np.testing.assert_array_equal(a.post_offsets, b.post_offsets)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.weights, b.weights)
        np.testing.assert_array_equal(a.positions, b.positions)
        assert a.max_df == b.max_df
    np.testing.assert_array_equal(snap.pagerank, again.pagerank)

    # a loaded snapshot serves queries identically
    e1 = QueryEngine(db, snapshot=snap)
    e2 = QueryEngine(db, snapshot=again)
    r1 = e1.query("algorithm database")
    r2 = e2.query("algorithm database")
    assert [x["Url"] for x in r1] == [x["Url"] for x in r2]


def test_bench_micro_runs(capsys):
    from spaghettisearch_tpu.cli.bench_micro import main

    main([])
    out = capsys.readouterr().out
    assert "md5 hex of a word" in out
    assert "intersect" in out


def test_gc_daemon(tmp_path):
    db = Database(str(tmp_path / "db"))
    db.word.set("k", "v")
    db.start_gc(interval_s=0.05)
    import time

    time.sleep(0.2)
    db.stop_gc()
    assert db.word.get("k") == "v"
    db.close()


def test_save_snapshot_overwrite_is_atomic(tmp_path):
    """Re-saving over an existing snapshot swaps directories; the final dir
    is always loadable (no half-written state left behind)."""
    import os

    snapshot = build_snapshot(build_corpus_db(n_pages=8, seed=6))
    path = str(tmp_path / "snapdir")
    save_snapshot(snapshot, path)
    first = load_snapshot(path)
    save_snapshot(snapshot, path)  # overwrite in place
    again = load_snapshot(path)
    assert again.n_docs == first.n_docs == snapshot.n_docs
    assert not [d for d in os.listdir(tmp_path) if ".tmp-" in d or ".old-" in d]


def test_slice_snapshot_scores_match_full():
    """slice_snapshot (shard-0 doc range): per-doc scores on the sliced
    snapshot equal the full engine's scores restricted to the kept docs —
    the property the shard-scale device measurements rest on."""
    from spaghettisearch_tpu.index.snapshot import slice_snapshot
    from spaghettisearch_tpu.retrieval.engine import parse_query

    db = build_corpus_db(n_pages=30, seed=4)
    full = QueryEngine(db)
    n_keep = 20
    part = QueryEngine(db, snapshot=slice_snapshot(full.snapshot, n_keep))
    assert part.snapshot.n_docs == n_keep
    assert part.index.n_docs == n_keep
    queries = ["algorithm database", "quantum physics galaxy",
               '"gradient neural"', 'ranking "matrix tensor" cluster',
               "poetry"]
    parsed = [parse_query(q) for q in queries]
    fs, fi = full.rank(parsed, topk=30)
    ps, pi = part.rank(parsed, topk=30)
    for r in range(len(parsed)):
        want = {int(d): float(s) for s, d in zip(fs[r], fi[r])
                if np.isfinite(s) and int(d) < n_keep}
        got = {int(d): float(s) for s, d in zip(ps[r], pi[r])
              if np.isfinite(s)}
        assert set(got) == set(want), queries[r]
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-5), (queries[r], d)

