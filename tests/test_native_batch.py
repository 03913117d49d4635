"""Native batch-job fast paths must be value-identical to the Python
reference implementations: the flat postings export, the vectorized
snapshot assembly, and the C++ term-weighting pass."""

import numpy as np
import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.index.snapshot import (
    SectionCSR,
    build_snapshot,
    export_postings,
)
from spaghettisearch_tpu.store.tables import Database

native = pytest.importorskip("spaghettisearch_tpu.store.native_kv")
if not native.native_available():
    pytest.skip("libfastkv.so not buildable", allow_module_level=True)


@pytest.fixture(scope="module")
def disk_db(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nb"))
    db = build_corpus_db(n_pages=60, seed=6, root=root)
    assert db.backend_kind == "native"
    return db


def _legacy_build_snapshot(db):
    """The round-1 dict-walking builder (kept as the oracle)."""
    from spaghettisearch_tpu.index import snapshot as S

    doc_hashes = sorted(db.doc_info.keys())
    doc_id = {h: i for i, h in enumerate(doc_hashes)}
    title_rows = dict(db.inv_title.items())
    body_rows = dict(db.inv_body.items())
    word_hashes = sorted(set(title_rows) | set(body_rows))
    word_id = {h: i for i, h in enumerate(word_hashes)}
    n_words, n_docs = len(word_hashes), len(doc_hashes)
    return (
        word_hashes,
        doc_hashes,
        SectionCSR.build(title_rows, word_id, doc_id, n_words, n_docs),
        SectionCSR.build(body_rows, word_id, doc_id, n_words, n_docs),
    )


def test_native_export_equals_python_export(disk_db):
    for table in (disk_db.inv_title, disk_db.inv_body, disk_db.inverted_raw("title")):
        nat = table._kv.export_postings()
        assert nat is not None
        # Python export of the same table
        kv = table._kv
        try:
            table._kv = type("X", (), {})()  # hide the native hook
            table._kv.items = kv.items
            py = export_postings(table)
        finally:
            table._kv = kv
        # row order differs (hash map vs iteration); normalize by row key
        def norm(flat):
            keys, ro, docs, w, po, pos = flat
            ro = ro.astype(np.int64); po = po.astype(np.int64)
            order = np.argsort(keys, kind="stable")
            rows = {}
            for r in order:
                lo, hi = int(ro[r]), int(ro[r + 1])
                entry = {}
                for p in range(lo, hi):
                    entry[docs[p]] = (
                        float(w[p]),
                        sorted(float(x) for x in pos[po[p] : po[p + 1]]),
                    )
                rows[keys[r]] = entry
            return rows
        assert norm(nat) == norm(py)


def test_vectorized_snapshot_equals_legacy(disk_db):
    snap = build_snapshot(disk_db)
    word_hashes, doc_hashes, title, body = _legacy_build_snapshot(disk_db)
    assert snap.word_hashes == word_hashes
    assert snap.doc_hashes == doc_hashes
    for got, want in ((snap.title, title), (snap.body, body)):
        np.testing.assert_array_equal(got.post_offsets, want.post_offsets)
        np.testing.assert_array_equal(got.doc_ids, want.doc_ids)
        np.testing.assert_array_equal(got.weights, want.weights)
        np.testing.assert_array_equal(got.pos_offsets, want.pos_offsets)
        np.testing.assert_array_equal(got.positions, want.positions)
        assert got.n_postings == want.n_postings
        assert got.max_df == want.max_df
        assert got.max_positions == want.max_positions


def test_native_term_weighting_equals_python(tmp_path):
    """The C++ weighting pass and the Python loop must leave value-identical
    stores (weights, positions, magnitudes) and stay idempotent."""
    import json

    from spaghettisearch_tpu.ops.weighting import update_term_weights

    dbs = {}
    for name in ("nat", "py"):
        db = build_corpus_db(n_pages=50, seed=12, root=str(tmp_path / name))
        dbs[name] = db  # build_corpus_db already ran weighting once

    py = dbs["py"]

    # run the pass AGAIN on both (idempotence: raw shadow derivation);
    # 'py' goes through the Python loop via a wrapper that hides the
    # native hook
    update_term_weights(dbs["nat"], "title")
    update_term_weights(dbs["nat"], "body")

    for t in (py.inv_title, py.inv_body):
        orig = t._kv

        class Wrap:
            def __init__(self, kv): self._kv = kv
            def items(self): return self._kv.items()
            def get(self, k): return self._kv.get(k)
            def set(self, k, v): return self._kv.set(k, v)
            def set_many(self, items): return self._kv.set_many(items)
            def delete(self, k): return self._kv.delete(k)

        t._kv = Wrap(orig)
    update_term_weights(py, "title")
    update_term_weights(py, "body")
    for t in (py.inv_title, py.inv_body):
        t._kv = t._kv._kv

    for table in ("inv_title", "inv_body", "doc_magnitude"):
        a = dict(dbs["nat"].tables[table].items())
        b = dict(py.tables[table].items())
        assert a.keys() == b.keys(), table
        for k in a:
            if table == "doc_magnitude":
                for sec in a[k]:
                    assert a[k][sec] == pytest.approx(b[k][sec], rel=1e-12), (k, sec)
            else:
                assert a[k] == b[k], (table, k)


def test_native_weighting_durable(tmp_path):
    """Native-pass rewrites must be WAL'd: reopen sees the weighted rows."""
    from spaghettisearch_tpu.ops.weighting import update_term_weights

    root = str(tmp_path / "d")
    db = build_corpus_db(n_pages=30, seed=4, root=root)
    update_term_weights(db, "body")  # second run, native path
    want = dict(db.inv_body.items())
    db.flush()
    db.close()
    db2 = Database(root)
    assert dict(db2.inv_body.items()) == want
    db2.close()
