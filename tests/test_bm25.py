"""BM25 ranking model: device scoring vs a pure-numpy Okapi reference."""

import math

import numpy as np
import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.models.bm25 import BM25Ranker, bm25_posting_weights
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query
from spaghettisearch_tpu.text.laundry import laundry
from spaghettisearch_tpu.utils.hashing import md5_hex


@pytest.fixture(scope="module")
def db():
    return build_corpus_db(n_pages=25, seed=12)


@pytest.fixture(scope="module")
def engine(db):
    return QueryEngine(db, model=BM25Ranker())


def _numpy_bm25(db, snap, query, k1=1.2, b=0.75, title_boost=2.0, body_boost=1.0):
    """Independent host-side BM25 over the raw store tables."""
    terms = laundry(query)
    n = snap.n_docs
    scores: dict[str, float] = {}
    for section, table, boost in (
        ("title", db.inv_title, title_boost),
        ("body", db.inv_body, body_boost),
    ):
        # doc lengths from the full table (tf = position count)
        doc_len: dict[str, float] = {}
        for _, row in table.items():
            for doc, lp in row.items():
                doc_len[doc] = doc_len.get(doc, 0.0) + len(lp) - 1
        # every indexed doc participates in avgdl with len 0 if absent
        avgdl = sum(doc_len.values()) / n
        for t in terms:
            row = table.get(md5_hex(t))
            if not row:
                continue
            df = len(row)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for doc, lp in row.items():
                tf = len(lp) - 1
                dl = doc_len.get(doc, 0.0)
                w = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                scores[doc] = scores.get(doc, 0.0) + boost * w
    return scores


def test_posting_weights_match_definition(db, engine):
    snap = engine.snapshot
    for name in ("title", "body"):
        csr = getattr(snap, name)
        w = bm25_posting_weights(csr, snap.n_docs)
        assert w.shape == csr.weights.shape
        assert np.all(w[: csr.n_postings] > 0)
        assert np.all(w[csr.n_postings:] == 0)


def test_bm25_scores_match_numpy(db, engine):
    snap = engine.snapshot
    for query in ("algorithm database", "quantum", "galaxy poetry theater"):
        want = _numpy_bm25(db, snap, query)
        parsed = parse_query(query)
        s, i = engine.rank([parsed], topk=50)
        got = {
            snap.doc_hashes[int(d)]: float(v)
            for v, d in zip(s[0], i[0])
            if np.isfinite(v)
        }
        assert set(got) == set(want), query
        for doc in got:
            assert got[doc] == pytest.approx(want[doc], rel=1e-4), (query, doc)


def test_bm25_phrase_query(db, engine):
    """Phrase semantics under BM25: adjacency still enforced; scores sum the
    BM25 weights of the matched postings."""
    # mine a real adjacent 2-gram
    for doc_hash in engine.snapshot.doc_hashes:
        raw = db.cached_doc(doc_hash)
        if not raw:
            continue
        toks = laundry(" ".join(raw.decode().split("<p>")[1].split("</p>")[0].split()))
        if len(toks) >= 2:
            ph = (toks[0], toks[1])
            break
    res = engine.query(f'"{ph[0]} {ph[1]}"')
    assert res, "phrase should match at least the source doc"
    # a non-adjacent or nonsense phrase yields nothing
    assert engine.query('"zzzz yyyy"') == []


def test_bm25_survives_refresh(db, engine):
    engine.refresh()
    assert engine.query("algorithm")  # prepare() re-ran, arrays consistent


def test_bm25_with_loaded_snapshot(tmp_path, db):
    """BM25 prepare() must work when the engine starts from a persisted
    snapshot (the server's --snapshot --ranker bm25 path)."""
    from spaghettisearch_tpu.index.persist import load_snapshot, save_snapshot
    from spaghettisearch_tpu.index.snapshot import build_snapshot

    save_snapshot(build_snapshot(db), str(tmp_path / "s"))
    eng = QueryEngine(db, snapshot=load_snapshot(str(tmp_path / "s")), model=BM25Ranker())
    assert eng.query("algorithm")
