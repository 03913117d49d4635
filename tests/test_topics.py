"""Topic-sensitive PageRank blend: disabled default, reference quirk mode,
and the fixed (usable) mode."""

import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.retrieval.engine import QueryEngine
from spaghettisearch_tpu.retrieval.topics import compute_topic_probs
from spaghettisearch_tpu.utils.hashing import md5_hex


@pytest.fixture(scope="module")
def db():
    d = build_corpus_db(n_pages=18, seed=13)
    # ODP-style topic term stats: "quantum" is a Science word,
    # "poetry" an Arts word (inv_topic keyed by word hash)
    d.inv_topic.set(md5_hex("quantum"), {"Science": 40})
    d.inv_topic.set(md5_hex("poetri"), {"Arts": 25})  # stemmed form
    return d


def test_disabled_by_default(db):
    eng = QueryEngine(db)
    res = eng.query("quantum")
    assert res and all(r["PageRank"] == 0.0 for r in res)


def test_reference_quirk_yields_zero(db):
    """Enabled but with the reference's zero-seeded product: still 0."""
    probs = compute_topic_probs(db, [md5_hex("quantum")])
    assert set(probs) == {"Science", "Arts"}
    assert all(v == 0.0 for v in probs.values())
    eng = QueryEngine(db, use_topic_model=True)
    res = eng.query("quantum")
    assert res and all(r["PageRank"] == 0.0 for r in res)


def test_fixed_mode_blends_pagerank(db):
    probs = compute_topic_probs(db, [md5_hex("quantum")], fixed=True)
    assert probs["Science"] > 0.0
    assert probs["Arts"] == 0.0

    eng = QueryEngine(db, use_topic_model=True, topic_model_fixed=True)
    res = eng.query("quantum")
    assert res
    assert any(r["PageRank"] > 0.0 for r in res)
    # scores include the PageRank term: strictly greater than disabled-model
    base = QueryEngine(db).query("quantum")
    base_by_url = {r["Url"]: r["FinalRank"] for r in base}
    assert any(
        r["FinalRank"] > base_by_url.get(r["Url"], 0.0) + 1e-12 for r in res
    )
