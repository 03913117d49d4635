"""Repaired topic-sensitive PageRank: per-category ODP personalization must
produce genuinely different rank vectors (the reference's category loop is
decorative — every category converges to the same vector,
ranking/pagerank.go:60-61,104), and the quirk-parity default must keep
producing identical ones."""

from datetime import datetime, timezone

import numpy as np
import pytest

from spaghettisearch_tpu.index.indexer import index_page
from spaghettisearch_tpu.ops.pagerank import update_pagerank
from spaghettisearch_tpu.ops.weighting import update_term_weights
from spaghettisearch_tpu.retrieval.engine import QueryEngine
from spaghettisearch_tpu.store.tables import Database
from spaghettisearch_tpu.utils.hashing import md5_hex
from spaghettisearch_tpu.text.laundry import laundry


def _page(title: str, body: str, links: list[str]) -> bytes:
    anchors = "".join(f'<a href="{u}">{title}</a>' for u in links)
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{body}</p>{anchors}</body></html>"
    ).encode()


@pytest.fixture(scope="module")
def topic_db():
    db = Database(None)
    # two categories with DIFFERENT ODP term profiles
    db.topic_meta.set("Science", {"numPages": 100.0, "wordCount": 500.0})
    db.topic_meta.set("Arts", {"numPages": 120.0, "wordCount": 400.0})
    sci_terms = {md5_hex(w): {"Science": 50} for w in laundry("quantum physics tensor")}
    art_terms = {md5_hex(w): {"Arts": 60} for w in laundry("poetry theater painting")}
    for wh, row in {**sci_terms, **art_terms}.items():
        db.inv_topic.set(wh, row)

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    base = "http://topic.local"
    pages = {
        f"{base}/sci0": ("quantum lab", "quantum physics tensor experiment", [f"{base}/sci1"]),
        f"{base}/sci1": ("physics hub", "physics tensor quantum results", [f"{base}/sci0", f"{base}/art0"]),
        f"{base}/art0": ("poetry corner", "poetry theater painting verse", [f"{base}/art1"]),
        f"{base}/art1": ("theater news", "theater painting poetry stage", [f"{base}/art0", f"{base}/sci0"]),
        f"{base}/mix": ("mixed page", "quantum poetry results stage", [f"{base}/sci0", f"{base}/art0"]),
    }
    for url, (title, body, links) in pages.items():
        index_page(db, _page(title, body, links), url, last_modified=ts)
    return db


def _rank_matrix(db, categories):
    docs = sorted(db.doc_rank.keys())
    return docs, np.array(
        [[(db.doc_rank.get(d) or {}).get(c, 0.0) for d in docs] for c in categories]
    )


def test_personalized_categories_diverge(topic_db):
    update_pagerank(topic_db, personalized=True)
    docs, r = _rank_matrix(topic_db, ["Arts", "Science"])
    # genuinely different vectors per category
    assert not np.allclose(r[0], r[1])
    # each category's probability mass sums to 1 over the graph
    np.testing.assert_allclose(r.sum(axis=1), 1.0, rtol=1e-3)
    # science pages out-rank arts pages under Science, and vice versa
    url_of = {d: topic_db.doc_info.get(d).url for d in docs}
    sci = [i for i, d in enumerate(docs) if "/sci" in url_of[d]]
    art = [i for i, d in enumerate(docs) if "/art" in url_of[d]]
    assert r[1][sci].sum() > r[1][art].sum()  # Science category
    assert r[0][art].sum() > r[0][sci].sum()  # Arts category


def test_quirk_default_categories_identical(topic_db):
    update_pagerank(topic_db)  # reference-parity mode
    _, r = _rank_matrix(topic_db, ["Arts", "Science"])
    np.testing.assert_allclose(r[0], r[1], rtol=1e-6)


def test_personalized_ranks_blend_through_topic_model(topic_db):
    """End to end: with --topicModel, a science query must pull science docs
    up via the Science-personalized PageRank axis."""
    update_pagerank(topic_db, personalized=True)
    update_term_weights(topic_db, "title")
    update_term_weights(topic_db, "body")
    eng = QueryEngine(topic_db, use_topic_model=True, topic_model_fixed=True)
    res = eng.query("quantum results")
    assert res
    # PageRank contributions are live (nonzero) in the blended score
    assert any(r["PageRank"] > 0 for r in res)
    # and differ from the quirk engine's (which has identical category axes)
    eng_quirk = QueryEngine(topic_db, use_topic_model=True, topic_model_fixed=False)
    res_quirk = eng_quirk.query("quantum results")
    assert [r["PageRank"] for r in res] != [r["PageRank"] for r in res_quirk]
