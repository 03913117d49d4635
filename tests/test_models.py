"""Ranking model composition, engine refresh, and parity evaluation."""

import numpy as np
import pytest

import oracle
from corpus import build_corpus_db
from spaghettisearch_tpu.evaluation import compare_rankings, recall_at_k
from spaghettisearch_tpu.index.indexer import index_page
from spaghettisearch_tpu.models.blended import BlendedRanker
from spaghettisearch_tpu.ops.pagerank import update_pagerank
from spaghettisearch_tpu.ops.weighting import update_term_weights
from spaghettisearch_tpu.retrieval.engine import QueryEngine


@pytest.fixture(scope="module")
def db():
    return build_corpus_db(n_pages=20, seed=21)


def test_custom_blend_changes_ranking(db):
    default = QueryEngine(db)
    title_only = QueryEngine(
        db, model=BlendedRanker(w_pagerank=0.0, w_title=1.0, w_body=0.0)
    )
    q = "quantum database ranking"
    r_default = default.query(q)
    r_title = title_only.query(q)
    assert r_default and r_title
    # same candidates, different scores
    assert {r["Url"] for r in r_default} == {r["Url"] for r in r_title}
    assert [r["FinalRank"] for r in r_default] != [r["FinalRank"] for r in r_title]


def test_custom_blend_zero_weights_zero_scores(db):
    zero = QueryEngine(db, model=BlendedRanker(w_pagerank=0, w_title=0, w_body=0))
    res = zero.query("algorithm")
    assert all(r["FinalRank"] == 0.0 for r in res)


def test_engine_refresh_picks_up_new_docs(db):
    eng = QueryEngine(db)
    before = len(eng.query("zebrafish"))
    assert before == 0
    page = b"<html><head><title>Zebrafish</title></head><body>zebrafish genomics zebrafish</body></html>"
    from datetime import datetime, timezone

    index_page(db, page, "http://test.local/zebra", last_modified=datetime(2026, 2, 1, tzinfo=timezone.utc))
    update_pagerank(db)
    # NB: re-running term weighting would re-multiply idf (reference quirk);
    # the new doc still ranks via its raw normTF weight
    eng.refresh()
    after = eng.query("zebrafish")
    assert len(after) == 1
    assert after[0]["Url"].endswith("/zebra")


def test_recall_helpers():
    assert recall_at_k(["a", "b", "c"], ["a", "b", "c"], 3) == 1.0
    assert recall_at_k(["a", "x", "y"], ["a", "b", "c"], 3) == pytest.approx(1 / 3)
    rep = compare_rankings(
        [[("a", 1.0), ("b", 0.5)]],
        [[("a", 1.0), ("b", 0.5)]],
        k=2,
    )
    assert rep.recall_at_k == 1.0 and rep.exact_order == 1.0


def test_engine_oracle_parity_report(db):
    eng = QueryEngine(db)
    queries = ["algorithm", "quantum physics", "database ranking engine", "galaxy"]
    got, want = [], []
    for q in queries:
        from spaghettisearch_tpu.retrieval.engine import parse_query

        scores, ids = eng.rank([parse_query(q)])
        got.append(
            [
                (eng.snapshot.doc_hashes[i], float(s))
                for s, i in zip(scores[0], ids[0])
                if np.isfinite(s)
            ]
        )
        want.append(oracle.retrieve(db, q))
    rep = compare_rankings(got, want, k=10)
    assert rep.recall_at_k == 1.0
    assert rep.score_max_rel_err < 1e-4
