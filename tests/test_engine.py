"""End-to-end query engine vs the reference-semantics oracle."""

import numpy as np
import pytest

import oracle
from corpus import build_corpus_db, VOCAB
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query
from spaghettisearch_tpu.text.laundry import laundry


@pytest.fixture(scope="module")
def db():
    return build_corpus_db(n_pages=25, seed=11)


@pytest.fixture(scope="module")
def engine(db):
    return QueryEngine(db)


def _compare(engine, db, query, topk=50):
    want = oracle.retrieve(db, query, topk)
    got_scores, got_ids = engine.rank([parse_query(query)], topk=topk)
    got = [
        (engine.snapshot.doc_hashes[i], float(s))
        for s, i in zip(got_scores[0], got_ids[0])
        if np.isfinite(s)
    ]
    assert len(got) == len(want), (
        f"candidate count mismatch for {query!r}: {len(got)} vs {len(want)}"
    )
    want_map = dict(want)
    for doc, score in got:
        assert doc in want_map, f"unexpected candidate {doc} for {query!r}"
        assert score == pytest.approx(want_map[doc], rel=2e-4, abs=1e-5)
    # rank order must match up to score ties
    got_scores_sorted = [s for _, s in got]
    want_scores_sorted = [s for _, s in want[: len(got)]]
    assert got_scores_sorted == pytest.approx(want_scores_sorted, rel=2e-4, abs=1e-5)


def test_keyword_queries_match_oracle(engine, db):
    for q in ("algorithm", "quantum physics", "database ranking engine",
              "galaxy poetry", "nonexistentword", "matrix matrix matrix"):
        _compare(engine, db, q)


def test_batched_equals_single(engine):
    queries = ["algorithm", "quantum physics", "poetry theater music"]
    batched = engine.query_batch(queries)
    singles = [engine.query(q) for q in queries]
    for b, s in zip(batched, singles):
        assert [r["Url"] for r in b] == [r["Url"] for r in s]
        assert [r["FinalRank"] for r in b] == [r["FinalRank"] for r in s]


def test_phrase_query_matches_oracle(engine, db):
    # mine a real 2-gram from some body text so at least one phrase matches
    found = None
    for doc_hash in engine.snapshot.doc_hashes:
        raw = db.cached_doc(doc_hash)
        if not raw:
            continue
        body = raw.decode().split("<p>")[1].split("</p>")[0].split()
        toks = laundry(" ".join(body))
        if len(toks) >= 2:
            found = f'"{toks[0]} {toks[1]}"'
            break
    assert found
    _compare(engine, db, found)
    _compare(engine, db, found + " algorithm")


def test_phrase_negative(engine, db):
    # a 2-gram of words that never appear adjacent: two vocabulary words
    # from different pages with an impossible order check via oracle parity
    _compare(engine, db, '"zzzz yyyy"')
    _compare(engine, db, '"algorithm algorithm algorithm algorithm"')


def test_single_term_phrase_counts_as_presence(engine, db):
    _compare(engine, db, '"algorithm"')


def test_result_shape(engine):
    res = engine.query("algorithm database")
    assert isinstance(res, list)
    if res:
        r = res[0]
        for key in ("Url", "Page_title", "Mod_date", "Page_size", "Children",
                    "Parents", "Words_mapping", "Summary", "PageRank", "FinalRank"):
            assert key in r
        assert r["FinalRank"] >= res[-1]["FinalRank"]
        assert r["PageRank"] == 0.0  # topic model disabled, parity quirk
        assert r["Url"].startswith("http://test.local/")


def test_empty_query(engine):
    assert engine.query("") == []
    assert engine.query("   ") == []
    # all-stopword query tokenizes to nothing
    assert engine.query("the and of") == []


def test_query_torture_inputs(engine):
    """Degenerate and adversarial query strings must parse, rank, and
    hydrate without raising — the reference's parser is a bare regex with
    no validation (retrieval/main_retrieve.go:34-44), so anything a user
    can type must flow through. Covers unterminated/empty/duplicate
    phrases, stopword-only phrases, unicode+emoji, control characters,
    and a >Q_CATCHALL keyword blast (truncated with a warning)."""
    nasty = [
        '"unterminated phrase',
        'trailing quote"',
        '""',
        '"the and of"',
        '"a" "b" "c" "d" "e"',
        "café naïve 東京 🚀",
        "\x01\x02 control chars",
        " ".join(f"word{i}" for i in range(100)),
        'mixed "quantum physics" tail',
        '"quantum physics" "quantum physics"',
    ]
    for q in nasty:
        res = engine.query(q)
        assert isinstance(res, list), q
        for r in res:
            assert "Url" in r and "FinalRank" in r, q


def test_wordlist(engine):
    wl = engine.wordlist("a")
    assert all(w.startswith("a") for w in wl)
    assert wl == sorted(set(wl))
    stemmed_vocab = {laundry(w)[0] for w in VOCAB if laundry(w)}
    assert set(engine.wordlist("")) >= {w for w in stemmed_vocab if w[0] == "a"}


def test_top50_cut(db):
    eng = QueryEngine(db)
    res = eng.query("algorithm database retrieval ranking crawler "
                    "vector cosine matrix tensor gradient")
    assert len(res) <= 50


def test_batched_phrase_queries_equal_single(engine, db):
    """A batch mixing several phrase queries must reproduce per-query results
    (the batched device matcher vs one query at a time)."""
    from spaghettisearch_tpu.text.laundry import laundry

    phrases = []
    for doc_hash in engine.snapshot.doc_hashes:
        raw = db.cached_doc(doc_hash)
        if not raw:
            continue
        body = raw.decode().split("<p>")[1].split("</p>")[0]
        toks = laundry(" ".join(body.split()))
        if len(toks) >= 2:
            phrases.append(f'"{toks[0]} {toks[1]}"')
        if len(phrases) == 3:
            break
    queries = phrases + ['"zzz yyy"', "keywordonly algorithm"]
    batched = engine.query_batch(queries)
    singles = [engine.query_batch([q])[0] for q in queries]
    for q, got, want in zip(queries, batched, singles):
        assert [r["Url"] for r in got] == [r["Url"] for r in want], q
        assert [r["FinalRank"] for r in got] == [r["FinalRank"] for r in want], q
    assert any(batched[i] for i in range(len(phrases)))  # real phrase hits


def test_big_batch_bucket_equals_chunked(db):
    """big_batch=True routes >128-row batches to the B_BIG=256 bucket; the
    padded wide program must score row-for-row like the default engine
    ranking the same queries in <=128-row chunks (incl. phrases and a
    long-keyword catch-all row)."""
    from spaghettisearch_tpu.retrieval.engine import _b_bucket

    assert _b_bucket(129) == 256 and _b_bucket(128) == 128

    eng_big = QueryEngine(db, big_batch=True)
    eng_ref = QueryEngine(db, snapshot=eng_big.snapshot, index=eng_big.index)
    texts = []
    words = [w for w in VOCAB if w not in ("the", "of")]
    for i in range(200):
        if i % 7 == 3:
            texts.append(f'"{words[i % len(words)]} {words[(i + 1) % len(words)]}"')
        elif i % 29 == 11:  # long-keyword catch-all row (q > Q_BASE)
            texts.append(" ".join(words[(i + j) % len(words)] for j in range(6)))
        else:
            texts.append(
                " ".join(words[(i * 3 + j) % len(words)] for j in range(1 + i % 3))
            )
    parsed = [parse_query(t) for t in texts]
    s_big, i_big = eng_big.rank(parsed, topk=10)
    assert s_big.shape == (200, 10)
    for lo in range(0, 200, 100):
        s_ref, i_ref = eng_ref.rank(parsed[lo : lo + 100], topk=10)
        np.testing.assert_allclose(
            s_big[lo : lo + 100], s_ref, rtol=1e-5, atol=1e-6)
        finite = np.isfinite(s_ref)
        np.testing.assert_array_equal(
            i_big[lo : lo + 100][finite], i_ref[finite])
