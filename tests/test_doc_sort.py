"""Doc-sorted device layout (DeviceIndex doc_sort): docs sorted by distinct
body-term count so the membership kernel's body sweep can stop at each doc
block's real T bound (experiments/tbound_probe.py: -37% off the dominant 1M
sweep). Everything downstream must be invisible to callers: scorers gather
top-k ids back through doc_perm, so engine results match the natural layout
exactly (modulo f32 tie groups, which these fixtures avoid)."""

import jax.numpy as jnp
import numpy as np
import pytest

from corpus import build_corpus_db
from spaghettisearch_tpu.ops.scoring import exact_top_k
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex
from spaghettisearch_tpu.retrieval.engine import QueryEngine


def test_exact_top_k_doc_map_both_routes():
    """doc_map must remap selected ids to natural space and renormalize the
    order to (score desc, natural id asc), on the small-D lax.top_k route
    and the large-D chunk-max route."""
    rng = np.random.default_rng(7)
    for d in (5000, 300_000):
        perm = rng.permutation(d).astype(np.int32)
        nat = rng.normal(size=(3, d)).astype(np.float32)
        permuted = nat[:, perm]  # permuted[i] = nat[perm[i]]
        want_s, want_i = exact_top_k(jnp.asarray(nat), 20)
        got_s, got_i = exact_top_k(
            jnp.asarray(permuted), 20, doc_map=jnp.asarray(perm)
        )
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_tbound_kernel_matches_static():
    """The dynamic-T body sweep (body_tmax + tc chunks) must reproduce the
    static kernel on a doc-sorted layout — interpret mode on CPU, covering
    qn dispatch, the hot-split qnb tile, and both emit_counts variants."""
    from spaghettisearch_tpu.ops.kernels.membership import (
        pallas_forward_scores_2sec,
    )

    rng = np.random.default_rng(11)
    d, tb, tt, n_vocab = 1024, 32, 8, 500
    doc_block = 128
    tc = 8
    b, q = 8, 4
    # per-doc distinct counts, already sorted desc (the layout contract)
    nt = np.sort(rng.integers(0, tb + 1, d).astype(np.int32))[::-1].copy()
    mask = np.arange(tb)[:, None] < nt[None, :]
    bft = np.where(mask, rng.integers(0, n_vocab, (tb, d)), -1).astype(np.int32)
    bfw = np.where(mask, rng.random((tb, d)).astype(np.float32) + 0.01, 0.0).astype(
        np.float32
    )
    tmask = np.arange(tt)[:, None] < 3
    tft = np.where(tmask, rng.integers(0, n_vocab, (tt, d)), -1).astype(np.int32)
    tfw = np.where(tmask, 0.5, 0.0).astype(np.float32)
    tmax = jnp.asarray(
        nt.reshape(-1, doc_block).max(axis=1).astype(np.int32)
    )

    qn = np.array([4, 3, 2, 2, 1, 1, 0, 0], np.int32)
    term_ids = np.full((b, q), np.iinfo(np.int32).max, np.int32)
    for i, n in enumerate(qn):
        # draw from the index so some terms actually hit
        term_ids[i, :n] = bft[0, rng.integers(0, tb, n)]
    qnb = np.maximum(qn - 1, 0).astype(np.int32)  # exercise the cold bound

    args = (
        jnp.asarray(tft), jnp.asarray(tfw), jnp.asarray(bft), jnp.asarray(bfw),
        jnp.asarray(term_ids), jnp.asarray(qn),
    )
    for emit_counts in (True, False):
        for use_qnb in (False, True):
            kw = dict(
                doc_block=doc_block, emit_counts=emit_counts, interpret=True,
                qnb=jnp.asarray(qnb) if use_qnb else None,
            )
            want = pallas_forward_scores_2sec(*args, **kw)
            got = pallas_forward_scores_2sec(
                *args, body_tmax=tmax, tc=tc, **kw
            )
            for w, g in zip(want, got):
                if w is None:
                    assert g is None
                    continue
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7
                )


@pytest.fixture(scope="module")
def natural_engine():
    return QueryEngine(build_corpus_db(n_pages=40, seed=17), doc_sort=False)


@pytest.fixture(scope="module")
def sorted_engine(natural_engine):
    # same store, forced doc-sorted layout
    return QueryEngine(natural_engine.db, doc_sort=True)


def test_doc_sort_layout_is_active(sorted_engine, natural_engine):
    idx = sorted_engine.index
    assert idx.doc_perm is not None
    assert idx.body.tmax_blocks is not None
    assert natural_engine.index.doc_perm is None
    # the permutation really moved docs and covers every slot exactly once
    perm = np.asarray(idx.doc_perm_np)
    assert sorted(perm.tolist()) == list(range(idx.n_docs_padded))
    assert not np.array_equal(perm, np.arange(idx.n_docs_padded))
    # body T padded to the chunk multiple
    from spaghettisearch_tpu.retrieval.device_index import DOC_SORT_TC

    assert idx.body.fwd.ft.shape[1] % DOC_SORT_TC == 0


@pytest.mark.parametrize(
    "query",
    [
        "algorithm",
        "quantum physics database",
        '"quantum physics"',
        'galaxy "music theater" poetry',
        "matrix matrix",
        "zzzznomatch",
    ],
)
def test_doc_sort_engine_matches_natural(sorted_engine, natural_engine, query):
    """Keyword, phrase, and mixed queries must return identical results
    (urls AND scores) under both layouts — the permutation is an internal
    kernel concern."""
    want = natural_engine.query(query)
    got = sorted_engine.query(query)
    assert [r["Url"] for r in got] == [r["Url"] for r in want]
    for g, w in zip(got, want):
        assert g["FinalRank"] == pytest.approx(w["FinalRank"], rel=1e-5)


def test_doc_sort_batch_matches_natural(sorted_engine, natural_engine):
    queries = [
        "galaxy poetry theater music",
        "algorithm",
        '"quantum physics" theory',
        "matrix",
    ]
    want = natural_engine.query_batch(queries)
    got = sorted_engine.query_batch(queries)
    for g_rows, w_rows in zip(got, want):
        assert [r["Url"] for r in g_rows] == [r["Url"] for r in w_rows]
        for g, w in zip(g_rows, w_rows):
            assert g["FinalRank"] == pytest.approx(w["FinalRank"], rel=1e-5)


def test_doc_sort_survives_refresh(sorted_engine, natural_engine):
    """refresh() must rebuild the permuted index (doc_sort persists) and
    still match the natural engine."""
    sorted_engine.refresh()
    assert sorted_engine.index.doc_perm is not None
    want = natural_engine.query("quantum physics")
    got = sorted_engine.query("quantum physics")
    assert [r["Url"] for r in got] == [r["Url"] for r in want]


def test_doc_sort_bm25_matches_natural(natural_engine):
    """The BM25 model builds its own forward arrays — they must follow the
    index permutation."""
    from spaghettisearch_tpu.models.bm25 import BM25Ranker

    nat = QueryEngine(
        natural_engine.db, model=BM25Ranker(), doc_sort=False
    )
    srt = QueryEngine(natural_engine.db, model=BM25Ranker(), doc_sort=True)
    for query in ("algorithm", '"quantum physics"', "galaxy music"):
        want = nat.query(query)
        got = srt.query(query)
        assert [r["Url"] for r in got] == [r["Url"] for r in want]
        for g, w in zip(got, want):
            assert g["FinalRank"] == pytest.approx(w["FinalRank"], rel=1e-5)


def test_doc_sort_auto_threshold():
    """Auto policy: off below DOC_SORT_MIN_DOCS, forced-on works on tiny
    corpora (tests), and truncated indexes never permute."""
    db = build_corpus_db(n_pages=10, seed=3)
    eng = QueryEngine(db)  # auto -> off at 10 docs
    assert eng.index.doc_perm is None
    forced = DeviceIndex.from_snapshot(eng.snapshot, doc_sort=True)
    assert forced.doc_perm is not None
    assert forced.match_pad == forced.n_docs_padded


@pytest.mark.parametrize("emit_counts", [True, False])
def test_mixed_tbound_kernel_matches_static(emit_counts):
    """The MIXED kernel's dynamic-T body keyword sweep (body_tmax + tc,
    doc-sorted layout) must reproduce the static mixed kernel — interpret
    mode on CPU, covering phrase rows, the qn dispatch, and the hot-split
    qnb tile."""
    from spaghettisearch_tpu.ops.kernels.mixed import (
        pallas_mixed_scores_2sec,
    )

    db = build_corpus_db(n_pages=30, seed=23)
    eng = QueryEngine(db, doc_sort=True)
    idx = eng.index
    assert idx.pos_dense and idx.body.tmax_blocks is not None
    n_words = eng.snapshot.n_words

    rng = np.random.default_rng(5)
    b, q, p = 16, 4, 4
    term_ids = rng.integers(0, n_words + 1, (b, q)).astype(np.int32)
    qn = rng.integers(0, q + 1, b).astype(np.int32)
    ph_ids = rng.integers(0, n_words, (b, p)).astype(np.int32)
    pn = rng.integers(0, p + 1, b).astype(np.int32)
    ph_valid = (np.arange(p)[None, :] < pn[:, None]).astype(np.float32)
    ph_ids[ph_valid == 0] = n_words
    order = np.lexsort((-qn, -pn))  # engine contract: phrase rows first
    term_ids, qn, ph_ids, ph_valid, pn = (
        term_ids[order], qn[order], ph_ids[order], ph_valid[order], pn[order]
    )
    qnb = np.maximum(qn - 1, 0).astype(np.int32)

    d = idx.title.fwd.ftT.shape[1]
    doc_block = 256
    assert d % doc_block == 0
    # mixed_scores_padded's repeat: canonical [D//512] -> kernel granularity
    tmax = jnp.repeat(
        idx.body.tmax_blocks, (d // doc_block) // idx.body.tmax_blocks.shape[0]
    )
    args = (
        idx.title.fwd.ftT, idx.title.fwd.fwT,
        idx.body.fwd.ftT, idx.body.fwd.fwT,
        idx.title.posT, idx.body.posT,
        jnp.asarray(term_ids), jnp.asarray(qn),
        jnp.asarray(ph_ids), jnp.asarray(ph_valid), jnp.asarray(pn),
    )
    for use_qnb in (False, True):
        kw = dict(
            doc_block=doc_block, emit_counts=emit_counts, interpret=True,
            qnb=jnp.asarray(qnb) if use_qnb else None,
        )
        want = pallas_mixed_scores_2sec(*args, **kw)
        # tmax_stage: "kw" bounds the keyword body sweep, "phrase" the
        # phrase stage's body sweeps (the per-phrase-row cost), "both"
        # bounds both; tc=16 matches the static _T_CHUNK grouping
        for stage, tc in (("kw", 32), ("phrase", 16), ("phrase", 32),
                          ("both", 32)):
            got = pallas_mixed_scores_2sec(
                *args, body_tmax=tmax, tmax_stage=stage, tc=tc, **kw
            )
            for w, g in zip(want, got):
                if w is None:
                    assert g is None
                    continue
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7,
                    err_msg=f"stage={stage} tc={tc} qnb={use_qnb}",
                )
