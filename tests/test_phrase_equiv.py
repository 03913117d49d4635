"""The two device phrase formulations must agree doc-for-doc.

match_phrase (CSR searchsorted, used by the sharded path) and
match_phrase_fwd (forward-index compare, the single-chip production path)
implement the same semantics as the reference's positional intersection
(reference: retrieval/phrase.go:11-109); this cross-checks them against
each other on randomized indexes where phrases are planted deliberately.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, ".")
from bench import synth_snapshot
from spaghettisearch_tpu.ops.phrase import match_phrase, match_phrase_fwd
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex


def _collect(d, tw, bw, fl, n_docs):
    d, tw, bw, fl = map(np.asarray, (d, tw, bw, fl))
    keep = d < n_docs
    return {
        int(doc): (float(t), float(b), float(f))
        for doc, t, b, f in zip(d[keep], tw[keep], bw[keep], fl[keep])
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fwd_matches_csr_phrase(seed):
    snap = synth_snapshot(
        n_docs=512, n_words=300, body_terms_per_doc=24, title_terms_per_doc=4,
        max_df=128, seed=seed,
    )
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(seed + 100)

    for trial in range(8):
        p = rng.integers(2, 5)
        ids = np.full(4, snap.n_words, np.int32)
        ids[:p] = rng.integers(0, snap.n_words, p)
        valid = np.zeros(4, bool)
        valid[:p] = True
        t_df = snap.title.df(ids[:p])
        b_df = snap.body.df(ids[:p])
        gen = int(np.argmin(t_df + b_df))

        common = dict(pos_cap=idx.pos_cap, n_docs=idx.n_docs)
        a = match_phrase(
            idx.title.offsets, idx.title.doc_ids, idx.title.weights,
            idx.title.pos_offsets, idx.title.positions,
            idx.body.offsets, idx.body.doc_ids, idx.body.weights,
            idx.body.pos_offsets, idx.body.positions,
            jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(gen, jnp.int32),
            posting_cap=idx.posting_cap, **common,
        )
        b = match_phrase_fwd(
            idx.title.fwd.ft, idx.title.fwd.fj, idx.title.weights,
            idx.title.pos_offsets, idx.title.positions,
            idx.body.fwd.ft, idx.body.fwd.fj, idx.body.weights,
            idx.body.pos_offsets, idx.body.positions,
            idx.title.offsets, idx.title.doc_ids,
            idx.body.offsets, idx.body.doc_ids,
            jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(gen, jnp.int32),
            posting_cap=idx.posting_cap, **common,
        )
        got_a = _collect(*a, idx.n_docs)
        got_b = _collect(*b, idx.n_docs)
        assert set(got_a) == set(got_b), (trial, ids[:p])
        for doc in got_a:
            np.testing.assert_allclose(got_a[doc], got_b[doc], rtol=1e-6)


def test_fwd_with_tight_generator_cap():
    """The production engine buckets posting_cap to the generator's df; the
    matcher must produce identical results with the tight cap."""
    snap = synth_snapshot(
        n_docs=512, n_words=300, body_terms_per_doc=24, title_terms_per_doc=4,
        max_df=128, seed=5,
    )
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(7)
    ids = np.full(4, snap.n_words, np.int32)
    ids[:2] = rng.integers(0, snap.n_words, 2)
    valid = np.array([True, True, False, False])
    t_df = snap.title.df(ids[:2])
    b_df = snap.body.df(ids[:2])
    gen = int(np.argmin(t_df + b_df))
    need = int(max(t_df[gen], b_df[gen], 1))
    cap = 128
    while cap < need:
        cap *= 2
    cap = min(cap, idx.posting_cap)

    args = (
        idx.title.fwd.ft, idx.title.fwd.fj, idx.title.weights,
        idx.title.pos_offsets, idx.title.positions,
        idx.body.fwd.ft, idx.body.fwd.fj, idx.body.weights,
        idx.body.pos_offsets, idx.body.positions,
        idx.title.offsets, idx.title.doc_ids,
        idx.body.offsets, idx.body.doc_ids,
        jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(gen, jnp.int32),
    )
    common = dict(pos_cap=idx.pos_cap, n_docs=idx.n_docs)
    full = _collect(*match_phrase_fwd(*args, posting_cap=idx.posting_cap, **common), idx.n_docs)
    tight = _collect(*match_phrase_fwd(*args, posting_cap=cap, **common), idx.n_docs)
    assert full == tight


def test_fwd_matches_csr_long_position_lists():
    """Repetitive documents push pos_cap past the pairwise-intersect branch:
    the searchsorted path must agree with the CSR matcher."""
    import random
    from datetime import datetime, timezone

    from spaghettisearch_tpu.index.indexer import index_page
    from spaghettisearch_tpu.index.snapshot import build_snapshot
    from spaghettisearch_tpu.ops.weighting import update_term_weights
    from spaghettisearch_tpu.store.tables import Database
    from spaghettisearch_tpu.utils.hashing import md5_hex

    rng = random.Random(4)
    db = Database(None)
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    words = ["alpha", "bravo", "charlie", "delta"]
    for i in range(10):
        # bodies dominated by repeated bigrams: positions lists length ~30
        body = []
        for _ in range(30):
            body += [words[i % 4], words[(i + 1) % 4]]
        body += [rng.choice(words) for _ in range(rng.randint(0, 10))]
        html = f"<html><head><title>page {i}</title></head><body><p>{' '.join(body)}</p></body></html>"
        index_page(db, html.encode(), f"http://rep.local/{i}", last_modified=ts)
    update_term_weights(db, "title", total_docs=10)
    update_term_weights(db, "body", total_docs=10)
    snap = build_snapshot(db)
    idx = DeviceIndex.from_snapshot(snap)
    assert idx.pos_cap > 16, idx.pos_cap  # exercises the searchsorted branch

    from spaghettisearch_tpu.ops.phrase import match_phrase

    ids = snap.term_ids([md5_hex("alpha"), md5_hex("bravo")])
    term_ids = np.full(4, snap.n_words, np.int32)
    term_ids[:2] = ids
    valid = np.array([True, True, False, False])
    t_df = snap.title.df(term_ids[:2]); b_df = snap.body.df(term_ids[:2])
    gen = int(np.argmin(t_df + b_df))
    common = dict(posting_cap=idx.posting_cap, pos_cap=idx.pos_cap, n_docs=idx.n_docs)
    a = match_phrase(
        idx.title.offsets, idx.title.doc_ids, idx.title.weights,
        idx.title.pos_offsets, idx.title.positions,
        idx.body.offsets, idx.body.doc_ids, idx.body.weights,
        idx.body.pos_offsets, idx.body.positions,
        jnp.asarray(term_ids), jnp.asarray(valid), jnp.asarray(gen, jnp.int32),
        **common,
    )
    b = match_phrase_fwd(
        idx.title.fwd.ft, idx.title.fwd.fj, idx.title.weights,
        idx.title.pos_offsets, idx.title.positions,
        idx.body.fwd.ft, idx.body.fwd.fj, idx.body.weights,
        idx.body.pos_offsets, idx.body.positions,
        idx.title.offsets, idx.title.doc_ids,
        idx.body.offsets, idx.body.doc_ids,
        jnp.asarray(term_ids), jnp.asarray(valid), jnp.asarray(gen, jnp.int32),
        **common,
    )
    got_a = _collect(*a, idx.n_docs)
    got_b = _collect(*b, idx.n_docs)
    assert got_a and set(got_a) == set(got_b)
    for doc in got_a:
        np.testing.assert_allclose(got_a[doc], got_b[doc], rtol=1e-6)
