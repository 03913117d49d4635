"""PageRank device op vs a direct restatement of the Go reference loop,
and term-weighting/magnitude checks."""

import math
import random

import jax.numpy as jnp
import numpy as np

from spaghettisearch_tpu.ops.pagerank import _load_graph, pagerank_power, update_pagerank
from spaghettisearch_tpu.ops.weighting import update_term_weights
from spaghettisearch_tpu.store.tables import Database


def go_pagerank(web_nodes, all_nodes, d, eps, n, max_iters=200):
    """Literal restatement of ranking/pagerank.go:85-145."""
    current = {k: 1.0 / n for k in all_nodes}
    last = {k: 1.0 / n for k in all_nodes}
    it, change = 1, math.inf
    while change > eps and it <= max_iters:
        current, last = last, current
        if it > 1:
            for k in all_nodes:
                current[k] = 0.0
        total = 0.0
        for p in all_nodes:
            kids = web_nodes.get(p, [])
            if not kids:
                continue
            wpd = d * last[p] / len(kids)
            total += wpd
            for c in kids:
                current[c] += wpd
        total += (1.0 - d) * len(all_nodes)
        change = 0.0
        for k in all_nodes:
            current[k] = (current[k] + (1.0 - d)) / total
            change += abs(current[k] - last[k])
        it += 1
    return current


def _random_graph(rng, n):
    web = {}
    for i in range(n):
        k = rng.randint(0, min(4, n - 1))
        web[f"n{i}"] = [f"n{j}" for j in rng.sample(range(n), k)]
    # one dangling stub node referenced but never crawled
    web["n0"] = web.get("n0", []) + ["stub"]
    return web


def test_pagerank_matches_reference_loop():
    rng = random.Random(7)
    web = _random_graph(rng, 30)
    all_nodes = sorted(set(web) | {c for kids in web.values() for c in kids})
    n_pages = 30

    expected = go_pagerank(web, all_nodes, 0.75, 1e-12, n_pages)

    node_id = {h: i for i, h in enumerate(all_nodes)}
    srcs, dsts = [], []
    outdeg = np.zeros(len(all_nodes))
    for p, kids in web.items():
        outdeg[node_id[p]] = len(kids)
        for c in kids:
            srcs.append(node_id[p])
            dsts.append(node_id[c])
    order = np.argsort(dsts, kind="stable")
    ranks = pagerank_power(
        jnp.asarray(np.array(srcs, np.int32)[order]),
        jnp.asarray(np.array(dsts, np.int32)[order]),
        jnp.asarray(outdeg, jnp.float32),
        jnp.asarray(np.array([n_pages]), jnp.float32),
        len(all_nodes),
        eps=1e-12,
    )
    got = np.asarray(ranks)[0]
    want = np.array([expected[k] for k in all_nodes])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_pagerank_categories_converge_identically():
    """Different numPages inits converge to the same fixed point
    (SURVEY §3.3 note)."""
    rng = random.Random(3)
    web = _random_graph(rng, 15)
    all_nodes = sorted(set(web) | {c for kids in web.values() for c in kids})
    node_id = {h: i for i, h in enumerate(all_nodes)}
    srcs, dsts = [], []
    outdeg = np.zeros(len(all_nodes))
    for p, kids in web.items():
        outdeg[node_id[p]] = len(kids)
        for c in kids:
            srcs.append(node_id[p])
            dsts.append(node_id[c])
    order = np.argsort(dsts, kind="stable")
    ranks = pagerank_power(
        jnp.asarray(np.array(srcs, np.int32)[order]),
        jnp.asarray(np.array(dsts, np.int32)[order]),
        jnp.asarray(outdeg, jnp.float32),
        jnp.asarray(np.array([10.0, 1000.0]), jnp.float32),
        len(all_nodes),
        eps=1e-10,
        max_iters=500,
    )
    r = np.asarray(ranks)
    np.testing.assert_allclose(r[0], r[1], atol=1e-5)


def test_update_pagerank_store_roundtrip():
    db = Database()
    db.doc_children.set("a", ["b", "c"])
    db.doc_children.set("b", ["c"])
    db.doc_children.set("c", [])
    db.topic_meta.set("Sci", {"numPages": 3.0, "wordCount": 10.0})
    update_pagerank(db)
    ranks = {k: v for k, v in db.doc_rank.items()}
    assert set(ranks) == {"a", "b", "c"}
    assert all("Sci" in v for v in ranks.values())
    # c receives from both a and b -> highest rank
    assert ranks["c"]["Sci"] > ranks["a"]["Sci"]
    node_list, es, ed, od = _load_graph(db)
    assert node_list == ["a", "b", "c"]
    assert len(es) == 3


def test_term_weighting_and_magnitude():
    db = Database()
    # rank census of 4 docs
    for d in ("d1", "d2", "d3", "d4"):
        db.doc_rank.set(d, {})
    # word w1 in 2 docs -> idf = log2(4/2) = 1; w2 in 1 doc -> idf = 2
    db.inv_body.set("w1", {"d1": [0.5, 0.0], "d2": [1.0, 1.0]})
    db.inv_body.set("w2", {"d1": [1.0, 2.0]})
    update_term_weights(db, "body")

    assert db.inv_body.get("w1")["d1"][0] == 0.5
    assert db.inv_body.get("w1")["d2"][0] == 1.0
    assert db.inv_body.get("w2")["d1"][0] == 2.0
    # positions untouched
    assert db.inv_body.get("w2")["d1"][1:] == [2.0]
    m1 = db.doc_magnitude.get("d1")["body"]
    assert math.isclose(m1, math.sqrt(0.5**2 + 2.0**2), rel_tol=1e-6)
    assert math.isclose(db.doc_magnitude.get("d2")["body"], 1.0, rel_tol=1e-6)


def test_term_weighting_idempotent_across_recrawls():
    """Weighting derives from the raw-normTF shadow rows, so re-running it
    (as every re-crawl does, start_crawl.go:176-177) must not change the
    stored weights — the reference's in-place multiply corrupts them."""
    from corpus import build_corpus_db
    from spaghettisearch_tpu.ops.weighting import update_term_weights

    db = build_corpus_db(n_pages=12, seed=13)
    before = {k: {d: v[0] for d, v in row.items()} for k, row in db.inv_body.items()}
    # simulate two more crawl cycles' post-crawl jobs
    update_term_weights(db, "title")
    update_term_weights(db, "body")
    update_term_weights(db, "title")
    update_term_weights(db, "body")
    after = {k: {d: v[0] for d, v in row.items()} for k, row in db.inv_body.items()}
    assert before == after
    mags_a = dict(db.doc_magnitude.items())
    update_term_weights(db, "body")
    assert dict(db.doc_magnitude.items()) == mags_a
