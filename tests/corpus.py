"""Deterministic HTML fixture corpus for offline tests (no network)."""

from __future__ import annotations

import random
from datetime import datetime, timezone

from spaghettisearch_tpu.index.indexer import index_page
from spaghettisearch_tpu.ops.pagerank import update_pagerank
from spaghettisearch_tpu.ops.weighting import update_term_weights
from spaghettisearch_tpu.store.tables import Database

VOCAB = (
    "algorithm database retrieval ranking crawler spider index engine "
    "vector cosine matrix tensor gradient neural network graph node edge "
    "compiler kernel memory bandwidth latency throughput query document "
    "cluster shard replica partition stream batch pipeline schedule "
    "quantum physics chemistry biology astronomy galaxy planet orbit "
    "history culture music painting sculpture poetry novel theater"
).split()


def make_page(rng: random.Random, i: int, n_pages: int, base: str) -> tuple[str, bytes]:
    url = f"{base}/page{i}"
    title_words = rng.sample(VOCAB, rng.randint(1, 4))
    body_words = [rng.choice(VOCAB) for _ in range(rng.randint(20, 80))]
    n_links = rng.randint(0, min(5, n_pages - 1))
    links = rng.sample([j for j in range(n_pages) if j != i], n_links)
    anchors = "".join(
        f'<a href="/page{j}">{" ".join(rng.sample(VOCAB, rng.randint(1, 3)))}</a>\n'
        for j in links
    )
    meta = ""
    if rng.random() < 0.3:
        meta = f'<meta name="description" content="{" ".join(rng.sample(VOCAB, 3))}">'
    html = f"""<html><head><title>{' '.join(title_words)}</title>{meta}</head>
<body><h1>Page {i}</h1>
<p>{' '.join(body_words)}</p>
{anchors}
</body></html>"""
    return url, html.encode()


def build_corpus_db(n_pages: int = 20, seed: int = 0, root: str | None = None) -> Database:
    """Index a random small site, then run PageRank + term weighting
    (the reference's post-crawl batch jobs, cmd/crawl/start_crawl.go:174-177)."""
    rng = random.Random(seed)
    db = Database(root)
    base = "http://test.local"
    # a couple of topic categories so the rank table has category keys
    db.topic_meta.set("Science", {"numPages": float(n_pages), "wordCount": 100.0})
    db.topic_meta.set("Arts", {"numPages": float(2 * n_pages), "wordCount": 80.0})

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    with db.bulk():
        for i in range(n_pages):
            url, html = make_page(rng, i, n_pages, base)
            index_page(db, html, url, last_modified=ts)

    update_pagerank(db)
    update_term_weights(db, "title")
    update_term_weights(db, "body")
    return db
