"""Headline benchmark: batched top-10 retrieval QPS on a 100k-doc index.

North star (BASELINE.json): >=10k QPS batched top-10 at recall@10 parity on a
100k-doc corpus on one TPU chip. The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against the 10k-QPS target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")


# ---------------------------------------------------------------------- #
# crawl-built benchmark corpus: ONE persisted index for QPS, parity and
# serving benchmarks (BASELINE.md north star: QPS *at recall parity* must be
# measured on the same index). Pages flow through the REAL indexer
# (index_page -> update_pagerank -> update_term_weights -> snapshot persist),
# exactly like a crawl (reference: cmd/crawl/start_crawl.go:163-177).
# ---------------------------------------------------------------------- #


def _bench_vocab(n_vocab: int) -> list[str]:
    return [f"w{i:05d}" for i in range(n_vocab)]


def _zipf_probs(n_vocab: int, head_drop: int = 40, s: float = 1.05) -> np.ndarray:
    """Zipf term distribution with the head removed: laundry strips real
    stopwords from crawled text, which is what bounds the hottest term's df
    in the reference's tables; dropping the synthetic head mirrors that."""
    p = 1.0 / np.arange(1, n_vocab + 1) ** s
    p[:head_drop] = 0.0
    return p / p.sum()


def _corpus_complete(root: str, want: dict) -> bool:
    """A corpus root counts as built only when the marker's params match
    AND the snapshot/store directories it vouches for exist — a marker
    alone can survive a concurrent builder's rmtree (seen once: two
    racing builds left BUILT.json with no snapshot/, and the stale
    marker then short-circuited every rebuild attempt)."""
    marker = os.path.join(root, "BUILT.json")
    if not os.path.exists(marker):
        return False
    try:
        with open(marker, encoding="utf-8") as f:
            built = json.load(f)
    except (OSError, ValueError):
        return False
    if {k: built.get(k) for k in want} != want:
        return False
    return os.path.isdir(os.path.join(root, "snapshot")) and os.path.isdir(
        os.path.join(root, "store")
    )


def build_bench_corpus(
    root: str,
    n_pages: int = 100_000,
    n_vocab: int = 30_000,
    seed: int = 0,
    quiet: bool = False,
) -> str:
    """Build (or reuse) the deterministic benchmark corpus under `root`:
    <root>/store (the 11-table database + docs/ HTML cache) and
    <root>/snapshot (persisted columnar arrays). Returns root."""
    marker = os.path.join(root, "BUILT.json")
    params = {"n_pages": n_pages, "n_vocab": n_vocab, "seed": seed, "v": 3}
    if _corpus_complete(root, params):
        return root

    from datetime import datetime, timezone

    from spaghettisearch_tpu.index.persist import save_snapshot
    from spaghettisearch_tpu.index.snapshot import build_snapshot
    from spaghettisearch_tpu.index.indexer import index_page
    from spaghettisearch_tpu.ops.pagerank import update_pagerank
    from spaghettisearch_tpu.ops.weighting import update_term_weights
    from spaghettisearch_tpu.store.tables import Database

    def say(msg: str) -> None:
        if not quiet:
            print(f"# corpus: {msg}", file=sys.stderr, flush=True)

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = _bench_vocab(n_vocab)
    probs = _zipf_probs(n_vocab)

    t0 = time.perf_counter()
    db = Database(os.path.join(root, "store"))
    db.topic_meta.set("General", {"numPages": float(n_pages), "wordCount": 1.0})
    db.topic_meta.set("Science", {"numPages": float(n_pages // 2), "wordCount": 1.0})
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)

    # pre-sample everything with numpy (the per-page python work is the
    # tokenizer + indexer, which is what we want to exercise)
    body_lens = rng.integers(40, 120, n_pages)
    title_lens = rng.integers(2, 6, n_pages)
    body_words = rng.choice(n_vocab, size=int(body_lens.sum()), p=probs)
    title_words = rng.choice(n_vocab, size=int(title_lens.sum()), p=probs)
    n_links = rng.integers(0, 8, n_pages)
    link_targets = rng.integers(0, n_pages, int(n_links.sum()))

    base = "http://bench.local"
    bo = to = lo = 0
    with db.bulk():
        for i in range(n_pages):
            bw = body_words[bo : bo + int(body_lens[i])]
            tw = title_words[to : to + int(title_lens[i])]
            links = link_targets[lo : lo + int(n_links[i])]
            bo += int(body_lens[i]); to += int(title_lens[i]); lo += int(n_links[i])
            anchors = "".join(
                f'<a href="/p{j}">{vocab[bw[k % len(bw)]]}</a>\n'
                for k, j in enumerate(links)
            )
            html = (
                f"<html><head><title>{' '.join(vocab[w] for w in tw)}</title>"
                f"</head><body><p>{' '.join(vocab[w] for w in bw)}</p>\n"
                f"{anchors}</body></html>"
            ).encode()
            index_page(db, html, f"{base}/p{i}", last_modified=ts)
            if not quiet and (i + 1) % 20_000 == 0:
                say(f"indexed {i + 1}/{n_pages} pages")
    say(f"indexing done in {time.perf_counter() - t0:.1f}s")

    t1 = time.perf_counter()
    update_pagerank(db)
    say(f"pagerank done in {time.perf_counter() - t1:.1f}s")
    t2 = time.perf_counter()
    update_term_weights(db, "title")
    update_term_weights(db, "body")
    say(f"term weighting done in {time.perf_counter() - t2:.1f}s")
    t3 = time.perf_counter()
    snap = build_snapshot(db)
    say(f"snapshot built in {time.perf_counter() - t3:.1f}s "
        f"({snap.n_docs} docs, {snap.n_words} words, "
        f"{snap.body.n_postings + snap.title.n_postings} postings)")
    save_snapshot(snap, os.path.join(root, "snapshot"))
    db.flush()
    db.close()
    # atomic marker write: a concurrent builder's rmtree between
    # save_snapshot and this write once left a marker with no snapshot
    # behind (round-3 session 10) — write-to-temp + rename means any
    # visible BUILT.json was written in full, and _corpus_complete
    # additionally demands the snapshot/store dirs it vouches for
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({**params, "docs": snap.n_docs, "words": snap.n_words,
                   "seconds": round(time.perf_counter() - t0, 1)}, f)
    os.replace(tmp, marker)
    say(f"total {time.perf_counter() - t0:.1f}s -> {root}")
    return root


def bench_queries(snap, n_queries: int, seed: int = 1, phrase_every: int = 4,
                  db=None) -> list[str]:
    """Deterministic query workload over a built corpus: 1-4 keywords
    sampled proportional to df, every `phrase_every`-th query carrying a
    2-gram mined from a real page body (so phrases actually match)."""
    rng = np.random.default_rng(seed)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    words = snap.word_hashes  # hashes; we need the words themselves
    word_of = None
    if db is not None:
        word_of = {wh: db.word.get(wh) for wh in words}
    out = []
    n_words = len(words)
    for i in range(n_queries):
        k = int(rng.integers(1, 5))
        ids = rng.choice(n_words, size=k, p=p)
        terms = []
        for wid in ids:
            w = word_of[words[int(wid)]] if word_of else words[int(wid)]
            if w:
                terms.append(w)
        q = " ".join(terms) if terms else "w00100"
        if phrase_every and i % phrase_every == 0 and db is not None:
            # mine an adjacent 2-gram from a random cached page body
            for _ in range(3):
                doc = snap.doc_hashes[int(rng.integers(0, snap.n_docs))]
                raw = db.cached_doc(doc)
                if not raw:
                    continue
                body = raw.decode().split("<p>", 1)[-1].split("</p>", 1)[0].split()
                if len(body) >= 2:
                    j = int(rng.integers(0, len(body) - 1))
                    q = f'"{body[j]} {body[j + 1]}" ' + q
                    break
        out.append(q)
    return out


def synth_snapshot(
    n_docs: int = 100_000,
    n_words: int = 50_000,
    body_terms_per_doc: int = 64,
    title_terms_per_doc: int = 6,
    max_df: int = 16_384,
    seed: int = 0,
):
    """Synthesize a Zipf-distributed CSR index directly (no host store):
    equivalent in shape/statistics to a crawled 100k-page corpus after
    stopword filtering (which bounds the hottest term's df)."""
    from spaghettisearch_tpu.index.snapshot import IndexSnapshot, SectionCSR, _pad_to

    rng = np.random.default_rng(seed)

    def make_section(terms_per_doc: int) -> SectionCSR:
        # sample word ids with a Zipf-ish distribution
        probs = 1.0 / np.arange(1, n_words + 1) ** 1.05
        probs /= probs.sum()
        total = n_docs * terms_per_doc
        words = rng.choice(n_words, size=total, p=probs).astype(np.int32)
        docs = np.repeat(np.arange(n_docs, dtype=np.int32), terms_per_doc)
        # unique (word, doc), then truncate hot rows to max_df
        key = words.astype(np.int64) * n_docs + docs
        key = np.unique(key)
        words = (key // n_docs).astype(np.int32)
        docs = (key % n_docs).astype(np.int32)
        # truncate per-word postings at max_df (order is word-major, doc asc)
        counts = np.bincount(words, minlength=n_words)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        rank_in_row = np.arange(len(words)) - offsets[words]
        keep = rank_in_row < max_df
        words, docs = words[keep], docs[keep]
        counts = np.bincount(words, minlength=n_words)
        post_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        n_post = len(words)

        tf = rng.integers(1, 8, n_post).astype(np.float32)
        idf = np.log2(n_docs / np.maximum(counts, 1)).astype(np.float32)
        weights = (tf / 8.0) * idf[words]

        p_pad = _pad_to(n_post)
        doc_ids = np.full(p_pad, n_docs, np.int32)
        doc_ids[:n_post] = docs
        w = np.zeros(p_pad, np.float32)
        w[:n_post] = weights
        # single position per posting (keyword bench doesn't exercise phrase)
        pos_offsets = np.arange(p_pad + 1, dtype=np.int32)
        pos_offsets[n_post:] = n_post
        l_pad = _pad_to(n_post)
        positions = np.full(l_pad, np.inf, np.float32)
        positions[:n_post] = rng.integers(0, 500, n_post).astype(np.float32)
        return SectionCSR(
            post_offsets=post_offsets,
            doc_ids=doc_ids,
            weights=w,
            pos_offsets=pos_offsets,
            positions=positions,
            n_postings=n_post,
            max_df=int(counts.max()),
            max_positions=1,
        )

    body = make_section(body_terms_per_doc)
    title = make_section(title_terms_per_doc)

    # magnitudes consistent with the weights
    def mags(csr) -> np.ndarray:
        m = np.zeros(n_docs + 1, np.float64)
        np.add.at(m, csr.doc_ids[: csr.n_postings], csr.weights[: csr.n_postings] ** 2)
        return np.sqrt(m[:n_docs]).astype(np.float32)

    doc_hashes = [f"d{i:07d}" for i in range(n_docs)]
    word_hashes = [f"w{i:07d}" for i in range(n_words)]
    return IndexSnapshot(
        doc_hashes=doc_hashes,
        word_hashes=word_hashes,
        doc_id={},
        word_id={},
        title=title,
        body=body,
        mag_title=mags(title),
        mag_body=mags(body),
        categories=["general"],
        pagerank=np.abs(rng.normal(size=(n_docs, 1))).astype(np.float32) / n_docs,
    )


def ensure_bench_corpus(n_pages: int = 100_000, n_vocab: int = 30_000) -> str:
    """Build the shared benchmark corpus in a CPU-forced subprocess (batch
    jobs like PageRank would otherwise pay remote-TPU compile latency for a
    one-time host-side build), or reuse the cached one."""
    root = os.path.join(BENCH_DIR, f"corpus{n_pages // 1000}k")
    if _corpus_complete(root, {"n_pages": n_pages, "n_vocab": n_vocab}):
        return root
    import subprocess

    print(f"# building benchmark corpus ({n_pages} pages) ...", file=sys.stderr, flush=True)
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--build-corpus",
         str(n_pages), str(n_vocab), root],
        check=True,
    )
    return root


def load_bench_corpus(root: str):
    """-> (Database, IndexSnapshot) for a built corpus."""
    from spaghettisearch_tpu.index.persist import load_snapshot
    from spaghettisearch_tpu.store.tables import Database

    return Database(os.path.join(root, "store")), load_snapshot(
        os.path.join(root, "snapshot")
    )


def bench_pagerank(n_nodes: int = 10_000, seed: int = 0) -> dict:
    """BASELINE config 3: topic-sensitive PageRank convergence on a 10k-node
    link graph (north star: < 1 s)."""
    import time

    import jax
    import jax.numpy as jnp

    from spaghettisearch_tpu.ops.pagerank import pagerank_power

    rng = np.random.default_rng(seed)
    out_deg = np.clip(rng.zipf(1.6, n_nodes), 0, 50)
    srcs = np.repeat(np.arange(n_nodes, dtype=np.int32), out_deg)
    dsts = rng.integers(0, n_nodes, len(srcs)).astype(np.int32)
    order = np.argsort(dsts, kind="stable")
    srcs, dsts = srcs[order], dsts[order]
    n_pages = np.full(16, float(n_nodes), np.float32)  # 16 topic categories

    args = (
        jnp.asarray(srcs), jnp.asarray(dsts),
        jnp.asarray(out_deg.astype(np.float32)), jnp.asarray(n_pages),
    )
    # eps 1e-6 ~= the f32 delta floor; the reference's 1e-20 is below f64
    # noise too and simply iterates to a fixed point (pagerank.go:93)
    r = pagerank_power(*args, n_nodes, eps=1e-6, max_iters=100)
    np.asarray(r)  # compile + sync
    t0 = time.perf_counter()
    r = pagerank_power(*args, n_nodes, eps=1e-6, max_iters=100)
    np.asarray(r)
    dt = time.perf_counter() - t0
    return {
        "metric": "pagerank_16topics_10k_nodes_wall_s",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / max(dt, 1e-9), 3),  # target: < 1 s
    }


def bench_phrase(n_docs: int = 100_000, reps: int = 30) -> dict:
    """BASELINE config 2: phrase-query latency (positional intersection),
    on the production forward-index matcher. Worst case: all phrase terms
    common, so the generator term's candidate window is at its widest."""
    import time

    import jax.numpy as jnp

    from spaghettisearch_tpu.ops.phrase import match_phrase_fwd
    from spaghettisearch_tpu.retrieval.device_index import DeviceIndex

    snap = synth_snapshot(n_docs=n_docs, n_words=50_000)
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(2)
    ids = np.full(4, snap.n_words, np.int32)
    ids[:3] = rng.integers(0, 1000, 3)  # common terms: worst-case candidates
    valid = np.array([True, True, True, False])
    t_df = snap.title.df(ids[:3])
    b_df = snap.body.df(ids[:3])
    gen = int(np.argmin(t_df + b_df))
    cap = 128
    while cap < max(t_df[gen], b_df[gen], 1):
        cap *= 2
    cap = min(cap, idx.posting_cap)

    def run():
        return match_phrase_fwd(
            idx.title.fwd.ft, idx.title.fwd.fj, idx.title.weights,
            idx.title.pos_offsets, idx.title.positions,
            idx.body.fwd.ft, idx.body.fwd.fj, idx.body.weights,
            idx.body.pos_offsets, idx.body.positions,
            idx.title.offsets, idx.title.doc_ids,
            idx.body.offsets, idx.body.doc_ids,
            jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(gen, jnp.int32),
            posting_cap=cap, pos_cap=idx.pos_cap, n_docs=idx.n_docs,
        )

    np.asarray(run()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    return {
        "metric": "phrase_match_p50_ms_100k_docs",
        "value": round(dt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(0.010 / max(dt, 1e-9), 3),  # target: 10 ms
    }


def bench_scale(n_docs: int = 1_000_000) -> dict:
    """BASELINE config 5 (single-chip form): batched top-10 over a 1M-doc
    corpus. The multi-chip variant shards the same arrays over a mesh
    (parallel/sharded.py); with one physical chip we measure the per-chip
    shard at full 1M-doc residency."""
    import time

    import jax
    import jax.numpy as jnp

    from spaghettisearch_tpu.ops.scoring import pallas_available, score_queries_forward
    from spaghettisearch_tpu.retrieval.device_index import DeviceIndex

    n_words = 200_000
    batch = 256
    snap = synth_snapshot(
        n_docs=n_docs, n_words=n_words, body_terms_per_doc=48,
        title_terms_per_doc=4, max_df=32_768,
    )
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    # same 1-4 keyword mix as the headline bench, sorted by term count
    batches = []
    for _ in range(5):
        ks = rng.integers(1, 5, batch)
        ks[::-1].sort()
        tids = np.full((batch, 4), n_words, np.int32)
        for i, k in enumerate(ks):
            tids[i, :k] = rng.choice(n_words, size=int(k), p=p)
        batches.append(
            (jnp.asarray(tids), jnp.asarray(ks.astype(np.int32)),
             jnp.asarray(ks.astype(np.float32)))
        )
    tp = jnp.zeros((batch, 1), jnp.float32)
    use_pallas = pallas_available()
    emit_counts = idx.has_zero_weight

    def run(t):
        tids, qn, qlen = t
        return score_queries_forward(
            idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body, idx.pagerank,
            tids, qlen, tp, qn, topk=10, use_pallas=use_pallas,
            emit_counts=emit_counts,
            # doc-sorted layout args, exactly as the engine passes them
            # (models/blended.py): dynamic-T sweep + natural-id mapping
            body_tmax=idx.body.tmax_blocks, doc_map=idx.doc_perm,
        )

    np.asarray(run(batches[0])[0])
    t0 = time.perf_counter()
    outs = [run(t) for t in batches]
    jax.block_until_ready(outs)
    np.asarray(outs[-1][0])
    dt = time.perf_counter() - t0
    qps = len(batches) * batch / dt
    return {
        "metric": "batched_top10_qps_1m_docs",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 1000.0, 3),  # pro-rata: 10k qps per 100k docs
    }


def bench_index(n_pages: int = 1000) -> dict:
    """Host-side indexing throughput (bulk write-back mode, in-memory store;
    the crawl path adds fetch + disk). The reference's per-word
    get-merge-set hot loop (indexer.go:357-402) is the comparison point."""
    import random
    import sys
    import time
    from datetime import datetime, timezone

    sys.path.insert(0, "tests")
    from corpus import make_page

    from spaghettisearch_tpu.index.indexer import index_page
    from spaghettisearch_tpu.store.tables import Database

    rng = random.Random(0)
    pages = [make_page(rng, i, n_pages, "http://bench.local") for i in range(n_pages)]
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    # best of 3: the 1-core host is shared, run-to-run noise is 2x
    dt = float("inf")
    for _ in range(3):
        db = Database(None)
        t0 = time.perf_counter()
        with db.bulk():
            for url, html in pages:
                index_page(db, html, url, last_modified=ts)
        dt = min(dt, time.perf_counter() - t0)
    return {
        "metric": "bulk_index_pages_per_s",
        "value": round(n_pages / dt, 1),
        "unit": "pages/s",
        "vs_baseline": round(n_pages / dt / 500.0, 3),  # target: 500 pages/s
    }


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def bench_serve(
    n_pages: int = 100_000,
    duration_s: float = 20.0,
    n_conns: int = 512,  # must exceed pipeline-depth x max_batch or Little's
    # law caps throughput below the server's capacity (3-stage batcher)
    warm_s: float = 15.0,
    n_queries: int = 4096,
    big_batch: bool = False,  # --bigBatch server (256-row bucket) + the
    # connection count Little's law then needs
    n_fetchers: int | None = None,  # server-side fetch pool override
    ph_patience_ms: float | None = None,  # segregation patience override
    ph_stale: str | None = None,  # stale-phrase-cohort policy override
    route_mix: bool = False,  # fold the reference's minority routes into
    # the load: 1/16 GET /wordlist/{pre} + 1/16 GET /query/{terms}
    # (reference route surface: cmd/server/server.go:112-120) so the
    # reader-lock + sorted-wordlist-cache path is priced under load
) -> dict:
    """End-to-end HTTP serving throughput at the FULL Rank_combined contract
    (reference: cmd/server/server.go:32-52 + retrieval/get_metadata.go): a
    real server subprocess on the crawl-built corpus, driven over POST /query
    by n_conns persistent connections; every response carries top-50 results
    with DocInfo, parents/children, keywords and dynamic summaries."""
    import selectors
    import socket
    import subprocess

    root = ensure_bench_corpus(n_pages)
    db, snap = load_bench_corpus(root)
    queries = bench_queries(snap, n_queries, seed=5, phrase_every=8, db=db)
    db.close()
    if big_batch:
        n_conns = max(n_conns, 1024)
    # first-ever warmup of the 1M shapes can settle for minutes through the
    # relay (FINDINGS: mixed family 100-440 s per program); scale the wait
    up_wait_s = 1200 if n_pages <= 200_000 else 3600
    if big_batch:
        up_wait_s += 1200  # two extra mixed-family settles

    port = _free_port()
    repo = os.path.dirname(os.path.abspath(__file__))
    log_path = os.path.join(BENCH_DIR, "serve_server.log")
    with open(log_path, "wb") as log:
        proc = subprocess.Popen(
            [sys.executable, "-m", "spaghettisearch_tpu.cli.server",
             "--db", os.path.join(root, "store"),
             "--snapshot", os.path.join(root, "snapshot"),
             "--port", str(port)]
            + (["--bigBatch"] if big_batch else [])
            + (["--fetchers", str(n_fetchers)] if n_fetchers else [])
            + (["--phrasePatienceMs", str(ph_patience_ms)]
               if ph_patience_ms is not None else [])
            + (["--phraseStale", ph_stale] if ph_stale else []),
            stdout=log, stderr=subprocess.STDOUT, cwd=repo,
        )
    try:
        deadline = time.monotonic() + up_wait_s  # warmup compiles via relay
        up = False
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(f"server died; see {log_path}")
            with open(log_path, "rb") as f:
                if b"Server is running on port" in f.read():
                    up = True
                    break
            time.sleep(2)
        if not up:
            raise RuntimeError("server did not come up; see " + log_path)

        payloads = []
        kinds = []
        from urllib.parse import quote as _quote

        for i, q in enumerate(queries):
            if route_mix and i % 16 == 14:
                # prefixes mined from the QUERY workload so they hit the
                # real vocabulary (the synthetic corpora's words don't
                # start with arbitrary letters)
                pre = (queries[(i * 7) % len(queries)].split()[0].strip('\"')
                       or "a")[0]
                payloads.append(
                    f"GET /wordlist/{pre} HTTP/1.1\r\nHost: b\r\n\r\n".encode()
                )
                kinds.append("wordlist")
            elif route_mix and i % 16 == 15:
                payloads.append(
                    f"GET /query/{_quote(q, safe='')} HTTP/1.1\r\n"
                    "Host: b\r\n\r\n".encode()
                )
                kinds.append("get_query")
            else:
                body = json.dumps({"query": q}).encode()
                payloads.append(
                    b"POST /query HTTP/1.1\r\nHost: b\r\n"
                    b"Content-Type: application/json\r\nContent-Length: "
                    + str(len(body)).encode() + b"\r\n\r\n" + body
                )
                kinds.append("post_query")

        sel = selectors.DefaultSelector()

        route_lat: dict[str, list[float]] = {
            "wordlist": [], "get_query": [], "post_query": []
        }

        class Conn:
            __slots__ = ("sock", "buf", "need", "qi", "t0", "lat", "done",
                         "kind")

            def __init__(self, qi: int) -> None:
                self.sock = socket.create_connection(("127.0.0.1", port))
                self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                # blocking sockets: the selector gates recv (>=1 byte ready)
                # and the tiny request always fits the send buffer
                self.buf = b""
                self.need = -1
                self.qi = qi
                self.lat: list[float] = []
                self.done = 0
                sel.register(self.sock, selectors.EVENT_READ, self)
                self.send()

            def send(self) -> None:
                self.t0 = time.perf_counter()
                self.kind = kinds[self.qi % len(payloads)]
                self.sock.sendall(payloads[self.qi % len(payloads)])
                self.qi += n_conns

            def feed(self) -> bool:
                data = self.sock.recv(1 << 18)
                if not data:
                    return False
                self.buf += data
                while True:
                    if self.need < 0:
                        he = self.buf.find(b"\r\n\r\n")
                        if he < 0:
                            return True
                        hdr = self.buf[:he].lower()
                        cl = hdr.find(b"content-length:")
                        # CL is fastloop's LAST header: there is no \r
                        # after it inside hdr, and find() == -1 as a slice
                        # stop silently chops the final digit (framing then
                        # only resyncs on the NEXT header block; a single-
                        # digit CL crashed outright — round-5 routes bench)
                        end = hdr.find(b"\r", cl)
                        if end < 0:
                            end = len(hdr)
                        self.need = he + 4 + int(hdr[cl + 15 : end])
                    if len(self.buf) < self.need:
                        return True
                    self.buf = self.buf[self.need:]
                    self.need = -1
                    dt = time.perf_counter() - self.t0
                    self.lat.append(dt)
                    if route_mix:
                        route_lat[self.kind].append(dt)
                    self.done += 1
                    self.send()

        # contract check on one request before the blast
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=json.dumps({"query": queries[0]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            sample = json.loads(resp.read())
        assert sample and set(sample[0]) == {
            "Url", "Page_title", "Mod_date", "Page_size", "Children",
            "Parents", "Words_mapping", "Summary", "PageRank", "FinalRank",
        }, "serve bench: response does not carry the full contract"

        conns = [Conn(i) for i in range(n_conns)]

        def pump(until: float) -> None:
            while time.monotonic() < until:
                for key, _ in sel.select(timeout=0.2):
                    if key.data.feed() is False:
                        raise RuntimeError("server closed a connection")

        pump(time.monotonic() + warm_s)  # warm record/summary caches
        for c in conns:
            c.lat.clear()
            c.done = 0
        for v in route_lat.values():
            v.clear()
        t0 = time.perf_counter()
        pump(time.monotonic() + duration_s)
        dt = time.perf_counter() - t0
        total = sum(c.done for c in conns)
        lats = np.sort(np.concatenate([np.asarray(c.lat) for c in conns]))
        for c in conns:
            sel.unregister(c.sock)
            c.sock.close()
        stats = {}
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30
            ) as resp:
                stats = json.loads(resp.read())
        except Exception:  # noqa: BLE001 — diagnostics only
            pass
        qps = total / dt
        return {
            "metric": f"serve_http_qps_{n_pages // 1000}k_docs_full_contract",
            "value": round(qps, 1),
            "unit": "qps",
            "vs_baseline": round(qps / 2000.0, 3),  # round-2 target: 2k QPS
            "p50_ms": round(1e3 * float(lats[len(lats) // 2]), 2) if len(lats) else None,
            "p99_ms": round(1e3 * float(lats[int(len(lats) * 0.99)]), 2) if len(lats) else None,
            "requests": total,
            "connections": n_conns,
            "big_batch": big_batch,
            "fetchers": n_fetchers or 1,  # server CLI default
            "mean_batch": (stats.get("microbatcher") or {}).get("mean_batch"),
            # phrase-class segregation (auto at the >=512k-doc fused tiers):
            # ph_batches/batches shows the split actually happening
            "segregate": (stats.get("microbatcher") or {}).get("segregate"),
            "ph_batches": (stats.get("microbatcher") or {}).get("ph_batches"),
            "batches": (stats.get("microbatcher") or {}).get("batches"),
            "rank_device_ms": (stats.get("rank.device") or {}).get("mean_ms"),
            "serve_query_ms": (stats.get("serve.query") or {}).get("mean_ms"),
            # per-stage pipeline spans (ms/batch): rank.device above is the
            # ASYNC dispatch only — the device-execution wait lands in
            # batch.fetch, so these are what locate the wall (host assemble
            # vs device+RTT) at each corpus tier
            "spans_ms": {
                k: (stats.get(f"batch.{k}") or {}).get("mean_ms")
                for k in ("wait", "parse", "dispatch", "fetch",
                          "assemble", "resolve")
            },
            # per-request queue-age distribution (enqueue -> resolve) by
            # class: the batching-induced part of the latency tail
            "queue_age": (stats.get("microbatcher") or {}).get("queue_age"),
            # per-route latency split when the minority-route mix is on
            # (GET /wordlist + GET /query ride the reader lock + sorted
            # wordlist cache, not the batcher)
            "routes": {
                k: {
                    "n": len(v),
                    "p50_ms": round(1e3 * float(np.percentile(v, 50)), 2),
                    "p99_ms": round(1e3 * float(np.percentile(v, 99)), 2),
                }
                for k, v in route_lat.items() if v
            } if route_mix else None,
        }
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except Exception:
            proc.kill()


def bench_residency(n_pages: int = 2_000_000) -> dict:
    """VERDICT r4 #3: the "~2M docs/chip" fused-lane ceiling, MEASURED.
    Loads the real crawl-built corpus at n_pages, builds the DeviceIndex at
    full single-chip residency, reports whether the int16-posT budget gate
    (retrieval/device_index.py POS_T_BUDGET_BYTES) kept the fused mixed
    lane live, and times the keyword / mixed 128-batch programs there. Also
    proves the past-the-gate path: with the budget forced to zero the index
    rebuilds WITHOUT posT planes and a mixed batch serves end-to-end on the
    legacy sparse lane (correctness leg of the gate)."""
    import time as _time

    from spaghettisearch_tpu.retrieval import device_index as _di
    from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

    root = ensure_bench_corpus(n_pages)
    db, snap = load_bench_corpus(root)
    t0 = _time.perf_counter()
    eng = QueryEngine(db, snapshot=snap)
    build_s = _time.perf_counter() - t0
    fused = bool(eng.model.supports_mixed(eng.index))
    queries = bench_queries(snap, 512, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries]
    kw = [p for p in parsed if not p.phrase_hashes]
    kw_batch = (kw * 2)[:128]
    batches = [parsed[i : i + 128] for i in range(0, 512, 128)]

    def pipelined(bs, reps=3):
        # depth-2 dispatch window: each in-flight execution holds ~[B, D]
        # f32 temporaries (1+ GiB at 2M docs) — a deep queue OOMs the chip
        def window(seq):
            prev = None
            for b in seq:
                h = eng.rank_async(b)
                if prev is not None:
                    prev.finish()
                prev = h
            prev.finish()

        window(bs)  # compile + settle
        best = float("inf")
        for _ in range(reps):
            t0 = _time.perf_counter()
            window(bs * 3)
            best = min(best, (_time.perf_counter() - t0) / (len(bs) * 3))
        return best * 1e3

    mixed_ms = pipelined(batches)
    kw_ms = pipelined([kw_batch])
    doc_sorted = eng.index.doc_perm is not None
    # past-the-gate degradation is proven by `--mode sparse2m` in its OWN
    # process: the relay frees device buffers lazily, so rebuilding the
    # 2M index sparse in-process OOMs the chip even after deleting the
    # fused engine (measured, round 5)
    db.close()
    qps = 128e3 / mixed_ms
    return {
        "metric": f"mixed_qps_{n_pages // 1000}k_docs_resident",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 1000.0, 3),  # rung: 1k mixed qps at tier
        "fused_lane_live": fused,
        "mixed128_pipelined_ms": round(mixed_ms, 2),
        "kw128_pipelined_ms": round(kw_ms, 2),
        "device_index_build_s": round(build_s, 1),
        "doc_sort": doc_sorted,
        "sparse_fallback": "see sparse2m (own process; HBM)",
    }


def bench_sparse2m(n_pages: int = 2_000_000, n_queries: int = 16) -> dict:
    """The past-the-posT-gate path at the 2M tier, END TO END on the real
    chip (VERDICT r4 #3's correctness leg): force the budget to zero so the
    index builds WITHOUT position planes (the sparse two-phase lane is then
    the serving path — exactly what a corpus past the gate gets), rank a
    small mixed batch, and compare against the reference-semantics host
    oracle. Runs in its own process: HBM cannot hold the fused and sparse
    2M indexes together."""
    import time as _time

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle import retrieve as oracle_retrieve

    from spaghettisearch_tpu.retrieval import device_index as _di
    from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

    _di.POS_T_BUDGET_BYTES = 0  # past-the-gate corpus, simulated exactly
    root = ensure_bench_corpus(n_pages)
    db, snap = load_bench_corpus(root)
    t0 = _time.perf_counter()
    eng = QueryEngine(db, snapshot=snap)
    build_s = _time.perf_counter() - t0
    assert not eng.index.body.pos_dense or eng.index.body.posT is None
    queries = bench_queries(snap, n_queries, seed=9, phrase_every=2, db=db)
    parsed = [parse_query(q) for q in queries]
    t0 = _time.perf_counter()
    scores, ids = eng.rank(parsed, topk=50)
    first_ms = (_time.perf_counter() - t0) * 1e3
    exact = 0
    for row, q in enumerate(queries):
        got = [snap.doc_hashes[int(d)]
               for s, d in zip(scores[row], ids[row])
               if s != -np.inf and not np.isnan(s)]
        want = [d for d, _ in oracle_retrieve(db, q)]
        exact += got == want
    db.close()
    return {
        "metric": "sparse_lane_exact_order_at_50_2000k",
        "value": round(exact / max(len(queries), 1), 6),
        "unit": "fraction",
        "vs_baseline": round(exact / max(len(queries), 1), 6),
        "n_queries": len(queries),
        "first_batch_ms": round(first_ms, 1),
        "device_index_build_s": round(build_s, 1),
        "note": "posT budget forced to 0: the sparse two-phase lane serves "
                "the whole mixed batch end-to-end at 2M docs (graceful "
                "degradation past the position-plane gate)",
    }


def bench_parity(n_pages: int = 100_000, n_queries: int = 1000) -> dict:
    """recall@10 vs the reference-semantics oracle ON THE SAME crawl-built
    index the headline QPS runs on (BASELINE.json: QPS is only meaningful AT
    recall parity). Mixed keyword + phrase workload; value is mean recall@10
    (target 1.0)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle import retrieve as oracle_retrieve

    from spaghettisearch_tpu.evaluation import recall_at_k
    from spaghettisearch_tpu.retrieval.engine import QueryEngine

    from spaghettisearch_tpu.evaluation import compare_rankings
    from spaghettisearch_tpu.retrieval.engine import parse_query

    root = ensure_bench_corpus(n_pages)
    db, snap = load_bench_corpus(root)
    eng = QueryEngine(db, snapshot=snap)
    queries = bench_queries(snap, n_queries, seed=9, phrase_every=3, db=db)

    # rank-level comparison (doc hashes + raw FinalRank scores): recall@10
    # AND exact-order/score agreement vs the oracle's top-50 (the
    # reference's result window, main_retrieve.go:99-103). Tie order is
    # well-defined on both sides: the oracle sorts (-score, doc_hash), the
    # engine's top-k breaks ties by doc id == sorted-doc-hash rank.
    got_all: list[list[tuple[str, float]]] = []
    want_all: list[list[tuple[str, float]]] = []
    for qi in range(0, len(queries), 64):
        chunk = queries[qi : qi + 64]
        parsed = [parse_query(q) for q in chunk]
        scores, ids = eng.rank(parsed, topk=50)
        for row, q in enumerate(chunk):
            got_all.append([
                (snap.doc_hashes[int(d)], float(s))
                for s, d in zip(scores[row], ids[row])
                if s != -np.inf and not np.isnan(s)
            ])
            want_all.append([(d, s) for d, s in oracle_retrieve(db, q)])
    report = compare_rankings(got_all, want_all, k=10)
    exact50 = sum(
        1 for a, b in zip(got_all, want_all)
        if [d for d, _ in a] == [d for d, _ in b]
    ) / max(len(got_all), 1)
    # classify residual top-50 divergences: a divergence is TIE-EXPLAINED
    # when every differing position holds docs whose oracle scores are
    # equal (any order is then a valid insertion-sort outcome, reference
    # util.go:48-54); anything else would be a real misorder
    n_div = n_tie = 0
    for a, b in zip(got_all, want_all):
        if [d for d, _ in a] == [d for d, _ in b]:
            continue
        n_div += 1
        bmap = dict(b)
        tie_ok = len(a) == len(b)
        if tie_ok:
            for (da, _), (db_, sb) in zip(a, b):
                if da == db_:
                    continue
                sa = bmap.get(da)
                if sa is None or abs(sa - sb) > 1e-6 * max(abs(sb), 1e-9):
                    tie_ok = False
                    break
        n_tie += tie_ok
    return {
        "order_divergences_at_50": n_div,
        "divergences_tie_explained": n_tie,
        "metric": f"recall_at_10_vs_reference_oracle_{n_pages // 1000}k",
        "value": round(report.recall_at_k, 6),
        "unit": "recall",
        "vs_baseline": round(report.recall_at_k / 1.0, 6),
        "exact_order_at_10": round(report.exact_order, 6),
        "exact_order_at_50": round(exact50, 6),
        "score_max_rel_err": float(f"{report.score_max_rel_err:.3g}"),
        "queries": report.queries,
        "docs": snap.n_docs,
    }


def _mine_ngram(snap, db, rng, n_terms: int) -> str | None:
    """An adjacent n_terms-gram from a random cached page body (so the
    phrase actually matches at least its source doc)."""
    for _ in range(20):
        doc = snap.doc_hashes[int(rng.integers(0, snap.n_docs))]
        raw = db.cached_doc(doc)
        if not raw:
            continue
        body = raw.decode().split("<p>", 1)[-1].split("</p>", 1)[0].split()
        if len(body) >= n_terms:
            j = int(rng.integers(0, len(body) - n_terms + 1))
            return '"' + " ".join(body[j : j + n_terms]) + '"'
    return None


def bench_parity_rare(n_pages: int = 100_000) -> dict:
    """Oracle parity for the RARE-grammar program families (VERDICT r3 #5):
    the catch-all and legacy programs are warmed and crash-tested by
    tests/test_shape_policy.py but their scores were unproven on the real
    device. Families walked here, each vs tests/oracle.py:

      kw_catchall   5-32 keywords (Q_CATCHALL program)
      phrase_long   8- and 16-term mined phrases (P_LEVELS tails)
      widefold      >64-match phrases on a posT-less engine (legacy sparse
                    matcher lane, wide e-fold levels)
      csr_lane      dense-truncated engine (exact-CSR scoring route)
      big_batch     one 256-row mixed batch (B_BIG program)
      topic_fixed   use_topic_model + topic_model_fixed=True (the
                    reference's shipped zero-seed quirk, retrieval/topics.py)

    Reference ordering semantics: /root/reference/retrieval/util.go:48-54,
    main_retrieve.go:99-103."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle import retrieve as oracle_retrieve

    from spaghettisearch_tpu.evaluation import compare_rankings
    from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

    root = ensure_bench_corpus(n_pages)
    db, snap = load_bench_corpus(root)
    rng = np.random.default_rng(23)
    word_of = {wh: db.word.get(wh) for wh in snap.word_hashes}
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()

    def kw_query(k: int) -> str:
        ids = rng.choice(len(snap.word_hashes), size=k, p=p)
        return " ".join(
            w for w in (word_of[snap.word_hashes[int(i)]] for i in ids) if w
        )

    def run_family(eng, queries, topic=False) -> dict:
        got_all, want_all = [], []
        for qi in range(0, len(queries), 64):
            chunk = queries[qi : qi + 64]
            parsed = [parse_query(q) for q in chunk]
            scores, ids = eng.rank(parsed, topk=50)
            for row, q in enumerate(chunk):
                got_all.append([
                    (snap.doc_hashes[int(d)], float(s))
                    for s, d in zip(scores[row], ids[row])
                    if s != -np.inf and not np.isnan(s)
                ])
                tp = None
                if topic:
                    from spaghettisearch_tpu.retrieval.topics import (
                        compute_topic_probs,
                    )

                    tp = compute_topic_probs(
                        db, parsed[row].keyword_hashes, fixed=True
                    )
                want_all.append(list(oracle_retrieve(db, q, topic_probs=tp)))
        rep = compare_rankings(got_all, want_all, k=10)
        exact50 = sum(
            1 for a, b in zip(got_all, want_all)
            if [d for d, _ in a] == [d for d, _ in b]
        ) / max(len(got_all), 1)
        return {
            "queries": rep.queries,
            "recall_at_10": round(rep.recall_at_k, 6),
            "exact_order_at_50": round(exact50, 6),
            "score_max_rel_err": float(f"{rep.score_max_rel_err:.3g}"),
        }

    eng = QueryEngine(db, snapshot=snap)
    fams: dict[str, dict] = {}

    # 5-32 keywords -> the Q_CATCHALL program
    fams["kw_catchall"] = run_family(
        eng, [kw_query(int(k)) for k in rng.integers(5, 33, 32)]
    )

    # 8/16-term phrases (+ keywords on some rows) -> P_LEVELS tails
    longs = []
    for n_terms in (8, 16):
        for _ in range(8):
            q = _mine_ngram(snap, db, rng, n_terms)
            if q:
                longs.append(q if rng.random() < 0.5 else f"{q} {kw_query(2)}")
    fams["phrase_long"] = run_family(eng, longs)

    # wide phrase folds on the legacy sparse matcher lane: single-term
    # phrases of top-df words match far beyond the 64-entry base fold
    eng_sparse = QueryEngine(db, snapshot=snap)
    live_idx = eng_sparse._live[1]
    live_idx.title.posT = None  # forces the two-phase sparse lane
    hot = np.argsort(-df)[:16]
    wide = [
        f'"{word_of[snap.word_hashes[int(i)]]}"' for i in hot
        if word_of[snap.word_hashes[int(i)]]
    ] + [
        f'"{word_of[snap.word_hashes[int(i)]]}" {kw_query(2)}'
        for i in hot[:4] if word_of[snap.word_hashes[int(i)]]
    ]
    fams["widefold"] = run_family(eng_sparse, wide)

    # dense-truncated engine -> the exact-CSR scoring route (tiny doc-term
    # cap so every dense row truncates; the CSR stays complete)
    import spaghettisearch_tpu.retrieval.device_index as _di

    saved_cap = _di.DOC_TERM_CAP
    try:
        _di.DOC_TERM_CAP = 8
        idx_csr = _di.DeviceIndex.from_snapshot(snap, doc_sort=False)
    finally:
        _di.DOC_TERM_CAP = saved_cap
    assert idx_csr.dense_truncated
    eng_csr = QueryEngine(db, snapshot=snap, index=idx_csr)
    fams["csr_lane"] = run_family(
        eng_csr,
        [kw_query(int(k)) for k in rng.integers(1, 5, 12)]
        + [q for q in (_mine_ngram(snap, db, rng, 2) for _ in range(4)) if q],
    )

    # one 256-row mixed batch through the B_BIG program
    eng_big = QueryEngine(db, snapshot=snap, big_batch=True)
    mixed = bench_queries(snap, 256, seed=31, phrase_every=4, db=db)
    fams["big_batch"] = run_family(eng_big, mixed)

    # the (disabled-by-default) topic model with the fixed-seed quirk
    eng_topic = QueryEngine(
        db, snapshot=snap, use_topic_model=True, topic_model_fixed=True
    )
    fams["topic_fixed"] = run_family(
        eng_topic, bench_queries(snap, 32, seed=37, phrase_every=4, db=db),
        topic=True,
    )

    worst = min(f["exact_order_at_50"] for f in fams.values())
    return {
        "metric": f"rare_grammar_exact_order_at_50_{n_pages // 1000}k",
        "value": round(worst, 6),
        "unit": "exact_order(worst family)",
        "vs_baseline": round(worst, 6),
        "families": fams,
        "docs": snap.n_docs,
    }


def bench_mixed(n_pages: int = 100_000, n_batches: int = 12) -> dict:
    """Engine-level MIXED-workload throughput: the honest headline for the
    reference's full query grammar (keywords AND "quoted phrases" through
    one path, reference: retrieval/main_retrieve.go:45-78). Same query
    distribution as --mode parity / serve (1-4 df-sampled keywords, every
    4th query carrying a real mined 2-gram); 128-query batches through
    QueryEngine.rank — device ranking + result fetch, no hydration."""
    from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

    root = ensure_bench_corpus(n_pages)
    db, snap = load_bench_corpus(root)
    eng = QueryEngine(db, snapshot=snap)
    eng.warmup()
    queries = bench_queries(snap, n_batches * 128, seed=3, phrase_every=4, db=db)
    batches = [
        [parse_query(q) for q in queries[i * 128 : (i + 1) * 128]]
        for i in range(n_batches)
    ]
    for b in batches[:2]:  # settle any residual first-use cost
        eng.rank(b)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for b in batches:
            eng.rank(b)
        best = min(best, time.perf_counter() - t0)
    qps = n_batches * 128 / best
    # pipelined variant: queue every batch's device dispatch, then fetch —
    # overlaps device execution with the per-batch relay RTTs the serial
    # loop pays in sequence (the micro-batcher's dispatch/fetch split does
    # exactly this in production serving)
    best_p = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        handles = [eng.rank_async(b) for b in batches]
        for h in handles:
            h.finish()
        best_p = min(best_p, time.perf_counter() - t0)
    qps_p = n_batches * 128 / best_p
    return {
        "metric": "engine_mixed_qps_100k_docs",
        "value": round(qps, 1),
        "unit": "qps",
        # the north-star 10k target is keyword-only; the committed round-3
        # target for the mixed grammar is 2k engine-level (VERDICT r2 #3)
        "vs_baseline": round(qps / 2000.0, 3),
        "batch_ms_p50": round(best / n_batches * 1e3, 1),
        "pipelined_qps": round(qps_p, 1),
        "phrase_share": round(
            sum(1 for b in batches for p in b if p.phrase_hashes)
            / (n_batches * 128), 3,
        ),
    }


def bench_sharded(n_docs: int = 1_000_000, n_shards: int = 8) -> dict:
    """Multi-chip structure at 1M docs, measured (VERDICT r1 item 6).

    Runs in a subprocess on a virtual 8-device CPU mesh (the pod is not
    reachable from this box: one physical chip), so the meaningful recorded
    numbers are host-side: the full ShardedIndex build time at 1M docs (the
    per-shard-scan splitter measured 5x faster than a global-argsort
    alternative, kept as the equality oracle in tests/test_sharded_build.py)
    plus a structural scoring step proving the 8-way shard_map program
    executes. CPU-mesh step latency is NOT comparable to TPU."""
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [_sys.executable, os.path.abspath(__file__), "--sharded-child",
         str(n_docs), str(n_shards)],
        capture_output=True, text=True, env=env, timeout=3600,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:
        raise RuntimeError(f"sharded child failed:\n{proc.stderr[-2000:]}")
    child = json.loads(proc.stdout.strip().splitlines()[-1])
    return {
        "metric": f"sharded_index_build_s_{n_docs // 1_000_000}m_docs_{n_shards}shards",
        "value": round(child["build_s"], 2),
        "unit": "s",
        # target: full 1M-doc sharded rebuild (split + forward views +
        # transposes + placement) under a minute
        "vs_baseline": round(60.0 / max(child["build_s"], 1e-9), 2),
        "split_s": round(child["split_s"], 2),
        "split_argsort_alt_s": round(child["split_alt_s"], 2),
        "cpu_mesh_step_ms": round(child["step_ms"], 1),
        "shards": n_shards,
        "docs": n_docs,
    }


def _sharded_child(n_docs: int, n_shards: int) -> None:
    """Child body for --mode sharded (runs on the virtual CPU mesh)."""
    import sys as _sys
    import jax

    _sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    )
    from test_sharded_build import _shard_csr_vectorized

    import spaghettisearch_tpu.parallel.sharded as sh
    from spaghettisearch_tpu.parallel.sharded import ShardedIndex, make_sharded_scorer

    assert len(jax.devices()) >= n_shards, jax.devices()
    snap = synth_snapshot(
        n_docs=n_docs, n_words=200_000, body_terms_per_doc=48,
        title_terms_per_doc=4, max_df=32_768,
    )
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_shards]), ("d",))

    t0 = time.perf_counter()
    sidx = ShardedIndex.from_snapshot(snap, mesh)
    build_s = time.perf_counter() - t0

    # host-side section split alone: production per-shard-scan builder vs
    # the global-argsort alternative (equality oracle) — measured evidence
    # for keeping the round-1 splitter (FINDINGS.md)
    dl = sidx.docs_per_shard
    t0 = time.perf_counter()
    for csr in (snap.title, snap.body):
        n_post = csr.n_postings
        per_doc = np.bincount(csr.doc_ids[:n_post], minlength=max(snap.n_docs, 1))
        sh._shard_csr(csr, n_shards, dl, max(int(per_doc.max(initial=0)), 1))
    split_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for csr in (snap.title, snap.body):
        n_post = csr.n_postings
        per_doc = np.bincount(csr.doc_ids[:n_post], minlength=max(snap.n_docs, 1))
        _shard_csr_vectorized(csr, n_shards, dl, max(int(per_doc.max(initial=0)), 1))
    split_alt_s = time.perf_counter() - t0

    # structural scoring step over the full 8-way mesh program
    import jax.numpy as jnp

    scorer = make_sharded_scorer(sidx, topk=10)
    rng = np.random.default_rng(0)
    b, q = 8, 4
    df = np.diff(snap.body.post_offsets).astype(np.float64)
    p = df / df.sum()
    term_ids = rng.choice(snap.n_words, size=(b, q), p=p).astype(np.int32)
    qlen = np.full(b, float(q), np.float32)
    tp = np.zeros((b, 1), np.float32)
    ph_ids = np.full(4, snap.n_words, np.int32)
    ph_valid = np.zeros(4, bool)
    args = (sidx, jnp.asarray(term_ids), jnp.asarray(qlen), jnp.asarray(tp),
            jnp.asarray(ph_ids), jnp.asarray(ph_valid),
            jnp.asarray(0, jnp.int32))
    out = scorer(*args)
    np.asarray(out[0])
    t0 = time.perf_counter()
    out = scorer(*args)
    np.asarray(out[0])
    step_ms = (time.perf_counter() - t0) * 1e3
    print(json.dumps(dict(
        build_s=build_s, split_s=split_s, split_alt_s=split_alt_s,
        step_ms=step_ms, ok=True,
    )))


def main() -> None:
    import sys

    if "--sharded-child" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        i = sys.argv.index("--sharded-child")
        _sharded_child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return

    if "--build-corpus" in sys.argv:
        # internal: corpus building is a host-side batch job; force CPU so
        # PageRank doesn't pay remote-TPU compile latency (must happen before
        # any backend is touched — env vars are overridden by sitecustomize)
        import jax

        jax.config.update("jax_platforms", "cpu")
        i = sys.argv.index("--build-corpus")
        n_pages, n_vocab, root = int(sys.argv[i + 1]), int(sys.argv[i + 2]), sys.argv[i + 3]
        build_bench_corpus(root, n_pages=n_pages, n_vocab=n_vocab)
        return

    from spaghettisearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    if "--profile" in sys.argv:
        # wrap the whole run in a jax.profiler trace (TensorBoard/Perfetto)
        import jax

        trace_dir = sys.argv[sys.argv.index("--profile") + 1]
        sys.argv.remove("--profile")
        sys.argv.remove(trace_dir)
        with jax.profiler.trace(trace_dir):
            main()
        print(f"# trace written to {trace_dir}", file=sys.stderr)
        return
    if "--cpu" in sys.argv:
        # force the host CPU backend (env vars are too late here — this
        # box's sitecustomize force-selects the axon TPU relay): host-side
        # benches measured through the relay pay 25 ms RTTs + compile waits
        # that say nothing about the code under test
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.argv.remove("--cpu")
    if "--results" in sys.argv:
        # per-round machine-readable artifact: every bench mode + the
        # real-TPU oracle-parity run into one JSON file (VERDICT r1 item 7)
        out_path = sys.argv[sys.argv.index("--results") + 1]
        emit_results(out_path)
        return

    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
        if mode == "pagerank":
            print(json.dumps(bench_pagerank()))
            return
        if mode == "phrase":
            print(json.dumps(bench_phrase()))
            return
        if mode == "scale1m":
            print(json.dumps(bench_scale()))
            return
        if mode == "index":
            print(json.dumps(bench_index()))
            return
        if mode == "parity":
            print(json.dumps(bench_parity()))
            return
        if mode == "parity1m":
            # mixed keyword+phrase parity at the 1M tier (engine kernel vs
            # host oracle; the pure-XLA CPU twin OOMs there)
            print(json.dumps(bench_parity(1_000_000, 256)))
            return
        if mode == "parity_rare":
            print(json.dumps(bench_parity_rare()))
            return
        if mode == "mixed":
            print(json.dumps(bench_mixed()))
            return
        if mode == "serve":
            kw = {}
            if "--conns" in sys.argv:
                kw["n_conns"] = int(sys.argv[sys.argv.index("--conns") + 1])
            if "--fetchers" in sys.argv:
                kw["n_fetchers"] = int(sys.argv[sys.argv.index("--fetchers") + 1])
            if "--routeMix" in sys.argv:
                kw["route_mix"] = True
            print(json.dumps(bench_serve(big_batch="--bigBatch" in sys.argv, **kw)))
            return
        if mode == "serve1m":
            # BASELINE ladder rung 5, single-chip form: full-contract HTTP
            # serving over the 1M-doc crawl-built corpus (builds the corpus
            # on first use — ~1-2 h host-side; cached after)
            kw = {}
            if "--phrasePatienceMs" in sys.argv:
                kw["ph_patience_ms"] = float(
                    sys.argv[sys.argv.index("--phrasePatienceMs") + 1]
                )
            if "--phraseStale" in sys.argv:
                kw["ph_stale"] = sys.argv[sys.argv.index("--phraseStale") + 1]
            if "--routeMix" in sys.argv:
                kw["route_mix"] = True
            print(json.dumps(bench_serve(n_pages=1_000_000, **kw)))
            return
        if mode == "sharded":
            print(json.dumps(bench_sharded()))
            return
        if mode == "scale2m":
            # VERDICT r4 #3: the fused lane's single-chip doc ceiling,
            # measured on the real 2M crawl-built corpus (builds on first
            # use — a multi-hour host job; cached after)
            print(json.dumps(bench_residency(2_000_000)))
            return
        if mode == "parity2m":
            print(json.dumps(bench_parity(2_000_000, 128)))
            return
        if mode == "sparse2m":
            print(json.dumps(bench_sparse2m()))
            return
        if mode != "synth":
            raise SystemExit(f"unknown mode {mode}")

    synth = "--mode" in sys.argv and sys.argv[sys.argv.index("--mode") + 1] == "synth"
    print(json.dumps(bench_headline(synth=synth)))


def host_calibration() -> dict:
    """Fixed single-core host workload, best-of-3, recorded into every
    results artifact. The shared 1-core VM swings 1.5-3x across driver
    restarts (experiments/FINDINGS.md round-3 sessions 6/9), so the
    host-bound entries (serve, index, pagerank) are only comparable across
    artifacts after dividing by this score. The scale is arbitrary but
    stable (0.22 s reference workload); the box that ran the round-3
    session-10 regen scored ~1.15."""
    import hashlib

    buf = b"\x5a" * (1 << 20)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.md5()
        for _ in range(96):
            h.update(buf)
        a = np.random.default_rng(0).random((512, 512), np.float32)
        for _ in range(6):
            a = a @ a.T
            a /= np.abs(a).max() + 1.0
        best = min(best, time.perf_counter() - t0)
    return {"metric": "host_single_core_score", "value": round(0.22 / best, 3),
            "unit": "x_ref_box", "best_s": round(best, 4)}


def emit_results(out_path: str) -> None:
    """Run every bench mode in sequence and write one JSON artifact. The
    headline/serve/parity modes run on the default backend (the real TPU
    when available — parity on TPU satisfies the CLAUDE.md 'run the oracle
    on the real TPU occasionally' invariant); sharded runs on the virtual
    CPU mesh in a subprocess."""
    import platform
    import subprocess

    import jax

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or None
    except OSError:
        head = None
    results: dict[str, object] = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "host": platform.node(),
        "host_calib": host_calibration(),
        "git_head": head,
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    def _fresh_cpu(mode: str):
        # host-side benches re-run in a FRESH CPU process: in-process they
        # inherit the TPU relay (25 ms RTTs poison sub-second jobs) and a
        # heap full of bench state on this 1-core box (measured: pagerank
        # 0.35 s fresh vs 1.1 s in-process, index 2.7k vs 0.8k pages/s)
        def run() -> dict:
            import subprocess

            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--mode", mode, "--cpu"],
                capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"{mode} child failed:\n{proc.stderr[-2000:]}")
            out = json.loads(proc.stdout.strip().splitlines()[-1])
            out["backend"] = "cpu-fresh"
            return out

        return run

    stages = [
        ("headline", lambda: bench_headline(synth=False)),
        ("mixed", bench_mixed),
        ("parity_tpu", bench_parity),
        ("parity_rare", bench_parity_rare),
        ("serve", bench_serve),
        ("scale1m", bench_scale),
        ("phrase", bench_phrase),
        ("pagerank", _fresh_cpu("pagerank")),
        ("index", _fresh_cpu("index")),
        ("sharded", bench_sharded),
    ]
    # 1M-tier stages join the artifact only when the corpus is already built
    # (first build is a ~1 h host-side job; `--mode serve1m` triggers it)
    if os.path.exists(os.path.join(BENCH_DIR, "corpus1000k", "BUILT.json")):
        stages.insert(5, ("serve1m", lambda: bench_serve(n_pages=1_000_000)))
        # mixed keyword+phrase parity at the top tier, engine vs oracle
        # (the pure-XLA CPU twin OOMs at 1M — this runs the real kernel)
        stages.insert(7, ("parity1m", lambda: bench_parity(1_000_000, 256)))
        # minority-route mix under 1M load (reference route surface —
        # VERDICT r4 #8): wordlist + GET /query ride the reader lock
        stages.append(
            ("serve1m_routes",
             lambda: bench_serve(n_pages=1_000_000, route_mix=True))
        )

        def _mesh_projection() -> dict:
            # VERDICT r4 #1: the 8-chip serve1m number, from REAL-chip
            # shard-scale device measurements (experiments/
            # shard_scale_probe.py — batch rows replicated, docs sharded,
            # so the per-shard program at 1M/8 docs is measured directly
            # on the one physical chip; collective merge + host stages
            # modeled from the measured r4 serve1m spans)
            import subprocess

            proc = subprocess.run(
                [sys.executable, "experiments/shard_scale_probe.py"],
                capture_output=True, text=True, timeout=5400,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode != 0:
                raise RuntimeError(proc.stderr[-1500:])
            data = json.loads(proc.stdout.strip().splitlines()[-1])
            val = data["shards8"]["pipeline_projected_qps"]
            return {
                "metric": "serve1m_projected_8chip_qps",
                "value": val,
                "unit": "qps",
                "vs_baseline": round(val / 2000.0, 3),
                "method": "measured shard-local programs on the real chip "
                          "at 1M/8 and 1M/4 doc slices of the real 1M "
                          "corpus + modeled collective merge and the "
                          "measured r4 host spans; correctness leg = the "
                          "1M CPU-mesh soak + sharded parity tests",
                **data,
            }

        stages.append(("serve1m_projected", _mesh_projection))
    if os.path.exists(os.path.join(BENCH_DIR, "corpus2000k", "BUILT.json")):
        # 2M tier (VERDICT r4 #3): measured fused-lane ceiling + oracle
        # parity at the doc count the int16-posT budget gate unlocks
        stages.append(("scale2m", lambda: bench_residency(2_000_000)))
        stages.append(("parity2m", lambda: bench_parity(2_000_000, 128)))
    for name, fn in stages:
        t0 = time.perf_counter()
        try:
            results[name] = fn()
        except Exception as exc:  # record the failure, keep going
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
        print(f"# {name}: {json.dumps(results[name])} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr, flush=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": out_path}))


def bench_headline(synth: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from spaghettisearch_tpu.ops.scoring import score_queries_forward
    from spaghettisearch_tpu.retrieval.device_index import DeviceIndex

    batch, q, topk = 256, 4, 10
    n_batches = 20

    if synth:
        # round-1 style synthetic CSR (kept for kernel-perf continuity)
        n_docs, n_words = 100_000, 50_000
        snap = synth_snapshot(n_docs=n_docs, n_words=n_words)
    else:
        # the headline number runs on the SAME crawl-built persisted index
        # that --mode parity checks recall@10 against (BASELINE.md north
        # star: QPS at recall parity, one index)
        root = ensure_bench_corpus()
        _db, snap = load_bench_corpus(root)
        _db.close()
        n_docs, n_words = snap.n_docs, snap.n_words
    idx = DeviceIndex.from_snapshot(snap)

    # realistic query mix: 1-4 keywords (same k distribution as
    # bench_queries / --mode serve / --mode parity), terms sampled
    # proportional to df; batches sorted by term count (the engine contract:
    # rank() sorts so the kernel's per-block q dispatch takes effect)
    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    term_batches = []
    for _ in range(n_batches):
        ks = rng.integers(1, q + 1, batch)
        ks[::-1].sort()  # descending
        tids = np.full((batch, q), n_words, np.int32)
        for i, k in enumerate(ks):
            tids[i, :k] = rng.choice(n_words, size=int(k), p=p)
        term_batches.append(
            (jnp.asarray(tids), jnp.asarray(ks.astype(np.int32)),
             jnp.asarray(ks.astype(np.float32)))
        )
    tp = jnp.zeros((batch, idx.n_categories), jnp.float32)

    from spaghettisearch_tpu.ops.scoring import pallas_available

    use_pallas = pallas_available()
    emit_counts = idx.has_zero_weight

    def run(tids_qn):
        tids, qn, qlen = tids_qn
        return score_queries_forward(
            idx.title.fwd, idx.body.fwd,
            idx.mag_title, idx.mag_body, idx.pagerank,
            tids, qlen, tp, qn, topk=topk, use_pallas=use_pallas,
            emit_counts=emit_counts,
            # doc-sorted layout args, exactly as the engine passes them
            # (models/blended.py): dynamic-T sweep + natural-id mapping
            body_tmax=idx.body.tmax_blocks, doc_map=idx.doc_perm,
        )

    # warmup / compile (np.asarray forces a host round-trip: through the
    # remote-TPU relay, block_until_ready alone can under-report)
    np.asarray(run(term_batches[0])[0])

    # best of 3 sweeps: the remote-TPU relay adds multi-ms jitter that can
    # understate hardware throughput by 10-20% in a single sweep
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(t) for t in term_batches]
        jax.block_until_ready(outs)
        # device execution is single-stream: a host round-trip on the final
        # output proves every batch completed, without paying 20 relay RTTs
        np.asarray(outs[-1][0])
        best_dt = min(best_dt, time.perf_counter() - t0)

    qps = n_batches * batch / best_dt
    return {
        "metric": "batched_top10_qps_100k_docs" + ("_synth" if synth else ""),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10_000.0, 3),
    }


if __name__ == "__main__":
    main()
