"""Profile the REAL corpus-build indexing path (bench.py build_bench_corpus's
loop: lxml tokenize + laundry + postings + anchor indexing + disk-WAL store).

The bulk bench (synthetic tests/corpus pages, in-memory store) runs ~3.8k
pages/s, but the 1M bench-corpus build measured 297 p/s — this isolates where
the extra ~3 ms/page goes. Usage:

    python experiments/index_profile.py [n_pages] [--mem] [--profile]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import shutil
import sys
import time
from datetime import datetime, timezone

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _bench_vocab, _zipf_probs  # noqa: E402
from spaghettisearch_tpu.index.indexer import index_page  # noqa: E402
from spaghettisearch_tpu.store.tables import Database  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20_000
    in_mem = "--mem" in sys.argv
    do_profile = "--profile" in sys.argv
    n_vocab = 30_000

    rng = np.random.default_rng(0)
    vocab = _bench_vocab(n_vocab)
    probs = _zipf_probs(n_vocab)
    body_lens = rng.integers(40, 120, n_pages)
    title_lens = rng.integers(2, 6, n_pages)
    body_words = rng.choice(n_vocab, size=int(body_lens.sum()), p=probs)
    title_words = rng.choice(n_vocab, size=int(title_lens.sum()), p=probs)
    n_links = rng.integers(0, 8, n_pages)
    link_targets = rng.integers(0, n_pages, int(n_links.sum()))

    pages = []
    bo = to = lo = 0
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
        pages.append((f"http://bench.local/p{i}", html))

    root = "/tmp/idxprof_store"
    shutil.rmtree(root, ignore_errors=True)
    db = Database(None if in_mem else root)
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def run() -> None:
        with db.bulk():
            for url, html in pages:
                index_page(db, html, url, last_modified=ts)

    t0 = time.perf_counter()
    c0 = time.process_time()
    if do_profile:
        pr = cProfile.Profile()
        pr.enable()
        run()
        pr.disable()
    else:
        run()
    dt = time.perf_counter() - t0
    cdt = time.process_time() - c0
    print(f"{n_pages} pages in {dt:.2f}s wall / {cdt:.2f}s cpu = "
          f"{n_pages / dt:.0f} wall-pages/s, {n_pages / cdt:.0f} cpu-pages/s "
          f"({'mem' if in_mem else 'disk'})")

    if do_profile:
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s)
        ps.sort_stats("cumulative").print_stats(30)
        print(s.getvalue())

    t1 = time.perf_counter()
    db.flush()
    db.close()
    print(f"flush+close {time.perf_counter() - t1:.2f}s")


if __name__ == "__main__":
    main()
