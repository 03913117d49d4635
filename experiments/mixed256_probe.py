"""Round-3 probe: amortize the mixed kernel's fixed streaming cost with
a 256-row batch at 1M docs.

split_probe.py showed the mixed program's cost is ~50 ms FIXED (posT +
ft/fw streaming over 1M docs at doc_block=256, row-count independent) +
~0.34 ms/row compute: mixed-16 = 52.2 ms, mixed-128 = 94.0. If that model
holds, mixed-256 ~= 138 ms -> 1,855 qps device ceiling (+38% over 128's
1,362). The engine already has the B_BIG=256 bucket behind --bigBatch.

Run (needs .bench/corpus1000k): python experiments/mixed256_probe.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.scoring import pallas_available, score_queries_mixed
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def t_queued(fn, reps=8):
    out = fn()
    np.asarray(out[0][:, :1])
    t0 = time.perf_counter()
    hs = [fn() for _ in range(reps)]
    np.asarray(hs[-1][0][:, :1])
    np.asarray(hs[0][0][:, :1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    root = ensure_bench_corpus(n)
    db, snap = load_bench_corpus(root)
    t0 = time.perf_counter()
    idx = DeviceIndex.from_snapshot(snap)
    print(f"device index in {time.perf_counter() - t0:.1f}s", flush=True)

    queries = bench_queries(snap, 256, phrase_every=8, db=db)
    q, p = 4, 16
    hot_map = idx.hot_body_map

    def build(bsz):
        parsed = [parse_query(qq) for qq in queries[:bsz]]
        term_ids, qlen, qn, qnb, hot_sids = QueryEngine._fill_keyword_rows(
            parsed, bsz, q, snap, hot_map
        )
        ph_ids = np.full((bsz, p), snap.n_words, np.int32)
        ph_valid = np.zeros((bsz, p), np.float32)
        pn = np.zeros(bsz, np.int32)
        for i, pq in enumerate(parsed):
            pids = snap.term_ids(pq.phrase_hashes)[:p]
            ph_ids[i, : len(pids)] = pids
            ph_valid[i, : len(pids)] = 1.0
            pn[i] = len(pids)
        perm = np.lexsort((-qn, -qnb, -pn))
        tp = jnp.zeros((bsz, idx.n_categories), jnp.float32)
        return dict(
            title_fwd=idx.title.fwd, body_fwd=idx.body.fwd,
            title_posT=idx.title.posT, body_posT=idx.body.posT,
            mag_title=idx.mag_title, mag_body=idx.mag_body,
            pagerank=idx.pagerank,
            term_ids=jnp.asarray(term_ids[perm]),
            query_len=jnp.asarray(qlen[perm]), topic_probs=tp,
            ph_ids=jnp.asarray(ph_ids[perm]),
            ph_valid=jnp.asarray(ph_valid[perm]), qn=jnp.asarray(qn[perm]),
            pn=jnp.asarray(pn[perm]), qnb=jnp.asarray(qnb[perm]),
            hot_sids=jnp.asarray(hot_sids[perm]), hot_w=idx.hot_body_w,
            doc_map=idx.doc_perm,
        )

    kw = dict(topk=50, use_pallas=pallas_available(),
              emit_counts=idx.has_zero_weight)
    for bsz in (128, 256):
        args = build(bsz)
        fn = lambda a=args: score_queries_mixed(**a, body_tmax=None, **kw)
        t0 = time.perf_counter()
        try:
            out = fn()
            np.asarray(out[0][:, :1])
        except Exception as e:
            print(f"mixed-{bsz}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"mixed-{bsz}: compile+settle {time.perf_counter() - t0:.1f}s",
              flush=True)
        ms = t_queued(fn)
        print(f"mixed-{bsz}: {ms:.1f} ms queued "
              f"({bsz * 1e3 / ms:.0f} qps ceiling)", flush=True)
    db.close()


if __name__ == "__main__":
    main()
