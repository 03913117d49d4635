"""Round-3 probe: decompose the 1M keyword scorer's 129 ms/128-batch.

probe1m.py showed serve1m's wall is the keyword membership program itself
(keyword-only 128.8 ms serial vs mixed 140.1 ms; host assemble cleared).
/tmp topk probe showed lax.top_k k=50 over [128,1M] alone is ~30 ms.
This probe splits the engine-config program (topk=50,
emit_counts=has_zero_weight) into its parts on the REAL 1M corpus:

  - engine config            (topk=50, counts on if corpus has zero weights)
  - topk=10                  (top_k share, scale1m's config)
  - topk=1                   (membership + finalize floor)
  - counts off, topk=50      (count-elision headroom)
  - counts off, topk=1       (pure floor)

Run (needs .bench/corpus1000k): python experiments/probe1m_decomp.py [n_docs]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.scoring import pallas_available, score_queries_forward
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex
from spaghettisearch_tpu.retrieval.engine import parse_query


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
    print(
        f"facts: has_zero_weight={idx.has_zero_weight} "
        f"title.ft={tuple(idx.title.fwd.ft.shape)} "
        f"body.ft={tuple(idx.body.fwd.ft.shape)} "
        f"D_pad={idx.n_docs_padded}",
        flush=True,
    )

    queries = bench_queries(snap, 256, phrase_every=0, db=db)
    parsed = [parse_query(q) for q in queries]
    b, q = 128, 4
    term_ids = np.full((b, q), snap.n_words, np.int32)
    qn = np.zeros(b, np.int32)
    qlen = np.zeros(b, np.float32)
    for i, p in enumerate(parsed[:b]):
        ids = snap.term_ids(p.keyword_hashes)[:q]
        term_ids[i, : len(ids)] = ids
        qn[i] = len(ids)
        qlen[i] = float(p.query_len)
    order = np.argsort(-qn, kind="stable")
    term_ids, qn, qlen = term_ids[order], qn[order], qlen[order]
    print(f"batch qn histogram: {np.bincount(qn, minlength=q + 1).tolist()}",
          flush=True)

    tids = jnp.asarray(term_ids)
    jq = jnp.asarray(qlen)
    jqn = jnp.asarray(qn)
    tp = jnp.zeros((b, idx.n_categories), jnp.float32)
    up = pallas_available()
    hzw = idx.has_zero_weight

    def run(topk, counts):
        return score_queries_forward(
            idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
            idx.pagerank, tids, jq, tp, jqn, topk=topk, use_pallas=up,
            emit_counts=counts,
        )

    for label, topk, counts in (
        ("engine config (topk=50, counts=hzw)", 50, hzw),
        ("topk=10", 10, hzw),
        ("topk=1", 1, hzw),
        ("counts off, topk=50", 50, False),
        ("counts off, topk=1", 1, False),
    ):
        ms = t_queued(lambda topk=topk, counts=counts: run(topk, counts))
        print(f"{label}: {ms:.1f} ms ({b * 1e3 / ms:.0f} qps)", flush=True)

    # hot-term dense cache split (device_index._build_hot_cache)
    hm = idx.hot_body_map
    print(f"hot terms cached: {0 if hm is None else len(hm)}", flush=True)
    if hm is not None:
        from spaghettisearch_tpu.retrieval.engine import QueryEngine

        t2, ql2, qn2, qnb2, sids2 = QueryEngine._fill_keyword_rows(
            parsed[:b], b, q, snap, hm
        )
        order = np.lexsort((-qn2, -qnb2))
        t2, ql2, qn2 = t2[order], ql2[order], qn2[order]
        qnb2, sids2 = qnb2[order], sids2[order]
        print(f"hot-split qnb histogram: "
              f"{np.bincount(qnb2, minlength=q + 1).tolist()}", flush=True)
        jt2, jql2, jqn2 = jnp.asarray(t2), jnp.asarray(ql2), jnp.asarray(qn2)
        jqnb2, jsids2 = jnp.asarray(qnb2), jnp.asarray(sids2)

        def run_hot(topk, counts):
            return score_queries_forward(
                idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
                idx.pagerank, jt2, jql2, tp, jqn2, jqnb2, jsids2,
                idx.hot_body_w, topk=topk, use_pallas=up, emit_counts=counts,
            )

        def run_base(topk, counts):
            # same rows/order, full sweep (cold-first is a valid layout)
            return score_queries_forward(
                idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
                idx.pagerank, jt2, jql2, tp, jqn2, topk=topk,
                use_pallas=up, emit_counts=counts,
            )

        ms = t_queued(lambda: run_hot(50, hzw))
        print(f"HOT engine config: {ms:.1f} ms ({b * 1e3 / ms:.0f} qps)",
              flush=True)
        hs, hi = run_hot(50, hzw)
        bs_, bi_ = run_base(50, hzw)
        ok = np.allclose(np.asarray(hs), np.asarray(bs_), rtol=1e-5, atol=1e-6)
        same_ids = float((np.asarray(hi) == np.asarray(bi_)).mean())
        print(f"hot vs full-sweep: scores_close={ok} id_agree={same_ids:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
