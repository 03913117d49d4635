"""Round-3 probe: is there a real gap between the ENGINE's 1M keyword
program and the hand-fused probe program (session 7: 51.4 ms vs engine
~57 same-session-8)? Cross-day numbers can't tell (relay varies 15%) —
this runs both in one process, same day, same batch:

  - engine path: QueryEngine.rank_async on a keyword-only 128-batch
    (model.score_keywords -> ops/scoring.py score_queries_padded)
  - hand-fused: pallas_forward_scores_2sec(+hot, +finalize, +chunk-max
    top-50) in one jit with index arrays as ARGUMENTS (the
    phrase_delta_probe 'fused kw-only' config, doc_block=512, dynamic-T)

Run: python experiments/kw_gap_probe.py [n_docs]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.kernels.membership import pallas_forward_scores_2sec
from spaghettisearch_tpu.ops.scoring import (
    exact_top_k,
    finalize_scores,
    hot_body_scores,
    pallas_available,
)
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    root = ensure_bench_corpus(n)
    db, snap = load_bench_corpus(root)
    t0 = time.perf_counter()
    eng = QueryEngine(db, snapshot=snap)
    idx = eng.index
    print(f"device index in {time.perf_counter() - t0:.1f}s "
          f"doc_sort={idx.doc_perm is not None}", flush=True)
    assert pallas_available()

    queries = bench_queries(snap, 1024, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries if not parse_query(q).phrase_hashes]
    kw_batch = parsed[:128]

    def queued_engine(reps=3, inner=6):
        eng.rank_async(kw_batch).finish()
        eng.rank_async(kw_batch).finish()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            hs = [eng.rank_async(kw_batch) for _ in range(inner)]
            for h in hs:
                h.finish()
            best = min(best, (time.perf_counter() - t0) / inner)
        return best * 1e3

    a = queued_engine()
    print(f"engine kw-128 queued: {a:.1f} ms ({128e3 / a:.0f} qps)", flush=True)

    b, q = 128, 4
    hot_map = idx.hot_body_map
    term_ids, qlen, qn, qnb, hot_sids = QueryEngine._fill_keyword_rows(
        kw_batch, b, q, snap, hot_map
    )
    perm = np.lexsort((-qn, -qnb))
    term_ids, qlen, qn = term_ids[perm], qlen[perm], qn[perm]
    qnb, hot_sids = qnb[perm], hot_sids[perm]
    tp = jnp.zeros((b, idx.n_categories), jnp.float32)

    @jax.jit
    def fused(tftT, tfwT, bftT, bfwT, btmax, hot_w, magt, magb, pr, dperm,
              ti, ql, tpx, qnx, qnbx, hsx):
        ts, _, bs, _ = pallas_forward_scores_2sec(
            tftT, tfwT, bftT, bfwT,
            ti, qnx, doc_block=512, emit_counts=False, qnb=qnbx,
            body_tmax=btmax,
        )
        hot = hot_body_scores(hot_w, hsx)[:, : bs.shape[1]]
        bs = bs + hot
        tc = (ts + bs > 0).astype(ts.dtype)
        bc = jnp.zeros_like(tc)
        final = finalize_scores(ts, tc, bs, bc, magt, magb, pr, ql, tpx)
        return exact_top_k(final, 50, doc_map=dperm)

    idx_args = (
        idx.title.fwd.ftT, idx.title.fwd.fwT,
        idx.body.fwd.ftT, idx.body.fwd.fwT, idx.body.tmax_blocks,
        idx.hot_body_w, idx.mag_title, idx.mag_body, idx.pagerank,
        idx.doc_perm,
    )
    jargs = (jnp.asarray(term_ids), jnp.asarray(qlen), tp,
             jnp.asarray(qn), jnp.asarray(qnb), jnp.asarray(hot_sids))

    def queued_fused(reps=3, inner=6):
        np.asarray(fused(*idx_args, *jargs)[0][:, :1])
        np.asarray(fused(*idx_args, *jargs)[0][:, :1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fused(*idx_args, *jargs) for _ in range(inner)]
            np.asarray(outs[-1][0][:, :1])
            np.asarray(outs[0][0][:, :1])
            best = min(best, (time.perf_counter() - t0) / inner)
        return best * 1e3

    c = queued_fused()
    print(f"hand-fused kw-128 queued: {c:.1f} ms ({128e3 / c:.0f} qps)",
          flush=True)
    print(f"gap: {a - c:+.1f} ms ({(a - c) / a * 100:+.1f}%)", flush=True)

    # exactness: engine rows are in request order, fused rows in perm
    # order — undo the sort (inv = argsort(perm)) before comparing
    es, ei = eng.rank(kw_batch)
    fs, fi = fused(*idx_args, *jargs)
    inv = np.argsort(perm)
    fs, fi = np.asarray(fs)[inv], np.asarray(fi)[inv]
    print("ids_equal:", np.array_equal(np.asarray(ei), fi),
          "scores_close:", np.allclose(np.asarray(es), fs, rtol=1e-6),
          flush=True)


if __name__ == "__main__":
    main()
