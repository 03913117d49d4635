"""Round-3 probe: split a mixed 128-batch into (16-row mixed program +
128-row keyword program) at 1M docs.

The mixed kernel cannot take the q=3 dispatch level or the dynamic-T body
sweep (VMEM scheduling vs the posT stream — FINDINGS round 3), so at 1M it
runs ~95 ms/128-batch while the keyword program runs ~59. A serving mixed
batch (phrase_every=8) has only ~16 phrase rows: route those through the
ALREADY-WARMED (16, q) mixed program and the ~112 keyword rows through the
(128, q) keyword program (pad), merge rows on the host. Both programs are
in the live jit set — no new compile shapes, no extra settle.

Measures, same-day on the real corpus:
  - mixed-128 (today's single program)
  - mixed-16 alone, keyword-128 alone
  - split pair queued back-to-back (the serving regime)
Exactness: split row scores/ids vs the mixed-128 rows.

Run (needs .bench/corpus1000k): python experiments/split_probe.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.scoring import (
    pallas_available,
    score_queries_forward,
    score_queries_mixed,
)
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


def t_queued_pair(fa, fb, reps=8):
    a, b_ = fa(), fb()
    np.asarray(a[0][:, :1]), np.asarray(b_[0][:, :1])
    t0 = time.perf_counter()
    hs = [(fa(), fb()) for _ in range(reps)]
    np.asarray(hs[-1][1][0][:, :1])
    np.asarray(hs[0][0][0][:, :1])
    np.asarray(hs[0][1][0][:, :1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    root = ensure_bench_corpus(n)
    db, snap = load_bench_corpus(root)
    t0 = time.perf_counter()
    idx = DeviceIndex.from_snapshot(snap)
    print(f"device index in {time.perf_counter() - t0:.1f}s  "
          f"doc_sort={idx.doc_perm is not None}", flush=True)

    queries = bench_queries(snap, 256, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries[:128]]
    b, q, p = 128, 4, 16
    hot_map = idx.hot_body_map
    term_ids, qlen, qn, qnb, hot_sids = QueryEngine._fill_keyword_rows(
        parsed, b, q, snap, hot_map
    )
    ph_ids = np.full((b, p), snap.n_words, np.int32)
    ph_valid = np.zeros((b, p), np.float32)
    pn = np.zeros(b, np.int32)
    for i, pq in enumerate(parsed):
        pids = snap.term_ids(pq.phrase_hashes)[:p]
        ph_ids[i, : len(pids)] = pids
        ph_valid[i, : len(pids)] = 1.0
        pn[i] = len(pids)
    perm = np.lexsort((-qn, -qnb, -pn))
    term_ids, qlen, qn, pn = term_ids[perm], qlen[perm], qn[perm], pn[perm]
    qnb, hot_sids = qnb[perm], hot_sids[perm]
    ph_ids, ph_valid = ph_ids[perm], ph_valid[perm]
    n_ph = int((pn > 0).sum())
    print(f"batch: phrase rows={n_ph}", flush=True)
    assert n_ph <= 16

    tp = jnp.zeros((b, idx.n_categories), jnp.float32)
    kw = dict(topk=50, use_pallas=pallas_available(),
              emit_counts=idx.has_zero_weight)

    def mixed(rows):
        bb = len(rows)
        return dict(
            title_fwd=idx.title.fwd, body_fwd=idx.body.fwd,
            title_posT=idx.title.posT, body_posT=idx.body.posT,
            mag_title=idx.mag_title, mag_body=idx.mag_body,
            pagerank=idx.pagerank,
            term_ids=jnp.asarray(term_ids[rows]),
            query_len=jnp.asarray(qlen[rows]),
            topic_probs=tp[:bb], ph_ids=jnp.asarray(ph_ids[rows]),
            ph_valid=jnp.asarray(ph_valid[rows]), qn=jnp.asarray(qn[rows]),
            pn=jnp.asarray(pn[rows]), qnb=jnp.asarray(qnb[rows]),
            hot_sids=jnp.asarray(hot_sids[rows]), hot_w=idx.hot_body_w,
            doc_map=idx.doc_perm,
        )

    all_rows = np.arange(b)
    args128 = mixed(all_rows)
    run128 = lambda: score_queries_mixed(**args128, body_tmax=None, **kw)

    ph_rows = np.arange(16)  # phrase-first sort puts them up front
    args16 = mixed(ph_rows)
    run16 = lambda: score_queries_mixed(**args16, body_tmax=None, **kw)

    # keyword rows padded back to the warmed 128 width (sentinel rows)
    kw_rows = np.arange(16, b)
    pad = b - len(kw_rows)
    sel = np.concatenate([kw_rows, np.zeros(pad, np.int64)])
    tk = np.asarray(term_ids[sel])
    tk[len(kw_rows):] = snap.n_words  # sentinel: empty rows
    qk = np.asarray(qn[sel]); qk[len(kw_rows):] = 0
    qbk = np.asarray(qnb[sel]); qbk[len(kw_rows):] = 0
    hk = np.asarray(hot_sids[sel]); hk[len(kw_rows):] = -1  # -1 = hot pad
    kwargs = dict(
        term_ids=jnp.asarray(tk), query_len=jnp.asarray(qlen[sel]),
        topic_probs=tp, qn=jnp.asarray(qk), qnb=jnp.asarray(qbk),
        hot_sids=jnp.asarray(hk),
    )
    runkw = lambda: score_queries_forward(
        idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
        idx.pagerank, kwargs["term_ids"], kwargs["query_len"],
        kwargs["topic_probs"], kwargs["qn"], topk=50,
        use_pallas=pallas_available(), emit_counts=idx.has_zero_weight,
        qnb=kwargs["qnb"], hot_sids=kwargs["hot_sids"], hot_w=idx.hot_body_w,
        body_tmax=idx.body.tmax_blocks, doc_map=idx.doc_perm,
    )

    for label, fn in (("mixed-128", run128), ("mixed-16", run16),
                      ("keyword-128", runkw)):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0][:, :1])
        print(f"{label}: compile+settle {time.perf_counter() - t0:.1f}s",
              flush=True)
        ms = t_queued(fn)
        print(f"{label}: {ms:.1f} ms queued", flush=True)

    ms = t_queued_pair(run16, runkw)
    print(f"SPLIT pair: {ms:.1f} ms / effective 128-batch "
          f"({b * 1e3 / ms:.0f} qps)", flush=True)

    # exactness: split rows == mixed-128 rows
    s128, i128 = (np.asarray(x) for x in run128())
    s16, i16 = (np.asarray(x) for x in run16())
    skw, ikw = (np.asarray(x) for x in runkw())
    ok_ph = (i128[:16] == i16).all() and np.allclose(s128[:16], s16, rtol=1e-6)
    nk = len(kw_rows)
    ok_kw = (i128[16:] == ikw[:nk]).all() and np.allclose(
        s128[16:], skw[:nk], rtol=1e-6, equal_nan=True)
    print(f"exactness: phrase_rows={ok_ph}  keyword_rows={ok_kw}", flush=True)
    db.close()


if __name__ == "__main__":
    main()
