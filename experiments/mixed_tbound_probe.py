"""Round-3 probe: dynamic-T body sweep in the MIXED kernel at 1M docs.

tbound_probe.py measured the doc-sorted dynamic-T trick on the KEYWORD
membership kernel (68.6 -> 43.4 ms/128-batch at tc=32). The mixed kernel
shares the body keyword sweep but is VMEM-scheduling sensitive (the q=3
level that bought 6 ms on the keyword kernels regressed mixed 44 -> 59 ms
at 100k — FINDINGS). This measures, on the REAL 1M corpus and the real
TPU, the full engine-config mixed program (topk=50, hot split, counts as
configured, phrase_every=8 serving mix):

  - static:  score_queries_mixed, body_tmax=None (current production)
  - dynamic: score_queries_mixed, body_tmax=idx.body.tmax_blocks

Same doc-sorted layout both ways, same-day control. Exactness: top-50
ids/scores static vs dynamic.

Run (needs .bench/corpus1000k): python experiments/mixed_tbound_probe.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
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
    force_natural = "natural" in sys.argv
    idx = DeviceIndex.from_snapshot(snap, doc_sort=not force_natural)
    print(f"device index in {time.perf_counter() - t0:.1f}s  "
          f"doc_sort={idx.doc_perm is not None}  pos_dense={idx.pos_dense}",
          flush=True)
    assert idx.pos_dense
    assert force_natural or (
        idx.doc_perm is not None and idx.body.tmax_blocks is not None
    )

    if idx.body.tmax_blocks is not None:
        tmax_np = np.asarray(idx.body.tmax_blocks)
        tb = idx.body.fwd.ftT.shape[0]
        print(f"body T_pad={tb}  tmax mean={tmax_np.mean():.1f} "
              f"max={tmax_np.max()}  swept_frac(tc=32)="
              f"{(np.ceil(tmax_np / 32) * 32).mean() / tb:.3f}", flush=True)

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
    print(f"batch: pn>0 rows={int((pn > 0).sum())}  "
          f"qnb hist={np.bincount(qnb, minlength=q + 1).tolist()}", flush=True)

    tp = jnp.zeros((b, idx.n_categories), jnp.float32)
    args = dict(
        title_fwd=idx.title.fwd, body_fwd=idx.body.fwd,
        title_posT=idx.title.posT, body_posT=idx.body.posT,
        mag_title=idx.mag_title, mag_body=idx.mag_body,
        pagerank=idx.pagerank,
        term_ids=jnp.asarray(term_ids), query_len=jnp.asarray(qlen),
        topic_probs=tp, ph_ids=jnp.asarray(ph_ids),
        ph_valid=jnp.asarray(ph_valid), qn=jnp.asarray(qn),
        pn=jnp.asarray(pn), qnb=jnp.asarray(qnb),
        hot_sids=jnp.asarray(hot_sids), hot_w=idx.hot_body_w,
        doc_map=idx.doc_perm,
    )
    kw = dict(topk=50, use_pallas=pallas_available(),
              emit_counts=idx.has_zero_weight)

    outs = {}
    variants = [("static-256", None, 256)]
    if idx.body.tmax_blocks is not None:
        variants += [
            ("dynamic-256", idx.body.tmax_blocks, 256),
            # doc_block=512 halves the grid (query-tile re-reads) but doubles
            # every VMEM tile; dynamic-T keeps the body sweep chunked via
            # refs, which may fit where the static kernel blew VMEM
            ("dynamic-512", idx.body.tmax_blocks, 512),
            ("static-512", None, 512),
        ]
    for label, btm, dblk in variants:
        t0 = time.perf_counter()
        try:
            out = score_queries_mixed(
                **args, body_tmax=btm, doc_block=dblk, **kw)
            np.asarray(out[0][:, :1])
        except Exception as e:  # Mosaic VMEM overflow is data, not failure
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"{label}: compile+settle {time.perf_counter() - t0:.1f}s",
              flush=True)
        ms = t_queued(lambda btm=btm, dblk=dblk: score_queries_mixed(
            **args, body_tmax=btm, doc_block=dblk, **kw))
        print(f"{label}: {ms:.1f} ms/128-batch ({b * 1e3 / ms:.0f} qps)",
              flush=True)
        outs[label] = (np.asarray(out[0]), np.asarray(out[1]))

    ss, si = outs.get("static-256", (None, None))
    for label, (ds, di) in outs.items():
        if label == "static-256" or ss is None:
            continue
        finite = np.isfinite(ss) & np.isfinite(ds)
        rel = np.where(
            finite, np.abs(ds - ss) / np.maximum(np.abs(ss), 1e-9), 0.0
        )
        inf_agree = bool((np.isfinite(ss) == np.isfinite(ds)).all())
        print(f"exactness[{label}]: id_agree={(si == di).mean():.4f}  "
              f"score_max_rel={rel.max():.2e}  inf_agree={inf_agree}",
              flush=True)
    db.close()


if __name__ == "__main__":
    main()
