"""Round-3 probe: does the doc-sorted dynamic-T sweep pay at the 100k
headline tier?

doc_sort is auto-on only at >= 256k padded docs (DOC_SORT_MIN_DOCS): at
1M it cut the keyword membership program 68.6 -> 43.4 ms. The 100k
headline (256-batch, topk=10, 18.3 ms/batch queued = 14.6k qps) still
sweeps the static T_pad. This replicates bench_headline's exact program
(same corpus, query mix, queued 20-batch timing) against a forced
doc_sort=True index and reports the same-day delta plus top-k agreement
(ties normalize to (score desc, natural id asc) under doc_map).

Run: python experiments/headline_tbound_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.scoring import pallas_available, score_queries_forward
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex


def main():
    root = ensure_bench_corpus()
    _db, snap = load_bench_corpus(root)
    _db.close()
    batch, q, topk, n_batches = 256, 4, 10, 20

    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(
        np.float64
    )
    p = df / df.sum()
    term_batches = []
    for _ in range(n_batches):
        ks = rng.integers(1, q + 1, batch)
        ks[::-1].sort()
        tids = np.full((batch, q), snap.n_words, np.int32)
        for i, k in enumerate(ks):
            tids[i, :k] = rng.choice(snap.n_words, size=int(k), p=p)
        term_batches.append(
            (jnp.asarray(tids), jnp.asarray(ks.astype(np.int32)),
             jnp.asarray(ks.astype(np.float32)))
        )

    use_pallas = pallas_available()
    outs_by = {}
    for label, ds in (("natural", False), ("doc_sort", True)):
        idx = DeviceIndex.from_snapshot(snap, doc_sort=ds)
        tp = jnp.zeros((batch, idx.n_categories), jnp.float32)
        extra = {}
        if ds:
            assert idx.doc_perm is not None
            tm = np.asarray(idx.body.tmax_blocks)
            tb = idx.body.fwd.ftT.shape[0]
            print(f"doc_sort: T_pad={tb} tmax mean={tm.mean():.1f} "
                  f"swept_frac(tc=32)="
                  f"{(np.ceil(tm / 32) * 32).mean() / tb:.3f}", flush=True)
            extra = dict(body_tmax=idx.body.tmax_blocks, doc_map=idx.doc_perm)

        def run(tb_, idx=idx, tp=tp, extra=extra):
            tids, qn, qlen = tb_
            return score_queries_forward(
                idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
                idx.pagerank, tids, qlen, tp, qn, topk=topk,
                use_pallas=use_pallas, emit_counts=idx.has_zero_weight,
                **extra,
            )

        np.asarray(run(term_batches[0])[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run(t) for t in term_batches]
            jax.block_until_ready(outs)
            np.asarray(outs[-1][0])
            best = min(best, time.perf_counter() - t0)
        qps = n_batches * batch / best
        print(f"{label}: {best / n_batches * 1e3:.2f} ms/batch "
              f"({qps:.0f} qps)", flush=True)
        outs_by[label] = [
            (np.asarray(s), np.asarray(i)) for s, i in (run(t) for t in term_batches)
        ]
        del idx

    agree = np.mean([
        (a[1] == b[1]).mean()
        for a, b in zip(outs_by["natural"], outs_by["doc_sort"])
    ])
    rel = max(
        float(np.abs(a[0] - b[0]).max() / max(np.abs(a[0]).max(), 1e-9))
        for a, b in zip(outs_by["natural"], outs_by["doc_sort"])
    )
    print(f"id_agree={agree:.4f}  score_max_rel={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
