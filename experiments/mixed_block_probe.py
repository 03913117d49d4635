"""Mixed-kernel block sweep on the real TPU: doc_block x b_block for the
fused keyword+phrase kernel at the 100k serving shapes. The production
doc_block=256 was picked conservatively for VMEM (posT tiles share it with
the keyword sweep); this measures whether 512 (the keyword kernels' block)
or a different b_block wins.

Run: python experiments/mixed_block_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.kernels.mixed import pallas_mixed_scores_2sec
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def main():
    root = ensure_bench_corpus()
    db, snap = load_bench_corpus(root)
    eng = QueryEngine(db, snapshot=snap)
    idx = eng.index
    assert idx.pos_dense
    queries = bench_queries(snap, 256, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries[:128]]

    b, q, p = 128, 4, 16
    term_ids = np.full((b, q), snap.n_words, np.int32)
    qn = np.zeros(b, np.int32)
    ph_ids = np.full((b, p), snap.n_words, np.int32)
    ph_valid = np.zeros((b, p), np.float32)
    pn = np.zeros(b, np.int32)
    for i, pq in enumerate(parsed):
        ids = snap.term_ids(pq.keyword_hashes)[:q]
        term_ids[i, : len(ids)] = ids
        qn[i] = len(ids)
        pids = snap.term_ids(pq.phrase_hashes)[:p]
        ph_ids[i, : len(pids)] = pids
        ph_valid[i, : len(pids)] = 1.0
        pn[i] = len(pids)
    perm = np.lexsort((-qn, -pn))
    term_ids, qn, ph_ids, ph_valid, pn = (
        term_ids[perm], qn[perm], ph_ids[perm], ph_valid[perm], pn[perm]
    )
    args = [jnp.asarray(x) for x in (term_ids, qn, ph_ids, ph_valid, pn)]
    kw = dict(emit_counts=idx.has_zero_weight)

    import itertools
    combos = [(256, 8), (512, 8)]  # each config pays a 100-440 s relay
    # settle; (512, 16) crashes Mosaic, (256, 16) adds nothing over 8
    for doc_block, b_block in combos:
        if True:
            label = f"doc_block={doc_block} b_block={b_block}"
            try:
                def run():
                    return pallas_mixed_scores_2sec(
                        idx.title.fwd.ftT, idx.title.fwd.fwT,
                        idx.body.fwd.ftT, idx.body.fwd.fwT,
                        idx.title.posT, idx.body.posT,
                        *args, doc_block=doc_block, b_block=b_block, **kw,
                    )

                # relay: block_until_ready under-reports — queue N
                # dispatches then fetch one scalar (FINDINGS round 2)
                float(run()[0][0, 0])  # compile + settle
                float(run()[0][0, 0])
                reps = 10
                t0 = time.perf_counter()
                outs = [run() for _ in range(reps)]
                float(outs[-1][0][0, 0])
                dt = (time.perf_counter() - t0) / reps

                # queued timing can bottom out at the relay's per-dispatch
                # floor (scorer_split_probe) — chain reps inside ONE jit
                # with a data-dependent carry for the true device time
                @jax.jit
                def chained():
                    def body(carry, _):
                        bump = (carry // jnp.float32(1e30)).astype(jnp.int32)
                        ts, tc, bs, bc = pallas_mixed_scores_2sec(
                            idx.title.fwd.ftT, idx.title.fwd.fwT,
                            idx.body.fwd.ftT, idx.body.fwd.fwT,
                            idx.title.posT, idx.body.posT,
                            args[0] + bump, *args[1:],
                            doc_block=doc_block, b_block=b_block, **kw,
                        )
                        return ts[0, 0], ts[0, 0]

                    _, outs = jax.lax.scan(
                        body, jnp.float32(0), None, length=reps)
                    return outs

                jax.block_until_ready(chained())
                t0 = time.perf_counter()
                jax.block_until_ready(chained())
                dt_c = (time.perf_counter() - t0) / reps
                print(f"{label}: queued {dt * 1e3:.1f} ms  "
                      f"chained {dt_c * 1e3:.1f} ms", flush=True)
            except Exception as e:  # noqa: BLE001 — Mosaic limits expected
                print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
    db.close()


if __name__ == "__main__":
    main()
