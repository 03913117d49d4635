"""Round-3 probe: where do the 313 ms of a mixed 128-batch go?

Splits engine.rank's mixed path into stages on the real TPU:
  A. end-to-end rank() on a mixed batch (baseline)
  B. matcher dispatch+device time only (no compression fetch)
  C. compression + packed fetch
  D. host repack + fold-array upload
  E. scorer dispatch + ranked fetch
Run: python experiments/mixed_stage_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from bench import load_bench_corpus, ensure_bench_corpus, bench_queries
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def t(fn, reps=5):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    root = ensure_bench_corpus()
    db, snap = load_bench_corpus(root)
    eng = QueryEngine(db, snapshot=snap)
    print("index on device; warming ...", flush=True)
    eng.warmup()
    queries = bench_queries(snap, 256, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries[:128]]
    n_ph = sum(1 for p in parsed if p.phrase_hashes)
    print(f"batch: 128 queries, {n_ph} with phrases")

    # A: end-to-end
    a = t(lambda: eng.rank(parsed))
    print(f"A rank() mixed 128-batch: {a:.1f} ms")

    kw_only = [p for p in parsed if not p.phrase_hashes]
    kw_batch = (kw_only * 3)[:128]
    akw = t(lambda: eng.rank(kw_batch))
    print(f"A' rank() keyword-only 128-batch: {akw:.1f} ms")

    # B: matcher only, dispatch + block (pre-host-compress path): call
    # _match_phrases_fixed but time only until the device results exist.
    ph_rows = [p.phrase_hashes for p in parsed if p.phrase_hashes]

    def matcher_full():
        out = eng._match_phrases_batch(ph_rows)
        return out

    b = t(matcher_full)
    print(f"B matcher+compress+fetch ({len(ph_rows)} phrases): {b:.1f} ms")

    # C: rank() with phrases stripped to measure keyword+scorer cost of the
    # same batch (phrase fold absent) is A'; the fold-bearing scorer:
    matches = matcher_full()
    import spaghettisearch_tpu.retrieval.engine as E

    idx = eng.index
    e_real = max((int((m[0] < idx.n_docs).sum()) for m in matches), default=1)
    levels = E._e_levels(idx.n_docs)
    e = next(lvl for lvl in levels if e_real <= lvl)
    print(f"e_real={e_real} -> e level {e}")

    # D+E: host repack + upload + scorer with fold, measured via rank() on a
    # phrase-parsed batch where we intercept; simpler: time a second rank()
    # run (cache warm) minus matcher time:
    print(f"residual (A - A' - B) ~= fold repack+upload+scorer delta: {a - akw - b:.1f} ms")

    # how big are matcher group dispatches alone (async, no fetch)?
    import jax.numpy as jnp

    snapm, idxm = eng.snapshot, eng.index
    from spaghettisearch_tpu.ops.phrase import match_phrase_fwd_batch

    t_w, b_w = eng._phrase_weights(idxm)
    caps = E._cap_levels(idxm.posting_cap)
    for cap in caps:
        for bp in (4, 16):
            ids = np.full((bp, 4), snapm.n_words, np.int32)
            valid = np.zeros((bp, 4), bool)
            gens = np.zeros(bp, np.int32)
            # real terms with df near the cap level
            df = (
                np.diff(np.asarray(snapm.body.post_offsets[: snapm.n_words + 1]))
            )
            cand = np.flatnonzero((df > cap // 4) & (df <= cap))
            if not cand.size:
                cand = np.flatnonzero(df > 0)
            w0 = int(cand[0])
            ids[:, :2] = [w0, int(cand[min(1, len(cand) - 1)])]
            valid[:, :2] = True

            def run(ids=ids, valid=valid, gens=gens, cap=cap):
                r = match_phrase_fwd_batch(
                    idxm.title.fwd.ft, idxm.title.fwd.fj, t_w,
                    idxm.title.pos_offsets, idxm.title.positions,
                    idxm.body.fwd.ft, idxm.body.fwd.fj, b_w,
                    idxm.body.pos_offsets, idxm.body.positions,
                    idxm.title.offsets, idxm.title.doc_ids,
                    idxm.body.offsets, idxm.body.doc_ids,
                    jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(gens),
                    idxm.title.pos_mat, idxm.body.pos_mat,
                    posting_cap=cap, pos_cap=idxm.pos_cap, n_docs=idxm.n_docs,
                )
                jax.block_until_ready(r)

            ms = t(run, reps=3)
            print(f"  matcher cap={cap} bp={bp}: {ms:.1f} ms (block_until_ready)")


if __name__ == "__main__":
    main()
