"""Round-4 probe (VERDICT #7): int16 posT position planes vs f32 on the
1M mixed program — the one unpriced single-chip lever on the mixed wall.

The mixed program has a ~50 ms row-independent floor attributed to posT +
ft/fw streaming (FINDINGS session 6); positions are small ints stored as
f32 planes (body [960, 1M] = 3.58 GiB at 1M). quantize_posT stores them as
int16 (PAD16 encodes POS_BIG) and the kernel dequantizes per VMEM tile —
HALF the HBM bytes for the dominant stream, bitwise-identical scores.

Measures, same-day on the real 1M corpus:
  - mixed-128 (16 phrase rows) with f32 planes (round-3 control)
  - mixed-128 with int16 planes (the new default path)
  - ALL-phrase-128 both ways (the row-linear phrase cost regime)
Exactness: scores/ids bitwise-equal between the two.

Accept at >=15% on the mixed 128-batch (VERDICT r4 #7).

Run (needs .bench/corpus1000k): python experiments/post16_probe.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

import spaghettisearch_tpu.ops.kernels.mixed as mx
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

    # capture the f32 planes the quantizer sees so the control needs no
    # rebuild and no device->host fetch (both cost minutes at 1M)
    captured = []
    orig = mx.quantize_posT

    def cap(p):
        captured.append(p)
        return orig(p)

    mx.quantize_posT = cap
    try:
        t0 = time.perf_counter()
        idx = DeviceIndex.from_snapshot(snap)
    finally:
        mx.quantize_posT = orig
    print(f"device index in {time.perf_counter() - t0:.1f}s  "
          f"posT dtype={idx.body.posT.dtype}", flush=True)
    assert idx.body.posT.dtype == jnp.int16, "probe expects the i16 default"
    assert len(captured) == 2, len(captured)
    t32 = jnp.asarray(captured[0])
    b32 = jnp.asarray(captured[1])
    del captured

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
    print(f"batch: phrase rows={int((pn > 0).sum())}", flush=True)

    # ALL-phrase batch: every row gets a 2-term phrase from its keywords
    aph_ids = np.full((b, p), snap.n_words, np.int32)
    aph_valid = np.zeros((b, p), np.float32)
    apn = np.full(b, 2, np.int32)
    phq = [parse_query(q) for q in queries[128:256]]
    for i, pq in enumerate(phq):
        ids = snap.term_ids(pq.phrase_hashes or pq.keyword_hashes[:2])[:2]
        if len(ids) < 2:
            ids = (list(ids) + [0, 0])[:2]
        aph_ids[i, :2] = ids
        aph_valid[i, :2] = 1.0

    tp = jnp.zeros((b, idx.n_categories), jnp.float32)
    kw = dict(topk=50, use_pallas=pallas_available(),
              emit_counts=idx.has_zero_weight)

    def args(tpos, bpos, all_phrase=False):
        return dict(
            title_fwd=idx.title.fwd, body_fwd=idx.body.fwd,
            title_posT=tpos, body_posT=bpos,
            mag_title=idx.mag_title, mag_body=idx.mag_body,
            pagerank=idx.pagerank,
            term_ids=jnp.asarray(term_ids),
            query_len=jnp.asarray(qlen),
            topic_probs=tp,
            ph_ids=jnp.asarray(aph_ids if all_phrase else ph_ids),
            ph_valid=jnp.asarray(aph_valid if all_phrase else ph_valid),
            qn=jnp.asarray(qn),
            pn=jnp.asarray(apn if all_phrase else pn),
            qnb=jnp.asarray(qnb),
            hot_sids=jnp.asarray(hot_sids), hot_w=idx.hot_body_w,
            doc_map=idx.doc_perm,
        )

    runs = {
        "mixed-128 f32": (lambda a=args(t32, b32):
                          score_queries_mixed(**a, body_tmax=None, **kw)),
        "mixed-128 i16": (lambda a=args(idx.title.posT, idx.body.posT):
                          score_queries_mixed(**a, body_tmax=None, **kw)),
        "allph-128 f32": (lambda a=args(t32, b32, True):
                          score_queries_mixed(**a, body_tmax=None, **kw)),
        "allph-128 i16": (lambda a=args(idx.title.posT, idx.body.posT, True):
                          score_queries_mixed(**a, body_tmax=None, **kw)),
    }
    ms = {}
    for label, fn in runs.items():
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0][:, :1])
        print(f"{label}: compile+settle {time.perf_counter() - t0:.1f}s",
              flush=True)
        ms[label] = t_queued(fn)
        print(f"{label}: {ms[label]:.1f} ms queued", flush=True)

    for tag in ("mixed-128", "allph-128"):
        f, i = ms[f"{tag} f32"], ms[f"{tag} i16"]
        print(f"{tag}: f32 {f:.1f} -> i16 {i:.1f} ms  "
              f"({(f - i) / f * 100:+.1f}% saved)", flush=True)

    # exactness, both regimes: bitwise-equal scores and ids
    for tag in ("mixed-128", "allph-128"):
        sf, idf = (np.asarray(x) for x in runs[f"{tag} f32"]())
        si, idi = (np.asarray(x) for x in runs[f"{tag} i16"]())
        ok = (idf == idi).all() and np.array_equal(sf, si, equal_nan=True)
        print(f"exactness {tag}: {ok}", flush=True)
        assert ok
    db.close()


if __name__ == "__main__":
    main()
