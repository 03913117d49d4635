"""Round-3 probe: tmax-bounded PHRASE-stage body sweeps at 1M docs.

The mixed kernel's phrase stage costs ~2.9 ms per phrase row at 1M
(segregate_probe): each phrase term sweeps the full static body T
(plus C position planes) per doc block. The doc-sorted layout's
per-block body_tmax (mean ~0.64 of T_pad on the 1M bench corpus) is
already exploited by the keyword kernels but was NEVER applied to the
phrase stage — and the keyword-stage bound inside the MIXED kernel is
known to regress (VMEM vs the posT stream, FINDINGS session 6). This
prices tmax_stage="phrase" (kernels/mixed.py _phrase_term_stage_ref):
keyword sweep static, phrase body sweeps bounded.

Measures, same-day on the real 1M corpus (no engine warmup — only the
(128, q) mixed program per variant is compiled + settled by the timing
warmup itself):
  - mixed 128-batch (16 phrases): static control vs phrase-tc16/tc32
  - ALL-phrase 128-batch: static control vs phrase-tc16/tc32
  - exactness: top-50 (scores, ids) equality vs the static control

Run (needs .bench/corpus1000k): python experiments/phrase_tmax_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.models.blended import BlendedRanker
from spaghettisearch_tpu.ops import scoring as _scoring
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

TMAX_STAGE = None  # monkeypatch knob: None = static control
TC = 16


def score_mixed_probe(self, index, term_ids, qlen, topic_probs,
                      ph_ids, ph_valid, topk=None, qn=None, pn=None,
                      qnb=None, hot_sids=None):
    k = min(topk or self.topk, index.n_docs) or 1
    qnb, hot_sids, hot_w = self._hot_args(index, term_ids, qn, qnb, hot_sids)
    body_tmax = index.body.tmax_blocks if TMAX_STAGE else None
    kw = {} if TMAX_STAGE is None else {"tmax_stage": TMAX_STAGE, "tc": TC}
    return _scoring.score_queries_mixed(
        index.title.fwd, index.body.fwd,
        index.title.posT, index.body.posT,
        index.mag_title, index.mag_body, index.pagerank,
        term_ids, qlen, topic_probs, ph_ids, ph_valid, qn, pn,
        qnb, hot_sids, hot_w, index.doc_perm, body_tmax,
        topk=k, use_pallas=_scoring.pallas_available(),
        emit_counts=index.has_zero_weight, **kw,
    )


def queued(eng, batch, reps=3, inner=6):
    h = eng.rank_async(batch)
    out = h.finish()  # compile + settle
    eng.rank_async(batch).finish()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        hs = [eng.rank_async(batch) for _ in range(inner)]
        for h in hs:
            h.finish()
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3, out


def main():
    global TMAX_STAGE, TC
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    root = ensure_bench_corpus(n)
    db, snap = load_bench_corpus(root)
    t0 = time.perf_counter()
    eng = QueryEngine(db, snapshot=snap)
    idx = eng.index
    print(f"device index in {time.perf_counter() - t0:.1f}s; "
          f"fused={eng.model.supports_mixed(idx)} "
          f"doc_sorted={idx.doc_perm is not None} "
          f"tmax_blocks={'yes' if idx.body.tmax_blocks is not None else 'NO'}",
          flush=True)
    assert idx.body.tmax_blocks is not None, "doc_sort off: probe is moot"
    BlendedRanker.score_mixed = score_mixed_probe

    queries = bench_queries(snap, 1024, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries]
    mixed = parsed[:128]
    ph = [p for p in parsed if p.phrase_hashes]
    allph = (ph * ((127 + len(ph)) // len(ph)))[:128]
    n_ph = sum(1 for p in mixed if p.phrase_hashes)

    results = {}
    for label, batch in (("mixed16", mixed), ("allph", allph)):
        for stage, tc in ((None, 16), ("phrase", 16), ("phrase", 32)):
            TMAX_STAGE, TC = stage, tc
            tag = f"{label}/{'static' if stage is None else f'{stage}-tc{tc}'}"
            try:
                ms, out = queued(eng, batch)
            except Exception as e:  # Mosaic compile cliffs are a result too
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
                continue
            results[tag] = (ms, out)
            print(f"{tag}: {ms:.1f} ms/128-batch ({128e3 / ms:.0f} qps)",
                  flush=True)
        base = results.get(f"{label}/static")
        if base:
            for k, (ms, out) in results.items():
                if k.startswith(label) and not k.endswith("static"):
                    s_eq = np.array_equal(np.asarray(base[1][0]), np.asarray(out[0]))
                    i_eq = np.array_equal(np.asarray(base[1][1]), np.asarray(out[1]))
                    print(f"  {k}: scores_bitwise={s_eq} ids_equal={i_eq}",
                          flush=True)
    print(f"(mixed batch carries {n_ph} phrase rows)", flush=True)


if __name__ == "__main__":
    main()
