"""Round-3 probe: LEAN phrase-delta kernel + fully-leveled keyword kernel
as ONE jit program, vs today's monolithic mixed kernel, at 1M docs.

Why the split might win where split_probe.py's program-pair split lost:
the mixed-16 program there still paid the whole mixed kernel — keyword
emit bodies forcing doc_block=256, pow2-only q levels, no dynamic-T — a
~50 ms row-count-independent floor. A kernel that does ONLY the phrase
stage (_phrase_block: membership sweep over the ≤3 phrase terms + the
positional chain) has tiny VMEM pressure, so it can stream posT at
doc_block=512 and leave the keyword work to pallas_forward_scores_2sec
with ALL its levels (q=3 dispatch, dynamic-T body sweep, hot-term matmul,
doc_block=512). Both kernels live in one jit with finalize+top-k, so a
mixed batch stays ONE dispatch + ONE packed fetch.

Measures, same-day on the real 1M corpus:
  - mixed-128 (today's single program, the control)
  - keyword-only fused tail (isolates the phrase-delta add)
  - split fused program at phrase doc_block {256, 512}
Exactness: split scores/ids vs mixed-128 for all 128 rows.

Run (needs .bench/corpus1000k): python experiments/phrase_delta_probe.py [n]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.kernels.membership import (
    pallas_forward_scores_2sec,
)
from spaghettisearch_tpu.ops.kernels.mixed import _phrase_block
from spaghettisearch_tpu.ops.scoring import (
    exact_top_k,
    finalize_scores,
    hot_body_scores,
    pallas_available,
    score_queries_mixed,
)
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def _kernel_phrase_delta(
    pn_ref, ph_ref, phv_ref, tft_ref, tfw_ref, bft_ref, bfw_ref,
    tposT_ref, bposT_ref, *refs, b_block: int, ct: int, cb: int,
    emit_flag: bool,
):
    n_out = 3 if emit_flag else 2
    out_refs = refs[:n_out]
    chain_t_ref, chain_b_ref = refs[n_out], refs[n_out + 1]
    tft = tft_ref[:]
    tfw = tfw_ref[:]
    bft = bft_ref[:]
    bfw = bfw_ref[:]
    tposT = tposT_ref[:]
    bposT = bposT_ref[:]

    def b_body(bi, _):
        row = bi * b_block
        ph = ph_ref[pl.ds(row, b_block), :]
        phv = phv_ref[pl.ds(row, b_block), :]
        # all-pad blocks (pn == 0) run zero mem-loop trips and skip the
        # chain pl.when; outputs still get written (zeros) every grid step
        t_ok, sum_tw, b_ok, sum_bw = _phrase_block(
            tft, tfw, bft, bfw, tposT, bposT, ph, phv, pn_ref[bi],
            ct, cb, chain_t_ref, chain_b_ref,
        )
        out_refs[0][pl.ds(row, b_block), :] = jnp.where(t_ok, sum_tw, 0.0)
        out_refs[1][pl.ds(row, b_block), :] = jnp.where(b_ok, sum_bw, 0.0)
        if emit_flag:
            out_refs[2][pl.ds(row, b_block), :] = (t_ok | b_ok).astype(
                jnp.float32
            )
        return 0

    jax.lax.fori_loop(0, ph_ref.shape[0] // b_block, b_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("doc_block", "b_block", "emit_flag", "interpret"),
)
def pallas_phrase_delta(
    title_ftT, title_fwT, body_ftT, body_fwT, title_posT, body_posT,
    ph_ids, ph_valid, pn,
    *, doc_block: int = 512, b_block: int = 8, emit_flag: bool = False,
    interpret: bool = False,
):
    """Phrase-only additive contributions: (add_t, add_b[, flag]) [B, D]."""
    tt, d = title_ftT.shape
    tb = body_ftT.shape[0]
    ct = title_posT.shape[0] // tt
    cb = body_posT.shape[0] // tb
    b, p = ph_ids.shape
    assert d % doc_block == 0 and b % b_block == 0
    pn_blocks = jnp.clip(
        pn.reshape(b // b_block, b_block).max(axis=1), 0, p
    ).astype(jnp.int32)
    kernel = functools.partial(
        _kernel_phrase_delta, b_block=b_block, ct=ct, cb=cb,
        emit_flag=emit_flag,
    )
    n_out = 3 if emit_flag else 2
    out = pl.pallas_call(
        kernel,
        grid=(d // doc_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct * tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb * tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[jax.ShapeDtypeStruct((b, d), jnp.float32)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((b_block, doc_block), jnp.float32),
            pltpu.VMEM((b_block, doc_block), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(pn_blocks, ph_ids, ph_valid, title_ftT, title_fwT, body_ftT,
      body_fwT, title_posT, body_posT)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    bp = 16  # phrase-row budget (batch sorted phrase-first)
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
    assert n_ph <= bp

    tp = jnp.zeros((b, idx.n_categories), jnp.float32)
    kw = dict(topk=50, use_pallas=pallas_available(),
              emit_counts=idx.has_zero_weight)
    assert not idx.has_zero_weight, "probe assumes the count-elided regime"

    args128 = dict(
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
    run128 = lambda: score_queries_mixed(**args128, body_tmax=None, **kw)

    # every index array is an explicit jit ARGUMENT: closing over them
    # bakes 3.35+ GB of constants into the remote-compile payload, which
    # breaks the relay's compile pipe (measured: Broken pipe os error 32)
    @functools.partial(
        jax.jit, static_argnames=("ph_db", "with_phrase", "bpx"))
    def fused(tftT, tfwT, bftT, bfwT, tposT, bposT, btmax, hot_w,
              magt, magb, pr, dperm,
              ti, ql, tpx, qnx, qnbx, hsx, phi, phv, pnx, ph_db, with_phrase,
              bpx=bp):
        ts, _, bs, _ = pallas_forward_scores_2sec(
            tftT, tfwT, bftT, bfwT,
            ti, qnx, doc_block=512, emit_counts=False, qnb=qnbx,
            body_tmax=btmax,
        )
        if with_phrase:
            at, ab = pallas_phrase_delta(
                tftT, tfwT, bftT, bfwT, tposT, bposT,
                phi[:bpx], phv[:bpx], pnx[:bpx], doc_block=ph_db,
            )
            ts = ts.at[:bpx].add(at)
            bs = bs.at[:bpx].add(ab)
        hot = hot_body_scores(hot_w, hsx)[:, : bs.shape[1]]
        bs = bs + hot
        tc = (ts + bs > 0).astype(ts.dtype)
        bc = jnp.zeros_like(tc)
        final = finalize_scores(ts, tc, bs, bc, magt, magb, pr, ql, tpx)
        return exact_top_k(final, 50, doc_map=dperm)

    idx_args = (
        idx.title.fwd.ftT, idx.title.fwd.fwT,
        idx.body.fwd.ftT, idx.body.fwd.fwT,
        idx.title.posT, idx.body.posT, idx.body.tmax_blocks,
        idx.hot_body_w, idx.mag_title, idx.mag_body, idx.pagerank,
        idx.doc_perm,
    )

    jti = jnp.asarray(term_ids)
    jql = jnp.asarray(qlen)
    jqn = jnp.asarray(qn)
    jqnb = jnp.asarray(qnb)
    jhs = jnp.asarray(hot_sids)
    jphi = jnp.asarray(ph_ids)
    jphv = jnp.asarray(ph_valid)
    jpn = jnp.asarray(pn)

    def t_queued(fn, reps=8):
        out = fn()
        np.asarray(out[0][:, :1])
        t0 = time.perf_counter()
        hs = [fn() for _ in range(reps)]
        np.asarray(hs[-1][0][:, :1])
        np.asarray(hs[0][0][:, :1])
        return (time.perf_counter() - t0) / reps * 1e3

    runs = [("mixed-128 (control)", run128),
            ("fused kw-only", lambda: fused(
                *idx_args,
                jti, jql, tp, jqn, jqnb, jhs, jphi, jphv, jpn, 512, False))]
    d_pad = idx.title.fwd.ftT.shape[1]
    for ph_db in (256, 512, 1024):
        if d_pad % ph_db:
            continue
        runs.append((f"fused split ph_db={ph_db}", lambda ph_db=ph_db: fused(
            *idx_args,
            jti, jql, tp, jqn, jqnb, jhs, jphi, jphv, jpn, ph_db, True)))
    # full-width delta (pad rows skip via the zero-trip block path): the
    # integration shape — ONE static width keeps the live program space flat
    runs.append(("fused split ph_db=512 bp=128", lambda: fused(
        *idx_args,
        jti, jql, tp, jqn, jqnb, jhs, jphi, jphv, jpn, 512, True, bpx=b)))

    results = {}
    for label, fn in runs:
        t0 = time.perf_counter()
        try:
            out = fn()
            np.asarray(out[0][:, :1])
        except Exception as e:  # Mosaic VMEM cliffs show up as compile errors
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"{label}: compile+settle {time.perf_counter() - t0:.1f}s",
              flush=True)
        ms = t_queued(fn)
        results[label] = (ms, out)
        print(f"{label}: {ms:.1f} ms queued ({b * 1e3 / ms:.0f} qps)",
              flush=True)

    # exactness: fused split rows == mixed-128 rows
    s128, i128 = (np.asarray(x) for x in run128())
    for label, (ms, out) in results.items():
        if "split" not in label:
            continue
        s, i = (np.asarray(x) for x in out)
        ok = (i == i128).all() and np.allclose(
            s, s128, rtol=1e-6, equal_nan=True)
        nid = int((i != i128).sum())
        print(f"{label}: exact={ok} (id diffs {nid}, "
              f"score max rel "
              f"{np.nanmax(np.abs(s - s128) / np.maximum(np.abs(s128), 1e-30)):.2e})",
              flush=True)
    db.close()


if __name__ == "__main__":
    main()
