"""Probe: unique-term factorized scoring (VPU compare vs unique batch terms
once + MXU fan-out to queries) vs the dense per-query membership scan.

score[b,d] = sum_u M[b,u] * E[d,u],  E[d,u] = sum_t fw[d,t]*[ft[d,t]==U[u]]

The dense scan compares every forward element against every query's terms
(cost B*Q per element); this compares against the batch's UNIQUE terms
(cost U per element) and lets the MXU apply per-query multiplicities M.
With Zipf-distributed workloads hot terms repeat across the batch: U << B*Q.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from bench import synth_snapshot
from spaghettisearch_tpu.ops.scoring import (
    exact_top_k,
    pallas_available,
    score_queries_forward,
)
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex


@partial(jax.jit, static_argnames=("topk", "n_doc_block"))
def score_unique_terms(
    title_ft, title_fw,  # [Dp, Tt]
    body_ft, body_fw,  # [Dp, Tb]
    mag_title, mag_body,  # [Dp]
    pagerank,  # [Dp, C]
    uterms,  # i32 [U] unique batch terms (pad -2: matches nothing)
    mult,  # f32 [U, B] multiplicity of term u in query b
    query_len,  # f32 [B]
    topic_probs,  # f32 [B, C]
    *,
    topk: int,
    n_doc_block: int = 128,
):
    dp = title_ft.shape[0]
    b = mult.shape[1]
    m = dp // n_doc_block

    def block(args):
        tft, tfw, bft, bfw, mt, mb, pr = args  # [Db, T*] / [Db] / [Db, C]

        def section(ft, fw):
            eq = ft[:, :, None] == uterms[None, None, :]  # [Db, T, U]
            e = jnp.where(eq, fw[:, :, None], 0.0).sum(1)  # [Db, U]
            c = eq.sum(1).astype(jnp.float32)  # [Db, U]
            es = jax.lax.dot_general(
                e, mult, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # [Db, B]
            cs = jax.lax.dot_general(
                c, mult, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            return es, cs

        ts, tc = section(tft, tfw)
        bs, bc = section(bft, bfw)
        qmag = jnp.sqrt(query_len)[None, :]  # [1, B]
        tn = ts / (mt[:, None] * qmag)
        bn = bs / (mb[:, None] * qmag)
        tn = jnp.where(jnp.isnan(tn), 0.0, tn)
        bn = jnp.where(jnp.isnan(bn), 0.0, bn)
        sqd = jax.lax.dot_general(  # [Db, B]
            pr, topic_probs, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        final = (0.33 * sqd + 0.38 * tn + 0.29 * bn) * 100.0
        return jnp.where(tc + bc > 0, final, -jnp.inf)  # [Db, B]

    parts = (
        title_ft.reshape(m, n_doc_block, -1),
        title_fw.reshape(m, n_doc_block, -1),
        body_ft.reshape(m, n_doc_block, -1),
        body_fw.reshape(m, n_doc_block, -1),
        mag_title.reshape(m, n_doc_block),
        mag_body.reshape(m, n_doc_block),
        pagerank.reshape(m, n_doc_block, -1),
    )
    final = jax.lax.map(block, parts)  # [M, Db, B]
    final = final.transpose(2, 0, 1).reshape(b, dp)
    return exact_top_k(final, topk)


def main():
    n_docs = 1_000_000
    n_words = 200_000
    print("backend:", jax.default_backend())
    snap = synth_snapshot(
        n_docs=n_docs, n_words=n_words, body_terms_per_doc=48,
        title_terms_per_doc=4, max_df=32_768,
    )
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(1)
    df_b = np.diff(snap.body.post_offsets).astype(np.float64)
    p = df_b / df_b.sum()
    q = 4
    use_pallas = pallas_available()

    all_terms = rng.choice(n_words, size=(2048, q), p=p).astype(np.int32)
    for bsz in (256, 512, 1024, 2048):
        u = np.unique(all_terms[:bsz])
        print(f"B={bsz:5d}: unique terms U={len(u)} (of {bsz*q})")

    qlen_full = np.full(2048, float(q), np.float32)
    tp_full = np.zeros((2048, 1), np.float32)

    def u_pad(n):
        lev = 128
        while lev < n:
            lev *= 2
        return lev

    # correctness vs dense at B=64
    bsz = 64
    terms = all_terms[:bsz]
    uniq = np.unique(terms)
    up = u_pad(len(uniq))
    uarr = np.full(up, -2, np.int32)
    uarr[: len(uniq)] = uniq
    mult = (terms[:, :, None] == uarr[None, None, :]).sum(1).astype(np.float32).T
    ds, di = score_queries_forward(
        idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body, idx.pagerank,
        jnp.asarray(terms), jnp.asarray(qlen_full[:bsz]), jnp.asarray(tp_full[:bsz]),
        topk=10, use_pallas=use_pallas,
    )
    us, ui = score_unique_terms(
        idx.title.ft, idx.title.fw, idx.body.ft, idx.body.fw,
        idx.mag_title, idx.mag_body, idx.pagerank,
        jnp.asarray(uarr), jnp.asarray(mult),
        jnp.asarray(qlen_full[:bsz]), jnp.asarray(tp_full[:bsz]),
        topk=10,
    )
    ds, di, us, ui = map(np.asarray, (ds, di, us, ui))
    fin = np.isfinite(ds)
    print("score close:", np.allclose(ds, us, rtol=1e-4, atol=1e-5),
          "ids match:", ((di == ui) | ~fin).mean(),
          "max rel diff:", np.nanmax(np.abs(np.where(fin, ds - us, 0))
                                     / np.maximum(np.abs(ds), 1e-9)))

    # timing: chained reps inside one jit would need carry plumbing; instead
    # queue many distinct batches and fetch once at the end
    for bsz in (256, 512, 1024):
        terms = all_terms[:bsz]
        uniq = np.unique(terms)
        up = u_pad(len(uniq))
        uarr = np.full(up, -2, np.int32)
        uarr[: len(uniq)] = uniq
        mult = (terms[:, :, None] == uarr[None, None, :]).sum(1).astype(np.float32).T
        args = (
            idx.title.ft, idx.title.fw, idx.body.ft, idx.body.fw,
            idx.mag_title, idx.mag_body, idx.pagerank,
            jnp.asarray(uarr), jnp.asarray(mult),
            jnp.asarray(qlen_full[:bsz]), jnp.asarray(tp_full[:bsz]),
        )
        out = score_unique_terms(*args, topk=10)
        np.asarray(out[0])
        reps = 10
        t0 = time.perf_counter()
        outs = [score_unique_terms(*args, topk=10) for _ in range(reps)]
        np.asarray(outs[-1][0])
        dt = (time.perf_counter() - t0) / reps
        print(f"uterm B={bsz:5d} U={up:5d}: {dt*1e3:8.2f} ms "
              f"({bsz/dt:9.0f} qps)")

    for bsz in (256, 512):  # B=1024 overflows the Pallas kernel's VMEM stack
        terms = jnp.asarray(all_terms[:bsz])
        args = (idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
                idx.pagerank, terms, jnp.asarray(qlen_full[:bsz]),
                jnp.asarray(tp_full[:bsz]))
        out = score_queries_forward(*args, topk=10, use_pallas=use_pallas)
        np.asarray(out[0])
        reps = 5
        t0 = time.perf_counter()
        outs = [score_queries_forward(*args, topk=10, use_pallas=use_pallas)
                for _ in range(reps)]
        np.asarray(outs[-1][0])
        dt = (time.perf_counter() - t0) / reps
        print(f"dense B={bsz:5d}: {dt*1e3:8.2f} ms ({bsz/dt:9.0f} qps)")


if __name__ == "__main__":
    main()
