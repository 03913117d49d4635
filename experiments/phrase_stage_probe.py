"""Bisect the forward phrase matcher's cost by stage, on the real TPU.

Stages: candidate gather+sort -> row gathers -> membership compares ->
position fetch -> intersect. Each probe compiles a truncated program and
forces a fetch, so XLA DCE can't skip the measured stage.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

import bench
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def timed(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / reps


def main():
    root = bench.ensure_bench_corpus()
    db, snap = bench.load_bench_corpus(root)
    eng = QueryEngine(db, snapshot=snap)
    idx = eng.index
    queries = bench.bench_queries(snap, 512, seed=5, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries if parse_query(q).phrase_hashes]
    print("pos_cap", idx.pos_cap, "posting_cap", idx.posting_cap)

    bp, p = 8, 4
    ids = np.full((bp, p), snap.n_words, np.int32)
    valid = np.zeros((bp, p), bool)
    gens = np.zeros(bp, np.int32)
    for i, pq in enumerate(parsed[:bp]):
        row = snap.term_ids(pq.phrase_hashes)
        ids[i, : len(row)] = row
        valid[i, : len(row)] = True
        gens[i] = int(np.argmin(snap.title.df(row) + snap.body.df(row)))
    ids_j, valid_j, gens_j = map(jnp.asarray, (ids, valid, gens))

    cap = idx.posting_cap
    d_pad = idx.title.fwd.ft.shape[0]

    def gather_windows(offsets, doc_ids, tid):
        start = offsets[tid]
        end = offsets[tid + 1]
        w = start + jnp.arange(cap, dtype=jnp.int32)
        v = w < end
        w = jnp.where(v, w, doc_ids.shape[0] - 1)
        return jnp.where(v, doc_ids[w], jnp.iinfo(jnp.int32).max)

    @jax.jit
    def stage_cand(t_off, t_did, b_off, b_did, ids, gens):
        def one(trow, g):
            tid = trow[g]
            td = gather_windows(t_off, t_did, tid)
            bd = gather_windows(b_off, b_did, tid)
            cand = jnp.sort(jnp.concatenate([td, bd]))
            return cand

        return jax.vmap(one)(ids, gens)

    @jax.jit
    def stage_rows(t_ft, t_fj, b_ft, b_fj, cand):
        def one(c):
            cr = jnp.minimum(c, d_pad - 1)
            return (t_ft[cr].sum() + t_fj[cr].sum()
                    + b_ft[cr].sum() + b_fj[cr].sum())

        return jax.vmap(one)(cand)

    @jax.jit
    def stage_member(t_ft, t_fj, b_ft, b_fj, cand, ids):
        def one(c, trow):
            cr = jnp.minimum(c, d_pad - 1)
            acc = 0.0
            for ft, fj in ((t_ft, t_fj), (b_ft, b_fj)):
                ftc = ft[cr]
                fjc = fj[cr]
                eq = ftc[None, :, :] == trow[:, None, None]
                found = jnp.any(eq, -1)
                j = jnp.max(jnp.where(eq, fjc[None], 0), -1)
                acc = acc + found.sum() + j.sum()
            return acc

        return jax.vmap(one)(cand, ids)

    @jax.jit
    def stage_pos_scalar(t_ft, t_fj, poff, pos, cand, ids):
        def one(c, trow):
            cr = jnp.minimum(c, d_pad - 1)
            ftc = t_ft[cr]
            fjc = t_fj[cr]
            eq = ftc[None, :, :] == trow[:, None, None]
            found = jnp.any(eq, -1)
            j = jnp.max(jnp.where(eq, fjc[None], 0), -1)
            j = jnp.where(found, j, poff.shape[0] - 2)
            ps = poff[j]
            pe = jnp.where(found, poff[j + 1], ps)
            pidx = ps[..., None] + jnp.arange(idx.pos_cap, dtype=jnp.int32)
            pv = pidx < pe[..., None]
            pidx = jnp.where(pv, pidx, pos.shape[0] - 1)
            return jnp.where(pv, pos[pidx], jnp.inf).sum()

        return jax.vmap(one)(cand, ids)

    @jax.jit
    def stage_pos_mat(t_ft, t_fj, pmat, cand, ids):
        def one(c, trow):
            cr = jnp.minimum(c, d_pad - 1)
            ftc = t_ft[cr]
            fjc = t_fj[cr]
            eq = ftc[None, :, :] == trow[:, None, None]
            found = jnp.any(eq, -1)
            j = jnp.max(jnp.where(eq, fjc[None], 0), -1)
            jm = jnp.where(found, j, pmat.shape[0] - 1)
            return pmat[jm].sum()

        return jax.vmap(one)(cand, ids)

    t = idx.title
    b = idx.body
    dt = timed(stage_cand, t.offsets, t.doc_ids, b.offsets, b.doc_ids,
               ids_j, gens_j)
    print(f"candidates (gather+sort 2x{cap})   : {dt*1e3:8.1f} ms")
    cand = stage_cand(t.offsets, t.doc_ids, b.offsets, b.doc_ids, ids_j, gens_j)
    cand = jnp.asarray(np.asarray(cand))  # materialize
    dt = timed(stage_rows, t.fwd.ft, t.fwd.fj, b.fwd.ft, b.fwd.fj, cand)
    print(f"row gathers [E,T] x4               : {dt*1e3:8.1f} ms")
    dt = timed(stage_member, t.fwd.ft, t.fwd.fj, b.fwd.ft, b.fwd.fj, cand, ids_j)
    print(f"+ membership compares              : {dt*1e3:8.1f} ms")
    dt = timed(stage_pos_scalar, t.fwd.ft, t.fwd.fj, t.pos_offsets, t.positions,
               cand, ids_j)
    print(f"title member + scalar pos gather   : {dt*1e3:8.1f} ms")
    if t.pos_mat is not None:
        dt = timed(stage_pos_mat, t.fwd.ft, t.fwd.fj, t.pos_mat, cand, ids_j)
        print(f"title member + pos_mat row gather  : {dt*1e3:8.1f} ms")

    from spaghettisearch_tpu.ops.phrase import match_phrase_fwd_batch

    t_w, b_w = eng._phrase_weights(idx)
    for pm in (False, True):
        dt = timed(
            lambda: match_phrase_fwd_batch(
                t.fwd.ft, t.fwd.fj, t_w, t.pos_offsets, t.positions,
                b.fwd.ft, b.fwd.fj, b_w, b.pos_offsets, b.positions,
                t.offsets, t.doc_ids, b.offsets, b.doc_ids,
                ids_j, valid_j, gens_j,
                t.pos_mat if pm else None, b.pos_mat if pm else None,
                posting_cap=cap, pos_cap=idx.pos_cap, n_docs=idx.n_docs,
            )
        )
        print(f"full matcher bp=8 cap={cap} pos_mat={pm}: {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
