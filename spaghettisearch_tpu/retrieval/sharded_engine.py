"""Multi-chip serving: a QueryEngine whose device program is the
doc-sharded shard_map scorer (parallel/sharded.py) instead of the
single-chip DeviceIndex path.

Everything host-side (parsing, hydration, summaries, wordlist, refresh) is
inherited; only `rank` changes — the batch is scored per shard with a local
top-k and an all-gather merge over ICI. Phrase sets are per row (the block
vmaps the forward matcher over the batch).

Use `cli.server --meshShards N` (and optionally `--meshBatch Q` for a 2-D
query-data-parallel x doc mesh) to serve this way.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config import MAX_RESULTS
from ..parallel.mesh import make_mesh, make_mesh2d
from ..parallel.sharded import ShardedIndex, make_sharded_scorer
from ..utils.timing import TRACER
from .engine import ParsedQuery, QueryEngine, _bucket, parse_query


class _IndexFacts:
    """The DeviceIndex fields generic engine/server code reads (healthz,
    emptiness checks) without the single-chip HBM arrays — the sharded
    engine holds the postings in the ShardedIndex instead."""

    def __init__(self, snap) -> None:
        self.n_docs = snap.n_docs
        self.n_words = snap.n_words
        self.n_categories = max(
            snap.pagerank.shape[1] if snap.pagerank is not None else 1, 1
        )


@dataclass
class ShardedQueryEngine(QueryEngine):
    n_shards: int = 1
    n_query_rows: int = 1  # >1: 2-D mesh, query batch data-parallel

    def __post_init__(self) -> None:
        # skip the single-chip DeviceIndex: postings live once, in the
        # ShardedIndex (at 1M docs the dense forward arrays are GBs)
        if self.snapshot is None:
            from ..index.snapshot import build_snapshot

            self.snapshot = build_snapshot(self.db)
        if self.index is None:
            self.index = _IndexFacts(self.snapshot)
        self._live = (self.snapshot, self.index)
        self._wordlist_cache = None
        self._build_sharded()

    def _build_sharded(self) -> None:
        if self.n_query_rows > 1:
            mesh = make_mesh2d(self.n_query_rows, self.n_shards)
        else:
            mesh = make_mesh(self.n_shards)
        self._mesh = mesh
        # honor the ranking model: BM25 swaps per-posting weights and the
        # finalize flavor; anything else uses the reference blend
        from ..models.bm25 import BM25Ranker

        self._bm25 = isinstance(self.model, BM25Ranker)
        self._sidx = ShardedIndex.from_snapshot(
            self.snapshot, mesh, weights="bm25" if self._bm25 else "tfidf"
        )
        self._scorers: dict[int, object] = {}

    def refresh(self) -> None:
        from ..index.snapshot import build_snapshot

        snapshot = build_snapshot(self.db)
        index = _IndexFacts(snapshot)
        self._live = (snapshot, index)
        self.snapshot, self.index = snapshot, index
        self._wordlist_cache = None
        self._build_sharded()

    def _scorer(self, topk: int):
        s = self._scorers.get(topk)
        if s is None:
            kwargs = {}
            if self._bm25:
                kwargs = dict(
                    scoring="bm25",
                    title_boost=self.model.title_boost,
                    body_boost=self.model.body_boost,
                )
            s = make_sharded_scorer(self._sidx, topk=topk, **kwargs)
            self._scorers[topk] = s
        return s

    def rank(
        self, parsed: list[ParsedQuery], topk: int = MAX_RESULTS, live=None
    ) -> tuple[np.ndarray, np.ndarray]:
        snap = self.snapshot
        sidx = self._sidx
        b_real = len(parsed)
        # batch bucket must also divide by the query-row mesh axis
        b = max(self.n_query_rows, 1)
        while b < b_real:
            b *= 2
        q = _bucket(max((len(p.keyword_hashes) for p in parsed), default=1))

        term_ids = np.full((b, q), snap.n_words, dtype=np.int32)
        qlen = np.zeros(b, dtype=np.float32)
        p_max = _bucket(max((len(p.phrase_hashes) for p in parsed), default=1))
        # phrase sets ride a COMPRESSED axis (bp rows) + a batch-row map, so
        # the in-block matcher's temporaries scale with the number of phrase
        # queries, not the whole batch
        n_ph = sum(1 for p in parsed if p.phrase_hashes)
        bp = 1
        while bp < max(n_ph, 1):
            bp *= 2
        ph_ids = np.full((bp, p_max), snap.n_words, dtype=np.int32)
        ph_valid = np.zeros((bp, p_max), dtype=bool)
        gens = np.zeros(bp, dtype=np.int32)
        ph_rows = np.full(bp, b, dtype=np.int32)  # pad rows drop in the fold
        ph_i = 0
        for i, p in enumerate(parsed):
            ids = snap.term_ids(p.keyword_hashes)[:q]
            term_ids[i, : len(ids)] = ids
            qlen[i] = float(p.query_len)
            if p.phrase_hashes:
                row = snap.term_ids(p.phrase_hashes)[:p_max]
                ph_ids[ph_i, : len(row)] = row
                ph_valid[ph_i, : len(row)] = True
                t_df = snap.title.df(row)
                b_df = snap.body.df(row)
                gens[ph_i] = int(np.argmin(t_df + b_df))
                ph_rows[ph_i] = i
                ph_i += 1

        topic_probs = np.zeros((b, sidx.pagerank.shape[-1]), dtype=np.float32)
        if self.use_topic_model:
            from .topics import compute_topic_probs

            for i, p in enumerate(parsed):
                probs = compute_topic_probs(
                    self.db, p.keyword_hashes, fixed=self.topic_model_fixed
                )
                for j, c in enumerate(snap.categories):
                    topic_probs[i, j] = probs.get(c, 0.0)

        with TRACER.span("rank.sharded"):
            scores, ids = self._scorer(topk)(
                jnp.asarray(term_ids), jnp.asarray(qlen), jnp.asarray(topic_probs),
                jnp.asarray(ph_ids), jnp.asarray(ph_valid), jnp.asarray(gens),
                jnp.asarray(ph_rows),
            )
            scores = np.asarray(scores)[:b_real]
            ids = np.asarray(ids)[:b_real]
        # sharded ids are global doc slots over padded shards; slots past the
        # real doc range only appear with -inf scores, mask them for hydration
        pad_mask = ids >= snap.n_docs
        scores = np.where(pad_mask, -np.inf, scores)
        ids = np.where(pad_mask, 0, ids)
        return scores, ids

    def warmup(self, max_batch: int = 64) -> None:  # pragma: no cover - timing
        if self.index.n_docs == 0:
            return
        kw = parse_query("warmup")
        ph = parse_query('"warm up"')
        b = max(self.n_query_rows, 1)
        while b <= max_batch:
            self.rank([kw] * b, topk=MAX_RESULTS)
            self.rank([ph] * b, topk=MAX_RESULTS)
            b *= 2
