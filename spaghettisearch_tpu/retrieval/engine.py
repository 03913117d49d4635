"""The query engine: host query parsing + one jit'd device program per batch.

Online path equivalent of the reference's Retrieve (reference:
retrieval/main_retrieve.go:15-104), restructured TPU-first: the per-term /
per-doc goroutine fan-out becomes array vectorization inside
ops.scoring.score_queries, and candidates come back as a dense top-k.

Query grammar parity:
- "..." spans are phrases (regex `".*?"`, reference: util.go:151-160), removed
  from the keyword part;
- all phrase spans concatenate into ONE token sequence evaluated as a single
  positional chain (reference: main_retrieve.go:26,45 passes the joined list);
- query_len for cosine normalization = #keyword tokens + #phrase tokens
  (reference: main_retrieve.go:90).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..config import MAX_KEYWORDS, MAX_LINKED_DOCS, MAX_RESULTS, EngineConfig
from ..index.snapshot import IndexSnapshot, build_snapshot
from ..models.blended import BlendedRanker
from ..ops.phrase import match_phrase_batch, match_phrase_fwd_batch
from ..store.docinfo import DocInfo
from ..store.tables import Database
from ..utils.hashing import md5_hex
from ..utils.timing import TRACER
from .device_index import DeviceIndex
from .summary import get_summary
from .topics import compute_topic_probs

_PHRASE_RE = re.compile(r'".*?"')


@dataclass
class ParsedQuery:
    raw: str
    stripped: str  # query text with phrase spans removed
    phrases: list[str]  # phrase texts (no quotes)
    keyword_hashes: list[str]
    phrase_hashes: list[str]

    @property
    def query_len(self) -> int:
        return len(self.keyword_hashes) + len(self.phrase_hashes)

    @property
    def is_empty(self) -> bool:
        return self.query_len == 0


def parse_query(text: str) -> ParsedQuery:
    from ..text.laundry import laundry

    spans = _PHRASE_RE.findall(text)
    phrases = [s[1:-1] for s in spans]
    stripped = text
    for ph in phrases:
        stripped = stripped.replace('"' + ph + '"', "", 1)
    keywords = laundry(" ".join(stripped.split()))
    phrase_tokens = laundry(" ".join(phrases))
    return ParsedQuery(
        raw=text,
        stripped=stripped,
        phrases=phrases,
        keyword_hashes=[md5_hex(w) for w in keywords],
        phrase_hashes=[md5_hex(w) for w in phrase_tokens],
    )


def _bucket(n: int, step: int = 4) -> int:
    """Round up to a step multiple (pads dynamic sizes into a small set of
    static shapes so jit retraces stay bounded)."""
    return max(((n + step - 1) // step) * step, step)


@dataclass
class QueryEngine:
    db: Database
    snapshot: IndexSnapshot | None = None
    index: DeviceIndex | None = None
    config: EngineConfig = field(default_factory=EngineConfig)
    model: BlendedRanker = field(default_factory=BlendedRanker)
    use_topic_model: bool = False  # reference ships with the model disabled
    # reference quirk: its naive-Bayes product is seeded at 0 so enabled
    # still yields zero probabilities; fixed=True seeds at 1 (usable model)
    topic_model_fixed: bool = False
    device: object | None = None

    def __post_init__(self) -> None:
        if self.snapshot is None:
            self.snapshot = build_snapshot(self.db)
        if self.index is None:
            self.index = DeviceIndex.from_snapshot(self.snapshot, self.device)
        # the (snapshot, index) pair readers must see together: a single
        # attribute store is atomic under the GIL, two separate ones are not
        self._live = (self.snapshot, self.index)
        self._wordlist_cache: list[str] | None = None
        if hasattr(self.model, "prepare"):  # model-specific device arrays
            self.model.prepare(self.snapshot, self.index, self.device)

    def refresh(self) -> None:
        """Rebuild the snapshot + device index from the store and swap
        atomically — the TPU-native analogue of the reference's in-place row
        mutation under a global mutex (SURVEY §2.4: immutable snapshots +
        atomic swap). In-flight queries keep the old arrays alive."""
        snapshot = build_snapshot(self.db)
        index = DeviceIndex.from_snapshot(snapshot, self.device)
        if hasattr(self.model, "prepare"):
            self.model.prepare(snapshot, index, self.device)
        self._live = (snapshot, index)
        self.snapshot, self.index = snapshot, index
        self._wordlist_cache = None

    # ------------------------------------------------------------------ #
    # device ranking
    # ------------------------------------------------------------------ #

    def rank(
        self, parsed: list[ParsedQuery], topk: int = MAX_RESULTS, live=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Device-rank a batch. Returns (scores [B,K], doc_ids [B,K]);
        non-candidate slots have score -inf."""
        if live is None:
            live = self._live
        snap, idx = live
        b_real = len(parsed)
        # bucket the batch axis to a power of two: the micro-batcher emits
        # arbitrary coalesced sizes, and every distinct b would otherwise
        # compile its own XLA program
        b = 1
        while b < b_real:
            b *= 2
        q = _bucket(max((len(p.keyword_hashes) for p in parsed), default=1))

        term_ids = np.full((b, q), snap.n_words, dtype=np.int32)
        qlen = np.zeros(b, dtype=np.float32)
        for i, p in enumerate(parsed):
            ids = snap.term_ids(p.keyword_hashes)[:q]
            term_ids[i, : len(ids)] = ids
            qlen[i] = float(p.query_len)

        topic_probs = np.zeros((b, idx.n_categories), dtype=np.float32)
        if self.use_topic_model:
            for i, p in enumerate(parsed):
                probs = compute_topic_probs(
                    self.db, p.keyword_hashes, fixed=self.topic_model_fixed
                )
                for j, c in enumerate(snap.categories):
                    topic_probs[i, j] = probs.get(c, 0.0)

        has_phrase = any(p.phrase_hashes for p in parsed)
        if not has_phrase:
            # fast path: forward-membership scorer (no scatter/gather)
            with TRACER.span("rank.device"):
                scores, ids = self.model.score_keywords(
                    idx,
                    jnp.asarray(term_ids), jnp.asarray(qlen),
                    jnp.asarray(topic_probs), topk=topk,
                )
                return np.asarray(scores)[:b_real], np.asarray(ids)[:b_real]

        # phrase matches: ONE batched device positional intersection for all
        # phrase queries in the batch, then host-compress the sparse results
        # so the fold-in scatter is tiny
        matches: list[tuple[np.ndarray, ...]] = [
            (np.zeros(0, np.int32),) * 4 for _ in parsed
        ]
        ph_rows = [i for i, p in enumerate(parsed) if p.phrase_hashes]
        if ph_rows:
            batch = self._match_phrases_batch(
                [parsed[i].phrase_hashes for i in ph_rows], live
            )
            for i, (d, tw, bw, fl) in zip(ph_rows, batch):
                real = d < idx.n_docs
                matches[i] = (d[real], tw[real], bw[real], fl[real])
        e = _bucket(max((len(m[0]) for m in matches), default=1), 64)
        # pad slot = n_docs_padded: lands past the real doc range in the
        # fold-in accumulator and is sliced away
        ph_docs = np.full((b, e), idx.n_docs_padded, dtype=np.int32)
        ph_tw = np.zeros((b, e), dtype=np.float32)
        ph_bw = np.zeros((b, e), dtype=np.float32)
        ph_fl = np.zeros((b, e), dtype=np.float32)
        for i, (d, tw, bw, fl) in enumerate(matches):
            n = len(d)
            ph_docs[i, :n], ph_tw[i, :n] = d, tw
            ph_bw[i, :n], ph_fl[i, :n] = bw, fl

        with TRACER.span("rank.device"):
            scores, ids = self.model.score_with_phrase(
                idx,
                jnp.asarray(term_ids), jnp.asarray(qlen), jnp.asarray(topic_probs),
                jnp.asarray(ph_docs), jnp.asarray(ph_tw), jnp.asarray(ph_bw),
                jnp.asarray(ph_fl), topk=topk,
            )
            return np.asarray(scores)[:b_real], np.asarray(ids)[:b_real]

    def _phrase_weights(self, idx):
        """Posting-weight arrays the phrase matcher sums: the ranking
        model's own (e.g. BM25) when it provides them, else tf-idf."""
        hook = getattr(self.model, "phrase_weights", None)
        if hook is not None:
            return hook(idx)
        return idx.title.weights, idx.body.weights

    def _match_phrases_batch(self, phrase_sets: list[list[str]], live=None):
        """Batch variant: one device program matches every phrase query.
        Returns per input a host (docs, title_w, body_w, flag) tuple."""
        snap, idx = live if live is not None else self._live
        bp_real = len(phrase_sets)
        bp = 1  # power-of-two bucket: the vmap axis is a compile shape
        while bp < bp_real:
            bp *= 2
        p = _bucket(max(len(s) for s in phrase_sets))
        ids = np.full((bp, p), snap.n_words, dtype=np.int32)
        valid = np.zeros((bp, p), dtype=bool)  # pad rows: no valid terms
        gens = np.zeros(bp, dtype=np.int32)
        need = 1
        for i, hashes in enumerate(phrase_sets):
            row = snap.term_ids(hashes)
            ids[i, : len(row)] = row
            valid[i, : len(row)] = True
            t_df = snap.title.df(row)
            b_df = snap.body.df(row)
            g = int(np.argmin(t_df + b_df))
            gens[i] = g
            need = max(need, int(t_df[g]), int(b_df[g]))
        # two cap levels only (rare-term fast path / full), so warmup can
        # pre-compile every phrase program instead of stalling a live query
        # on a fresh cap bucket
        cap = 128 if need <= 128 else idx.posting_cap
        cap = min(cap, idx.posting_cap)
        if idx.dense_truncated:
            # a pathological doc's dense row was capped: the forward matcher
            # could under-match it, so use the exact CSR formulation (full
            # posting_cap — its membership searches every term's window)
            t_w, b_w = self._phrase_weights(idx)
            d, tw, bw, fl = match_phrase_batch(
                idx.title.offsets, idx.title.doc_ids, t_w,
                idx.title.pos_offsets, idx.title.positions,
                idx.body.offsets, idx.body.doc_ids, b_w,
                idx.body.pos_offsets, idx.body.positions,
                jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(gens),
                posting_cap=idx.posting_cap, pos_cap=idx.pos_cap,
                n_docs=idx.n_docs,
            )
            d, tw, bw, fl = map(np.asarray, (d, tw, bw, fl))
            return [(d[i], tw[i], bw[i], fl[i]) for i in range(bp_real)]
        t_w, b_w = self._phrase_weights(idx)
        d, tw, bw, fl = match_phrase_fwd_batch(
            idx.title.fwd.ft, idx.title.fwd.fj, t_w,
            idx.title.pos_offsets, idx.title.positions,
            idx.body.fwd.ft, idx.body.fwd.fj, b_w,
            idx.body.pos_offsets, idx.body.positions,
            idx.title.offsets, idx.title.doc_ids,
            idx.body.offsets, idx.body.doc_ids,
            jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(gens),
            posting_cap=cap, pos_cap=idx.pos_cap, n_docs=idx.n_docs,
        )
        d, tw, bw, fl = map(np.asarray, (d, tw, bw, fl))
        return [(d[i], tw[i], bw[i], fl[i]) for i in range(bp_real)]

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #

    def warmup(self, max_batch: int = 64) -> None:
        """Compile the hot query programs before serving traffic: the first
        jit of each (batch, q) shape can take tens of seconds (especially
        through a remote-TPU tunnel), which would otherwise be paid by the
        first unlucky requests. The micro-batcher coalesces to arbitrary
        sizes, so every power-of-two bucket up to max_batch gets compiled,
        plus the single-phrase-query program."""
        if self.index.n_docs == 0:
            return
        kw = parse_query("warmup")
        ph = parse_query('"warm up"')
        b = 1
        while b <= max_batch:
            self.rank([kw] * b, topk=MAX_RESULTS)
            b *= 2
        # phrase programs: both cap levels x every phrase sub-batch bucket
        idx = self.index
        caps = sorted({min(128, idx.posting_cap), idx.posting_cap})
        ids = np.full((1, 4), self.snapshot.n_words, np.int32)
        valid = np.zeros((1, 4), bool)
        gens = np.zeros(1, np.int32)
        t_w, b_w = self._phrase_weights(idx)
        bp = 1
        while bp <= max_batch:
            for cap in caps:
                match_phrase_fwd_batch(
                    idx.title.fwd.ft, idx.title.fwd.fj, t_w,
                    idx.title.pos_offsets, idx.title.positions,
                    idx.body.fwd.ft, idx.body.fwd.fj, b_w,
                    idx.body.pos_offsets, idx.body.positions,
                    idx.title.offsets, idx.title.doc_ids,
                    idx.body.offsets, idx.body.doc_ids,
                    jnp.asarray(np.repeat(ids, bp, 0)),
                    jnp.asarray(np.repeat(valid, bp, 0)),
                    jnp.asarray(np.repeat(gens, bp)),
                    posting_cap=cap, pos_cap=idx.pos_cap, n_docs=idx.n_docs,
                )
            bp *= 2
        self.rank([ph], topk=MAX_RESULTS)

    def query(self, text: str, max_results: int = MAX_RESULTS) -> list[dict]:
        return self.query_batch([text], max_results)[0]

    def query_batch(self, texts: list[str], max_results: int = MAX_RESULTS) -> list[list[dict]]:
        parsed = [parse_query(t) for t in texts]
        results: list[list[dict]] = [[] for _ in texts]
        rows = [i for i, p in enumerate(parsed) if not p.is_empty]
        live = self._live  # one consistent (snapshot, index) for the request
        if not rows or live[1].n_docs == 0:
            return results
        scores, ids = self.rank([parsed[i] for i in rows], topk=max_results, live=live)
        for row, i in enumerate(rows):
            out = []
            for score, doc_id in zip(scores[row], ids[row]):
                # -inf marks non-candidates; +inf is a legitimate score for a
                # candidate whose magnitude is 0 (not yet weighted), matching
                # the reference's IsNaN-only guard (get_metadata.go:61-66)
                if score == -np.inf or np.isnan(score):
                    continue
                out.append(
                    self._hydrate(float(score), int(doc_id), parsed[i], live[0])
                )
            results[i] = out
        return results

    def _hydrate(
        self, score: float, doc_id: int, parsed: ParsedQuery, snapshot=None
    ) -> dict:
        """Result formatting + metadata hydration (reference:
        retrieval/util.go:56-149, get_metadata.go:211-411)."""
        doc_hash = (snapshot or self.snapshot).doc_hashes[doc_id]
        info: DocInfo | None = self.db.doc_info.get(doc_hash)
        if info is None:
            info = DocInfo(url="")

        def url_of(h: str) -> str | None:
            d = self.db.doc_info.get(h)
            return d.url if d is not None else None

        parents = [
            u for u in (url_of(h) for h in list(info.parents)[:MAX_LINKED_DOCS]) if u
        ]
        children = [
            u for u in (url_of(h) for h in info.children[:MAX_LINKED_DOCS]) if u
        ]

        top_words = sorted(info.words_mapping.items(), key=lambda kv: -kv[1])[:MAX_KEYWORDS]
        words_mapping = {}
        for wh, freq in top_words:
            w = self.db.word.get(wh)
            if w is not None:
                words_mapping[w] = freq

        title = " ".join(info.page_title) if info.page_title else info.host

        pagerank = 0.0
        if self.use_topic_model:
            probs = compute_topic_probs(
                self.db, parsed.keyword_hashes, fixed=self.topic_model_fixed
            )
            ranks = self.db.doc_rank.get(doc_hash) or {}
            pagerank = sum(p * ranks.get(t, 0.0) for t, p in probs.items())

        return {
            "Url": info.url,
            "Page_title": title,
            "Mod_date": info.mod_date.isoformat(),
            "Page_size": info.page_size,
            "Children": children or None,
            "Parents": parents or None,
            "Words_mapping": words_mapping or None,
            "Summary": get_summary(self.db, doc_hash, parsed.stripped, parsed.phrases),
            "PageRank": pagerank,
            "FinalRank": score,
        }

    def wordlist(self, prefix: str) -> list[str]:
        """Vocabulary dump filtered by prefix (reference:
        cmd/server/server.go:54-85 + database.go:414-454)."""
        if self._wordlist_cache is None:
            words = []
            for wh in self.snapshot.word_hashes:
                w = self.db.word.get(wh)
                if w is not None:
                    words.append(w)
            self._wordlist_cache = sorted(set(words))
        if not prefix:
            return list(self._wordlist_cache)
        return [w for w in self._wordlist_cache if w.startswith(prefix)]
