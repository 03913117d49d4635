"""spaghettisearch_tpu — a TPU-native search-engine framework.

A from-scratch rebuild of the capabilities of nwihardjo/SpaghettiSearch
(a concurrent Go/BadgerDB web search engine) designed TPU-first:

- The inverted index lives in HBM as padded CSR postings + positional arrays
  (reference: Go map-of-maps rows in BadgerDB, /root/reference/database/database.go:85-99).
- Query scoring (TF-IDF cosine + PageRank blend + top-k) is a single jit'd
  XLA program over a query *batch* (reference: goroutine fan-out/fan-in per
  term/doc, /root/reference/retrieval/main_retrieve.go:50-97).
- Topic-sensitive PageRank is a batched power iteration with a category axis
  (reference: per-category Go loops, /root/reference/ranking/pagerank.go:14-124).
- Phrase search is a vectorized positional-intersection program
  (reference: sort-merge per doc, /root/reference/retrieval/phrase.go).
- The crawler, HTML tokenizer, durable store, and HTTP API stay host-side and
  stream columnar snapshots to the device.
- Multi-chip scale-out uses jax.sharding.Mesh + shard_map over ICI
  (doc-sharded postings, per-shard top-k + all-gather merge).
"""

__version__ = "0.1.0"
