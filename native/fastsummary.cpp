// Native dynamic-summary renderer for the serving hot path.
//
// Reproduces retrieval/summary.py get_summary() exactly (which itself
// mirrors the reference's forward scan, get_metadata.go:79-209): clean each
// doc word (strip non-[A-Za-z0-9] BYTES — multi-byte UTF-8 sequences are
// >= 0x80 and drop, matching Python's ASCII regex — and lowercase), find the
// first word where any phrase matches consecutively or any keyword matches,
// emit the ~20-word window with ellipses, else the middle-21 fallback.
//
// Why native: Python built a per-doc index (cleaned tokens + position dicts)
// cached per doc — ~1.3 ms per MISS, and a 100k-doc serving working set
// thrashes any bounded cache (measured: the serve bench collapsed to 3.5 qps
// on cold summaries). Here a call is ONE pass over the doc's ~200 words
// (~2-6 us), so no per-doc index exists at all; only the compact text bytes
// are cached Python-side. ctypes releases the GIL for the duration.
//
// Contract (all strings utf-8, not NUL-terminated unless stated):
//   fs_summary(text, text_len,
//              qtoks, n_qtoks,          // cleaned keyword tokens, NUL-joined
//              phtoks, ph_lens, n_ph,   // cleaned phrase tokens, NUL-joined,
//                                       // ph_lens[i] tokens per phrase
//              out, out_cap) -> written length, or -1 if out_cap too small
//
// The caller passes CLEANED query tokens (summary.py prepare_summary_query);
// doc words are cleaned here, streaming, without allocation. The render core
// lives in summary_core.h, shared with the response assembler
// (fastserve.cpp).

#include "summary_core.h"

extern "C" {

int fs_summary(const char* text, int text_len, const char* qtoks, int n_qtoks,
               const char* phtoks, const int* ph_lens, int n_ph, char* out_buf,
               int out_cap) {
  std::vector<fsum::TokView> qt, pt;
  fsum::split_toks(qtoks, n_qtoks, &qt);
  int total_ph_toks = 0;
  for (int p = 0; p < n_ph; p++) total_ph_toks += ph_lens[p];
  fsum::split_toks(phtoks, total_ph_toks, &pt);
  return fsum::render(text, text_len, qt, pt, ph_lens, n_ph, out_buf, out_cap);
}

}  // extern "C"
