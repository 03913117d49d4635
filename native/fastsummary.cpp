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
// doc words are cleaned here, streaming, without allocation.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Word {
  const char* raw;
  int raw_len;
  std::string clean;
};

inline void clean_word(const char* s, int n, std::string* out) {
  out->clear();
  for (int i = 0; i < n; i++) {
    unsigned char c = s[i];
    if (c >= 'A' && c <= 'Z') {
      out->push_back(c - 'A' + 'a');
    } else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
      out->push_back(c);
    }
  }
}

inline bool tok_eq(const Word& w, const char* t, int tn) {
  return (int)w.clean.size() == tn && memcmp(w.clean.data(), t, tn) == 0;
}

struct Out {
  char* buf;
  int cap;
  int len;
  bool overflow;
  void put(const char* s, int n) {
    if (len + n > cap) {
      overflow = true;
      return;
    }
    memcpy(buf + len, s, n);
    len += n;
  }
  void word(const Word& w, bool lead_space) {
    if (lead_space) put(" ", 1);
    put(w.raw, w.raw_len);
  }
};

}  // namespace

extern "C" {

int fs_summary(const char* text, int text_len, const char* qtoks, int n_qtoks,
               const char* phtoks, const int* ph_lens, int n_ph, char* out_buf,
               int out_cap) {
  // split on any ASCII whitespace run (Python str.split semantics)
  std::vector<Word> words;
  words.reserve(text_len / 6 + 4);
  int i = 0;
  while (i < text_len) {
    while (i < text_len && (unsigned char)text[i] <= ' ') i++;
    if (i >= text_len) break;
    int start = i;
    while (i < text_len && (unsigned char)text[i] > ' ') i++;
    Word w;
    w.raw = text + start;
    w.raw_len = i - start;
    clean_word(w.raw, w.raw_len, &w.clean);
    words.push_back(std::move(w));
  }
  const int n = (int)words.size();

  // collect query token views
  std::vector<std::pair<const char*, int>> qt(n_qtoks);
  {
    const char* p = qtoks;
    for (int q = 0; q < n_qtoks; q++) {
      int l = (int)strlen(p);
      qt[q] = {p, l};
      p += l + 1;
    }
  }
  int total_ph_toks = 0;
  for (int p = 0; p < n_ph; p++) total_ph_toks += ph_lens[p];
  std::vector<std::pair<const char*, int>> pt(total_ph_toks);
  {
    const char* p = phtoks;
    for (int t = 0; t < total_ph_toks; t++) {
      int l = (int)strlen(p);
      pt[t] = {p, l};
      p += l + 1;
    }
  }

  // first keyword match (first word whose cleaned form equals any token)
  int best = n;
  for (int wi = 0; wi < n && best == n; wi++) {
    for (int q = 0; q < n_qtoks; q++) {
      if (tok_eq(words[wi], qt[q].first, qt[q].second)) {
        best = wi;
        break;
      }
    }
  }
  // phrases: first consecutive match strictly before the current best
  {
    int off = 0;
    for (int p = 0; p < n_ph; p++) {
      int plen = ph_lens[p];
      if (plen == 0) {
        continue;
      }
      for (int wi = 0; wi < best; wi++) {
        if (!tok_eq(words[wi], pt[off].first, pt[off].second)) continue;
        bool all = true;
        for (int k = 1; k < plen; k++) {
          if (wi + k >= n ||
              !tok_eq(words[wi + k], pt[off + k].first, pt[off + k].second)) {
            all = false;
            break;
          }
        }
        if (all) {
          best = wi;
          break;
        }
      }
      off += plen;
    }
  }

  Out out{out_buf, out_cap, 0, false};
  static const char kDots[] = "...";
  if (best < n) {
    int m = best;
    int span;
    bool first = true;
    if (m - 10 < 0) {
      span = 20 - m;  // diff
      for (int k = 0; k < m; k++) {
        out.word(words[k], !first);
        first = false;
      }
    } else {
      span = 10;
      out.put(kDots, 3);
      first = false;
      for (int k = m - 10; k < m; k++) out.word(words[k], true);
    }
    if (m + span <= n) {
      for (int k = m; k < m + span; k++) {
        out.word(words[k], !first);
        first = false;
      }
      if (!first) out.put(" ", 1);
      out.put(kDots, 3);
    } else {
      for (int k = m; k < n; k++) {
        out.word(words[k], !first);
        first = false;
      }
    }
  } else if (n > 21) {
    // middle window: i = ceil(n/2), words[i-10 : i+11]
    int m = (n + 1) / 2;
    out.put(kDots, 3);
    for (int k = m - 10; k < m + 11 && k < n; k++) out.word(words[k], true);
    out.put(" ", 1);
    out.put(kDots, 3);
  } else {
    bool first = true;
    for (int k = 0; k < n; k++) {
      out.word(words[k], !first);
      first = false;
    }
    if (!first) out.put(" ", 1);
    out.put(kDots, 3);
  }
  if (out.overflow) return -1;
  return out.len;
}

}  // extern "C"
