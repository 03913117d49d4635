// Shared dynamic-summary renderer core, used by both the standalone
// fs_summary ABI (fastsummary.cpp) and the response assembler
// (fastserve.cpp). Semantics mirror retrieval/summary.py _render /
// reference get_metadata.go:79-209; see fastsummary.cpp for the contract.
//
// Documents are pre-tokenized ONCE into a TokDoc (raw word spans + a
// concatenated cleaned-word blob): the previous per-render tokenize built
// a heap std::string per word and was the dominant cost of a summary
// cache miss (~5-6 us/render on ~500-word docs, the serving host's
// biggest per-card expense). Rendering from a TokDoc is a memcmp scan to
// the first match plus a ~20-word memcpy window.
#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

namespace fsum {

// Pre-tokenized summary text: word k is raw bytes
// [text + raw_start[k], +raw_len[k]) and cleaned bytes
// [clean_blob + clean_start[k], +clean_len[k]).
struct TokDoc {
  std::string text;  // owns the raw summary text
  std::string clean_blob;
  std::vector<int32_t> raw_start;
  std::vector<int32_t> raw_len;
  std::vector<int32_t> clean_start;
  std::vector<int32_t> clean_len;
  int n() const { return (int)raw_start.size(); }
};

inline void build_tokdoc(const char* text, int text_len, TokDoc* d) {
  d->text.assign(text, text_len);
  d->clean_blob.clear();
  d->raw_start.clear();
  d->raw_len.clear();
  d->clean_start.clear();
  d->clean_len.clear();
  const char* t = d->text.data();
  int i = 0;
  while (i < text_len) {
    while (i < text_len && (unsigned char)t[i] <= ' ') i++;
    if (i >= text_len) break;
    int start = i;
    while (i < text_len && (unsigned char)t[i] > ' ') i++;
    d->raw_start.push_back(start);
    d->raw_len.push_back(i - start);
    int cs = (int)d->clean_blob.size();
    for (int k = start; k < i; k++) {
      unsigned char c = t[k];
      if (c >= 'A' && c <= 'Z') {
        d->clean_blob.push_back(c - 'A' + 'a');
      } else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        d->clean_blob.push_back(c);
      }
    }
    d->clean_start.push_back(cs);
    d->clean_len.push_back((int)d->clean_blob.size() - cs);
  }
}

using TokView = std::pair<const char*, int>;

// NUL-joined token blob -> n views
inline void split_toks(const char* blob, int n, std::vector<TokView>* out) {
  out->resize(n);
  const char* p = blob;
  for (int i = 0; i < n; i++) {
    int l = (int)strlen(p);
    (*out)[i] = {p, l};
    p += l + 1;
  }
}

inline bool tok_eq(const TokDoc& d, int wi, const char* t, int tn) {
  return d.clean_len[wi] == tn &&
         memcmp(d.clean_blob.data() + d.clean_start[wi], t, tn) == 0;
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
  void word(const TokDoc& d, int wi, bool lead_space) {
    if (lead_space) put(" ", 1);
    put(d.text.data() + d.raw_start[wi], d.raw_len[wi]);
  }
};

// First word index where any phrase matches consecutively or any keyword
// matches; returns n when no match (caller emits the static window).
inline int first_match(const TokDoc& d, const std::vector<TokView>& qt,
                       const std::vector<TokView>& pt, const int* ph_lens,
                       int n_ph) {
  const int n = d.n();
  int best = n;
  for (int wi = 0; wi < n && best == n; wi++) {
    for (size_t q = 0; q < qt.size(); q++) {
      if (tok_eq(d, wi, qt[q].first, qt[q].second)) {
        best = wi;
        break;
      }
    }
  }
  int off = 0;
  for (int p = 0; p < n_ph; p++) {
    int plen = ph_lens[p];
    if (plen == 0) continue;
    for (int wi = 0; wi < best; wi++) {
      if (!tok_eq(d, wi, pt[off].first, pt[off].second)) continue;
      bool all = true;
      for (int k = 1; k < plen; k++) {
        if (wi + k >= n ||
            !tok_eq(d, wi + k, pt[off + k].first, pt[off + k].second)) {
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
  return best;
}

// The ~20-word window emitter (match semantics documented in summary.py).
inline void emit_window(const TokDoc& d, int best, Out* outp) {
  Out& out = *outp;
  const int n = d.n();
  static const char kDots[] = "...";
  if (best < n) {
    int m = best;
    int span;
    bool first = true;
    if (m - 10 < 0) {
      span = 20 - m;
      for (int k = 0; k < m; k++) {
        out.word(d, k, !first);
        first = false;
      }
    } else {
      span = 10;
      out.put(kDots, 3);
      first = false;
      for (int k = m - 10; k < m; k++) out.word(d, k, true);
    }
    if (m + span <= n) {
      for (int k = m; k < m + span; k++) {
        out.word(d, k, !first);
        first = false;
      }
      if (!first) out.put(" ", 1);
      out.put(kDots, 3);
    } else {
      for (int k = m; k < n; k++) {
        out.word(d, k, !first);
        first = false;
      }
    }
  } else if (n > 21) {
    int m = (n + 1) / 2;
    out.put(kDots, 3);
    for (int k = m - 10; k < m + 11 && k < n; k++) out.word(d, k, true);
    out.put(" ", 1);
    out.put(kDots, 3);
  } else {
    bool first = true;
    for (int k = 0; k < n; k++) {
      out.word(d, k, !first);
      first = false;
    }
    if (!first) out.put(" ", 1);
    out.put(kDots, 3);
  }
}

inline int render_tok(const TokDoc& d, const std::vector<TokView>& qt,
                      const std::vector<TokView>& pt, const int* ph_lens,
                      int n_ph, char* out_buf, int out_cap) {
  int best = first_match(d, qt, pt, ph_lens, n_ph);
  Out out{out_buf, out_cap, 0, false};
  emit_window(d, best, &out);
  if (out.overflow) return -1;
  return out.len;
}

// One-shot form (standalone fastsummary ABI): tokenize then render.
inline int render(const char* text, int text_len, const std::vector<TokView>& qt,
                  const std::vector<TokView>& pt, const int* ph_lens, int n_ph,
                  char* out_buf, int out_cap) {
  TokDoc d;
  build_tokdoc(text, text_len, &d);
  return render_tok(d, qt, pt, ph_lens, n_ph, out_buf, out_cap);
}

}  // namespace fsum
