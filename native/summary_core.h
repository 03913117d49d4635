// Shared dynamic-summary renderer core, used by both the standalone
// fs_summary ABI (fastsummary.cpp) and the response assembler
// (fastserve.cpp). Semantics mirror retrieval/summary.py _render /
// reference get_metadata.go:79-209; see fastsummary.cpp for the contract.
#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

namespace fsum {

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

inline void tokenize(const char* text, int text_len, std::vector<Word>* words) {
  words->clear();
  words->reserve(text_len / 6 + 4);
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
    words->push_back(std::move(w));
  }
}

// First word index where any phrase matches consecutively or any keyword
// matches; -(n+1)-free sentinel handled by caller (returns n when no match).
inline int first_match(const std::vector<Word>& words,
                       const std::vector<TokView>& qt,
                       const std::vector<TokView>& pt, const int* ph_lens,
                       int n_ph) {
  const int n = (int)words.size();
  int best = n;
  for (int wi = 0; wi < n && best == n; wi++) {
    for (size_t q = 0; q < qt.size(); q++) {
      if (tok_eq(words[wi], qt[q].first, qt[q].second)) {
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
  return best;
}

// The ~20-word window emitter (match semantics documented in summary.py).
inline void emit_window(const std::vector<Word>& words, int best, Out* outp) {
  Out& out = *outp;
  const int n = (int)words.size();
  static const char kDots[] = "...";
  if (best < n) {
    int m = best;
    int span;
    bool first = true;
    if (m - 10 < 0) {
      span = 20 - m;
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
}

inline int render(const char* text, int text_len, const std::vector<TokView>& qt,
                  const std::vector<TokView>& pt, const int* ph_lens, int n_ph,
                  char* out_buf, int out_cap) {
  std::vector<Word> words;
  tokenize(text, text_len, &words);
  int best = first_match(words, qt, pt, ph_lens, n_ph);
  Out out{out_buf, out_cap, 0, false};
  emit_window(words, best, &out);
  if (out.overflow) return -1;
  return out.len;
}

}  // namespace fsum
