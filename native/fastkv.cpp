// fastkv — embedded log-structured KV store (the storage engine under the
// host-side table layer, playing the role BadgerDB plays for the reference:
// SURVEY.md L0, /root/reference/database/database.go).
//
// Design: RAM-resident hash map + append-only binary WAL per table directory,
// compaction rewrites the log from the live map. Single-writer multi-reader
// via a shared mutex. Exposed through a C ABI for ctypes binding
// (spaghettisearch_tpu/store/native_kv.py).
//
// Record format (little-endian):
//   u8 op (0 = set, 1 = delete) | u32 klen | u32 vlen | key bytes | val bytes

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <sys/stat.h>
#include <unordered_map>
#include <vector>

namespace {

struct Store {
  std::string dir;
  std::unordered_map<std::string, std::string> map;
  FILE* log = nullptr;
  mutable std::shared_mutex mu;
  uint64_t log_bytes = 0;

  std::string log_path() const { return dir + "/data.log"; }

  bool replay(FILE* f) {
    for (;;) {
      uint8_t op;
      uint32_t klen, vlen;
      if (fread(&op, 1, 1, f) != 1) break;
      if (fread(&klen, 4, 1, f) != 1) return false;
      if (fread(&vlen, 4, 1, f) != 1) return false;
      std::string key(klen, '\0');
      if (klen && fread(&key[0], 1, klen, f) != klen) return false;
      if (op == 0) {
        std::string val(vlen, '\0');
        if (vlen && fread(&val[0], 1, vlen, f) != vlen) return false;
        map[std::move(key)] = std::move(val);
      } else {
        map.erase(key);
      }
    }
    return true;
  }

  static void append_record(FILE* f, uint8_t op, const std::string& k,
                            const char* v, uint32_t vlen) {
    uint32_t klen = (uint32_t)k.size();
    fwrite(&op, 1, 1, f);
    fwrite(&klen, 4, 1, f);
    fwrite(&vlen, 4, 1, f);
    fwrite(k.data(), 1, klen, f);
    if (vlen) fwrite(v, 1, vlen, f);
  }

  bool open() {
    ::mkdir(dir.c_str(), 0755);
    FILE* f = fopen(log_path().c_str(), "rb");
    if (f) {
      replay(f);  // a torn tail record is dropped (crash recovery)
      fclose(f);
    }
    log = fopen(log_path().c_str(), "ab");
    if (!log) return false;
    long pos = ftell(log);
    log_bytes = pos > 0 ? (uint64_t)pos : 0;
    return true;
  }

  void set(const std::string& k, const char* v, uint32_t vlen) {
    std::unique_lock lock(mu);
    map[k].assign(v, vlen);
    append_record(log, 0, k, v, vlen);
    log_bytes += 9 + k.size() + vlen;
  }

  void del(const std::string& k) {
    std::unique_lock lock(mu);
    map.erase(k);
    append_record(log, 1, k, nullptr, 0);
    log_bytes += 9 + k.size();
  }

  // Rewrites data.log from the live map. Returns 1 on success, 0 when
  // compaction was REFUSED because the on-disk log no longer matches this
  // handle's view (another process appended or rewrote it since open):
  // rewriting from our in-RAM map would silently revert the foreign rows,
  // and the foreign writer's future appends would land on the unlinked
  // inode. Compaction is a single-writer operation by contract.
  int compact() {
    std::unique_lock lock(mu);
    fflush(log);
    struct stat st;
    if (stat(log_path().c_str(), &st) != 0) return 0;
    if ((uint64_t)st.st_size != log_bytes) return 0;
    std::string tmp = log_path() + ".tmp";
    FILE* f = fopen(tmp.c_str(), "wb");
    if (!f) return 0;
    for (const auto& [k, v] : map)
      append_record(f, 0, k, v.data(), (uint32_t)v.size());
    fclose(f);
    fclose(log);
    rename(tmp.c_str(), log_path().c_str());
    log = fopen(log_path().c_str(), "ab");
    log_bytes = 0;
    for (const auto& [k, v] : map) log_bytes += 9 + k.size() + v.size();
    return 1;
  }

  void flush() {
    std::unique_lock lock(mu);
    fflush(log);
  }
};

struct Iter {
  std::vector<std::pair<std::string, std::string>> items;
  size_t pos = 0;
};

}  // namespace

extern "C" {

void* fastkv_open(const char* dir) {
  auto* s = new Store();
  s->dir = dir;
  if (!s->open()) {
    delete s;
    return nullptr;
  }
  return s;
}

void fastkv_close(void* h) {
  auto* s = (Store*)h;
  {
    std::unique_lock lock(s->mu);
    if (s->log) {
      fflush(s->log);
      fclose(s->log);
      s->log = nullptr;
    }
  }
  delete s;
}

// returns 1 if found; *out is malloc'd (caller frees via fastkv_free)
int fastkv_get(void* h, const char* key, uint32_t klen, char** out,
               uint32_t* out_len) {
  auto* s = (Store*)h;
  std::shared_lock lock(s->mu);
  auto it = s->map.find(std::string(key, klen));
  if (it == s->map.end()) return 0;
  *out_len = (uint32_t)it->second.size();
  *out = (char*)malloc(it->second.size());
  memcpy(*out, it->second.data(), it->second.size());
  return 1;
}

void fastkv_free(char* p) { free(p); }

void fastkv_set(void* h, const char* key, uint32_t klen, const char* val,
                uint32_t vlen) {
  ((Store*)h)->set(std::string(key, klen), val, vlen);
}

void fastkv_delete(void* h, const char* key, uint32_t klen) {
  ((Store*)h)->del(std::string(key, klen));
}

// batched set: concatenated keys/values with per-item lengths
void fastkv_set_many(void* h, uint32_t n, const char* keys,
                     const uint32_t* klens, const char* vals,
                     const uint32_t* vlens) {
  auto* s = (Store*)h;
  std::unique_lock lock(s->mu);
  const char* kp = keys;
  const char* vp = vals;
  for (uint32_t i = 0; i < n; i++) {
    std::string k(kp, klens[i]);
    s->map[k].assign(vp, vlens[i]);
    Store::append_record(s->log, 0, k, vp, vlens[i]);
    s->log_bytes += 9 + klens[i] + vlens[i];
    kp += klens[i];
    vp += vlens[i];
  }
}

uint64_t fastkv_len(void* h) {
  auto* s = (Store*)h;
  std::shared_lock lock(s->mu);
  return s->map.size();
}

uint64_t fastkv_log_bytes(void* h) { return ((Store*)h)->log_bytes; }

void fastkv_flush(void* h) { ((Store*)h)->flush(); }

// 1 = compacted, 0 = refused (foreign writer appended since open) or failed
int fastkv_compact(void* h) { return ((Store*)h)->compact(); }

// iteration over a point-in-time snapshot
void* fastkv_iter_new(void* h) {
  auto* s = (Store*)h;
  auto* it = new Iter();
  std::shared_lock lock(s->mu);
  it->items.reserve(s->map.size());
  for (const auto& kv : s->map) it->items.push_back(kv);
  return it;
}

int fastkv_iter_next(void* hi, const char** k, uint32_t* klen, const char** v,
                     uint32_t* vlen) {
  auto* it = (Iter*)hi;
  if (it->pos >= it->items.size()) return 0;
  const auto& [key, val] = it->items[it->pos++];
  *k = key.data();
  *klen = (uint32_t)key.size();
  *v = val.data();
  *vlen = (uint32_t)val.size();
  return 1;
}

void fastkv_iter_free(void* hi) { delete (Iter*)hi; }

}  // extern "C"

// ======================================================================
// Columnar ingest helpers: the snapshot/weighting batch jobs are
// O(total postings) and were Python hot loops (JSON decode + per-posting
// work). These parse the simple JSON row shapes the table layer writes —
//   inverted:  {"<32-hex doc>": [w, p0, p1, ...], ...}
//   raw/plain: {"<32-hex doc>": 0.5, ...}
// — into flat arrays in one pass (spaghettisearch_tpu/index/snapshot.py
// consumes them with numpy). Returns -1 when a row doesn't match the
// expected shape so callers can fall back to the Python path.
// ======================================================================

namespace {

struct Export {
  std::string row_keys;              // 32 bytes per row
  std::vector<uint64_t> row_offsets; // [n_rows+1] into postings
  std::string doc_hashes;            // 32 bytes per posting
  std::vector<double> weights;       // vals[0] per posting
  std::vector<uint64_t> pos_offsets; // [n_post+1] into positions
  std::vector<double> positions;
};

inline void skip_ws(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
}

// Parses one table row value (JSON object) into ex; false on shape mismatch.
bool parse_row(const std::string& val, Export& ex) {
  const char* p = val.data();
  const char* end = p + val.size();
  skip_ws(p, end);
  if (p >= end || *p != '{') return false;
  p++;
  skip_ws(p, end);
  if (p < end && *p == '}') return true;  // empty row
  for (;;) {
    skip_ws(p, end);
    if (p >= end || *p != '"') return false;
    p++;
    const char* kstart = p;
    while (p < end && *p != '"') p++;
    if (p - kstart != 32) return false;  // md5 hex doc hash expected
    ex.doc_hashes.append(kstart, 32);
    p++;  // closing quote
    skip_ws(p, end);
    if (p >= end || *p != ':') return false;
    p++;
    skip_ws(p, end);
    if (p < end && *p == '[') {
      p++;
      bool first = true;
      for (;;) {
        skip_ws(p, end);
        if (p < end && *p == ']') { p++; break; }
        char* q;
        double v = strtod(p, &q);
        if (q == p) return false;
        p = q;
        if (first) { ex.weights.push_back(v); first = false; }
        else ex.positions.push_back(v);
        skip_ws(p, end);
        if (p < end && *p == ',') p++;
      }
      if (first) return false;  // empty posting list
    } else {
      char* q;
      double v = strtod(p, &q);
      if (q == p) return false;
      p = q;
      ex.weights.push_back(v);
    }
    ex.pos_offsets.push_back(ex.positions.size());
    skip_ws(p, end);
    if (p < end && *p == ',') { p++; continue; }
    if (p < end && *p == '}') return true;
    return false;
  }
}

template <typename T>
T* copy_out(const std::vector<T>& v) {
  T* out = (T*)malloc(sizeof(T) * std::max(v.size(), size_t(1)));
  memcpy(out, v.data(), sizeof(T) * v.size());
  return out;
}

char* copy_out_str(const std::string& s) {
  char* out = (char*)malloc(std::max(s.size(), size_t(1)));
  memcpy(out, s.data(), s.size());
  return out;
}

}  // namespace

extern "C" {

// Flat export of an inverted/raw table. Outputs are malloc'd (free with
// fastkv_free). Returns n_rows, or -1 on shape mismatch (caller falls back).
int64_t fastkv_export_postings(
    void* h,
    char** row_keys, uint64_t** row_offsets,
    char** doc_hashes, double** weights,
    uint64_t** pos_offsets, double** positions,
    uint64_t* n_post, uint64_t* n_pos) {
  auto* s = (Store*)h;
  std::shared_lock lock(s->mu);
  Export ex;
  ex.row_offsets.push_back(0);
  ex.pos_offsets.push_back(0);
  ex.row_keys.reserve(s->map.size() * 32);
  int64_t n_rows = 0;
  for (const auto& [k, v] : s->map) {
    if (k.size() != 32) return -1;
    if (!parse_row(v, ex)) return -1;
    ex.row_keys.append(k);
    ex.row_offsets.push_back(ex.weights.size());
    n_rows++;
  }
  *row_keys = copy_out_str(ex.row_keys);
  *row_offsets = copy_out(ex.row_offsets);
  *doc_hashes = copy_out_str(ex.doc_hashes);
  *weights = copy_out(ex.weights);
  *pos_offsets = copy_out(ex.pos_offsets);
  *positions = copy_out(ex.positions);
  *n_post = ex.weights.size();
  *n_pos = ex.positions.size();
  return n_rows;
}

// TF-IDF weighting pass over one inverted table (the reference's
// UpdateTermWeights hot loop, term_weighting.go:29-55), entirely native:
// for each row, vals[0] = float32(raw_normTF) * float32(idf) — the raw
// base comes from the shadow table when present (idempotent re-crawls) —
// and per-doc sum-of-squared-weights accumulate for the magnitude table.
// idf values are precomputed by the caller (float32 of log2(N/df), cast to
// double), keyed by word hash: n_rows entries of (idf_word_hashes 32 bytes
// each, idfs). Outputs per-doc squared sums (malloc'd). Returns n_docs
// or -1 (shape mismatch / missing idf — caller falls back to Python).
int64_t fastkv_apply_term_weights(
    void* h_inv, void* h_raw,
    uint64_t n_rows, const char* idf_word_hashes, const double* idfs,
    char** out_doc_hashes, double** out_sq_sums) {
  auto* inv = (Store*)h_inv;
  auto* raw = (Store*)h_raw;
  std::unique_lock lock(inv->mu);
  std::shared_lock rlock(raw->mu);

  std::unordered_map<std::string, double> idf_of;
  idf_of.reserve(n_rows);
  for (uint64_t i = 0; i < n_rows; i++)
    idf_of.emplace(std::string(idf_word_hashes + 32 * i, 32), idfs[i]);

  // validate coverage BEFORE mutating anything: a mid-loop abort would
  // leave the table half-weighted
  for (const auto& [word, val] : inv->map)
    if (idf_of.find(word) == idf_of.end()) return -1;

  std::unordered_map<std::string, double> sq;
  std::string newval;
  char buf[64];
  for (auto& [word, val] : inv->map) {
    float idf32 = (float)idf_of.find(word)->second;
    // raw shadow row: {"doc": raw, ...}
    std::unordered_map<std::string, double> rawrow;
    auto rit = raw->map.find(word);
    if (rit != raw->map.end()) {
      Export rex;
      rex.pos_offsets.push_back(0);
      if (!parse_row(rit->second, rex)) return -1;
      const char* dh = rex.doc_hashes.data();
      for (size_t i = 0; i < rex.weights.size(); i++, dh += 32)
        rawrow.emplace(std::string(dh, 32), rex.weights[i]);
    }
    // rewrite the row value
    Export ex;
    ex.pos_offsets.push_back(0);
    if (!parse_row(val, ex)) return -1;
    newval.clear();
    newval.push_back('{');
    const char* dh = ex.doc_hashes.data();
    for (size_t i = 0; i < ex.weights.size(); i++, dh += 32) {
      std::string doc(dh, 32);
      double base = ex.weights[i];
      auto bit = rawrow.find(doc);
      if (bit != rawrow.end()) base = bit->second;
      float w = (float)base * idf32;
      sq[doc] += (double)w * (double)w;
      if (i) newval.push_back(',');
      newval.push_back('"');
      newval.append(doc);
      newval.append("\": [");
      snprintf(buf, sizeof buf, "%.17g", (double)w);
      newval.append(buf);
      for (uint64_t j = ex.pos_offsets[i]; j < ex.pos_offsets[i + 1]; j++) {
        snprintf(buf, sizeof buf, ", %.17g", ex.positions[j]);
        newval.append(buf);
      }
      newval.push_back(']');
    }
    newval.push_back('}');
    val = newval;
    Store::append_record(inv->log, 0, word, newval.data(), (uint32_t)newval.size());
    inv->log_bytes += 9 + word.size() + newval.size();
  }

  std::string docs;
  std::vector<double> sums;
  docs.reserve(sq.size() * 32);
  sums.reserve(sq.size());
  for (const auto& [d, v] : sq) {
    docs.append(d);
    sums.push_back(v);
  }
  *out_doc_hashes = copy_out_str(docs);
  *out_sq_sums = copy_out(sums);
  return (int64_t)sq.size();
}

}  // extern "C"
