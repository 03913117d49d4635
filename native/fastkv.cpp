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
