// Native record-store reader: mmap'd blob log + flat binary index.
//
// Host-side data-plane replacement for the role liblmdb plays in the
// reference (util/lmdb_loader.py:59-71 opens per-worker LMDB envs through
// Python bindings). This reader mmaps <dir>/data.bin once, parses
// <dir>/index.bin (written by data/records.py:FaceRecordWriter), and serves
// zero-copy payload pointers plus GIL-free batched gathers — many Python
// threads can fetch simultaneously while cv2 decodes.
//
// Format of index.bin:  "VLFR" | u32 version | u64 n
//                       | u64 offsets[n] | u32 lengths[n] | i64 labels[n]

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Store {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t data_size = 0;
  std::vector<uint64_t> offsets;
  std::vector<uint32_t> lengths;
  std::vector<int64_t> labels;
};

bool ReadIndex(const std::string& dir, Store* s) {
  FILE* f = fopen((dir + "/index.bin").c_str(), "rb");
  if (!f) return false;
  char magic[4];
  uint32_t version;
  uint64_t n;
  bool ok = fread(magic, 1, 4, f) == 4 && memcmp(magic, "VLFR", 4) == 0 &&
            fread(&version, 4, 1, f) == 1 && version == 1 &&
            fread(&n, 8, 1, f) == 1;
  if (ok) {
    s->offsets.resize(n);
    s->lengths.resize(n);
    s->labels.resize(n);
    ok = fread(s->offsets.data(), 8, n, f) == n &&
         fread(s->lengths.data(), 4, n, f) == n &&
         fread(s->labels.data(), 8, n, f) == n;
  }
  fclose(f);
  return ok;
}

}  // namespace

extern "C" {

void* rs_open(const char* directory) {
  auto s = new Store();
  std::string dir(directory);
  if (!ReadIndex(dir, s)) {
    delete s;
    return nullptr;
  }
  s->fd = open((dir + "/data.bin").c_str(), O_RDONLY);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  struct stat st;
  fstat(s->fd, &st);
  s->data_size = static_cast<size_t>(st.st_size);
  if (s->data_size > 0) {
    void* m = mmap(nullptr, s->data_size, PROT_READ, MAP_SHARED, s->fd, 0);
    if (m == MAP_FAILED) {
      close(s->fd);
      delete s;
      return nullptr;
    }
    s->data = static_cast<const uint8_t*>(m);
    madvise(m, s->data_size, MADV_RANDOM);
  }
  return s;
}

void rs_close(void* h) {
  auto s = static_cast<Store*>(h);
  if (s->data) munmap(const_cast<uint8_t*>(s->data), s->data_size);
  if (s->fd >= 0) close(s->fd);
  delete s;
}

int64_t rs_count(void* h) { return static_cast<Store*>(h)->offsets.size(); }

const int64_t* rs_labels(void* h) { return static_cast<Store*>(h)->labels.data(); }

// zero-copy view of one record
const uint8_t* rs_payload(void* h, int64_t i, int64_t* size_out) {
  auto s = static_cast<Store*>(h);
  *size_out = s->lengths[i];
  return s->data + s->offsets[i];
}

// batched gather: copies n payloads back-to-back into out (caller sized it
// via rs_batch_size); out_offsets[n+1] receives the prefix offsets.
void rs_gather(void* h, const int64_t* indices, int64_t n, uint8_t* out,
               int64_t* out_offsets) {
  auto s = static_cast<Store*>(h);
  int64_t pos = 0;
  for (int64_t j = 0; j < n; ++j) {
    const int64_t i = indices[j];
    out_offsets[j] = pos;
    const uint32_t len = s->lengths[i];
    memcpy(out + pos, s->data + s->offsets[i], len);
    pos += len;
  }
  out_offsets[n] = pos;
}

int64_t rs_batch_size(void* h, const int64_t* indices, int64_t n) {
  auto s = static_cast<Store*>(h);
  int64_t total = 0;
  for (int64_t j = 0; j < n; ++j) total += s->lengths[indices[j]];
  return total;
}

}  // extern "C"
