// fgpack — memory-mapped packed frame store with threaded batch reads.
//
// TPU-native replacement for the reference's LMDB frame packing +
// torch-DataLoader worker processes (/root/reference/tools/data/create_lmdb.py,
// mmpt/datasets/video_dataset.py LMDB readers): video frames are packed into
// one flat file with an index; this reader mmaps the file and serves batch
// reads with a pthread pool, so the (single-process) JAX host loop gets
// parallel page-in + copy without Python worker processes.
//
// File layout (little endian):
//   [0:4]   magic "FGPK"
//   [4:8]   uint32 version (1)
//   [8:16]  uint64 n_records
//   index:  n_records × {uint64 offset, uint64 nbytes,
//                        uint32 height, uint32 width, uint32 channels,
//                        uint32 reserved}
//   data:   raw uint8 HWC blobs
//
// C ABI (ctypes-friendly); see fgvc_tpu/data_io/fgpack.py.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct RecordMeta {
  uint64_t offset;
  uint64_t nbytes;
  uint32_t height;
  uint32_t width;
  uint32_t channels;
  uint32_t reserved;
};

struct Pack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t n_records = 0;
  const RecordMeta* index = nullptr;
};

struct ReadTask {
  const Pack* pack;
  const int64_t* indices;
  int64_t n;
  uint8_t* dst;
  int64_t stride;      // bytes between consecutive output slots
  int64_t next;        // shared work counter
  pthread_mutex_t mu;
  int error;           // set when any index is invalid or oversized
};

void* read_worker(void* arg) {
  ReadTask* t = static_cast<ReadTask*>(arg);
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int64_t i = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (i >= t->n) break;
    int64_t rec = t->indices[i];
    // invalid index or a record larger than the output slot is an ERROR —
    // skipping silently would hand uninitialized memory to the caller and
    // an oversized memcpy would overflow the destination buffer
    if (rec < 0 || rec >= static_cast<int64_t>(t->pack->n_records)) {
      t->error = 1;
      continue;
    }
    const RecordMeta& m = t->pack->index[rec];
    if (static_cast<int64_t>(m.nbytes) > t->stride) {
      t->error = 1;
      continue;
    }
    std::memcpy(t->dst + i * t->stride, t->pack->base + m.offset, m.nbytes);
  }
  return nullptr;
}

}  // namespace

extern "C" {

void* fgpack_open(const char* path) {
  Pack* p = new Pack();
  p->fd = ::open(path, O_RDONLY);
  if (p->fd < 0) { delete p; return nullptr; }
  struct stat st;
  if (fstat(p->fd, &st) != 0 || st.st_size < 16) {
    ::close(p->fd); delete p; return nullptr;
  }
  p->size = static_cast<size_t>(st.st_size);
  void* mem = mmap(nullptr, p->size, PROT_READ, MAP_SHARED, p->fd, 0);
  if (mem == MAP_FAILED) { ::close(p->fd); delete p; return nullptr; }
  p->base = static_cast<const uint8_t*>(mem);
  if (std::memcmp(p->base, "FGPK", 4) != 0) {
    munmap(mem, p->size); ::close(p->fd); delete p; return nullptr;
  }
  uint32_t version = 0;
  std::memcpy(&version, p->base + 4, 4);
  std::memcpy(&p->n_records, p->base + 8, 8);
  // reject unknown versions and files too short to hold the index —
  // a truncated copy would otherwise SIGSEGV on the first record read
  size_t index_end = 16 + p->n_records * sizeof(RecordMeta);
  if (version != 1 || index_end > p->size) {
    munmap(mem, p->size); ::close(p->fd); delete p; return nullptr;
  }
  p->index = reinterpret_cast<const RecordMeta*>(p->base + 16);
  for (uint64_t i = 0; i < p->n_records; ++i) {
    const RecordMeta& m = p->index[i];
    if (m.offset + m.nbytes > p->size) {
      munmap(mem, p->size); ::close(p->fd); delete p; return nullptr;
    }
  }
  return p;
}

int64_t fgpack_count(void* handle) {
  return handle ? static_cast<int64_t>(static_cast<Pack*>(handle)->n_records)
                : -1;
}

// Writes {height, width, channels, nbytes} into out[0..3]; returns 0 on ok.
int fgpack_record_info(void* handle, int64_t i, int64_t* out) {
  Pack* p = static_cast<Pack*>(handle);
  if (!p || i < 0 || i >= static_cast<int64_t>(p->n_records)) return -1;
  const RecordMeta& m = p->index[i];
  out[0] = m.height; out[1] = m.width; out[2] = m.channels;
  out[3] = static_cast<int64_t>(m.nbytes);
  return 0;
}

// Parallel batch read: record indices[i] is copied to dst + i*stride.
int fgpack_read_batch(void* handle, const int64_t* indices, int64_t n,
                      uint8_t* dst, int64_t stride, int n_threads) {
  Pack* p = static_cast<Pack*>(handle);
  if (!p || n <= 0) return -1;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 16) n_threads = 16;
  ReadTask task{p, indices, n, dst, stride, 0, PTHREAD_MUTEX_INITIALIZER, 0};
  if (n_threads == 1) {
    read_worker(&task);
    return task.error ? -2 : 0;
  }
  pthread_t threads[16];
  for (int i = 0; i < n_threads; ++i)
    pthread_create(&threads[i], nullptr, read_worker, &task);
  for (int i = 0; i < n_threads; ++i) pthread_join(threads[i], nullptr);
  return task.error ? -2 : 0;
}

// Hint the kernel to page-in a record range ahead of use.
int fgpack_prefetch(void* handle, int64_t lo, int64_t hi) {
  Pack* p = static_cast<Pack*>(handle);
  if (!p || lo < 0 || hi > static_cast<int64_t>(p->n_records) || lo >= hi)
    return -1;
  uint64_t start = p->index[lo].offset;
  uint64_t end = p->index[hi - 1].offset + p->index[hi - 1].nbytes;
  long page = sysconf(_SC_PAGESIZE);
  uint64_t astart = start & ~static_cast<uint64_t>(page - 1);
  return madvise(const_cast<uint8_t*>(p->base) + astart, end - astart,
                 MADV_WILLNEED);
}

void fgpack_close(void* handle) {
  Pack* p = static_cast<Pack*>(handle);
  if (!p) return;
  if (p->base) munmap(const_cast<uint8_t*>(p->base), p->size);
  if (p->fd >= 0) ::close(p->fd);
  delete p;
}

}  // extern "C"
