// fgpack — memory-mapped packed frame store with threaded batch reads and
// native JPEG decode.
//
// TPU-native replacement for the reference's LMDB frame packing +
// torch-DataLoader worker processes (/root/reference/tools/data/create_lmdb.py,
// mmpt/datasets/video_dataset.py LMDB readers): video frames are packed into
// one flat file with an index; this reader mmaps the file and serves batch
// reads with a pthread pool, so the (single-process) JAX host loop gets
// parallel page-in + decode + copy without Python worker processes and
// without holding the GIL (ctypes releases it around the call).
//
// v2 adds two things the reference's loader did in Python/OpenCV:
//   * JPEG records (codec=1), decoded in the worker threads via libjpeg —
//     the same backend the reference's mmcv.imfrombytes path bottoms out in.
//   * direct-to-I420 output (layout=1): frames come back as YUV 4:2:0
//     planes — the eval harness's wire format for host→TPU upload
//     (fgvc_tpu/ops/color.py) — using OpenCV's exact BT.601 studio-swing
//     fixed-point arithmetic (top-left chroma siting), verified bit-exact
//     against cv2.COLOR_RGB2YUV_I420 in tests/test_fgpack.py.
//
// File layout (little endian):
//   [0:4]   magic "FGPK"
//   [4:8]   uint32 version (1 = raw only, 2 = per-record codec)
//   [8:16]  uint64 n_records
//   index:  n_records × {uint64 offset, uint64 nbytes,
//                        uint32 height, uint32 width, uint32 channels,
//                        uint32 codec}           (codec 0=raw u8 HWC, 1=JPEG;
//                                                 h/w/c are DECODED dims)
//   data:   record blobs
//
// C ABI (ctypes-friendly); see fgvc_tpu/data_io/fgpack.py.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>

namespace {

constexpr uint32_t kCodecRaw = 0;
constexpr uint32_t kCodecJpeg = 1;
constexpr int kLayoutHWC = 0;   // uint8 HWC, as decoded (RGB for JPEG)
constexpr int kLayoutI420 = 1;  // uint8 (h*3/2, w) YUV 4:2:0 planes

struct RecordMeta {
  uint64_t offset;
  uint64_t nbytes;
  uint32_t height;
  uint32_t width;
  uint32_t channels;
  uint32_t codec;
};

struct Pack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t n_records = 0;
  const RecordMeta* index = nullptr;
};

// ---------------------------------------------------------------------- //
// JPEG decode (libjpeg).  The default libjpeg error handler exit()s the
// process; route fatal errors through setjmp instead.

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf env;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->env, 1);
}

// Corrupt records already surface as a batch error; keep worker threads
// from spraying libjpeg warnings ("Premature end of JPEG file") on stderr.
void jpeg_silent_message(j_common_ptr) {}

// Decode `src[0:nbytes]` into dst (h*w*3 RGB).  Returns 0 on success, -1 on
// decode error or dimension mismatch.
int decode_jpeg_rgb(const uint8_t* src, size_t nbytes, uint8_t* dst,
                    uint32_t h, uint32_t w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  jerr.mgr.output_message = jpeg_silent_message;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(src),
               static_cast<unsigned long>(nbytes));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_width != w || cinfo.output_height != h ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  const size_t row_stride = static_cast<size_t>(w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = dst + cinfo.output_scanline * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------- //
// RGB → I420 (YUV 4:2:0 planes), bit-exact vs cv2.COLOR_RGB2YUV_I420:
// ITU-R BT.601 studio swing, shift-20 fixed point, round-half-up, chroma
// from the TOP-LEFT pixel of each 2×2 block (OpenCV sites chroma there, it
// does not average).  Y constant CGY fitted exactly against cv2 output
// (528482 = round(0.504·2^20)); U/V constants are OpenCV's published set.
constexpr int kShift = 20;
constexpr int kHalf = 1 << (kShift - 1);

inline uint8_t clamp_u8(int v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

void rgb_to_i420(const uint8_t* rgb, uint8_t* dst, uint32_t h, uint32_t w) {
  uint8_t* yp = dst;
  uint8_t* up = dst + static_cast<size_t>(h) * w;
  uint8_t* vp = up + static_cast<size_t>(h / 2) * (w / 2);
  for (uint32_t r = 0; r < h; ++r) {
    const uint8_t* px = rgb + static_cast<size_t>(r) * w * 3;
    for (uint32_t c = 0; c < w; ++c, px += 3) {
      const int R = px[0], G = px[1], B = px[2];
      yp[static_cast<size_t>(r) * w + c] = clamp_u8(
          (269484 * R + 528482 * G + 102760 * B + (16 << kShift) + kHalf) >>
          kShift);
      if ((r & 1) == 0 && (c & 1) == 0) {
        const size_t ci = static_cast<size_t>(r / 2) * (w / 2) + c / 2;
        up[ci] = clamp_u8(
            (-155188 * R - 305135 * G + 460324 * B + (128 << kShift) + kHalf) >>
            kShift);
        vp[ci] = clamp_u8(
            (460324 * R - 385875 * G - 74448 * B + (128 << kShift) + kHalf) >>
            kShift);
      }
    }
  }
}

// ---------------------------------------------------------------------- //

inline int64_t out_nbytes(uint32_t h, uint32_t w, uint32_t c, int layout) {
  if (layout == kLayoutI420)
    return static_cast<int64_t>(h) * w * 3 / 2;
  return static_cast<int64_t>(h) * w * c;
}

struct ReadTask {
  const Pack* pack;
  const int64_t* indices;
  int64_t n;
  uint8_t* dst;
  int64_t stride;  // bytes between consecutive output slots
  int layout;
  int64_t next;  // shared work counter
  pthread_mutex_t mu;
  int error;  // set when any index is invalid, oversized, or fails to decode
};

// Produce one record into `slot` (capacity `stride`).  `scratch` holds
// h*w*3 bytes for decode-then-convert paths; both buffers are caller-owned.
int produce_record(const RecordMeta& m, const uint8_t* blob, uint8_t* slot,
                   int64_t stride, int layout, uint8_t* scratch) {
  if (layout == kLayoutI420 &&
      (m.channels != 3 || (m.height | m.width) & 1))
    return -1;  // I420 needs even-sized RGB frames
  if (out_nbytes(m.height, m.width, m.channels, layout) > stride) return -1;

  if (m.codec == kCodecRaw) {
    if (layout == kLayoutHWC) {
      std::memcpy(slot, blob, m.nbytes);
      return 0;
    }
    rgb_to_i420(blob, slot, m.height, m.width);
    return 0;
  }
  if (m.codec == kCodecJpeg) {
    uint8_t* rgb = (layout == kLayoutHWC) ? slot : scratch;
    if (decode_jpeg_rgb(blob, m.nbytes, rgb, m.height, m.width) != 0)
      return -1;
    if (layout == kLayoutI420) rgb_to_i420(rgb, slot, m.height, m.width);
    return 0;
  }
  return -1;  // unknown codec
}

void* read_worker(void* arg) {
  ReadTask* t = static_cast<ReadTask*>(arg);
  uint8_t* scratch = nullptr;
  size_t scratch_size = 0;
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int64_t i = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (i >= t->n) break;
    int64_t rec = t->indices[i];
    // invalid index, oversized record, or decode failure is an ERROR —
    // skipping silently would hand uninitialized memory to the caller
    if (rec < 0 || rec >= static_cast<int64_t>(t->pack->n_records)) {
      t->error = 1;
      continue;
    }
    const RecordMeta& m = t->pack->index[rec];
    const size_t need = static_cast<size_t>(m.height) * m.width * 3;
    if (t->layout == kLayoutI420 && m.codec == kCodecJpeg &&
        need > scratch_size) {
      scratch = static_cast<uint8_t*>(realloc(scratch, need));
      scratch_size = need;
    }
    if (produce_record(m, t->pack->base + m.offset, t->dst + i * t->stride,
                       t->stride, t->layout, scratch) != 0)
      t->error = 1;
  }
  free(scratch);
  return nullptr;
}

// In-memory JPEG batch decode (TAP-Vid pickles hold per-frame JPEG byte
// strings; reference decodes them one by one under the GIL).
struct MemTask {
  const uint8_t* const* bufs;
  const int64_t* sizes;
  int64_t n;
  uint8_t* dst;
  int64_t stride;
  int layout;
  uint32_t h, w;
  int64_t next;
  pthread_mutex_t mu;
  int error;
};

void* mem_worker(void* arg) {
  MemTask* t = static_cast<MemTask*>(arg);
  uint8_t* scratch = nullptr;
  if (t->layout == kLayoutI420)
    scratch = static_cast<uint8_t*>(
        malloc(static_cast<size_t>(t->h) * t->w * 3));
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int64_t i = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (i >= t->n) break;
    RecordMeta m{0, static_cast<uint64_t>(t->sizes[i]), t->h, t->w, 3,
                 kCodecJpeg};
    if (produce_record(m, t->bufs[i], t->dst + i * t->stride, t->stride,
                       t->layout, scratch) != 0)
      t->error = 1;
  }
  free(scratch);
  return nullptr;
}

int run_pool(void* (*worker)(void*), void* task, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 16) n_threads = 16;
  if (n_threads == 1) {
    worker(task);
    return 0;
  }
  pthread_t threads[16];
  for (int i = 0; i < n_threads; ++i)
    pthread_create(&threads[i], nullptr, worker, task);
  for (int i = 0; i < n_threads; ++i) pthread_join(threads[i], nullptr);
  return 0;
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
  if ((version != 1 && version != 2) || index_end > p->size) {
    munmap(mem, p->size); ::close(p->fd); delete p; return nullptr;
  }
  p->index = reinterpret_cast<const RecordMeta*>(p->base + 16);
  for (uint64_t i = 0; i < p->n_records; ++i) {
    const RecordMeta& m = p->index[i];
    if (m.offset + m.nbytes > p->size ||
        (version == 1 && m.codec != kCodecRaw)) {
      munmap(mem, p->size); ::close(p->fd); delete p; return nullptr;
    }
  }
  return p;
}

int64_t fgpack_count(void* handle) {
  return handle ? static_cast<int64_t>(static_cast<Pack*>(handle)->n_records)
                : -1;
}

// Writes {height, width, channels, stored_nbytes, codec} into out[0..4];
// returns 0 on ok.  height/width/channels are the DECODED dims.
int fgpack_record_info(void* handle, int64_t i, int64_t* out) {
  Pack* p = static_cast<Pack*>(handle);
  if (!p || i < 0 || i >= static_cast<int64_t>(p->n_records)) return -1;
  const RecordMeta& m = p->index[i];
  out[0] = m.height; out[1] = m.width; out[2] = m.channels;
  out[3] = static_cast<int64_t>(m.nbytes);
  out[4] = m.codec;
  return 0;
}

// Parallel batch read/decode: record indices[i] lands at dst + i*stride.
// layout 0 = decoded HWC uint8; layout 1 = I420 planes (h*3/2, w).
int fgpack_read_batch(void* handle, const int64_t* indices, int64_t n,
                      uint8_t* dst, int64_t stride, int n_threads,
                      int layout) {
  Pack* p = static_cast<Pack*>(handle);
  if (!p || n <= 0 || (layout != kLayoutHWC && layout != kLayoutI420))
    return -1;
  ReadTask task{p,      indices, n, dst, stride, layout,
                0,      PTHREAD_MUTEX_INITIALIZER,
                0};
  run_pool(read_worker, &task, n_threads);
  return task.error ? -2 : 0;
}

// Decode n in-memory JPEG buffers (bufs[i], sizes[i] bytes) of identical
// decoded size (h, w, 3) into dst slots.  Same layout semantics as above.
int fgpack_decode_jpeg_batch(const uint8_t* const* bufs, const int64_t* sizes,
                             int64_t n, int64_t h, int64_t w, uint8_t* dst,
                             int64_t stride, int n_threads, int layout) {
  if (!bufs || n <= 0 || h <= 0 || w <= 0 ||
      (layout != kLayoutHWC && layout != kLayoutI420))
    return -1;
  MemTask task{bufs,
               sizes,
               n,
               dst,
               stride,
               layout,
               static_cast<uint32_t>(h),
               static_cast<uint32_t>(w),
               0,
               PTHREAD_MUTEX_INITIALIZER,
               0};
  run_pool(mem_worker, &task, n_threads);
  return task.error ? -2 : 0;
}

// RGB → I420 batch conversion (n frames, h×w×3 each).  Bit-exact vs
// cv2.COLOR_RGB2YUV_I420 (~0.1 ms/frame at 256² — no pool needed); used by
// the upload encoder when frames are already in host memory as RGB.
int fgpack_rgb_to_i420_batch(const uint8_t* rgb, int64_t n, int64_t h,
                             int64_t w, uint8_t* dst) {
  if (!rgb || !dst || n <= 0 || h <= 0 || w <= 0 || ((h | w) & 1)) return -1;
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  const size_t out_stride = static_cast<size_t>(h) * w * 3 / 2;
  for (int64_t i = 0; i < n; ++i)
    rgb_to_i420(rgb + i * in_stride, dst + i * out_stride,
                static_cast<uint32_t>(h), static_cast<uint32_t>(w));
  return 0;
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
