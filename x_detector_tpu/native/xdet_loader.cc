// Native host-side data loader for x_detector_tpu.
//
// Replaces the tf.data input pipeline's C++ (the only runtime-native layer
// the TF1 reference leaned on — SURVEY.md §1 "TensorFlow 1.x runtime":
// queue-runner/tf.data host threads feeding the accelerator) with a
// self-contained implementation:
//
//   * TFRecord framing: {uint64 length, u32 masked-crc32c(length),
//     bytes data[length], u32 masked-crc32c(data)}.  CRCs are verified with
//     a software CRC32C (Castagnoli).
//   * tf.train.Example parsing: a minimal protobuf wire-format reader for
//     the fixed feature schema written by data/tfrecord.py (bytes_list /
//     packed+unpacked float_list / int64_list).  No protoc codegen needed.
//   * JPEG decode via libjpeg, bilinear resize to a square canvas.
//   * A worker thread pool with a bounded output queue and a shuffle
//     buffer, exposed through a C API consumed by ctypes
//     (x_detector_tpu/data/native_loader.py).
//
// Build: make -C x_detector_tpu/native   (produces libxdet_loader.so)

#include <csetjmp>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli), table-driven; TFRecord "masked" variant.
// ---------------------------------------------------------------------------

uint32_t kCrcTable[256];
struct CrcInit {
  CrcInit() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c >> 1) ^ ((c & 1) ? 0x82f63b78u : 0u);
      kCrcTable[i] = c;
    }
  }
} crc_init;

uint32_t Crc32c(const uint8_t* data, size_t n) {
  uint32_t c = 0xffffffffu;
  for (size_t i = 0; i < n; ++i)
    c = kCrcTable[(c ^ data[i]) & 0xff] ^ (c >> 8);
  return c ^ 0xffffffffu;
}

uint32_t MaskedCrc(const uint8_t* data, size_t n) {
  uint32_t crc = Crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ---------------------------------------------------------------------------
// Protobuf wire-format primitives.
// ---------------------------------------------------------------------------

struct Slice {
  const uint8_t* p;
  size_t n;
};

bool ReadVarint(Slice* s, uint64_t* out) {
  uint64_t v = 0;
  int shift = 0;
  while (s->n > 0 && shift < 64) {
    uint8_t b = *s->p;
    s->p++; s->n--;
    v |= uint64_t(b & 0x7f) << shift;
    if (!(b & 0x80)) { *out = v; return true; }
    shift += 7;
  }
  return false;
}

// Reads one field header; returns field number, wire type.
bool ReadTag(Slice* s, uint32_t* field, uint32_t* wire) {
  uint64_t tag;
  if (!ReadVarint(s, &tag)) return false;
  *field = uint32_t(tag >> 3);
  *wire = uint32_t(tag & 7);
  return true;
}

bool SkipField(Slice* s, uint32_t wire) {
  uint64_t tmp;
  switch (wire) {
    case 0: return ReadVarint(s, &tmp);                      // varint
    case 1: if (s->n < 8) return false; s->p += 8; s->n -= 8; return true;
    case 2: {                                                // length-delim
      if (!ReadVarint(s, &tmp) || s->n < tmp) return false;
      s->p += tmp; s->n -= tmp; return true;
    }
    case 5: if (s->n < 4) return false; s->p += 4; s->n -= 4; return true;
    default: return false;
  }
}

bool ReadLenDelim(Slice* s, Slice* out) {
  uint64_t len;
  if (!ReadVarint(s, &len) || s->n < len) return false;
  out->p = s->p; out->n = len;
  s->p += len; s->n -= len;
  return true;
}

// ---------------------------------------------------------------------------
// tf.train.Example subset parser.
// ---------------------------------------------------------------------------

struct ParsedExample {
  std::string encoded;          // image/encoded
  std::string image_id;         // image/id
  std::vector<float> ymin, xmin, ymax, xmax;
  std::vector<int64_t> labels, difficult;
};

void ParseFloatList(Slice body, std::vector<float>* out) {
  // FloatList { repeated float value = 1; } — packed or unpacked.
  uint32_t field, wire;
  Slice s = body;
  while (s.n > 0 && ReadTag(&s, &field, &wire)) {
    if (field == 1 && wire == 2) {               // packed
      Slice packed;
      if (!ReadLenDelim(&s, &packed)) return;
      while (packed.n >= 4) {
        float f;
        memcpy(&f, packed.p, 4);
        out->push_back(f);
        packed.p += 4; packed.n -= 4;
      }
    } else if (field == 1 && wire == 5) {        // unpacked
      if (s.n < 4) return;
      float f;
      memcpy(&f, s.p, 4);
      out->push_back(f);
      s.p += 4; s.n -= 4;
    } else if (!SkipField(&s, wire)) {
      return;
    }
  }
}

void ParseInt64List(Slice body, std::vector<int64_t>* out) {
  uint32_t field, wire;
  Slice s = body;
  while (s.n > 0 && ReadTag(&s, &field, &wire)) {
    if (field == 1 && wire == 2) {               // packed
      Slice packed;
      if (!ReadLenDelim(&s, &packed)) return;
      uint64_t v;
      while (packed.n > 0 && ReadVarint(&packed, &v))
        out->push_back(int64_t(v));
    } else if (field == 1 && wire == 0) {
      uint64_t v;
      if (!ReadVarint(&s, &v)) return;
      out->push_back(int64_t(v));
    } else if (!SkipField(&s, wire)) {
      return;
    }
  }
}

void ParseBytesList(Slice body, std::string* out) {
  uint32_t field, wire;
  Slice s = body;
  while (s.n > 0 && ReadTag(&s, &field, &wire)) {
    if (field == 1 && wire == 2) {
      Slice v;
      if (!ReadLenDelim(&s, &v)) return;
      out->assign(reinterpret_cast<const char*>(v.p), v.n);
      return;                                    // first value only
    }
    if (!SkipField(&s, wire)) return;
  }
}

// Feature { oneof kind { BytesList bytes_list=1; FloatList float_list=2;
//                        Int64List int64_list=3; } }
void DispatchFeature(const std::string& key, Slice feat, ParsedExample* ex) {
  uint32_t field, wire;
  Slice s = feat;
  while (s.n > 0 && ReadTag(&s, &field, &wire)) {
    Slice body;
    if (wire != 2 || !ReadLenDelim(&s, &body)) {
      if (!SkipField(&s, wire)) return;
      continue;
    }
    if (field == 1) {                            // bytes_list
      if (key == "image/encoded") ParseBytesList(body, &ex->encoded);
      else if (key == "image/id") ParseBytesList(body, &ex->image_id);
    } else if (field == 2) {                     // float_list
      if (key == "image/object/bbox/ymin") ParseFloatList(body, &ex->ymin);
      else if (key == "image/object/bbox/xmin") ParseFloatList(body, &ex->xmin);
      else if (key == "image/object/bbox/ymax") ParseFloatList(body, &ex->ymax);
      else if (key == "image/object/bbox/xmax") ParseFloatList(body, &ex->xmax);
    } else if (field == 3) {                     // int64_list
      if (key == "image/object/bbox/label") ParseInt64List(body, &ex->labels);
      else if (key == "image/object/bbox/difficult")
        ParseInt64List(body, &ex->difficult);
    }
  }
}

bool ParseExample(const uint8_t* data, size_t n, ParsedExample* ex) {
  // Example { Features features = 1; }
  // Features { map<string, Feature> feature = 1; }  (map entry: key=1, value=2)
  Slice s{data, n};
  uint32_t field, wire;
  while (s.n > 0 && ReadTag(&s, &field, &wire)) {
    if (field == 1 && wire == 2) {               // features
      Slice feats;
      if (!ReadLenDelim(&s, &feats)) return false;
      uint32_t f2, w2;
      while (feats.n > 0 && ReadTag(&feats, &f2, &w2)) {
        if (f2 == 1 && w2 == 2) {                // one map entry
          Slice entry;
          if (!ReadLenDelim(&feats, &entry)) return false;
          std::string key;
          Slice value{nullptr, 0};
          uint32_t f3, w3;
          while (entry.n > 0 && ReadTag(&entry, &f3, &w3)) {
            Slice body;
            if (w3 != 2 || !ReadLenDelim(&entry, &body)) {
              if (!SkipField(&entry, w3)) return false;
              continue;
            }
            if (f3 == 1)
              key.assign(reinterpret_cast<const char*>(body.p), body.n);
            else if (f3 == 2)
              value = body;
          }
          if (!key.empty() && value.p) DispatchFeature(key, value, ex);
        } else if (!SkipField(&feats, w2)) {
          return false;
        }
      }
    } else if (!SkipField(&s, wire)) {
      return false;
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// JPEG decode + bilinear resize.
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void JpegErrorExit(j_common_ptr cinfo) {
  // libjpeg's default error_exit calls exit(); longjmp back so one corrupt
  // image is skipped instead of killing the training process.
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool DecodeJpeg(const std::string& bytes, std::vector<uint8_t>* rgb,
                int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
  if (bytes.size() < 4 || uint8_t(bytes[0]) != 0xFF ||
      uint8_t(bytes[1]) != 0xD8)
    return false;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, reinterpret_cast<const unsigned char*>(bytes.data()),
               bytes.size());
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  rgb->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Resize src (sh x sw) to (dh x dw), writing into dst whose rows are
// ``dst_stride`` pixels wide (dst_stride >= dw; letterbox writes into the
// top-left of a larger zeroed canvas).
void ResizeBilinear(const uint8_t* src, int sh, int sw, float* dst,
                    int dh, int dw, int dst_stride) {
  // float output in [0, 255]; half-pixel-center sampling, clamped.
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sh / dh - 0.5f;
    fy = std::max(0.f, std::min(fy, float(sh - 1)));
    int y0 = int(fy), y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sw / dw - 0.5f;
      fx = std::max(0.f, std::min(fx, float(sw - 1)));
      int x0 = int(fx), x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(size_t(y0) * sw + x0) * 3 + c];
        float v01 = src[(size_t(y0) * sw + x1) * 3 + c];
        float v10 = src[(size_t(y1) * sw + x0) * 3 + c];
        float v11 = src[(size_t(y1) * sw + x1) * 3 + c];
        dst[(size_t(y) * dst_stride + x) * 3 + c] =
            (1 - wy) * ((1 - wx) * v00 + wx * v01) +
            wy * ((1 - wx) * v10 + wx * v11);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Loader: shard reading, worker pool, bounded queue.
// ---------------------------------------------------------------------------

struct DecodedExample {
  std::vector<float> image;       // canvas*canvas*3
  std::vector<float> boxes;       // max_gt*4 (canvas-normalized)
  std::vector<int32_t> labels;    // max_gt
  std::vector<uint8_t> mask;      // max_gt
  std::vector<uint8_t> difficult; // max_gt
  float box_scale[2] = {1.f, 1.f};  // content fraction [fy, fx] (letterbox)
  std::string image_id;
};

struct Loader {
  std::vector<std::string> paths;
  int canvas, max_gt, batch;
  bool shuffle, repeat, letterbox = false;
  uint64_t seed;
  int num_threads;

  std::deque<std::unique_ptr<DecodedExample>> queue;
  std::mutex mu;
  std::condition_variable cv_can_push, cv_can_pop;
  size_t max_queue = 256;
  std::atomic<bool> done{false};
  std::atomic<bool> stop{false};
  std::atomic<int> active_workers{0};
  std::vector<std::thread> workers;

  ~Loader() {
    {
      // Flag under the mutex so a thread between predicate check and
      // wait() cannot miss the wakeup.
      std::lock_guard<std::mutex> lock(mu);
      stop = true;
    }
    cv_can_push.notify_all();
    cv_can_pop.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

// Reads one TFRecord frame; returns false at EOF/corruption.
bool ReadRecord(FILE* f, std::vector<uint8_t>* out) {
  uint8_t header[12];
  if (fread(header, 1, 12, f) != 12) return false;
  uint64_t len;
  memcpy(&len, header, 8);
  uint32_t len_crc;
  memcpy(&len_crc, header + 8, 4);
  if (MaskedCrc(header, 8) != len_crc) return false;
  if (len > (1ull << 31)) return false;
  out->resize(len);
  if (fread(out->data(), 1, len, f) != len) return false;
  uint8_t crc_buf[4];
  if (fread(crc_buf, 1, 4, f) != 4) return false;
  uint32_t data_crc;
  memcpy(&data_crc, crc_buf, 4);
  return MaskedCrc(out->data(), len) == data_crc;
}

std::unique_ptr<DecodedExample> DecodeOne(const std::vector<uint8_t>& rec,
                                          int canvas, int max_gt,
                                          bool letterbox) {
  ParsedExample ex;
  if (!ParseExample(rec.data(), rec.size(), &ex) || ex.encoded.empty())
    return nullptr;
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeJpeg(ex.encoded, &rgb, &w, &h) || w <= 0 || h <= 0)
    return nullptr;

  auto out = std::make_unique<DecodedExample>();
  out->image.assign(size_t(canvas) * canvas * 3, 0.f);
  if (letterbox) {
    float scale = float(canvas) / std::max(h, w);
    int h1 = std::max(1, int(h * scale + 0.5f));
    int w1 = std::max(1, int(w * scale + 0.5f));
    h1 = std::min(h1, canvas);
    w1 = std::min(w1, canvas);
    ResizeBilinear(rgb.data(), h, w, out->image.data(), h1, w1, canvas);
    out->box_scale[0] = float(h1) / canvas;
    out->box_scale[1] = float(w1) / canvas;
  } else {
    ResizeBilinear(rgb.data(), h, w, out->image.data(), canvas, canvas,
                   canvas);
  }
  out->boxes.assign(size_t(max_gt) * 4, 0.f);
  out->labels.assign(max_gt, 0);
  out->mask.assign(max_gt, 0);
  out->difficult.assign(max_gt, 0);
  size_t n = std::min<size_t>(ex.ymin.size(), max_gt);
  const float fy = out->box_scale[0], fx = out->box_scale[1];
  for (size_t i = 0; i < n; ++i) {
    out->boxes[i * 4 + 0] = ex.ymin[i] * fy;
    out->boxes[i * 4 + 1] = ex.xmin[i] * fx;
    out->boxes[i * 4 + 2] = ex.ymax[i] * fy;
    out->boxes[i * 4 + 3] = ex.xmax[i] * fx;
    out->labels[i] = i < ex.labels.size() ? int32_t(ex.labels[i]) : 0;
    out->mask[i] = 1;
    out->difficult[i] = i < ex.difficult.size() && ex.difficult[i] ? 1 : 0;
  }
  out->image_id = ex.image_id;
  return out;
}

void Push(Loader* L, std::unique_ptr<DecodedExample> ex) {
  std::unique_lock<std::mutex> lock(L->mu);
  L->cv_can_push.wait(lock, [L] {
    return L->queue.size() < L->max_queue || L->stop;
  });
  if (L->stop) return;
  L->queue.push_back(std::move(ex));
  L->cv_can_pop.notify_one();
}

void WorkerMain(Loader* L, int worker_id) {
  std::mt19937_64 rng(L->seed + worker_id * 1000003ull);
  // shard ownership: worker i takes paths i, i+T, i+2T, ...
  std::vector<std::string> my_paths;
  for (size_t i = worker_id; i < L->paths.size(); i += L->num_threads)
    my_paths.push_back(L->paths[i]);

  // shuffle buffer for approximate global shuffling
  std::vector<std::unique_ptr<DecodedExample>> buffer;
  const size_t kBuf = 512;

  bool first_epoch = true;
  while (!L->stop && !my_paths.empty() && (first_epoch || L->repeat)) {
    first_epoch = false;
    auto epoch_paths = my_paths;
    if (L->shuffle)
      std::shuffle(epoch_paths.begin(), epoch_paths.end(), rng);
    for (const auto& path : epoch_paths) {
      FILE* f = fopen(path.c_str(), "rb");
      if (!f) continue;
      std::vector<uint8_t> rec;
      while (!L->stop && ReadRecord(f, &rec)) {
        auto ex = DecodeOne(rec, L->canvas, L->max_gt, L->letterbox);
        if (!ex) continue;
        if (L->shuffle) {
          if (buffer.size() < kBuf) {
            buffer.push_back(std::move(ex));
          } else {
            size_t j = rng() % kBuf;
            std::swap(buffer[j], ex);
            Push(L, std::move(ex));
          }
        } else {
          Push(L, std::move(ex));
        }
      }
      fclose(f);
    }
    // Epoch boundary: flush the shuffle buffer so datasets smaller than
    // kBuf still stream promptly (epoch-wise shuffle for small data,
    // windowed shuffle for large).
    if (L->shuffle) {
      std::shuffle(buffer.begin(), buffer.end(), rng);
      for (auto& ex : buffer) {
        if (L->stop) break;
        Push(L, std::move(ex));
      }
      buffer.clear();
    }
  }
  if (--L->active_workers == 0) {
    {
      std::lock_guard<std::mutex> lock(L->mu);
      L->done = true;
    }
    L->cv_can_pop.notify_all();
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C API (consumed via ctypes).
// ---------------------------------------------------------------------------

extern "C" {

void* xdet_loader_create(const char** paths, int num_paths, int canvas,
                         int max_gt, int batch, int shuffle, uint64_t seed,
                         int repeat, int num_threads, int letterbox) {
  auto* L = new Loader();
  for (int i = 0; i < num_paths; ++i) L->paths.emplace_back(paths[i]);
  L->canvas = canvas;
  L->max_gt = max_gt;
  L->batch = batch;
  L->shuffle = shuffle != 0;
  L->repeat = repeat != 0;
  L->letterbox = letterbox != 0;
  L->seed = seed;
  L->num_threads = std::max(1, std::min(num_threads,
                                        int(L->paths.size())));
  L->active_workers = L->num_threads;
  for (int i = 0; i < L->num_threads; ++i)
    L->workers.emplace_back(WorkerMain, L, i);
  return L;
}

// Fills one batch.  Returns number of examples written (== batch normally,
// < batch on final partial batch, 0 at end of data).
int xdet_loader_next(void* handle, float* images, float* boxes,
                     int32_t* labels, uint8_t* mask, uint8_t* difficult,
                     float* box_scale, char* image_ids, int id_capacity) {
  auto* L = static_cast<Loader*>(handle);
  int count = 0;
  const size_t img_sz = size_t(L->canvas) * L->canvas * 3;
  while (count < L->batch) {
    std::unique_ptr<DecodedExample> ex;
    {
      std::unique_lock<std::mutex> lock(L->mu);
      L->cv_can_pop.wait(lock, [L] {
        return !L->queue.empty() || L->done || L->stop;
      });
      if (L->queue.empty()) break;  // done/stopped and drained
      ex = std::move(L->queue.front());
      L->queue.pop_front();
      L->cv_can_push.notify_one();
    }
    memcpy(images + size_t(count) * img_sz, ex->image.data(),
           img_sz * sizeof(float));
    memcpy(boxes + size_t(count) * L->max_gt * 4, ex->boxes.data(),
           size_t(L->max_gt) * 4 * sizeof(float));
    memcpy(labels + size_t(count) * L->max_gt, ex->labels.data(),
           size_t(L->max_gt) * sizeof(int32_t));
    memcpy(mask + size_t(count) * L->max_gt, ex->mask.data(), L->max_gt);
    memcpy(difficult + size_t(count) * L->max_gt, ex->difficult.data(),
           L->max_gt);
    if (box_scale) {
      box_scale[count * 2 + 0] = ex->box_scale[0];
      box_scale[count * 2 + 1] = ex->box_scale[1];
    }
    if (image_ids && id_capacity > 0) {
      char* dst = image_ids + size_t(count) * id_capacity;
      strncpy(dst, ex->image_id.c_str(), id_capacity - 1);
      dst[id_capacity - 1] = 0;
    }
    ++count;
  }
  return count;
}

void xdet_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
