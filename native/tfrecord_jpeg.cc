// Native host-side data loader: TFRecord framing reader + libjpeg decode with
// fused nearest resize. The reference consumes tf.data's C++ pipeline for
// this work (SURVEY.md 2.6); this is the framework's own native equivalent,
// exposed to Python via ctypes (no pybind11 in the image).
//
// TFRecord framing: { uint64 length, uint32 masked_crc32c(length),
//                     bytes data[length], uint32 masked_crc32c(data) }.
// CRCs are validated with a table-driven CRC32C.
//
// Build: g++ -O3 -shared -fPIC tfrecord_jpeg.cc -ljpeg -o libtfrecord_jpeg.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli), table-driven, with the TFRecord masking scheme.
// ---------------------------------------------------------------------------

static uint32_t kCrcTable[256];
static bool crc_init_done = false;

static void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    kCrcTable[i] = c;
  }
  crc_init_done = true;
}

static uint32_t crc32c(const uint8_t* data, size_t n) {
  crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; i++)
    c = kCrcTable[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

static uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ---------------------------------------------------------------------------
// TFRecord reader.
// ---------------------------------------------------------------------------

struct TfRecordReader {
  FILE* f;
  uint8_t* buf;
  size_t buf_cap;
  int check_crc;
};

void* tfrecord_open(const char* path, int check_crc) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* r = new TfRecordReader{f, (uint8_t*)malloc(1 << 20), 1 << 20,
                               check_crc};
  return r;
}

// Returns record length (>= 0), -2 on EOF, -1 on corruption. Data pointer
// valid until the next call.
int64_t tfrecord_next(void* handle, const uint8_t** out_data) {
  auto* r = (TfRecordReader*)handle;
  uint8_t header[12];
  if (fread(header, 1, 12, r->f) != 12) return -2;  // EOF
  uint64_t len;
  memcpy(&len, header, 8);
  if (r->check_crc) {
    uint32_t len_crc;
    memcpy(&len_crc, header + 8, 4);
    if (masked_crc(header, 8) != len_crc) return -1;
  }
  if (len + 4 > r->buf_cap) {
    r->buf_cap = len + 4;
    r->buf = (uint8_t*)realloc(r->buf, r->buf_cap);
  }
  if (fread(r->buf, 1, len + 4, r->f) != len + 4) return -1;
  if (r->check_crc) {
    uint32_t data_crc;
    memcpy(&data_crc, r->buf + len, 4);
    if (masked_crc(r->buf, len) != data_crc) return -1;
  }
  *out_data = r->buf;
  return (int64_t)len;
}

void tfrecord_rewind(void* handle) {
  auto* r = (TfRecordReader*)handle;
  fseek(r->f, 0, SEEK_SET);
}

void tfrecord_close(void* handle) {
  auto* r = (TfRecordReader*)handle;
  fclose(r->f);
  free(r->buf);
  delete r;
}

// ---------------------------------------------------------------------------
// JPEG decode (+ nearest resize onto a caller-provided RGB canvas).
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(((JpegErr*)cinfo->err)->jb, 1);
}

// Decode JPEG into out (out_h x out_w x 3, uint8), aspect-preserving nearest
// resize placed top-left; writes content dims to content_hw[2].
// Returns 0 on success.
int jpeg_decode_resize(const uint8_t* data, int64_t len, uint8_t* out,
                       int out_h, int out_w, int* content_hw) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // Use libjpeg's fractional DCT scaling to avoid decoding full resolution:
  // pick scale M/8 >= target/src.
  double ratio_h = (double)out_h / cinfo.image_height;
  double ratio_w = (double)out_w / cinfo.image_width;
  double ratio = ratio_h < ratio_w ? ratio_h : ratio_w;
  if (ratio > 1.0) ratio = 1.0;
  int num = (int)(ratio * 8.0 + 0.999);
  if (num < 1) num = 1;
  if (num > 8) num = 8;
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);

  int src_h = cinfo.output_height;
  int src_w = cinfo.output_width;
  int comps = cinfo.output_components;  // 3 (RGB)

  uint8_t* rows = (uint8_t*)malloc((size_t)src_h * src_w * comps);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = rows + (size_t)cinfo.output_scanline * src_w * comps;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // aspect-preserving nearest resize into the canvas (top-left)
  double scale = (double)out_h / src_h;
  double sw = (double)out_w / src_w;
  if (sw < scale) scale = sw;
  int ch = (int)(src_h * scale + 0.5);
  int cw = (int)(src_w * scale + 0.5);
  if (ch > out_h) ch = out_h;
  if (cw > out_w) cw = out_w;
  memset(out, 0, (size_t)out_h * out_w * 3);
  for (int y = 0; y < ch; y++) {
    int sy = (int)(y / scale);
    if (sy >= src_h) sy = src_h - 1;
    const uint8_t* src_row = rows + (size_t)sy * src_w * comps;
    uint8_t* dst_row = out + (size_t)y * out_w * 3;
    for (int x = 0; x < cw; x++) {
      int sx = (int)(x / scale);
      if (sx >= src_w) sx = src_w - 1;
      const uint8_t* p = src_row + (size_t)sx * comps;
      dst_row[x * 3 + 0] = p[0];
      dst_row[x * 3 + 1] = comps > 1 ? p[1] : p[0];
      dst_row[x * 3 + 2] = comps > 2 ? p[2] : p[0];
    }
  }
  free(rows);
  content_hw[0] = ch;
  content_hw[1] = cw;
  return 0;
}

// Decode JPEG filling the WHOLE canvas (independent H/W scales, nearest)
// — the classification train canvas contract (tf.data branch stretches).
int jpeg_decode_stretch(const uint8_t* data, int64_t len, uint8_t* out,
                        int out_h, int out_w, int* content_hw) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  double ratio_h = (double)out_h / cinfo.image_height;
  double ratio_w = (double)out_w / cinfo.image_width;
  double ratio = ratio_h > ratio_w ? ratio_h : ratio_w;  // cover both dims
  if (ratio > 1.0) ratio = 1.0;
  int num = (int)(ratio * 8.0 + 0.999);
  if (num < 1) num = 1;
  if (num > 8) num = 8;
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  int src_h = cinfo.output_height;
  int src_w = cinfo.output_width;
  int comps = cinfo.output_components;
  uint8_t* rows = (uint8_t*)malloc((size_t)src_h * src_w * comps);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = rows + (size_t)cinfo.output_scanline * src_w * comps;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  for (int y = 0; y < out_h; y++) {
    int sy = (int)((double)y * src_h / out_h);
    if (sy >= src_h) sy = src_h - 1;
    const uint8_t* src_row = rows + (size_t)sy * src_w * comps;
    uint8_t* dst_row = out + (size_t)y * out_w * 3;
    for (int x = 0; x < out_w; x++) {
      int sx = (int)((double)x * src_w / out_w);
      if (sx >= src_w) sx = src_w - 1;
      const uint8_t* p = src_row + (size_t)sx * comps;
      dst_row[x * 3 + 0] = p[0];
      dst_row[x * 3 + 1] = comps > 1 ? p[1] : p[0];
      dst_row[x * 3 + 2] = comps > 2 ? p[2] : p[0];
    }
  }
  free(rows);
  content_hw[0] = out_h;
  content_hw[1] = out_w;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Parallel batch pipeline: reader thread -> JPEG-decode worker pool ->
// bounded ready queue of examples -> batch assembly in next_batch().
//
// The reference leans on tf.data's C++ runtime for interleave/parallel-map/
// prefetch (SURVEY.md 2.6); this is the framework-native equivalent for
// classification TFRecords ({"image/encoded", "image/class/label"}).
// Examples are proto-parsed here too (minimal tf.Example wire-format walk),
// so Python only sees ready uint8 canvas batches.
// ---------------------------------------------------------------------------

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// --- minimal tf.Example parsing (wire format) ---

struct Slice { const uint8_t* p; size_t n; };

static bool read_varint_c(const uint8_t*& p, const uint8_t* end,
                          uint64_t* out) {
  uint64_t v = 0; int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    v |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) { *out = v; return true; }
    shift += 7;
    if (shift > 63) return false;
  }
  return false;
}

// walk a message body, returning the bytes of the LAST occurrence of a
// length-delimited field `want`
static bool find_field(Slice msg, int want, Slice* out) {
  const uint8_t* p = msg.p;
  const uint8_t* end = msg.p + msg.n;
  bool found = false;
  while (p < end) {
    uint64_t tag;
    if (!read_varint_c(p, end, &tag)) return found;
    int field = (int)(tag >> 3), wire = (int)(tag & 7);
    if (wire == 2) {
      uint64_t len;
      if (!read_varint_c(p, end, &len) || p + len > end) return found;
      if (field == want) { *out = {p, (size_t)len}; found = true; }
      p += len;
    } else if (wire == 0) {
      uint64_t v; if (!read_varint_c(p, end, &v)) return found;
      if (field == want) { out->p = nullptr; out->n = v; found = true; }
    } else if (wire == 5) { p += 4; }
    else if (wire == 1) { p += 8; }
    else return found;
  }
  return found;
}

// Example -> features(1) -> map entries: key(1) string, value(2) Feature.
// Feature: bytes_list(1)/float_list(2)/int64_list(3), each with values(1).
static bool example_lookup(Slice example, const char* key, Slice* feature) {
  Slice features;
  if (!find_field(example, 1, &features)) return false;
  const uint8_t* p = features.p;
  const uint8_t* end = features.p + features.n;
  size_t key_len = strlen(key);
  // features message: repeated map entries are field 1 submessages
  Slice body = features;
  const uint8_t* q = body.p;
  while (q < end) {
    uint64_t tag;
    const uint8_t* qq = q;
    if (!read_varint_c(qq, end, &tag)) return false;
    if ((tag >> 3) != 1 || (tag & 7) != 2) return false;
    uint64_t len;
    if (!read_varint_c(qq, end, &len) || qq + len > end) return false;
    Slice entry{qq, (size_t)len};
    Slice k, v;
    if (find_field(entry, 1, &k) && k.n == key_len &&
        memcmp(k.p, key, key_len) == 0 && find_field(entry, 2, &v)) {
      *feature = v;
      return true;
    }
    q = qq + len;
  }
  (void)p;
  return false;
}

static bool feature_bytes(Slice feature, Slice* out) {
  Slice blist;
  if (!find_field(feature, 1, &blist)) return false;
  return find_field(blist, 1, out);  // first value
}

static bool feature_floats(Slice feature, std::vector<float>* out) {
  Slice flist;
  if (!find_field(feature, 2, &flist)) return false;
  // FloatList values: field 1, wire 5 (repeated) or wire 2 (packed)
  const uint8_t* p = flist.p;
  const uint8_t* end = flist.p + flist.n;
  while (p < end) {
    uint64_t tag;
    if (!read_varint_c(p, end, &tag)) return false;
    if ((tag >> 3) != 1) return false;
    if ((tag & 7) == 5) {
      if (p + 4 > end) return false;
      float v;
      memcpy(&v, p, 4);
      out->push_back(v);
      p += 4;
    } else if ((tag & 7) == 2) {
      uint64_t len;
      if (!read_varint_c(p, end, &len) || p + len > end) return false;
      for (const uint8_t* q = p; q + 4 <= p + len; q += 4) {
        float v;
        memcpy(&v, q, 4);
        out->push_back(v);
      }
      p += len;
    } else {
      return false;
    }
  }
  return true;
}

static bool feature_int64s(Slice feature, std::vector<int64_t>* out) {
  Slice ilist;
  if (!find_field(feature, 3, &ilist)) return false;
  const uint8_t* p = ilist.p;
  const uint8_t* end = ilist.p + ilist.n;
  while (p < end) {
    uint64_t tag;
    if (!read_varint_c(p, end, &tag)) return false;
    if ((tag >> 3) != 1) return false;
    if ((tag & 7) == 0) {
      uint64_t v;
      if (!read_varint_c(p, end, &v)) return false;
      out->push_back((int64_t)v);
    } else if ((tag & 7) == 2) {
      uint64_t len;
      if (!read_varint_c(p, end, &len) || p + len > end) return false;
      const uint8_t* e2 = p + len;
      while (p < e2) {
        uint64_t v;
        if (!read_varint_c(p, e2, &v)) return false;
        out->push_back((int64_t)v);
      }
    } else {
      return false;
    }
  }
  return true;
}

static bool feature_int64(Slice feature, int64_t* out) {
  Slice ilist;
  if (!find_field(feature, 3, &ilist)) return false;
  const uint8_t* p = ilist.p;
  const uint8_t* end = ilist.p + ilist.n;
  uint64_t tag, v;
  if (!read_varint_c(p, end, &tag)) return false;
  if ((tag & 7) == 2) {  // packed
    uint64_t len;
    if (!read_varint_c(p, end, &len)) return false;
    const uint8_t* e2 = p + len;
    if (!read_varint_c(p, e2, &v)) return false;
  } else {
    if (!read_varint_c(p, end, &v)) return false;
  }
  *out = (int64_t)v;
  return true;
}

// --- pipeline ---

struct ExampleOut {
  std::vector<uint8_t> canvas;
  int64_t label;
  int content_h, content_w;
  // detection mode
  std::vector<float> boxes;      // [max_instances, 4] canvas coords
  std::vector<int32_t> classes;  // [max_instances], -1 padded
  float source_id;
};

struct Pipeline {
  std::vector<std::string> files;
  int batch, canvas_h, canvas_w;
  size_t prefetch_max;      // bound on decoded examples waiting
  bool repeat;
  int mode = 0;             // 0 = classification, 1 = detection
  int max_instances = 0;
  bool skip_crowd = false;

  std::mutex mu;
  std::condition_variable cv_work, cv_ready;
  std::deque<std::vector<uint8_t>> work;   // raw records
  std::deque<ExampleOut> ready;
  bool done_reading = false;
  std::atomic<bool> stop{false};
  bool stretch = false;     // cls: fill the canvas (tf.data train parity);
                            // det: aspect-preserving letterbox
  int in_flight = 0;        // records popped by workers, not yet in ready
  int64_t dropped = 0;      // corrupt/undecodable examples (counted, skipped)

  std::thread reader;
  std::vector<std::thread> workers;
};

static void reader_main(Pipeline* pl) {
  do {
    int opened = 0;
    for (const auto& path : pl->files) {
      void* r = tfrecord_open(path.c_str(), 1);
      if (!r) continue;
      opened++;
      const uint8_t* data;
      int64_t n;
      while ((n = tfrecord_next(r, &data)) >= 0) {
        std::vector<uint8_t> rec(data, data + n);
        std::unique_lock<std::mutex> lk(pl->mu);
        pl->cv_work.wait(lk, [&] {
          return pl->stop || pl->work.size() < pl->prefetch_max;
        });
        if (pl->stop) { tfrecord_close(r); return; }
        pl->work.push_back(std::move(rec));
        pl->cv_ready.notify_all();
      }
      tfrecord_close(r);
      if (pl->stop) return;
    }
    if (opened == 0) break;  // nothing readable: end instead of spinning
  } while (pl->repeat && !pl->stop);
  std::lock_guard<std::mutex> lk(pl->mu);
  pl->done_reading = true;
  pl->cv_ready.notify_all();
}

static void worker_main(Pipeline* pl) {
  for (;;) {
    std::vector<uint8_t> rec;
    {
      std::unique_lock<std::mutex> lk(pl->mu);
      pl->cv_ready.wait(lk, [&] {
        return pl->stop || !pl->work.empty() || pl->done_reading;
      });
      if (pl->stop) return;
      if (pl->work.empty()) {
        if (pl->done_reading) return;
        continue;
      }
      rec = std::move(pl->work.front());
      pl->work.pop_front();
      pl->in_flight++;
      pl->cv_work.notify_all();
    }
    Slice ex{rec.data(), rec.size()};
    Slice img_feat, jpeg;
    int64_t label = -1;
    ExampleOut out;
    bool ok = example_lookup(ex, "image/encoded", &img_feat) &&
              feature_bytes(img_feat, &jpeg);
    if (ok) {
      Slice lab_feat;
      if (example_lookup(ex, "image/class/label", &lab_feat))
        feature_int64(lab_feat, &label);
      out.canvas.resize((size_t)pl->canvas_h * pl->canvas_w * 3);
      int hw[2] = {0, 0};
      ok = (pl->stretch
            ? jpeg_decode_stretch(jpeg.p, (int64_t)jpeg.n,
                                  out.canvas.data(), pl->canvas_h,
                                  pl->canvas_w, hw)
            : jpeg_decode_resize(jpeg.p, (int64_t)jpeg.n,
                                 out.canvas.data(), pl->canvas_h,
                                 pl->canvas_w, hw)) == 0;
      out.content_h = hw[0];
      out.content_w = hw[1];
      out.label = label;
    }
    if (ok && pl->mode == 1) {
      // detection: normalized gt boxes -> canvas coords (content dims ==
      // src dims * scale), crowd filter, truncate/pad to max_instances
      std::vector<float> ymin, xmin, ymax, xmax;
      std::vector<int64_t> labels, crowd;
      Slice f;
      if (example_lookup(ex, "image/object/bbox/ymin", &f))
        feature_floats(f, &ymin);
      if (example_lookup(ex, "image/object/bbox/xmin", &f))
        feature_floats(f, &xmin);
      if (example_lookup(ex, "image/object/bbox/ymax", &f))
        feature_floats(f, &ymax);
      if (example_lookup(ex, "image/object/bbox/xmax", &f))
        feature_floats(f, &xmax);
      if (example_lookup(ex, "image/object/class/label", &f))
        feature_int64s(f, &labels);
      if (example_lookup(ex, "image/object/is_crowd", &f))
        feature_int64s(f, &crowd);
      out.source_id = 0.0f;
      if (example_lookup(ex, "image/source_id", &f)) {
        Slice s;
        if (feature_bytes(f, &s) && s.n > 0 && s.n < 32) {
          char tmp[32];
          memcpy(tmp, s.p, s.n);
          tmp[s.n] = 0;
          out.source_id = (float)atof(tmp);
        }
      }
      int g = pl->max_instances;
      out.boxes.assign((size_t)g * 4, 0.0f);
      out.classes.assign(g, -1);
      int n = 0;
      size_t total = ymin.size();
      for (size_t i = 0; i < total && n < g; i++) {
        if (i >= xmin.size() || i >= ymax.size() || i >= xmax.size()) break;
        if (pl->skip_crowd && i < crowd.size() && crowd[i]) continue;
        out.boxes[(size_t)n * 4 + 0] = ymin[i] * out.content_h;
        out.boxes[(size_t)n * 4 + 1] = xmin[i] * out.content_w;
        out.boxes[(size_t)n * 4 + 2] = ymax[i] * out.content_h;
        out.boxes[(size_t)n * 4 + 3] = xmax[i] * out.content_w;
        out.classes[n] = i < labels.size() ? (int32_t)labels[i] : -1;
        n++;
      }
    }
    std::unique_lock<std::mutex> lk(pl->mu);
    if (ok) {
      // bound DECODED examples too (a slow consumer must not let ~MB
      // canvases pile up without limit); consumers notify cv_work on pop.
      // in_flight stays >0 until the example is visible in `ready`, so
      // the consumer's exhaustion predicate can never fire early.
      pl->cv_work.wait(lk, [&] {
        return pl->stop || pl->ready.size() < pl->prefetch_max;
      });
      if (pl->stop) return;
      pl->ready.push_back(std::move(out));
    } else {
      pl->dropped++;
    }
    pl->in_flight--;
    pl->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

static Pipeline* create_impl(const char** paths, int n_paths, int batch,
                             int canvas_h, int canvas_w, int n_workers,
                             int prefetch_batches, int repeat, int mode,
                             int max_instances, int skip_crowd,
                             int stretch) {
  auto* pl = new Pipeline();
  for (int i = 0; i < n_paths; i++) pl->files.emplace_back(paths[i]);
  pl->batch = batch;
  pl->canvas_h = canvas_h;
  pl->canvas_w = canvas_w;
  pl->prefetch_max = (size_t)prefetch_batches * batch;
  pl->repeat = repeat != 0;
  pl->mode = mode;                    // set BEFORE threads start (no race)
  pl->max_instances = max_instances;
  pl->skip_crowd = skip_crowd != 0;
  pl->stretch = stretch != 0;
  pl->reader = std::thread(reader_main, pl);
  if (n_workers < 1) n_workers = 1;
  for (int i = 0; i < n_workers; i++)
    pl->workers.emplace_back(worker_main, pl);
  return pl;
}

void* pipeline_create(const char** paths, int n_paths, int batch,
                      int canvas_h, int canvas_w, int n_workers,
                      int prefetch_batches, int repeat) {
  // classification fills the canvas (matches the tf.data train branch's
  // stretch resize; the old letterbox left black bands random crops then
  // sampled)
  return create_impl(paths, n_paths, batch, canvas_h, canvas_w, n_workers,
                     prefetch_batches, repeat, /*mode=*/0, 0, 0,
                     /*stretch=*/1);
}

// Fill images [batch, H, W, 3] u8, labels [batch] i64, content_hw
// [batch, 2] i32. Returns number of examples written (< batch only at end
// of a non-repeating stream; 0 = exhausted).
int pipeline_next_batch(void* handle, uint8_t* images, int64_t* labels,
                        int32_t* content_hw) {
  auto* pl = (Pipeline*)handle;
  size_t canvas_bytes = (size_t)pl->canvas_h * pl->canvas_w * 3;
  int got = 0;
  while (got < pl->batch) {
    ExampleOut ex;
    {
      std::unique_lock<std::mutex> lk(pl->mu);
      // exhausted only when the reader finished AND no record is queued
      // or mid-decode — exact accounting, no grace-period heuristics
      pl->cv_ready.wait(lk, [&] {
        return pl->stop || !pl->ready.empty() ||
               (pl->done_reading && pl->work.empty() && pl->in_flight == 0);
      });
      if (pl->stop) return got;
      if (pl->ready.empty()) return got;
      ex = std::move(pl->ready.front());
      pl->ready.pop_front();
      pl->cv_work.notify_all();
    }
    memcpy(images + (size_t)got * canvas_bytes, ex.canvas.data(),
           canvas_bytes);
    labels[got] = ex.label;
    content_hw[got * 2] = ex.content_h;
    content_hw[got * 2 + 1] = ex.content_w;
    got++;
  }
  return got;
}

// Detection pipeline: images [B,H,W,3] u8, true_hw [B,2] f32 (content
// dims), gt_boxes [B,G,4] f32 canvas coords, gt_classes [B,G] i32
// (-1 padded), source_id [B] f32.
void* det_pipeline_create(const char** paths, int n_paths, int batch,
                          int canvas, int max_instances, int skip_crowd,
                          int n_workers, int prefetch_batches, int repeat) {
  return create_impl(paths, n_paths, batch, canvas, canvas, n_workers,
                     prefetch_batches, repeat, /*mode=*/1, max_instances,
                     skip_crowd, /*stretch=*/0);
}

int det_pipeline_next_batch(void* handle, uint8_t* images, float* true_hw,
                            float* gt_boxes, int32_t* gt_classes,
                            float* source_id) {
  auto* pl = (Pipeline*)handle;
  size_t canvas_bytes = (size_t)pl->canvas_h * pl->canvas_w * 3;
  int g = pl->max_instances;
  int got = 0;
  while (got < pl->batch) {
    ExampleOut ex;
    {
      std::unique_lock<std::mutex> lk(pl->mu);
      pl->cv_ready.wait(lk, [&] {
        return pl->stop || !pl->ready.empty() ||
               (pl->done_reading && pl->work.empty() && pl->in_flight == 0);
      });
      if (pl->stop) return got;
      if (pl->ready.empty()) return got;
      ex = std::move(pl->ready.front());
      pl->ready.pop_front();
      pl->cv_work.notify_all();
    }
    memcpy(images + (size_t)got * canvas_bytes, ex.canvas.data(),
           canvas_bytes);
    true_hw[got * 2] = (float)ex.content_h;
    true_hw[got * 2 + 1] = (float)ex.content_w;
    memcpy(gt_boxes + (size_t)got * g * 4, ex.boxes.data(),
           (size_t)g * 4 * sizeof(float));
    memcpy(gt_classes + (size_t)got * g, ex.classes.data(),
           (size_t)g * sizeof(int32_t));
    source_id[got] = ex.source_id;
    got++;
  }
  return got;
}

int64_t pipeline_dropped(void* handle) {
  return ((Pipeline*)handle)->dropped;
}

void pipeline_destroy(void* handle) {
  auto* pl = (Pipeline*)handle;
  {
    std::lock_guard<std::mutex> lk(pl->mu);
    pl->stop = true;
  }
  pl->cv_work.notify_all();
  pl->cv_ready.notify_all();
  pl->reader.join();
  for (auto& w : pl->workers) w.join();
  delete pl;
}

}  // extern "C"
