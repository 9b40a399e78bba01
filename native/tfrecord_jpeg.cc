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

}  // extern "C"
