// Native ark reader: binary Kaldi matrices (FM/DM/CM) with crop-aware
// decode, for the training-input hot path.
//
// Role: the reference's data plane was Kaldi C++ (copy-feats writes
// CompressedMatrix arks; make_fbank.sh:120-124) read back per-utterance by
// pure-python kaldi_io (datasets.py:63).  Here the python fallback lives in
// pkr_tpu/io/kaldi_ark.py; this library is the fast path used by
// pkr_tpu.io.native:
//
//  * pread at an scp byte offset — no file-position state, safe across
//    threads;
//  * CM (CompressedMatrix format 1) decode of ONLY the cropped frame range:
//    the format is column-major, so a 200-frame crop of a 1000-frame
//    utterance touches 1/5 of the quantized bytes instead of decoding the
//    whole matrix and slicing (what the reference's reader must do);
//  * output written transposed (feat-major, (F, T)) directly into the
//    caller's batch buffer — the layout the model consumes
//    (datasets.py:68's chunk_mat.T) with zero intermediate copies.
//
// Format reference for CM decode semantics: compressed-matrix.h (documented
// in /root/reference/kaldi_io.py:427-460).  Build: make -C native.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <fcntl.h>
#include <unistd.h>

namespace {

constexpr float kUint16Scale = 1.0f / 65535.0f;

struct Reader {
  int fd = -1;
  long pos = 0;
  bool ok = true;

  explicit Reader(const char* path, long offset) : pos(offset) {
    fd = ::open(path, O_RDONLY);
    ok = fd >= 0;
  }
  ~Reader() {
    if (fd >= 0) ::close(fd);
  }
  bool read(void* dst, size_t n) {
    if (!ok) return false;
    ssize_t got = ::pread(fd, dst, n, pos);
    if (got != (ssize_t)n) {
      ok = false;
      return false;
    }
    pos += n;
    return true;
  }
};

struct MatHeader {
  char kind;  // 'F' float32, 'D' float64, 'C' compressed
  int rows = 0, cols = 0;
  // CM fields
  float gmin = 0, grange = 0;
  long data_pos = 0;  // file position of payload (per-col headers for CM)
};

// Parse "\0B" + token + dims.  Returns false on malformed input.
bool parse_header(Reader& r, MatHeader* h) {
  unsigned char flag[2];
  if (!r.read(flag, 2) || flag[0] != 0 || flag[1] != 'B') return false;
  char token[3];
  if (!r.read(token, 3)) return false;
  if (!memcmp(token, "FM ", 3) || !memcmp(token, "DM ", 3)) {
    h->kind = token[0];
    unsigned char t1;
    int32_t rows, cols;
    if (!r.read(&t1, 1) || t1 != 4 || !r.read(&rows, 4)) return false;
    if (!r.read(&t1, 1) || t1 != 4 || !r.read(&cols, 4)) return false;
    // negative dims from a corrupt header would otherwise reach new[] as a
    // huge size_t and abort the process via bad_alloc across the C boundary
    if (rows < 0 || cols < 0) return false;
    h->rows = rows;
    h->cols = cols;
    h->data_pos = r.pos;
    return true;
  }
  if (!memcmp(token, "CM ", 3) || !memcmp(token, "CM2", 3) ||
      !memcmp(token, "CM3", 3)) {
    if (token[2] == ' ') {
      h->kind = 'C';
    } else {
      // on-disk tokens are "CM2 "/"CM3 " (WriteToken appends the space)
      char sp;
      if (!r.read(&sp, 1) || sp != ' ') return false;
      h->kind = token[2];  // '2' = uint16 row-major, '3' = uint8 row-major
    }
    int32_t rows, cols;
    if (!r.read(&h->gmin, 4) || !r.read(&h->grange, 4)) return false;
    if (!r.read(&rows, 4) || !r.read(&cols, 4)) return false;
    if (rows < 0 || cols < 0) return false;
    h->rows = rows;
    h->cols = cols;
    h->data_pos = r.pos;
    return true;
  }
  return false;  // ascii unsupported in the fast path
}

// CM2/CM3 (compressed-matrix.h kTwoByte*/kOneByte*): row-major elementwise
// codes, single linear map.  Same f32 evaluation order as the python codec
// (gmin + (grange * scale) * code).
inline float cm2_decode(uint16_t code, float gmin, float grange) {
  return gmin + grange * kUint16Scale * (float)code;
}
inline float cm3_decode(uint8_t code, float gmin, float grange) {
  return gmin + grange * (1.0f / 255.0f) * (float)code;
}

inline float cm_percentile(uint16_t code, float gmin, float grange) {
  // pure f32 with numpy's evaluation order: (grange * scale) * code + gmin
  return gmin + grange * kUint16Scale * (float)code;
}

// Decode CM bytes of one column into out[k].  The arithmetic order matches
// the python codec (kaldi_ark._chars_to_floats) exactly so both decoders are
// bit-identical: span * (code * (1/step)), accumulated in f32.
inline void cm_decode_col(const uint8_t* data, const uint16_t* hdr, float gmin,
                          float grange, int n, float* out) {
  const float p0 = cm_percentile(hdr[0], gmin, grange);
  const float p25 = cm_percentile(hdr[1], gmin, grange);
  const float p75 = cm_percentile(hdr[2], gmin, grange);
  const float p100 = cm_percentile(hdr[3], gmin, grange);
  const float d_low = p25 - p0;
  const float d_mid = p75 - p25;
  const float d_high = p100 - p75;
  // all f32 in numpy's evaluation order; the build disables fp-contract so
  // a+b*c is NOT fused into FMA (numpy rounds the multiply separately)
  for (int k = 0; k < n; ++k) {
    const float c = (float)data[k];
    float v;
    if (data[k] <= 64)
      v = p0 + d_low * (c * (1.0f / 64.0f));
    else if (data[k] <= 192)
      v = p25 + d_mid * ((c - 64.0f) * (1.0f / 128.0f));
    else
      v = p75 + d_high * ((c - 192.0f) * (1.0f / 63.0f));
    out[k] = v;
  }
}

}  // namespace

extern "C" {

// Fill (rows, cols); returns 0 on success, negative errno-style codes.
int pkr_mat_dims(const char* path, long offset, int* rows, int* cols) {
  Reader r(path, offset);
  if (!r.ok) return -1;
  MatHeader h;
  if (!parse_header(r, &h)) return -2;
  *rows = h.rows;
  *cols = h.cols;
  return 0;
}

// Decode rows [row_start, row_start+n_rows) TRANSPOSED into out, which must
// hold cols*n_rows floats laid out out[c*n_rows + k] (i.e. an (F, T) crop).
// If the matrix has fewer than row_start+n_rows rows, the crop is tiled
// cyclically (matching the loader's short-utterance policy).
int pkr_read_crop_t(const char* path, long offset, int row_start, int n_rows,
                    int expect_cols, float* out) {
  Reader r(path, offset);
  if (!r.ok) return -1;
  MatHeader h;
  if (!parse_header(r, &h)) return -2;
  if (h.cols != expect_cols || h.rows <= 0) return -3;
  const int R = h.rows, C = h.cols;

  if (h.kind == 'C') {
    // per-column headers (C * 4 uint16), then uint8 data column-major
    uint16_t* hdrs = new uint16_t[(size_t)C * 4];
    r.pos = h.data_pos;
    if (!r.read(hdrs, (size_t)C * 8)) {
      delete[] hdrs;
      return -4;
    }
    const long data0 = r.pos;
    uint8_t* colbuf = new uint8_t[(size_t)R];
    for (int c = 0; c < C; ++c) {
      float* dst = out + (size_t)c * n_rows;
      if (row_start + n_rows <= R) {
        // the point of the crop-aware path: pread ONLY the crop's bytes —
        // a 200-frame crop of a 1000-frame column touches 1/5 of the data
        r.pos = data0 + (long)c * R + row_start;
        if (!r.read(colbuf, (size_t)n_rows)) {
          delete[] hdrs;
          delete[] colbuf;
          return -4;
        }
        cm_decode_col(colbuf, hdrs + 4 * c, h.gmin, h.grange, n_rows, dst);
      } else {
        // cyclic tiling wraps the column: the whole column is needed
        r.pos = data0 + (long)c * R;
        if (!r.read(colbuf, (size_t)R)) {
          delete[] hdrs;
          delete[] colbuf;
          return -4;
        }
        for (int k = 0; k < n_rows; ++k) {
          const int rr = (row_start + k) % R;
          cm_decode_col(colbuf + rr, hdrs + 4 * c, h.gmin, h.grange, 1,
                        dst + k);
        }
      }
    }
    delete[] hdrs;
    delete[] colbuf;
    return 0;
  }

  const int esz = (h.kind == 'F') ? 4 : (h.kind == 'D') ? 8
                  : (h.kind == '2') ? 2 : 1;
  // row-major payload (FM/DM floats, CM2/CM3 fixed-point codes): read the
  // crop rows, decode if needed, transpose on the fly
  char* rowbuf = new char[(size_t)C * esz];
  for (int k = 0; k < n_rows; ++k) {
    const int rr = (row_start + k) % R;
    r.pos = h.data_pos + (long)rr * C * esz;
    if (!r.read(rowbuf, (size_t)C * esz)) {
      delete[] rowbuf;
      return -4;
    }
    if (h.kind == 'F') {
      const float* row = (const float*)rowbuf;
      for (int c = 0; c < C; ++c) out[(size_t)c * n_rows + k] = row[c];
    } else if (h.kind == 'D') {
      const double* row = (const double*)rowbuf;
      for (int c = 0; c < C; ++c) out[(size_t)c * n_rows + k] = (float)row[c];
    } else if (h.kind == '2') {
      const uint16_t* row = (const uint16_t*)rowbuf;
      for (int c = 0; c < C; ++c)
        out[(size_t)c * n_rows + k] = cm2_decode(row[c], h.gmin, h.grange);
    } else {
      const uint8_t* row = (const uint8_t*)rowbuf;
      for (int c = 0; c < C; ++c)
        out[(size_t)c * n_rows + k] = cm3_decode(row[c], h.gmin, h.grange);
    }
  }
  delete[] rowbuf;
  return 0;
}

// Full matrix, row-major float32 out (capacity rows*cols).
int pkr_read_mat(const char* path, long offset, float* out, long capacity,
                 int* rows, int* cols) {
  Reader r(path, offset);
  if (!r.ok) return -1;
  MatHeader h;
  if (!parse_header(r, &h)) return -2;
  if ((long)h.rows * h.cols > capacity) return -5;
  *rows = h.rows;
  *cols = h.cols;
  const int R = h.rows, C = h.cols;
  if (h.kind == 'C') {
    uint16_t* hdrs = new uint16_t[(size_t)C * 4];
    r.pos = h.data_pos;
    if (!r.read(hdrs, (size_t)C * 8)) {
      delete[] hdrs;
      return -4;
    }
    uint8_t* colbuf = new uint8_t[(size_t)R];
    float* coldec = new float[(size_t)R];
    for (int c = 0; c < C; ++c) {
      if (!r.read(colbuf, (size_t)R)) {
        delete[] hdrs;
        delete[] colbuf;
        delete[] coldec;
        return -4;
      }
      cm_decode_col(colbuf, hdrs + 4 * c, h.gmin, h.grange, R, coldec);
      for (int k = 0; k < R; ++k) out[(size_t)k * C + c] = coldec[k];
    }
    delete[] hdrs;
    delete[] colbuf;
    delete[] coldec;
    return 0;
  }
  const int esz = (h.kind == 'F') ? 4 : (h.kind == 'D') ? 8
                  : (h.kind == '2') ? 2 : 1;
  char* buf = new char[(size_t)R * C * esz];
  if (!r.read(buf, (size_t)R * C * esz)) {
    delete[] buf;
    return -4;
  }
  if (h.kind == 'F') {
    memcpy(out, buf, (size_t)R * C * 4);
  } else if (h.kind == 'D') {
    const double* src = (const double*)buf;
    for (long i = 0; i < (long)R * C; ++i) out[i] = (float)src[i];
  } else if (h.kind == '2') {
    const uint16_t* src = (const uint16_t*)buf;
    for (long i = 0; i < (long)R * C; ++i)
      out[i] = cm2_decode(src[i], h.gmin, h.grange);
  } else {
    const uint8_t* src = (const uint8_t*)buf;
    for (long i = 0; i < (long)R * C; ++i)
      out[i] = cm3_decode(src[i], h.gmin, h.grange);
  }
  delete[] buf;
  return 0;
}

}  // extern "C"
