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
#include <string>
#include <thread>
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

// Parse every matching{i}.txt in a directory, in parallel (one thread per
// file, capped at hardware concurrency), into one flat (rows, 8) table with
// GLOBALLY sequential feature indices (file order — identical indexing to
// the sequential path).  Designed for the framework's target scale
// (thousands of files): file IO and float parsing overlap across cores,
// and the offset fix-up is a single pass.
//   folder        : directory containing matching{i}.txt
//   num_images    : files are matching1.txt .. matching{num_images}.txt
//   out           : caller buffer, capacity max_rows*8 doubles
// Returns rows written, -1 on parse error / overflow.
int64_t parse_matching_dir(const char* folder, int num_images, double* out,
                           int64_t max_rows, int64_t* n_features_out) {
  struct PerFile {
    std::vector<double> rows;   // (n, 8), local f_idx from 0
    int64_t n_features = 0;
    int64_t n_rows = 0;
    bool present = false;
    bool error = false;
  };
  std::vector<PerFile> files(num_images);

  auto work = [&](int i) {
    char path[4096];
    snprintf(path, sizeof(path), "%s/matching%d.txt", folder, i + 1);
    FILE* f = fopen(path, "rb");
    if (!f) return;                       // missing file: skipped, like Python
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
      fclose(f);
      files[i].error = true;
      return;
    }
    fclose(f);
    buf[size] = '\0';
    files[i].present = true;
    // capacity bound: every output row consumes >= 4 bytes of text (a
    // match row is "j u v" >= 6 chars; a self row comes from >= 12) —
    // size/4 + slack keeps peak memory ~16 bytes per text byte instead of
    // the naive one-row-per-byte (~128x) bound
    int64_t cap = size / 4 + 16;
    files[i].rows.resize(cap * 8);
    Cursor c{buf.data(), buf.data() + size};
    while (c.p < c.end && *c.p != '\n') ++c.p;
    int64_t rows = 0, f_idx = 0;
    double v;
    while (true) {
      if (!read_double(c, &v)) break;
      int total = static_cast<int>(v);
      double r, g, b, u_i, v_i;
      if (!read_double(c, &r) || !read_double(c, &g) || !read_double(c, &b) ||
          !read_double(c, &u_i) || !read_double(c, &v_i)) {
        files[i].error = true;
        return;
      }
      double rgb_packed = r * 65536.0 + g * 256.0 + b;
      // rows written this feature = 1 self + max(total-1, 0) matches —
      // a malformed total <= 0 still writes the self row, so bound by
      // at least 1 (the old `rows + total` check under-counted there)
      int64_t need = total > 1 ? total : 1;
      if (rows + need > cap) {
        files[i].error = true;
        return;
      }
      double* self_row = files[i].rows.data() + rows * 8;
      self_row[0] = i + 1; self_row[1] = 0.0;
      self_row[2] = u_i;   self_row[3] = v_i;
      self_row[4] = 0.0;   self_row[5] = 0.0;
      self_row[6] = static_cast<double>(f_idx);
      self_row[7] = rgb_packed;
      ++rows;
      for (int m = 0; m < total - 1; ++m) {
        double j, u_j, v_j;
        if (!read_double(c, &j) || !read_double(c, &u_j) ||
            !read_double(c, &v_j)) {
          files[i].error = true;
          return;
        }
        double* row = files[i].rows.data() + rows * 8;
        row[0] = i + 1; row[1] = j;
        row[2] = u_i;   row[3] = v_i;
        row[4] = u_j;   row[5] = v_j;
        row[6] = static_cast<double>(f_idx);
        row[7] = rgb_packed;
        ++rows;
      }
      ++f_idx;
    }
    files[i].n_rows = rows;
    files[i].n_features = f_idx;
    // release the slack immediately — with thousands of files in flight
    // the oversized buffers would otherwise all coexist until the final
    // concatenation
    files[i].rows.resize(rows * 8);
    files[i].rows.shrink_to_fit();
  };

  unsigned hw = std::thread::hardware_concurrency();
  int pool = static_cast<int>(hw ? hw : 4);
  for (int base = 0; base < num_images; base += pool) {
    std::vector<std::thread> ts;
    for (int i = base; i < num_images && i < base + pool; ++i) {
      ts.emplace_back(work, i);
    }
    for (auto& t : ts) t.join();
  }

  int64_t total_rows = 0, total_feats = 0;
  for (auto& pf : files) {
    if (pf.error) return -1;
    total_rows += pf.n_rows;
    total_feats += pf.n_features;
  }
  if (total_rows > max_rows) return -1;
  // concatenate with global f_idx offsets (file order == sequential parse)
  int64_t row_off = 0, feat_off = 0;
  for (auto& pf : files) {
    if (!pf.present) continue;
    double* dst = out + row_off * 8;
    memcpy(dst, pf.rows.data(), pf.n_rows * 8 * sizeof(double));
    for (int64_t r = 0; r < pf.n_rows; ++r) {
      dst[r * 8 + 6] += static_cast<double>(feat_off);
    }
    row_off += pf.n_rows;
    feat_off += pf.n_features;
  }
  *n_features_out = total_feats;
  return total_rows;
}

// Binary little-endian PLY point-cloud writer (float32 xyz + uchar rgb).
// The ASCII Python writer formats ~60 bytes of text per point; at the
// million-point scale this framework targets, binary is ~20x faster to
// write and 4x smaller.  Returns 0, or -1 on IO error.
int64_t write_ply_binary(const char* path, const double* points,
                         const uint8_t* colors, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  char header[256];
  int hl = snprintf(
      header, sizeof(header),
      "ply\nformat binary_little_endian 1.0\n"
      "element vertex %lld\n"
      "property float x\nproperty float y\nproperty float z\n"
      "property uchar red\nproperty uchar green\nproperty uchar blue\n"
      "end_header\n",
      static_cast<long long>(n));
  if (fwrite(header, 1, hl, f) != static_cast<size_t>(hl)) {
    fclose(f);
    return -1;
  }
  std::vector<char> rec(n * 15);
  char* p = rec.data();
  for (int64_t i = 0; i < n; ++i) {
    float xyz[3] = {static_cast<float>(points[i * 3]),
                    static_cast<float>(points[i * 3 + 1]),
                    static_cast<float>(points[i * 3 + 2])};
    memcpy(p, xyz, 12);
    memcpy(p + 12, colors + i * 3, 3);
    p += 15;
  }
  size_t nb = static_cast<size_t>(n) * 15;
  if (fwrite(rec.data(), 1, nb, f) != nb) {
    fclose(f);
    return -1;
  }
  fclose(f);
  return 0;
}

}  // extern "C"
