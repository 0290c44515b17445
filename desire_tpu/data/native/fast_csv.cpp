// Fast parser for the transposed 4-row SDD annotation CSVs
// (row0=frames, row1=ids, row2=xs, row3=ys — layout from the reference
// preprocessor, /root/reference/scripts/preprocess.py:31-34).
//
// The reference ingested these with np.genfromtxt in a Python loop
// (utils/data_loader.py:98) — the #1 CPU hot loop (SURVEY §3.5). This
// parser mmaps the file and strtod's all four rows in one pass
// (~30-60x faster on the 3.5M-record tree).
//
// Build: python -m desire_tpu.data.native.build
// ABI: plain C, consumed via ctypes (fast_csv.py).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
  return m;
}

void unmap(Mapped& m) {
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) close(m.fd);
}

}  // namespace

extern "C" {

// Number of comma-separated fields in the first line, or -1 on I/O error.
long count_fields(const char* path) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  long n = 1;
  for (size_t i = 0; i < m.size; ++i) {
    char c = m.data[i];
    if (c == ',') ++n;
    else if (c == '\n') break;
  }
  unmap(m);
  return n;
}

// Parse 4 rows x n fields into out[4*n] (row-major). Returns the number of
// fields parsed in the shortest row (== n on success).
long parse_csv4(const char* path, long n, double* out) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  long min_row = n;
  for (int row = 0; row < 4; ++row) {
    long col = 0;
    while (p < end && *p != '\n' && col < n) {
      char* next = nullptr;
      out[row * n + col] = strtod(p, &next);
      if (next == p) {  // empty field
        out[row * n + col] = 0.0;
        ++next;
      }
      p = next;
      if (p < end && *p == ',') ++p;
      ++col;
    }
    if (col < min_row) min_row = col;
    while (p < end && *p != '\n') ++p;  // skip trailing junk
    if (p < end) ++p;                   // consume newline
  }
  unmap(m);
  return min_row;
}

}  // extern "C"
