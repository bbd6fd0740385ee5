// COCO RLE mask codec (decode / encode / string parse+emit).
//
// Native replacement for the reference's pycocotools.mask C extension
// (RLE decode on every VOS dataset row, e.g. ref utils/mevis_dataset.py,
// refer_vos_dataset.py; encode in evaluation drivers). The Python-side
// wrapper (rga3_tpu/utils/rle.py) keeps a pure-numpy fallback.
//
// Conventions match pycocotools: column-major pixel order, counts start
// with a (possibly zero) background run, compressed string is the
// LEB128-ish base-48 format with delta coding from the 3rd element on.
//
// Build: g++ -O3 -shared -fPIC -o librle.so rle.cpp
#include <cstdint>
#include <cstring>

extern "C" {

// counts -> row-major (h, w) uint8 mask. Returns 0 on success, -1 if the
// runs overflow h*w. Runs fill a contiguous column-major scratch
// (memset per run), then a blocked transpose produces row-major output.
int32_t rle_decode(const int64_t* counts, int64_t n_counts, int64_t h,
                   int64_t w, uint8_t* out /* h*w, row-major */) {
  const int64_t total = h * w;
  uint8_t* cm = new uint8_t[static_cast<size_t>(total)];
  std::memset(cm, 0, static_cast<size_t>(total));
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t i = 0; i < n_counts; ++i) {
    const int64_t c = counts[i];
    // c < 0 can reach here from malformed compressed strings (delta
    // decoding in rle_from_string); memset with a negative count would
    // be a ~2^64-sized out-of-bounds write.
    if (c < 0 || pos + c > total) {
      delete[] cm;
      return -1;
    }
    if (val) std::memset(cm + pos, 1, static_cast<size_t>(c));
    pos += c;
    val ^= 1;
  }
  constexpr int64_t B = 64;  // cache-blocked transpose
  for (int64_t r0 = 0; r0 < h; r0 += B) {
    const int64_t r1 = r0 + B < h ? r0 + B : h;
    for (int64_t c0 = 0; c0 < w; c0 += B) {
      const int64_t c1 = c0 + B < w ? c0 + B : w;
      for (int64_t row = r0; row < r1; ++row)
        for (int64_t col = c0; col < c1; ++col)
          out[row * w + col] = cm[col * h + row];
    }
  }
  delete[] cm;
  return 0;
}

// row-major (h, w) uint8 mask -> counts (column-major runs, background
// first). Returns number of counts written, or -1 if max_counts is too
// small (caller retries with a bigger buffer; h*w+1 always suffices).
int64_t rle_encode(const uint8_t* mask /* row-major */, int64_t h,
                   int64_t w, int64_t* counts, int64_t max_counts) {
  const int64_t total = h * w;
  uint8_t* cm = new uint8_t[static_cast<size_t>(total)];
  constexpr int64_t B = 64;  // blocked transpose to column-major
  for (int64_t c0 = 0; c0 < w; c0 += B) {
    const int64_t c1 = c0 + B < w ? c0 + B : w;
    for (int64_t r0 = 0; r0 < h; r0 += B) {
      const int64_t r1 = r0 + B < h ? r0 + B : h;
      for (int64_t col = c0; col < c1; ++col)
        for (int64_t row = r0; row < r1; ++row)
          cm[col * h + row] = mask[row * w + col] ? 1 : 0;
    }
  }
  int64_t n = 0;
  uint8_t cur = 0;
  int64_t run = 0;
  for (int64_t p = 0; p < total; ++p) {
    if (cm[p] == cur) {
      ++run;
    } else {
      if (n >= max_counts) {
        delete[] cm;
        return -1;
      }
      counts[n++] = run;
      cur = cm[p];
      run = 1;
    }
  }
  delete[] cm;
  if (n >= max_counts) return -1;
  counts[n++] = run;
  return n;
}

// Compressed COCO string -> counts. Returns count of values, or -1 on a
// truncated string / overflow of max_counts.
int64_t rle_from_string(const char* s, int64_t len, int64_t* counts,
                        int64_t max_counts) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < len) {
    int64_t x = 0;
    int64_t k = 0;
    bool more = true;
    while (more) {
      if (i >= len) return -1;
      const int64_t c = static_cast<int64_t>(s[i]) - 48;
      x |= (c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (n > 2) x += counts[n - 2];
    if (n >= max_counts) return -1;
    counts[n++] = x;
  }
  return n;
}

// counts -> compressed COCO string. Returns string length, or -1 if
// max_len is too small (6 bytes per count always suffices for int32
// magnitudes; callers allocate generously).
int64_t rle_to_string(const int64_t* counts, int64_t n_counts, char* out,
                      int64_t max_len) {
  int64_t m = 0;
  for (int64_t i = 0; i < n_counts; ++i) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      const int64_t c5 = x & 0x1F;
      x >>= 5;
      more = (c5 & 0x10) ? (x != -1) : (x != 0);
      int64_t c = c5;
      if (more) c |= 0x20;
      if (m >= max_len) return -1;
      out[m++] = static_cast<char>(c + 48);
    }
  }
  return m;
}

}  // extern "C"
