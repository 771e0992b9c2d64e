// COCO run-length-encoding hot loops, C++ implementation.
//
// TPU-native equivalent of the reference's pycocotools C layer
// (reference: detectron2 depends on pycocotools/_mask.pyx -> maskApi.c for
// rleEncode/rleDecode/rleIou/rleFrString/rleToString).  The JAX compute path
// never touches RLE; these run on the host inside COCOEvaluator and the
// dataset loaders, where the pure-numpy fallback (fsgd_tpu/data/rle.py) spends
// its time in per-run Python loops.  Built on demand by fsgd_tpu/native
// (g++ -O3 -shared), loaded via ctypes; every function has a pure-Python
// fallback so the framework works without a toolchain.
//
// Conventions match rle.py: counts are int64 runs over the Fortran-ordered
// flat mask, starting with a zero-run; the compressed form is COCO's base-48
// LEB128-style varint with delta coding from the 3rd count on.

#include <cstdint>
#include <cstring>

extern "C" {

// varint-compress n counts into out (caller-sized); returns bytes written,
// or -1 if cap would be exceeded.
int64_t rle_compress(const int64_t* counts, int64_t n, char* out, int64_t cap) {
  int64_t w = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      if (w >= cap) return -1;
      int64_t c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      out[w++] = static_cast<char>(c + 48);
    }
  }
  return w;
}

// varint-decompress s (len bytes) into counts_out; returns count of runs,
// or -1 if cap would be exceeded.
int64_t rle_decompress(const char* s, int64_t len, int64_t* counts_out, int64_t cap) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    int64_t c = 0;
    while (more) {
      if (i >= len) return -1;  // truncated varint
      c = static_cast<int64_t>(s[i]) - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
    }
    if (c & 0x10) x |= ~((int64_t{1} << (5 * k)) - 1);  // sign-extend
    if (n > 2) x += counts_out[n - 2];
    if (n >= cap) return -1;
    counts_out[n++] = x;
  }
  return n;
}

// run-merge intersection area of two RLEs (no decode).
static int64_t inter_area(const int64_t* a, int64_t na, const int64_t* b, int64_t nb) {
  int64_t inter = 0;
  int64_t ia = 0, ib = 0;
  int64_t ca = na ? a[0] : 0, cb = nb ? b[0] : 0;
  int va = 0, vb = 0;
  while (ia < na && ib < nb) {
    int64_t step = ca < cb ? ca : cb;
    if (va && vb) inter += step;
    ca -= step;
    cb -= step;
    if (ca == 0) {
      if (++ia < na) ca = a[ia];
      va ^= 1;
    }
    if (cb == 0) {
      if (++ib < nb) cb = b[ib];
      vb ^= 1;
    }
  }
  return inter;
}

static int64_t rle_area_one(const int64_t* c, int64_t n) {
  int64_t area = 0;
  for (int64_t i = 1; i < n; i += 2) area += c[i];
  return area;
}

// Pairwise IoU matrix, maskUtils.iou contract: out[i, j] for det i, gt j;
// crowd gt -> intersection over det area.  Counts for all dets (and all gts)
// are flattened into one array with offsets[k]..offsets[k+1] delimiting k.
void rle_iou_matrix(const int64_t* det_counts, const int64_t* det_offsets, int64_t nd,
                    const int64_t* gt_counts, const int64_t* gt_offsets, int64_t ng,
                    const uint8_t* iscrowd, double* out) {
  for (int64_t j = 0; j < ng; ++j) {
    const int64_t* g = gt_counts + gt_offsets[j];
    const int64_t gn = gt_offsets[j + 1] - gt_offsets[j];
    const int64_t garea = rle_area_one(g, gn);
    for (int64_t i = 0; i < nd; ++i) {
      const int64_t* d = det_counts + det_offsets[i];
      const int64_t dn = det_offsets[i + 1] - det_offsets[i];
      const int64_t darea = rle_area_one(d, dn);
      const int64_t inter = inter_area(d, dn, g, gn);
      const double denom =
          iscrowd[j] ? static_cast<double>(darea)
                     : static_cast<double>(darea + garea - inter);
      out[i * ng + j] = denom > 0 ? static_cast<double>(inter) / denom : 0.0;
    }
  }
}

}  // extern "C"
