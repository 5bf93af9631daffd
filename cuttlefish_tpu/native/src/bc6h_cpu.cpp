// CPU BC6H encoder: independent reference-class quality baseline.
//
// From-scratch ispc_texcomp-"veryfast"-class BC6H (unsigned) encoder —
// the reference's fast path for BC6H UFloat
// (/root/reference/lib/src/S3tcConverter.cpp:497-569 drives
// ispc::CompressBlocksBC6H with profiles veryfast..veryslow; veryfast is
// the one-region mode search).  Used by tests/test_cpu_reference.py to
// back the BASELINE.md north-star PSNR claim for BC6H the same way
// bc7/astc/etc2/bc1_cpu.cpp do for their families.
//
// Mode 11 (one region, 10.10 endpoints, 4-bit indices): half-bit-domain
// PCA-free min/max seed along the principal channel spread, index assign
// against the EXACT decode palette (unquant + 31/64 finalize, mirroring
// decode/bc6h.py), least-squares endpoint refinement from the index
// assignment, and a per-channel +-1 quant-neighborhood sweep at
// quality >= 2.  Error is SSE on the decoded half-bit codes (monotone in
// the float ordering, the standard BC6H encoder metric).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// f32 -> half bits (round-to-nearest-even), negatives clamped to 0
// (BC6H unsigned), inf/nan clamped to max finite half.
uint16_t f32_to_half_u(float f) {
  if (!(f > 0.0f)) return 0;
  if (f >= 65504.0f) return 0x7BFF;
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  uint32_t exp = (bits >> 23) & 0xFF;
  uint32_t man = bits & 0x7FFFFF;
  int e = (int)exp - 127 + 15;
  if (e <= 0) {
    // subnormal half
    if (e < -10) return 0;
    man |= 0x800000;
    int shift = 14 - e;
    uint32_t half = man >> shift;
    uint32_t rem = man & ((1u << shift) - 1);
    uint32_t halfway = 1u << (shift - 1);
    if (rem > halfway || (rem == halfway && (half & 1))) ++half;
    return (uint16_t)half;
  }
  uint32_t half = ((uint32_t)e << 10) | (man >> 13);
  uint32_t rem = man & 0x1FFF;
  if (rem > 0x1000 || (rem == 0x1000 && (half & 1))) ++half;
  return (uint16_t)std::min(half, 0x7BFFu);
}

// decode/bc6h.py:_unquant_unsigned (bits = 10).
inline int unquant10(int q) {
  if (q == 0) return 0;
  if (q == 1023) return 0xFFFF;
  return ((q << 16) + 0x8000) >> 10;
}

inline int finalize_u(int v) { return (v * 31) >> 6; }

// 4-bit interpolation weights (bc7_tables.WEIGHTS4).
const int W4[16] = {0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64};

struct Block {
  int v[16][3];  // half-bit codes 0..0x7BFF
};

// Exact mode-11 palette entry for quantized endpoints.
inline int pal_entry(int u0, int u1, int w) {
  return finalize_u((u0 * (64 - w) + u1 * w + 32) >> 6);
}

double fit_indices(const Block& B, const int q0[3], const int q1[3],
                   int sel[16]) {
  int pal[16][3];
  for (int c = 0; c < 3; ++c) {
    int u0 = unquant10(q0[c]);
    int u1 = unquant10(q1[c]);
    for (int i = 0; i < 16; ++i) pal[i][c] = pal_entry(u0, u1, W4[i]);
  }
  // Targets in the finalized domain: decode compares against (v*31)>>5?
  // No — the decoded half bits ARE finalize_u(unq); compare against the
  // source half bits directly.
  double err = 0;
  for (int t = 0; t < 16; ++t) {
    double best = 1e30;
    int bi = 0;
    for (int i = 0; i < 16; ++i) {
      double e = 0;
      for (int c = 0; c < 3; ++c) {
        double d = (double)B.v[t][c] - pal[i][c];
        e += d * d;
      }
      if (e < best) { best = e; bi = i; }
    }
    sel[t] = bi;
    err += best;
  }
  return err;
}

// Quantize a target half-bit value to a 10-bit mode-11 endpoint (inverse
// of unquant10, nearest).
inline int quant10(double v16) {
  if (v16 <= 0) return 0;
  if (v16 >= 0xFFFF) return 1023;
  int q = (int)std::lround(v16 * 1024.0 / 65536.0);
  return clampi(q, 0, 1023);
}

void ls_endpoints(const Block& B, const int sel[16], double e0[3],
                  double e1[3]) {
  double a00 = 0, a01 = 0, a11 = 0, bx[3] = {0, 0, 0}, by[3] = {0, 0, 0};
  for (int t = 0; t < 16; ++t) {
    double w1 = W4[sel[t]] / 64.0, w0 = 1.0 - w1;
    a00 += w0 * w0;
    a01 += w0 * w1;
    a11 += w1 * w1;
    for (int c = 0; c < 3; ++c) {
      // Invert the 31/64 finalize so the LS target lives in the
      // interpolation domain.
      double tv = (double)B.v[t][c] * 64.0 / 31.0;
      bx[c] += w0 * tv;
      by[c] += w1 * tv;
    }
  }
  double det = a00 * a11 - a01 * a01;
  if (std::fabs(det) < 1e-9) return;
  for (int c = 0; c < 3; ++c) {
    e0[c] = (a11 * bx[c] - a01 * by[c]) / det;
    e1[c] = (a00 * by[c] - a01 * bx[c]) / det;
  }
}

double try_pair(const Block& B, const int q0[3], const int q1[3], int bq0[3],
                int bq1[3], int bsel[16], double best) {
  int sel[16];
  double err = fit_indices(B, q0, q1, sel);
  if (err < best) {
    std::memcpy(bq0, q0, 3 * sizeof(int));
    std::memcpy(bq1, q1, 3 * sizeof(int));
    std::memcpy(bsel, sel, 16 * sizeof(int));
    return err;
  }
  return best;
}

void encode_block(const float* rgb /*16*3*/, int quality, uint8_t out[16]) {
  Block B;
  for (int t = 0; t < 16; ++t)
    for (int c = 0; c < 3; ++c)
      B.v[t][c] = f32_to_half_u(rgb[t * 3 + c]);

  // Seed: per-channel min/max (the veryfast bounding-box seed).
  double lo[3], hi[3];
  for (int c = 0; c < 3; ++c) {
    lo[c] = 1e30;
    hi[c] = -1e30;
    for (int t = 0; t < 16; ++t) {
      lo[c] = std::min(lo[c], (double)B.v[t][c]);
      hi[c] = std::max(hi[c], (double)B.v[t][c]);
    }
    // finalize-inverse into the interpolation domain
    lo[c] = lo[c] * 64.0 / 31.0;
    hi[c] = hi[c] * 64.0 / 31.0;
  }
  int q0[3], q1[3], bq0[3], bq1[3], bsel[16];
  for (int c = 0; c < 3; ++c) {
    q0[c] = quant10(lo[c]);
    q1[c] = quant10(hi[c]);
  }
  double best = 1e30;
  best = try_pair(B, q0, q1, bq0, bq1, bsel, best);

  int rounds = quality <= 0 ? 1 : (quality >= 4 ? 6 : quality + 1);
  for (int it = 0; it < rounds; ++it) {
    double e0[3], e1[3];
    for (int c = 0; c < 3; ++c) {
      e0[c] = unquant10(bq0[c]);
      e1[c] = unquant10(bq1[c]);
    }
    ls_endpoints(B, bsel, e0, e1);
    int nq0[3], nq1[3];
    for (int c = 0; c < 3; ++c) {
      nq0[c] = quant10(e0[c]);
      nq1[c] = quant10(e1[c]);
    }
    double prev = best;
    best = try_pair(B, nq0, nq1, bq0, bq1, bsel, best);
    if (best >= prev - 1e-9) break;
  }

  if (quality >= 2) {
    for (int pass = 0; pass < 2; ++pass) {
      int base0[3], base1[3];
      std::memcpy(base0, bq0, sizeof base0);
      std::memcpy(base1, bq1, sizeof base1);
      for (int c = 0; c < 3; ++c)
        for (int d0 = -1; d0 <= 1; ++d0)
          for (int d1 = -1; d1 <= 1; ++d1) {
            if (!d0 && !d1) continue;
            int nq0[3], nq1[3];
            std::memcpy(nq0, base0, sizeof nq0);
            std::memcpy(nq1, base1, sizeof nq1);
            nq0[c] = clampi(base0[c] + d0, 0, 1023);
            nq1[c] = clampi(base1[c] + d1, 0, 1023);
            best = try_pair(B, nq0, nq1, bq0, bq1, bsel, best);
          }
      if (!std::memcmp(base0, bq0, sizeof base0) &&
          !std::memcmp(base1, bq1, sizeof base1))
        break;
    }
  }

  // Fixup: anchor index 0 must have its MSB clear (the spec drops the
  // anchor's top bit); swap endpoints if needed (palette reverses).
  if (bsel[0] & 8) {
    std::swap(bq0[0], bq1[0]);
    std::swap(bq0[1], bq1[1]);
    std::swap(bq0[2], bq1[2]);
    for (int t = 0; t < 16; ++t) bsel[t] = 15 - bsel[t];
  }

  // Pack mode 11: 5 mode bits 00011, then rw[9:0] gw[9:0] bw[9:0]
  // rx[9:0] gx[9:0] bx[9:0], then 63 index bits (anchor 3 bits).
  uint8_t bits[16] = {};
  int pos = 0;
  auto put = [&](uint64_t v, int n) {
    for (int i = 0; i < n; ++i) {
      if ((v >> i) & 1) bits[(pos + i) >> 3] |= (uint8_t)(1 << ((pos + i) & 7));
    }
    pos += n;
  };
  put(0x03, 5);  // mode 11 = 00011 (LSB-first: bits 0..4)
  put((uint64_t)bq0[0], 10);
  put((uint64_t)bq0[1], 10);
  put((uint64_t)bq0[2], 10);
  put((uint64_t)bq1[0], 10);
  put((uint64_t)bq1[1], 10);
  put((uint64_t)bq1[2], 10);
  put((uint64_t)(bsel[0] & 7), 3);
  for (int t = 1; t < 16; ++t) put((uint64_t)(bsel[t] & 15), 4);
  std::memcpy(out, bits, 16);
}

}  // namespace

extern "C" {

// rgb [n,16,3] float (non-negative HDR) -> out [n,16] BC6H unsigned blocks.
void ctpu_bc6h_encode(const float* rgb, int n, int quality, int threads,
                      uint8_t* out) {
  (void)threads;
  for (int b = 0; b < n; ++b)
    encode_block(rgb + b * 48, quality, out + b * 16);
}

}  // extern "C"
