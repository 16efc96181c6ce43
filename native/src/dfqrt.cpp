// dfqrt implementation. See dfqrt.h.
//
// Activations flow NHWC float32; quantized conv/linear layers quantize
// their input to int8 on the fly (asymmetric, zero point from the
// data-free ranges), accumulate in int32, and dequantize with fused
// bias. Non-conv quantizer sites apply quantize-dequantize in float,
// matching the simulator's semantics (dfq_tpu/graph/executor.py).

#include "dfqrt.h"

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#ifdef __AVX512VNNI__
#include <immintrin.h>
#endif

namespace {

std::string g_last_error;

struct Stored {
  std::string dtype;
  std::vector<int> dims;
  size_t offset = 0;
  size_t nbytes = 0;
};

struct Node {
  std::string op;
  std::string name;
  std::vector<std::string> inputs;
  std::map<std::string, std::string> attrs;
};

struct Tensor {
  std::vector<int> dims;
  std::vector<float> data;
  size_t numel() const {
    size_t n = 1;
    for (int d : dims) n *= static_cast<size_t>(d);
    return n;
  }
};

struct Model {
  std::vector<Node> nodes;
  std::vector<std::string> outputs;
  std::map<std::string, Stored> stored;
  std::vector<char> blob;
  int bits_act = 8;
  std::vector<Tensor> last_outputs;
  // preprocessed per-layer weights: HWIO-transposed int8 for convs
  std::map<std::string, std::vector<int8_t>> conv_w_khwi;  // [O][kh][kw][I/g]
  // dense (groups==1) convs also get a tap-major, oc-contiguous copy
  // for the blocked-GEMM fast path: [kh*kw][I][O]
  std::map<std::string, std::vector<int8_t>> conv_w_kio;
  // AVX512-VNNI tile layout for dense convs: [tap][O/16][C/4][16oc][4c]
  // (zero-padded in both c and oc) so one vpdpbusd consumes a 64-byte
  // weight tile against a broadcast 4-channel u8 dword of activation
  std::map<std::string, std::vector<int8_t>> conv_w_vnni;
  // depthwise convs (groups==in_ch==out_ch): tap-major, channel-
  // contiguous [kh*kw][C] so the per-pixel loop vectorizes over C
  std::map<std::string, std::vector<int8_t>> conv_w_dwk;
};

bool has(const Node &n, const std::string &k) { return n.attrs.count(k) > 0; }

std::vector<int> attr_ints(const Node &n, const std::string &k) {
  std::vector<int> out;
  auto it = n.attrs.find(k);
  if (it == n.attrs.end()) return out;
  std::stringstream ss(it->second);
  std::string tok;
  while (std::getline(ss, tok, ',')) out.push_back(std::stoi(tok));
  return out;
}

std::vector<float> attr_floats(const Node &n, const std::string &k) {
  std::vector<float> out;
  auto it = n.attrs.find(k);
  if (it == n.attrs.end()) return out;
  std::stringstream ss(it->second);
  std::string tok;
  while (std::getline(ss, tok, ',')) out.push_back(std::stof(tok));
  return out;
}

int attr_int(const Node &n, const std::string &k, int dflt) {
  auto v = attr_ints(n, k);
  return v.empty() ? dflt : v[0];
}

float attr_float(const Node &n, const std::string &k, float dflt) {
  auto v = attr_floats(n, k);
  return v.empty() ? dflt : v[0];
}

const Stored *find_stored(const Model &m, const std::string &name) {
  auto it = m.stored.find(name);
  return it == m.stored.end() ? nullptr : &it->second;
}

const float *stored_f32(const Model &m, const Stored &s) {
  return reinterpret_cast<const float *>(m.blob.data() + s.offset);
}
const int8_t *stored_i8(const Model &m, const Stored &s) {
  return reinterpret_cast<const int8_t *>(m.blob.data() + s.offset);
}
const int32_t *stored_i32(const Model &m, const Stored &s) {
  return reinterpret_cast<const int32_t *>(m.blob.data() + s.offset);
}

// Quantize-dequantize matching dfq_tpu.quant.core.fake_quant (asymmetric).
void fake_quant_inplace(Tensor &t, float lo, float hi, int bits) {
  const float qmax = static_cast<float>((1 << bits) - 1);
  float scale = std::max((hi - lo) / qmax, 1e-8f);
  const float inv = 1.0f / scale;
  float *p = t.data.data();
  const size_t n = t.numel();
#pragma omp parallel for schedule(static)
  for (long i = 0; i < static_cast<long>(n); ++i) {
    float q = (p[i] - lo) * inv;
    q = std::min(std::max(q, 0.0f), qmax);
    p[i] = std::nearbyint(q) * scale + lo;
  }
}

void maybe_site_quant(const Node &n, int idx, Tensor &t, int bits) {
  std::string key = "aq" + std::to_string(idx);
  if (!has(n, key)) return;
  auto r = attr_floats(n, key);
  fake_quant_inplace(t, r[0], r[1], bits);
}

// ---------------------------------------------------------------------------
// int8 conv: input NHWC f32 -> quantize -> pad(zp) -> direct conv with
// weights pre-transposed to [O][kh][kw][Ig] -> int32 -> dequant epilogue.
Tensor conv_int8(const Model &m, const Node &n, const Tensor &x) {
  const int N = x.dims[0], H = x.dims[1], W = x.dims[2], C = x.dims[3];
  auto stride = attr_ints(n, "stride");
  auto padding = attr_ints(n, "padding");
  auto dilation = attr_ints(n, "dilation");
  auto kernel = attr_ints(n, "kernel");
  const int groups = attr_int(n, "groups", 1);
  const int out_ch = attr_int(n, "out_ch", 0);
  const int kh = kernel[0], kw = kernel[1];
  const int sh = stride[0], sw = stride[1];
  const int ph = padding[0], pw = padding[1];
  const int dh = dilation[0], dw = dilation[1];
  const int ig = C / groups;
  const int og = out_ch / groups;

  const float in_scale = attr_float(n, "in_scale", 1.0f);
  const int in_zp = attr_int(n, "in_zp", 0);

  const Stored *sw_scale = find_stored(m, n.name + "#ws");
  const Stored *swsum = find_stored(m, n.name + "#wsum");
  const Stored *sbias = find_stored(m, n.name + "#b");
  const float *w_scale = stored_f32(m, *sw_scale);
  const int32_t *wsum = stored_i32(m, *swsum);
  const float *bias = sbias ? stored_f32(m, *sbias) : nullptr;
  const std::vector<int8_t> &wk = m.conv_w_khwi.at(n.name);

  // quantize + pad input with the zero point. The buffer holds the
  // UNSIGNED grid value q+128 in [0,255] (padding = zp+128): every
  // inner product then runs u8 x s8 — the form AVX512-VNNI's vpdpbusd
  // computes natively — and the zero-point fold becomes
  // ``acc - (zp+128) * wsum``, exact at borders because the padding
  // carries the same +128 shift.
  const int PH = H + 2 * ph, PW = W + 2 * pw;
  const int zp_u = in_zp + 128;
  // +4 bytes slack: the VNNI path's 4-byte channel-group loads may read
  // up to 3 bytes past the final channel (matched by zero weights)
  std::vector<uint8_t> q(static_cast<size_t>(N) * PH * PW * C + 4,
                         static_cast<uint8_t>(zp_u));
  const float inv_s = 1.0f / in_scale;
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < N; ++b)
    for (int i = 0; i < H; ++i) {
      const float *src = x.data.data() + ((static_cast<size_t>(b) * H + i) * W) * C;
      uint8_t *dst = q.data() +
                     ((static_cast<size_t>(b) * PH + i + ph) * PW + pw) * C;
      for (int j = 0; j < W * C; ++j) {
        float v = std::nearbyint(src[j] * inv_s) + zp_u;
        v = std::min(std::max(v, 0.0f), 255.0f);
        dst[j] = static_cast<uint8_t>(v);
      }
    }

  const int OH = (PH - (dh * (kh - 1) + 1)) / sh + 1;
  const int OW = (PW - (dw * (kw - 1) + 1)) / sw + 1;
  Tensor out;
  out.dims = {N, OH, OW, out_ch};
  out.data.resize(out.numel());

#ifdef __AVX512VNNI__
  auto vnni_it = m.conv_w_vnni.find(n.name);
  if (groups == 1 && vnni_it != m.conv_w_vnni.end()) {
    // VNNI GEMM: per (row, 8-pixel block, 16-oc tile), one vpdpbusd
    // consumes 4 input channels x 16 output channels; the 64-byte
    // weight tile is reused across the 8 pixels from registers/L1.
    // u8 x s8 is exact with the +128-shifted buffer (see above).
    constexpr int PX = 8;
    const int OT = (out_ch + 15) / 16, C4 = (C + 3) / 4;
    const int8_t *wt_all = vnni_it->second.data();
#pragma omp parallel for collapse(2) schedule(static)
    for (int b = 0; b < N; ++b)
      for (int oy = 0; oy < OH; ++oy) {
        for (int ox0 = 0; ox0 < OW; ox0 += PX) {
          const int npx = std::min(PX, OW - ox0);
          const uint8_t *xbase[PX];
          for (int px = 0; px < npx; ++px)
            xbase[px] = q.data() +
                        ((static_cast<size_t>(b) * PH + oy * sh) * PW +
                         (ox0 + px) * sw) *
                            C;
          for (int ot = 0; ot < OT; ++ot) {
            __m512i acc[PX];
            for (int px = 0; px < npx; ++px) acc[px] = _mm512_setzero_si512();
            for (int ky = 0; ky < kh; ++ky)
              for (int kx = 0; kx < kw; ++kx) {
                const size_t xoff =
                    (static_cast<size_t>(ky) * dh * PW + kx * dw) * C;
                const int8_t *wblk =
                    wt_all +
                    ((static_cast<size_t>(ky) * kw + kx) * OT + ot) * C4 * 64;
                for (int c4 = 0; c4 < C4; ++c4) {
                  const __m512i wv = _mm512_loadu_si512(
                      reinterpret_cast<const void *>(wblk + c4 * 64));
                  for (int px = 0; px < npx; ++px) {
                    uint32_t xd;
                    std::memcpy(&xd, xbase[px] + xoff + c4 * 4, 4);
                    acc[px] = _mm512_dpbusd_epi32(
                        acc[px], _mm512_set1_epi32(static_cast<int>(xd)), wv);
                  }
                }
              }
            const int o0 = ot * 16, on = std::min(16, out_ch - o0);
            for (int px = 0; px < npx; ++px) {
              alignas(64) int32_t av[16];
              _mm512_store_si512(reinterpret_cast<void *>(av), acc[px]);
              float *dst =
                  out.data.data() +
                  ((static_cast<size_t>(b) * OH + oy) * OW + ox0 + px) *
                      out_ch +
                  o0;
              for (int o = 0; o < on; ++o) {
                float v = static_cast<float>(av[o] - zp_u * wsum[o0 + o]) *
                          (in_scale * w_scale[o0 + o]);
                if (bias) v += bias[o0 + o];
                dst[o] = v;
              }
            }
          }
        }
      }
    return out;
  }
#endif

  auto kio_it = m.conv_w_kio.find(n.name);
  if (groups == 1 && kio_it != m.conv_w_kio.end()) {
    // Blocked-GEMM fallback for dense convs without VNNI: PX output
    // pixels x all out_ch accumulated together, inner loop contiguous
    // over oc so it autovectorizes, with each input channel's oc-row
    // of weights reused across the PX pixels from L1.
    constexpr int PX = 8;
    const int8_t *wt_all = kio_it->second.data();
#pragma omp parallel for collapse(2) schedule(static)
    for (int b = 0; b < N; ++b)
      for (int oy = 0; oy < OH; ++oy) {
        std::vector<int32_t> acc(static_cast<size_t>(PX) * out_ch);
        for (int ox0 = 0; ox0 < OW; ox0 += PX) {
          const int npx = std::min(PX, OW - ox0);
          std::fill(acc.begin(), acc.begin() + static_cast<size_t>(npx) * out_ch, 0);
          for (int ky = 0; ky < kh; ++ky) {
            const int iy = oy * sh + ky * dh;
            const uint8_t *xrow =
                q.data() + (static_cast<size_t>(b) * PH + iy) * PW * C;
            for (int kx = 0; kx < kw; ++kx) {
              const int8_t *wt =
                  wt_all + (static_cast<size_t>(ky) * kw + kx) * C * out_ch;
              for (int c = 0; c < C; ++c) {
                const int8_t *wrow = wt + static_cast<size_t>(c) * out_ch;
                for (int px = 0; px < npx; ++px) {
                  const int ix = (ox0 + px) * sw + kx * dw;
                  const int32_t xv = xrow[static_cast<size_t>(ix) * C + c];
                  if (xv == 0) continue;  // u8 0 == relu-sparse zero
                  int32_t *ap = acc.data() + static_cast<size_t>(px) * out_ch;
                  for (int o = 0; o < out_ch; ++o)
                    ap[o] += xv * static_cast<int32_t>(wrow[o]);
                }
              }
            }
          }
          for (int px = 0; px < npx; ++px) {
            float *dst = out.data.data() +
                         ((static_cast<size_t>(b) * OH + oy) * OW + ox0 + px) *
                             out_ch;
            const int32_t *ap = acc.data() + static_cast<size_t>(px) * out_ch;
            for (int o = 0; o < out_ch; ++o) {
              float v = static_cast<float>(ap[o] - zp_u * wsum[o]) *
                        (in_scale * w_scale[o]);
              if (bias) v += bias[o];
              dst[o] = v;
            }
          }
        }
      }
    return out;
  }

  auto dwk_it = m.conv_w_dwk.find(n.name);
  if (ig == 1 && groups == out_ch && dwk_it != m.conv_w_dwk.end()) {
    // Depthwise fast path: per output pixel, accumulate the k^2 taps
    // with a channel-contiguous inner loop (vectorizes over C); the
    // generic grouped loop below degrades to a scalar 1-wide dot here.
    const int8_t *wt_all = dwk_it->second.data();
#pragma omp parallel for collapse(2) schedule(static)
    for (int b = 0; b < N; ++b)
      for (int oy = 0; oy < OH; ++oy) {
        std::vector<int32_t> acc(out_ch);
        for (int ox = 0; ox < OW; ++ox) {
          std::fill(acc.begin(), acc.end(), 0);
          for (int ky = 0; ky < kh; ++ky) {
            const int iy = oy * sh + ky * dh;
            for (int kx = 0; kx < kw; ++kx) {
              const int ix = ox * sw + kx * dw;
              const uint8_t *xp =
                  q.data() + ((static_cast<size_t>(b) * PH + iy) * PW + ix) * C;
              const int8_t *wrow =
                  wt_all + (static_cast<size_t>(ky) * kw + kx) * out_ch;
              for (int c = 0; c < out_ch; ++c)
                acc[c] += static_cast<int32_t>(xp[c]) *
                          static_cast<int32_t>(wrow[c]);
            }
          }
          float *dst = out.data.data() +
                       ((static_cast<size_t>(b) * OH + oy) * OW + ox) * out_ch;
          for (int c = 0; c < out_ch; ++c) {
            float v = static_cast<float>(acc[c] - zp_u * wsum[c]) *
                      (in_scale * w_scale[c]);
            if (bias) v += bias[c];
            dst[c] = v;
          }
        }
      }
    return out;
  }

  const size_t wstride_oc = static_cast<size_t>(kh) * kw * ig;
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < N; ++b)
    for (int oy = 0; oy < OH; ++oy) {
      for (int ox = 0; ox < OW; ++ox) {
        float *dst = out.data.data() +
                     ((static_cast<size_t>(b) * OH + oy) * OW + ox) * out_ch;
        for (int g = 0; g < groups; ++g) {
          for (int oc_l = 0; oc_l < og; ++oc_l) {
            const int oc = g * og + oc_l;
            const int8_t *wp = wk.data() + oc * wstride_oc;
            int32_t acc = 0;
            for (int ky = 0; ky < kh; ++ky) {
              const int iy = oy * sh + ky * dh;
              for (int kx = 0; kx < kw; ++kx) {
                const int ix = ox * sw + kx * dw;
                const uint8_t *xp =
                    q.data() +
                    ((static_cast<size_t>(b) * PH + iy) * PW + ix) * C + g * ig;
                const int8_t *wrow = wp + (ky * kw + kx) * ig;
                int32_t s = 0;
                for (int c = 0; c < ig; ++c)
                  s += static_cast<int32_t>(xp[c]) * wrow[c];
                acc += s;
              }
            }
            acc -= zp_u * wsum[oc];
            float v = static_cast<float>(acc) * (in_scale * w_scale[oc]);
            if (bias) v += bias[oc];
            dst[oc] = v;
          }
        }
      }
    }
  return out;
}

Tensor linear_int8(const Model &m, const Node &n, const Tensor &x) {
  const int in_f = attr_int(n, "in_f", 0);
  const int out_f = attr_int(n, "out_f", 0);
  const int N = static_cast<int>(x.numel()) / in_f;
  const float in_scale = attr_float(n, "in_scale", 1.0f);
  const int in_zp = attr_int(n, "in_zp", 0);
  const Stored *sqw = find_stored(m, n.name + "#qw");
  const int8_t *qw = stored_i8(m, *sqw);  // [out_f, in_f]
  const float *w_scale = stored_f32(m, *find_stored(m, n.name + "#ws"));
  const int32_t *wsum = stored_i32(m, *find_stored(m, n.name + "#wsum"));
  const Stored *sbias = find_stored(m, n.name + "#b");
  const float *bias = sbias ? stored_f32(m, *sbias) : nullptr;

  std::vector<int8_t> q(static_cast<size_t>(N) * in_f);
  const float inv_s = 1.0f / in_scale;
  for (size_t i = 0; i < q.size(); ++i) {
    float v = std::nearbyint(x.data[i] * inv_s) + (in_zp + 128);
    v = std::min(std::max(v, 0.0f), 255.0f);
    q[i] = static_cast<int8_t>(static_cast<int>(v) - 128);
  }

  Tensor out;
  out.dims = {N, out_f};
  out.data.resize(out.numel());
#pragma omp parallel for schedule(static)
  for (int b = 0; b < N; ++b) {
    const int8_t *xp = q.data() + static_cast<size_t>(b) * in_f;
    float *dst = out.data.data() + static_cast<size_t>(b) * out_f;
    for (int o = 0; o < out_f; ++o) {
      const int8_t *wp = qw + static_cast<size_t>(o) * in_f;
      int32_t acc = 0;
      for (int c = 0; c < in_f; ++c)
        acc += static_cast<int32_t>(xp[c]) * wp[c];
      acc -= in_zp * wsum[o];
      float v = static_cast<float>(acc) * (in_scale * w_scale[o]);
      if (bias) v += bias[o];
      dst[o] = v;
    }
  }
  return out;
}

// f32 fallback conv (unquantized layers).
Tensor conv_f32(const Model &m, const Node &n, const Tensor &x) {
  const int N = x.dims[0], H = x.dims[1], W = x.dims[2], C = x.dims[3];
  auto stride = attr_ints(n, "stride");
  auto padding = attr_ints(n, "padding");
  auto dilation = attr_ints(n, "dilation");
  auto kernel = attr_ints(n, "kernel");
  const int groups = attr_int(n, "groups", 1);
  const int out_ch = attr_int(n, "out_ch", 0);
  const int kh = kernel[0], kw = kernel[1];
  const int sh = stride[0], sw = stride[1];
  const int ph = padding[0], pw = padding[1];
  const int dh = dilation[0], dw = dilation[1];
  const int ig = C / groups, og = out_ch / groups;
  const float *wt = stored_f32(m, *find_stored(m, n.name + "#weight"));
  const Stored *sb = find_stored(m, n.name + "#bias");
  const float *bias = sb ? stored_f32(m, *sb) : nullptr;

  const int OH = (H + 2 * ph - (dh * (kh - 1) + 1)) / sh + 1;
  const int OW = (W + 2 * pw - (dw * (kw - 1) + 1)) / sw + 1;
  Tensor out;
  out.dims = {N, OH, OW, out_ch};
  out.data.assign(out.numel(), 0.0f);
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < N; ++b)
    for (int oy = 0; oy < OH; ++oy)
      for (int ox = 0; ox < OW; ++ox)
        for (int g = 0; g < groups; ++g)
          for (int oc_l = 0; oc_l < og; ++oc_l) {
            const int oc = g * og + oc_l;
            float acc = bias ? bias[oc] : 0.0f;
            for (int ky = 0; ky < kh; ++ky) {
              const int iy = oy * sh + ky * dh - ph;
              if (iy < 0 || iy >= H) continue;
              for (int kx = 0; kx < kw; ++kx) {
                const int ix = ox * sw + kx * dw - pw;
                if (ix < 0 || ix >= W) continue;
                for (int c = 0; c < ig; ++c) {
                  // weight OIHW
                  float wv = wt[((static_cast<size_t>(oc) * ig + c) * kh + ky) * kw + kx];
                  acc += wv * x.data[((static_cast<size_t>(b) * H + iy) * W + ix) * C +
                                     g * ig + c];
                }
              }
            }
            out.data[((static_cast<size_t>(b) * OH + oy) * OW + ox) * out_ch + oc] = acc;
          }
  return out;
}

Tensor bn_f32(const Model &m, const Node &n, const Tensor &x) {
  const float eps = attr_float(n, "eps", 1e-5f);
  const float *gamma = stored_f32(m, *find_stored(m, n.name + "#gamma"));
  const float *beta = stored_f32(m, *find_stored(m, n.name + "#beta"));
  const float *mean = stored_f32(m, *find_stored(m, n.name + "#mean"));
  const float *var = stored_f32(m, *find_stored(m, n.name + "#var"));
  const int C = x.dims.back();
  Tensor out = x;
  const size_t n_el = x.numel();
#pragma omp parallel for schedule(static)
  for (long i = 0; i < static_cast<long>(n_el); ++i) {
    const int c = static_cast<int>(i % C);
    out.data[i] = (x.data[i] - mean[c]) / std::sqrt(var[c] + eps) * gamma[c] + beta[c];
  }
  return out;
}

Tensor bilinear_resize(const Tensor &x, int oh, int ow, bool align_corners) {
  const int N = x.dims[0], H = x.dims[1], W = x.dims[2], C = x.dims[3];
  Tensor out;
  out.dims = {N, oh, ow, C};
  out.data.resize(out.numel());
  auto coord = [&](int i, int in_len, int out_len) -> float {
    if (align_corners && out_len > 1)
      return static_cast<float>(i) * (in_len - 1) / (out_len - 1);
    float c = (i + 0.5f) * in_len / out_len - 0.5f;
    return std::min(std::max(c, 0.0f), static_cast<float>(in_len - 1));
  };
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < N; ++b)
    for (int oy = 0; oy < oh; ++oy) {
      float fy = coord(oy, H, oh);
      int y0 = static_cast<int>(fy);
      int y1 = std::min(y0 + 1, H - 1);
      float wy = fy - y0;
      for (int ox = 0; ox < ow; ++ox) {
        float fx = coord(ox, W, ow);
        int x0 = static_cast<int>(fx);
        int x1 = std::min(x0 + 1, W - 1);
        float wx = fx - x0;
        float *dst = out.data.data() +
                     ((static_cast<size_t>(b) * oh + oy) * ow + ox) * C;
        const float *p00 = x.data.data() + ((static_cast<size_t>(b) * H + y0) * W + x0) * C;
        const float *p01 = x.data.data() + ((static_cast<size_t>(b) * H + y0) * W + x1) * C;
        const float *p10 = x.data.data() + ((static_cast<size_t>(b) * H + y1) * W + x0) * C;
        const float *p11 = x.data.data() + ((static_cast<size_t>(b) * H + y1) * W + x1) * C;
        for (int c = 0; c < C; ++c) {
          float top = p00[c] * (1 - wx) + p01[c] * wx;
          float bot = p10[c] * (1 - wx) + p11[c] * wx;
          dst[c] = top * (1 - wy) + bot * wy;
        }
      }
    }
  return out;
}

Tensor pool2d(const Tensor &x, const Node &n, bool is_max) {
  auto window = attr_ints(n, "window");
  auto stride = attr_ints(n, "stride");
  auto padding = attr_ints(n, "padding");
  const int N = x.dims[0], H = x.dims[1], W = x.dims[2], C = x.dims[3];
  const int wh = window[0], ww = window[1];
  const int sh = stride[0], sw = stride[1];
  const int ph = padding[0], pw = padding[1];
  const int OH = (H + 2 * ph - wh) / sh + 1;
  const int OW = (W + 2 * pw - ww) / sw + 1;
  Tensor out;
  out.dims = {N, OH, OW, C};
  out.data.resize(out.numel());
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < N; ++b)
    for (int oy = 0; oy < OH; ++oy)
      for (int ox = 0; ox < OW; ++ox) {
        float *dst = out.data.data() +
                     ((static_cast<size_t>(b) * OH + oy) * OW + ox) * C;
        for (int c = 0; c < C; ++c) {
          float acc = is_max ? -1e30f : 0.0f;
          for (int ky = 0; ky < wh; ++ky) {
            const int iy = oy * sh + ky - ph;
            for (int kx = 0; kx < ww; ++kx) {
              const int ix = ox * sw + kx - pw;
              float v = 0.0f;
              if (iy >= 0 && iy < H && ix >= 0 && ix < W)
                v = x.data[((static_cast<size_t>(b) * H + iy) * W + ix) * C + c];
              else if (is_max)
                continue;
              if (is_max)
                acc = std::max(acc, v);
              else
                acc += v;  // count_include_pad=true
            }
          }
          dst[c] = is_max ? acc : acc / (wh * ww);
        }
      }
  return out;
}

bool parse_param(Model &m, const std::string &path) {
  std::ifstream f(path);
  if (!f) {
    g_last_error = "cannot open param file: " + path;
    return false;
  }
  std::string line;
  if (!std::getline(f, line) || line.rfind("dfqrt", 0) != 0) {
    g_last_error = "bad magic in " + path;
    return false;
  }
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    std::stringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "node") {
      Node n;
      int nin = 0, nattr = 0;
      ss >> n.op >> n.name >> nin;
      for (int i = 0; i < nin; ++i) {
        std::string s;
        ss >> s;
        n.inputs.push_back(s);
      }
      ss >> nattr;
      for (int i = 0; i < nattr; ++i) {
        std::string kv;
        ss >> kv;
        auto eq = kv.find('=');
        if (eq != std::string::npos)
          n.attrs[kv.substr(0, eq)] = kv.substr(eq + 1);
      }
      m.nodes.push_back(std::move(n));
    } else if (kind == "outputs") {
      int k = 0;
      ss >> k;
      for (int i = 0; i < k; ++i) {
        std::string s;
        ss >> s;
        m.outputs.push_back(s);
      }
    } else if (kind == "bits_act") {
      ss >> m.bits_act;
    } else if (kind == "tensor") {
      Stored s;
      std::string name;
      int ndim = 0;
      ss >> name >> s.dtype >> ndim;
      for (int i = 0; i < ndim; ++i) {
        int d = 0;
        ss >> d;
        s.dims.push_back(d);
      }
      ss >> s.offset >> s.nbytes;
      m.stored[name] = s;
    }
  }
  return true;
}

void prepack_conv_weights(Model &m) {
  for (const auto &n : m.nodes) {
    if (n.op != "conv" || !has(n, "q")) continue;
    const Stored *sqw = find_stored(m, n.name + "#qw");
    if (!sqw) continue;
    const int8_t *qw = stored_i8(m, *sqw);  // OIHW [O, Ig, kh, kw]
    const int O = sqw->dims[0], Ig = sqw->dims[1], KH = sqw->dims[2],
              KW = sqw->dims[3];
    std::vector<int8_t> packed(static_cast<size_t>(O) * KH * KW * Ig);
    for (int o = 0; o < O; ++o)
      for (int ky = 0; ky < KH; ++ky)
        for (int kx = 0; kx < KW; ++kx)
          for (int c = 0; c < Ig; ++c)
            packed[((static_cast<size_t>(o) * KH + ky) * KW + kx) * Ig + c] =
                qw[((static_cast<size_t>(o) * Ig + c) * KH + ky) * KW + kx];
    m.conv_w_khwi[n.name] = std::move(packed);
    if (attr_int(n, "groups", 1) == 1) {
      // [kh*kw][I][O]: tap-major with oc contiguous, so the GEMM fast
      // path's inner loop streams one cache-resident oc row per input
      // channel (see conv_int8's blocked path)
      std::vector<int8_t> kio(static_cast<size_t>(KH) * KW * Ig * O);
      for (int ky = 0; ky < KH; ++ky)
        for (int kx = 0; kx < KW; ++kx)
          for (int c = 0; c < Ig; ++c)
            for (int o = 0; o < O; ++o)
              kio[(((static_cast<size_t>(ky) * KW + kx) * Ig + c) * O) + o] =
                  qw[((static_cast<size_t>(o) * Ig + c) * KH + ky) * KW + kx];
      m.conv_w_kio[n.name] = std::move(kio);
#ifdef __AVX512VNNI__
      const int OT = (O + 15) / 16, C4 = (Ig + 3) / 4;
      std::vector<int8_t> vw(static_cast<size_t>(KH) * KW * OT * C4 * 64, 0);
      for (int ky = 0; ky < KH; ++ky)
        for (int kx = 0; kx < KW; ++kx)
          for (int o = 0; o < O; ++o)
            for (int c = 0; c < Ig; ++c)
              vw[((((static_cast<size_t>(ky) * KW + kx) * OT + o / 16) * C4 +
                   c / 4) *
                      16 +
                  o % 16) *
                     4 +
                 c % 4] =
                  qw[((static_cast<size_t>(o) * Ig + c) * KH + ky) * KW + kx];
      m.conv_w_vnni[n.name] = std::move(vw);
#endif
    }
    const int groups = attr_int(n, "groups", 1);
    if (groups > 1 && Ig == 1 && groups == O) {
      std::vector<int8_t> dwk(static_cast<size_t>(KH) * KW * O);
      for (int ky = 0; ky < KH; ++ky)
        for (int kx = 0; kx < KW; ++kx)
          for (int c = 0; c < O; ++c)
            dwk[(static_cast<size_t>(ky) * KW + kx) * O + c] =
                qw[(static_cast<size_t>(c) * KH + ky) * KW + kx];
      m.conv_w_dwk[n.name] = std::move(dwk);
    }
  }
}

// Identity BNs (gamma=1, beta=0, mean=0, var=1 — what merge_batchnorm
// leaves behind) become passthroughs: a full per-channel normalize pass
// over an identity transform was ~25% of MNV2 forward time.
bool bn_is_identity(const Model &m, const Node &n) {
  const Stored *sg = find_stored(m, n.name + "#gamma");
  const Stored *sb = find_stored(m, n.name + "#beta");
  const Stored *sm = find_stored(m, n.name + "#mean");
  const Stored *sv = find_stored(m, n.name + "#var");
  if (!sg || !sb || !sm || !sv) return false;
  const int C = sg->dims[0];
  const float *g = stored_f32(m, *sg), *b = stored_f32(m, *sb),
              *mu = stored_f32(m, *sm), *v = stored_f32(m, *sv);
  for (int c = 0; c < C; ++c)
    if (g[c] != 1.0f || b[c] != 0.0f || mu[c] != 0.0f || v[c] != 1.0f)
      return false;
  return true;
}

Tensor run_node(Model &m, const Node &n, std::vector<Tensor> &ins) {
  const std::string &op = n.op;
  if (op == "conv") {
    if (has(n, "q")) return conv_int8(m, n, ins[0]);
    maybe_site_quant(n, 0, ins[0], m.bits_act);
    return conv_f32(m, n, ins[0]);
  }
  if (op == "linear") {
    if (has(n, "q")) return linear_int8(m, n, ins[0]);
    g_last_error = "f32 linear not packed";
    return ins[0];
  }
  if (op == "bn") {
    if (bn_is_identity(m, n)) return std::move(ins[0]);
    return bn_f32(m, n, ins[0]);
  }
  if (op == "relu") {
    Tensor out = std::move(ins[0]);  // forward loop gave us our own copy
    for (auto &v : out.data) v = std::max(v, 0.0f);
    return out;
  }
  if (op == "relu6") {
    Tensor out = std::move(ins[0]);
    for (auto &v : out.data) v = std::min(std::max(v, 0.0f), 6.0f);
    return out;
  }
  if (op == "add") {
    maybe_site_quant(n, 0, ins[0], m.bits_act);
    maybe_site_quant(n, 1, ins[1], m.bits_act);
    Tensor out = std::move(ins[0]);
    for (size_t i = 0; i < out.data.size(); ++i) out.data[i] += ins[1].data[i];
    return out;
  }
  if (op == "concat") {
    int axis = attr_int(n, "axis", -1);
    const int nd = static_cast<int>(ins[0].dims.size());
    if (axis < 0) axis += nd;
    for (size_t i = 0; i < ins.size(); ++i)
      maybe_site_quant(n, static_cast<int>(i), ins[i], m.bits_act);
    Tensor out;
    out.dims = ins[0].dims;
    int total = 0;
    for (auto &t : ins) total += t.dims[axis];
    out.dims[axis] = total;
    out.data.resize(out.numel());
    // outer = product of dims before axis; inner = after
    size_t outer = 1, inner = 1;
    for (int i = 0; i < axis; ++i) outer *= ins[0].dims[i];
    for (int i = axis + 1; i < nd; ++i) inner *= ins[0].dims[i];
    size_t dst_off = 0;
    for (size_t o = 0; o < outer; ++o) {
      for (auto &t : ins) {
        const size_t chunk = static_cast<size_t>(t.dims[axis]) * inner;
        std::memcpy(out.data.data() + dst_off, t.data.data() + o * chunk,
                    chunk * sizeof(float));
        dst_off += chunk;
      }
    }
    return out;
  }
  if (op == "global_mean" || op == "global_pool") {
    maybe_site_quant(n, 0, ins[0], m.bits_act);
    const int N = ins[0].dims[0], H = ins[0].dims[1], W = ins[0].dims[2],
              C = ins[0].dims[3];
    Tensor out;
    out.dims = (op == "global_mean") ? std::vector<int>{N, C}
                                     : std::vector<int>{N, 1, 1, C};
    out.data.assign(static_cast<size_t>(N) * C, 0.0f);
    for (int b = 0; b < N; ++b) {
      float *dst = out.data.data() + static_cast<size_t>(b) * C;
      for (int i = 0; i < H * W; ++i) {
        const float *src =
            ins[0].data.data() + (static_cast<size_t>(b) * H * W + i) * C;
        for (int c = 0; c < C; ++c) dst[c] += src[c];
      }
      for (int c = 0; c < C; ++c) dst[c] /= static_cast<float>(H * W);
    }
    return out;
  }
  if (op == "avgpool") return pool2d(ins[0], n, false);
  if (op == "maxpool") return pool2d(ins[0], n, true);
  if (op == "pad") {
    auto p = attr_ints(n, "pads");  // top, bottom, left, right
    const int N = ins[0].dims[0], H = ins[0].dims[1], W = ins[0].dims[2],
              C = ins[0].dims[3];
    Tensor out;
    out.dims = {N, H + p[0] + p[1], W + p[2] + p[3], C};
    out.data.assign(out.numel(), 0.0f);
    for (int b = 0; b < N; ++b)
      for (int i = 0; i < H; ++i)
        std::memcpy(out.data.data() +
                        ((static_cast<size_t>(b) * out.dims[1] + i + p[0]) *
                             out.dims[2] +
                         p[2]) *
                            C,
                    ins[0].data.data() +
                        (static_cast<size_t>(b) * H + i) * W * C,
                    static_cast<size_t>(W) * C * sizeof(float));
    return out;
  }
  if (op == "interpolate") {
    maybe_site_quant(n, 0, ins[0], m.bits_act);
    auto size = attr_ints(n, "size");
    bool align = attr_int(n, "align_corners", 1) != 0;
    return bilinear_resize(ins[0], size[0], size[1], align);
  }
  if (op == "softmax") {
    maybe_site_quant(n, 0, ins[0], m.bits_act);
    int axis = attr_int(n, "axis", -1);
    const int nd = static_cast<int>(ins[0].dims.size());
    if (axis < 0) axis += nd;
    Tensor out = ins[0];
    size_t outer = 1, inner = 1;
    const int ax = ins[0].dims[axis];
    for (int i = 0; i < axis; ++i) outer *= ins[0].dims[i];
    for (int i = axis + 1; i < nd; ++i) inner *= ins[0].dims[i];
    for (size_t o = 0; o < outer; ++o)
      for (size_t in = 0; in < inner; ++in) {
        float mx = -1e30f;
        for (int a = 0; a < ax; ++a)
          mx = std::max(mx, out.data[(o * ax + a) * inner + in]);
        float sum = 0.0f;
        for (int a = 0; a < ax; ++a) {
          float e = std::exp(out.data[(o * ax + a) * inner + in] - mx);
          out.data[(o * ax + a) * inner + in] = e;
          sum += e;
        }
        for (int a = 0; a < ax; ++a)
          out.data[(o * ax + a) * inner + in] /= sum;
      }
    return out;
  }
  if (op == "reshape") {
    auto shape = attr_ints(n, "shape");
    Tensor out = ins[0];
    std::vector<int> dims = {ins[0].dims[0]};
    size_t known = 1;
    int neg = -1;
    for (size_t i = 0; i < shape.size(); ++i) {
      dims.push_back(shape[i]);
      if (shape[i] == -1)
        neg = static_cast<int>(i) + 1;
      else
        known *= shape[i];
    }
    if (neg >= 0)
      dims[neg] = static_cast<int>(ins[0].numel() / ins[0].dims[0] / known);
    out.dims = dims;
    return out;
  }
  if (op == "identity" || op == "dropout") return ins[0];
  g_last_error = "unsupported op: " + op;
  return ins[0];
}

}  // namespace

extern "C" {

void *dfqrt_load(const char *param_path, const char *bin_path) {
  auto m = std::make_unique<Model>();
  if (!parse_param(*m, param_path)) return nullptr;
  std::ifstream f(bin_path, std::ios::binary | std::ios::ate);
  if (!f) {
    g_last_error = std::string("cannot open bin file: ") + bin_path;
    return nullptr;
  }
  const std::streamsize size = f.tellg();
  f.seekg(0);
  m->blob.resize(static_cast<size_t>(size));
  f.read(m->blob.data(), size);
  prepack_conv_weights(*m);
  return m.release();
}

void dfqrt_free(void *handle) { delete static_cast<Model *>(handle); }

int dfqrt_forward(void *handle, const float *input, const int *dims, int ndim) {
  Model &m = *static_cast<Model *>(handle);
  std::map<std::string, Tensor> env;
  // count consumers so intermediate tensors can be freed eagerly
  std::map<std::string, int> remaining;
  for (const auto &n : m.nodes)
    for (const auto &in : n.inputs) remaining[in]++;
  for (const auto &o : m.outputs) remaining[o] += 1000000;

  for (const auto &n : m.nodes) {
    if (n.op == "input") {
      Tensor t;
      t.dims.assign(dims, dims + ndim);
      t.data.assign(input, input + t.numel());
      env[n.name] = std::move(t);
      continue;
    }
    std::vector<Tensor> ins;
    ins.reserve(n.inputs.size());
    for (const auto &in : n.inputs) {
      auto it = env.find(in);
      if (it == env.end()) {
        g_last_error = "missing input tensor " + in + " for node " + n.name;
        return 1;
      }
      // ops may mutate their inputs (site quant, in-place relu/add), so
      // a consumer needs its own tensor — but when this node is the
      // LAST consumer the tensor can be moved instead of deep-copied
      // (the copies were ~30% of MNV2 forward time, NATIVE_r05.json)
      if (remaining[in] == 1)
        ins.push_back(std::move(it->second));
      else
        ins.push_back(it->second);
    }
    static const bool profile = std::getenv("DFQRT_PROFILE") != nullptr;
    if (profile) {
      const auto t0 = std::chrono::steady_clock::now();
      env[n.name] = run_node(m, n, ins);
      const auto t1 = std::chrono::steady_clock::now();
      std::fprintf(
          stderr, "DFQRT_PROFILE %s %s %.3f ms\n", n.op.c_str(),
          n.name.c_str(),
          std::chrono::duration_cast<std::chrono::duration<double>>(t1 - t0)
                  .count() *
              1e3);
    } else {
      env[n.name] = run_node(m, n, ins);
    }
    for (const auto &in : n.inputs) {
      if (--remaining[in] == 0) env.erase(in);
    }
  }

  m.last_outputs.clear();
  for (const auto &o : m.outputs) m.last_outputs.push_back(env[o]);
  return 0;
}

int dfqrt_num_outputs(void *handle) {
  return static_cast<int>(static_cast<Model *>(handle)->last_outputs.size());
}

int dfqrt_output_ndim(void *handle, int index) {
  return static_cast<int>(
      static_cast<Model *>(handle)->last_outputs[index].dims.size());
}

void dfqrt_output_dims(void *handle, int index, int *dims_out) {
  const auto &t = static_cast<Model *>(handle)->last_outputs[index];
  for (size_t i = 0; i < t.dims.size(); ++i) dims_out[i] = t.dims[i];
}

void dfqrt_output_data(void *handle, int index, float *data_out) {
  const auto &t = static_cast<Model *>(handle)->last_outputs[index];
  std::memcpy(data_out, t.data.data(), t.data.size() * sizeof(float));
}

const char *dfqrt_last_error() { return g_last_error.c_str(); }

}  // extern "C"
