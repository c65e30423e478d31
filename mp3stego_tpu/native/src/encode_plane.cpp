// Native twin of the encode analysis plane (ops/encode_plane.analysis_mdct):
// polyphase window + 32-band filter + forward MDCT + alias butterflies in
// exact Q31 fixed point.
//
// Behavioural reference (bit-for-bit): /root/reference/mp3stego/encoder/
//   MP3_Encoder.py:321-370, 751-758 (window+filter), 681-701 (MDCT),
//   703-744 (alias butterflies); fixed point ops encoder/util.py:123-172.
//
// Everything is integer arithmetic (int64 products, int32 wraparound sums —
// associative, so any summation order matches the reference). This is the
// enabler for the fully-host single-stream encode engine: spectra never
// cross the device link.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int32_t q31mul(int64_t a, int64_t b) {
  return int32_t((a * b) >> 32);
}

}  // namespace

// pcm: (nch, 480 + tg*576) int16 front-padded streams (raw samples; the <<16
// upshift of the reference's WAV read happens here). out: (nch, tg, 576).
extern "C" int64_t encode_analysis(
    const int16_t* pcm, int64_t nch, int64_t tg,
    const int64_t* enwindow,   // (512,) int64 fixed-point window
    const int32_t* fl,         // (32,64) subband filter
    const int32_t* cos_l,      // (18,36) MDCT cosine
    const int32_t* cs8, const int32_t* ca8,  // alias butterfly coefs
    int32_t* out) {
  const int64_t stride = 480 + tg * 576;
  const int64_t ts = tg * 18;
  std::vector<int32_t> sb(size_t(ts) * 32);

  for (int64_t ch = 0; ch < nch; ++ch) {
    const int16_t* s = pcm + ch * stride;

    // ---- window + 32-band filter per 32-sample step
    for (int64_t t = 0; t < ts; ++t) {
      uint32_t tacc[64];
      std::memset(tacc, 0, sizeof(tacc));
      for (int k = 0; k < 8; ++k) {
        const int64_t* en = enwindow + 64 * k;
        const int16_t* base = s + 32 * t + 511 - 64 * k;
        for (int i = 0; i < 64; ++i) {
          const int32_t a = int32_t(base[-i]) << 16;
          tacc[i] += uint32_t(q31mul(a, en[i]));
        }
      }
      int32_t tmp[64];
      for (int i = 0; i < 64; ++i) tmp[i] = int32_t(tacc[i]);

      int32_t* sbt = sb.data() + t * 32;
      const bool odd_step = (t % 18) & 1;
      for (int b = 0; b < 32; ++b) {
        const int32_t* fb = fl + b * 64;
        uint32_t acc = 0;
        for (int j = 0; j < 64; ++j) acc += uint32_t(q31mul(fb[j], tmp[j]));
        int32_t v = int32_t(acc);
        if (odd_step && (b & 1)) v = int32_t(0u - uint32_t(v));
        sbt[b] = v;
      }
    }

    // ---- MDCT over [prev granule ; current granule] per band, then alias
    for (int64_t g = 0; g < tg; ++g) {
      int32_t* og = out + (ch * tg + g) * 576;
      const int32_t* cur = sb.data() + g * 18 * 32;
      const int32_t* prv = g > 0 ? cur - 18 * 32 : nullptr;
      for (int b = 0; b < 32; ++b) {
        int32_t in[36];
        for (int m = 0; m < 18; ++m)
          in[m] = prv ? prv[m * 32 + b] : 0;
        for (int m = 0; m < 18; ++m)
          in[18 + m] = cur[m * 32 + b];
        for (int l = 0; l < 18; ++l) {
          const int32_t* cl = cos_l + l * 36;
          uint32_t acc = 0;
          for (int m = 0; m < 36; ++m) acc += uint32_t(q31mul(in[m], cl[m]));
          og[b * 18 + l] = int32_t(acc);
        }
      }
      // alias butterflies: each (b, i) pair touches exactly freq[b][i] and
      // freq[b-1][17-i]; read both, write both (cmuls semantics, >>31)
      for (int b = 1; b < 32; ++b) {
        for (int i = 0; i < 8; ++i) {
          const int64_t bu = og[b * 18 + i];
          const int64_t bd = og[(b - 1) * 18 + 17 - i];
          og[b * 18 + i] = int32_t((bu * cs8[i] - bd * ca8[i]) >> 31);
          og[(b - 1) * 18 + 17 - i] = int32_t((bu * ca8[i] + bd * cs8[i]) >> 31);
        }
      }
    }
  }
  return 0;
}
