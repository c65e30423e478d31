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
//
// Loop structure is chosen for auto-vectorization (AVX-512 via -march=native
// -mprefer-vector-width=512):
//   * window taps iterate ASCENDING over contiguous int16 samples (the
//     reference's descending base[-i] walk is re-indexed j = 63-i, with the
//     enwindow and filter tables pre-reversed to match), giving unit-stride
//     widening loads;
//   * the 32-band filter is a 64x32 matvec with the filter TRANSPOSED so the
//     32 output lanes are contiguous per tap (broadcast-multiply-accumulate);
//   * the MDCT iterates over the 36 input sub-steps with the 32 bands as
//     contiguous lanes (sb rows are band-contiguous), accumulating an 18x32
//     tile that is transposed on store.
// Every product is (int64)int32 * (int64)int32 >> 32 (or >> 16 for the
// window, see below) accumulated mod 2^32 — per-element exact, so
// vectorization cannot change results.

#include <cstdint>
#include <cstring>
#include <vector>
#if defined(__AVX512F__) && defined(__AVX512DQ__) \
    && !defined(MP3STEGO_FORCE_SCALAR)
#include <x86intrin.h>
#define MP3STEGO_ENC_AVX512 1
#endif

// pcm: (nch, 480 + tg*576) int16 front-padded streams (raw samples; the <<16
// upshift of the reference's WAV read happens here). out: (nch, tg, 576).
// Returns -1 if an enwindow entry exceeds int32 range (never for the ISO
// table; guards the exactness of the >>16 re-association below).
extern "C" int64_t encode_analysis(
    const int16_t* pcm, int64_t nch, int64_t tg,
    const int64_t* enwindow,   // (512,) int64 fixed-point window
    const int32_t* fl,         // (32,64) subband filter
    const int32_t* cos_l,      // (18,36) MDCT cosine
    const int32_t* cs8, const int32_t* ca8,  // alias butterfly coefs
    int32_t* out) {
  const int64_t stride = 480 + tg * 576;
  const int64_t ts = tg * 18;

  // Reversed window: enr[k][j] = enwindow[64k + 63 - j]. The reference
  // computes q31mul(sample << 16, en) = ((s<<16) * en) >> 32 == (s * en)
  // >> 16 exactly (no overflow: |s| < 2^15, |en| < 2^31 -> |product| < 2^46;
  // both shifts are arithmetic on the same value).
  int32_t enr[8][64];
  for (int k = 0; k < 8; ++k)
    for (int j = 0; j < 64; ++j) {
      const int64_t v = enwindow[64 * k + 63 - j];
      if (v != int64_t(int32_t(v))) return -1;
      enr[k][j] = int32_t(v);
    }
  // Transposed+reversed filter: flt[j][b] = fl[b][63 - j], so the b-loop is
  // contiguous in both the table and the accumulator.
  std::vector<int32_t> flt(64 * 32);
  for (int j = 0; j < 64; ++j)
    for (int b = 0; b < 32; ++b) flt[j * 32 + b] = fl[b * 64 + (63 - j)];

  std::vector<int32_t> sb(size_t(ts) * 32);

  for (int64_t ch = 0; ch < nch; ++ch) {
    const int16_t* s = pcm + ch * stride;

    // ---- window + 32-band filter per 32-sample step
    for (int64_t t = 0; t < ts; ++t) {
      // taccr[j] holds the reference's tacc[63 - j]
      uint32_t taccr[64];
      std::memset(taccr, 0, sizeof(taccr));
      for (int k = 0; k < 8; ++k) {
        const int16_t* base = s + 32 * t + 448 - 64 * k;  // ascending window
        const int32_t* en = enr[k];
        for (int j = 0; j < 64; ++j)
          taccr[j] += uint32_t((int64_t(base[j]) * en[j]) >> 16);
      }

      int32_t* sbt = sb.data() + t * 32;
      uint32_t acc[32];
      std::memset(acc, 0, sizeof(acc));
      for (int j = 0; j < 64; ++j) {
        const int64_t tj = int32_t(taccr[j]);
        const int32_t* fj = flt.data() + j * 32;
        for (int b = 0; b < 32; ++b)
          acc[b] += uint32_t((int64_t(fj[b]) * tj) >> 32);
      }
      const bool odd_step = (t % 18) & 1;
      for (int b = 0; b < 32; ++b) {
        int32_t v = int32_t(acc[b]);
        if (odd_step && (b & 1)) v = int32_t(0u - uint32_t(v));
        sbt[b] = v;
      }
    }

    // ---- MDCT over [prev granule ; current granule] per band, then alias
    for (int64_t g = 0; g < tg; ++g) {
      int32_t* og = out + (ch * tg + g) * 576;
      const int32_t* cur = sb.data() + g * 18 * 32;
      const int32_t* prv = g > 0 ? cur - 18 * 32 : nullptr;

      // macc[l][b], accumulated lane-parallel over the 32 bands
      uint32_t macc[18][32];
#if defined(MP3STEGO_ENC_AVX512)
      // Register-block the 18x32 tile: 6 l-rows x 8 bands live in 6 zmm
      // accumulators across all 36 m (the autovectorized form reloads and
      // stores the tile every (m,l)). Integer sums are associative mod
      // 2^32, and accumulating the >>32 products in 64-bit lanes keeps the
      // low 32 bits identical to the uint32 scalar accumulation.
      for (int bh = 0; bh < 32; bh += 8) {
        for (int lb = 0; lb < 18; lb += 6) {
          __m512i a0 = _mm512_setzero_si512(), a1 = a0, a2 = a0, a3 = a0,
                  a4 = a0, a5 = a0;
          const int32_t* cl = cos_l + lb * 36;
          for (int m = 0; m < 36; ++m) {
            const int32_t* row =
                m < 18 ? (prv ? prv + m * 32 : nullptr) : cur + (m - 18) * 32;
            if (!row) continue;  // first granule: prev half is zero
            const __m512i r = _mm512_cvtepi32_epi64(
                _mm256_loadu_si256((const __m256i*)(row + bh)));
            // vpmuldq: int32 x int32 -> int64 per lane, then >>32
            a0 = _mm512_add_epi64(
                a0, _mm512_srai_epi64(
                        _mm512_mul_epi32(r, _mm512_set1_epi64(cl[m])), 32));
            a1 = _mm512_add_epi64(
                a1, _mm512_srai_epi64(
                        _mm512_mul_epi32(r, _mm512_set1_epi64(cl[36 + m])),
                        32));
            a2 = _mm512_add_epi64(
                a2, _mm512_srai_epi64(
                        _mm512_mul_epi32(r, _mm512_set1_epi64(cl[72 + m])),
                        32));
            a3 = _mm512_add_epi64(
                a3, _mm512_srai_epi64(
                        _mm512_mul_epi32(r, _mm512_set1_epi64(cl[108 + m])),
                        32));
            a4 = _mm512_add_epi64(
                a4, _mm512_srai_epi64(
                        _mm512_mul_epi32(r, _mm512_set1_epi64(cl[144 + m])),
                        32));
            a5 = _mm512_add_epi64(
                a5, _mm512_srai_epi64(
                        _mm512_mul_epi32(r, _mm512_set1_epi64(cl[180 + m])),
                        32));
          }
          _mm256_storeu_si256((__m256i*)&macc[lb + 0][bh],
                              _mm512_cvtepi64_epi32(a0));
          _mm256_storeu_si256((__m256i*)&macc[lb + 1][bh],
                              _mm512_cvtepi64_epi32(a1));
          _mm256_storeu_si256((__m256i*)&macc[lb + 2][bh],
                              _mm512_cvtepi64_epi32(a2));
          _mm256_storeu_si256((__m256i*)&macc[lb + 3][bh],
                              _mm512_cvtepi64_epi32(a3));
          _mm256_storeu_si256((__m256i*)&macc[lb + 4][bh],
                              _mm512_cvtepi64_epi32(a4));
          _mm256_storeu_si256((__m256i*)&macc[lb + 5][bh],
                              _mm512_cvtepi64_epi32(a5));
        }
      }
#else
      std::memset(macc, 0, sizeof(macc));
      for (int m = 0; m < 36; ++m) {
        const int32_t* row =
            m < 18 ? (prv ? prv + m * 32 : nullptr) : cur + (m - 18) * 32;
        if (!row) continue;  // first granule: prev half is zero
        for (int l = 0; l < 18; ++l) {
          const int64_t c = cos_l[l * 36 + m];
          uint32_t* ml = macc[l];
          for (int b = 0; b < 32; ++b)
            ml[b] += uint32_t((int64_t(row[b]) * c) >> 32);
        }
      }
#endif
      for (int b = 0; b < 32; ++b)
        for (int l = 0; l < 18; ++l) og[b * 18 + l] = int32_t(macc[l][b]);

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
