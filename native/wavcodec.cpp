// Fast WAV sample codec — the hot inner loops of WAV encode/decode
// (PCM16/24/32 + float32 <-> double), the native counterpart of the
// reference's WAVReader/WAVWriter sample conversion. Container parsing stays
// in Python (utils/wav.py); these loops convert bulk sample data at memory
// bandwidth for the streaming writer (AsyncWavWriter analog).

#include <cstdint>
#include <cstring>

extern "C" {

void wav_decode_pcm16(const int16_t* src, double* dst, int64_t n) {
  constexpr double k = 1.0 / 32768.0;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * k;
}

void wav_decode_pcm24(const uint8_t* src, double* dst, int64_t n) {
  constexpr double k = 1.0 / 8388608.0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t v = src[3 * i] | (src[3 * i + 1] << 8) | (src[3 * i + 2] << 16);
    if (v >= (1 << 23)) v -= (1 << 24);
    dst[i] = v * k;
  }
}

void wav_decode_pcm32(const int32_t* src, double* dst, int64_t n) {
  constexpr double k = 1.0 / 2147483648.0;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * k;
}

void wav_encode_pcm16(const double* src, int16_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    double v = src[i];
    if (v > 0.999969482421875) v = 0.999969482421875;
    if (v < -1.0) v = -1.0;
    dst[i] = static_cast<int16_t>(v * 32768.0);
  }
}

void wav_encode_pcm24(const double* src, uint8_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    double v = src[i];
    if (v > 0.99999988) v = 0.99999988;
    if (v < -1.0) v = -1.0;
    int32_t q = static_cast<int32_t>(v * 8388608.0);
    dst[3 * i] = q & 0xFF;
    dst[3 * i + 1] = (q >> 8) & 0xFF;
    dst[3 * i + 2] = (q >> 16) & 0xFF;
  }
}

void wav_encode_f32(const double* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
}

}  // extern "C"
