/* Native audio codec primitives for the host-side I/O path.
 *
 * The hot host-side loops around the device compute — float↔PCM16
 * conversion with clipping/rounding and peak scans over multi-minute
 * sessions — are memory-bound C loops that vectorize well; gcc -O3
 * auto-vectorizes all three. Python binds via ctypes
 * (vocalie_tts_tpu/native/__init__.py) with a numpy fallback when the
 * shared object has not been built.
 *
 * Build: scripts/build-native.sh (gcc -O3 -shared -fPIC).
 */

#include <stdint.h>
#include <stddef.h>
#include <math.h>

/* float [-1,1] → int16 with clipping and round-half-away-from-zero
 * (matches numpy's np.round for the PCM grid). */
void encode_pcm16(const float *in, int16_t *out, size_t n) {
    for (size_t i = 0; i < n; i++) {
        float x = in[i];
        if (x > 1.0f) x = 1.0f;
        if (x < -1.0f) x = -1.0f;
        float scaled = x * 32767.0f;
        out[i] = (int16_t)(scaled >= 0.0f ? scaled + 0.5f : scaled - 0.5f);
    }
}

/* int16 → float in [-1, 1) (divide by 32768, reference convention). */
void decode_pcm16(const int16_t *in, float *out, size_t n) {
    const float inv = 1.0f / 32768.0f;
    for (size_t i = 0; i < n; i++) {
        out[i] = (float)in[i] * inv;
    }
}

/* max |x| over the buffer — the peak-normalization scan. */
float peak_abs(const float *in, size_t n) {
    float peak = 0.0f;
    for (size_t i = 0; i < n; i++) {
        float a = fabsf(in[i]);
        if (a > peak) peak = a;
    }
    return peak;
}

/* root-mean-square — reference-audio validation. */
float rms(const float *in, size_t n) {
    if (n == 0) return 0.0f;
    double acc = 0.0;
    for (size_t i = 0; i < n; i++) {
        acc += (double)in[i] * (double)in[i];
    }
    return (float)sqrt(acc / (double)n);
}

/* first/last index where |x| > threshold → active range scan.
 * Returns 0 when nothing exceeds the threshold, else 1. */
int active_range(const float *in, size_t n, float threshold,
                 size_t *start, size_t *end) {
    size_t lo = n, hi = 0;
    for (size_t i = 0; i < n; i++) {
        float a = in[i] < 0 ? -in[i] : in[i];
        if (a > threshold) { lo = i; break; }
    }
    if (lo == n) return 0;
    for (size_t i = n; i > 0; i--) {
        float a = in[i - 1] < 0 ? -in[i - 1] : in[i - 1];
        if (a > threshold) { hi = i; break; }
    }
    *start = lo;
    *end = hi;
    return 1;
}
