/* Native host-side data-loader kernels.
 *
 * The reference's heavy host machinery lives in the external CARLA C++
 * server (SURVEY.md); the only native-worthy hot path that remains in the
 * rebuilt framework is the training input pipeline: decoding bit-packed
 * BEV episodes and the dataset rotation jitter run per sample on the host
 * while the TPU trains. These loops are branch-free C so the compiler
 * vectorizes them; Python binds via ctypes (no pybind11 in this image).
 */
#include <stdint.h>
#include <string.h>
#include <math.h>

/* (n) packed bytes -> (n, 7) float 0/1 planes, via a 256-entry LUT so
 * each pixel is one 28-byte copy instead of 7 strided scalar stores. */
static float LUT[256][8];
static int LUT_READY = 0;

static void init_lut(void) {
    for (int v = 0; v < 256; ++v)
        for (int c = 0; c < 8; ++c)
            LUT[v][c] = (float)((v >> c) & 1);
    LUT_READY = 1;
}

void unpack_birdview_f32(const uint8_t *packed, float *out, int64_t n) {
    if (!LUT_READY) init_lut();
    for (int64_t i = 0; i < n; ++i)
        memcpy(out + i * 7, LUT[packed[i]], 7 * sizeof(float));
}

/* (n, 7) float planes -> (n) packed bytes */
void pack_birdview_u8(const float *bv, uint8_t *out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        const float *b = bv + i * 7;
        uint8_t p = 0;
        for (int c = 0; c < 7; ++c)
            p |= (uint8_t)((b[c] > 0.0f) ? (1u << c) : 0u);
        out[i] = p;
    }
}

/* Nearest-neighbor rotation of a (h, w) uint8 plane about (cx, cy) by
 * `deg` degrees CCW (cv2.getRotationMatrix2D convention): the inverse
 * map samples src at M^{-1} (dst - c) + c. Out-of-bounds -> 0. */
void rotate_nearest_u8(const uint8_t *src, uint8_t *dst, int32_t h,
                       int32_t w, float cx, float cy, float deg) {
    const float a = deg * (float)(M_PI / 180.0);
    const float c = cosf(a), s = sinf(a);
    for (int32_t y = 0; y < h; ++y) {
        const float dy = (float)y - cy;
        for (int32_t x = 0; x < w; ++x) {
            const float dx = (float)x - cx;
            const float sx = cx + c * dx - s * dy;
            const float sy = cy + s * dx + c * dy;
            const int32_t ix = (int32_t)lrintf(sx);
            const int32_t iy = (int32_t)lrintf(sy);
            dst[(int64_t)y * w + x] =
                (ix >= 0 && ix < w && iy >= 0 && iy < h)
                    ? src[(int64_t)iy * w + ix]
                    : 0;
        }
    }
}
