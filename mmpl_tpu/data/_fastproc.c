/* Native frame preprocessing for the training data path.
 *
 * The reference preprocesses video frames per-Python-call through
 * torchvision/PIL (MMPL_t2v/utils/wan_dataset.py:64-110: max-scale resize,
 * center crop, ToTensor, Normalize(0.5, 0.5)).  On this image's 1-core
 * host that chain dominates offline encoding wall-clock, so the whole
 * fused pipeline runs here in one C call per CLIP (all frames batched):
 *
 *   uint8 [T, H, W, 3]  ->  float32 [T, 3, th, tw] in [-1, 1]
 *
 * Separable resampling with per-axis precomputed tap weights (box/area
 * filter on downscale, 2-tap bilinear on upscale), horizontal pass
 * restricted to the source rows the crop needs.  Visually equivalent to
 * PIL's filters, not bit-identical (see data/fastproc.py).
 *
 * Built at import time by data/fastproc.py via cc -O3 -shared; loaded
 * with ctypes (no pybind11 in this image).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

typedef struct {
    int *start;     /* [n_out] first source index of the tap window   */
    int *count;     /* [n_out] number of taps                         */
    float *weight;  /* [n_out * max_taps] normalised tap weights      */
    int max_taps;
} Taps;

/* Tap table for resampling axis length `in` -> `resized`, but only for
 * output indices [out0, out0 + n_out) (the crop window). */
static int build_taps(Taps *t, int in, long resized, long out0, int n_out) {
    double inv = (double)in / (double)resized;
    int max_taps = (int)ceil(inv) + 2;
    if (max_taps < 2) max_taps = 2;
    t->max_taps = max_taps;
    t->start = (int *)malloc(sizeof(int) * n_out);
    t->count = (int *)malloc(sizeof(int) * n_out);
    t->weight = (float *)calloc((size_t)n_out * max_taps, sizeof(float));
    if (!t->start || !t->count || !t->weight) return 1;

    for (int o = 0; o < n_out; ++o) {
        long oo = out0 + o;
        if (inv > 1.0) {                       /* downscale: box/area     */
            double s0 = oo * inv, s1 = (oo + 1) * inv;
            int i0 = (int)floor(s0), i1 = (int)ceil(s1);
            if (i0 < 0) i0 = 0;
            if (i1 > in) i1 = in;
            if (i1 - i0 > max_taps) i1 = i0 + max_taps;
            float wsum = 0.f;
            for (int i = i0; i < i1; ++i) {
                double w = fmin((double)(i + 1), s1) - fmax((double)i, s0);
                if (w < 0) w = 0;
                t->weight[(size_t)o * max_taps + (i - i0)] = (float)w;
                wsum += (float)w;
            }
            t->start[o] = i0;
            t->count[o] = i1 - i0;
            if (wsum > 0)
                for (int k = 0; k < i1 - i0; ++k)
                    t->weight[(size_t)o * max_taps + k] /= wsum;
        } else {                               /* upscale: 2-tap bilinear */
            double s = (oo + 0.5) * inv - 0.5;
            int i0 = (int)floor(s);
            double f = s - i0;
            if (i0 < 0) { i0 = 0; f = 0; }
            int i1 = i0 + 1 < in ? i0 + 1 : i0;
            t->start[o] = i0;
            t->count[o] = (i1 > i0) ? 2 : 1;
            t->weight[(size_t)o * max_taps + 0] = (float)(1.0 - f);
            if (i1 > i0)
                t->weight[(size_t)o * max_taps + 1] = (float)f;
            else
                t->weight[(size_t)o * max_taps + 0] = 1.f;
        }
    }
    return 0;
}

static void free_taps(Taps *t) {
    free(t->start); free(t->count); free(t->weight);
}

/* Fused max-scale resize + center crop + normalise + HWC->CHW for a clip.
 * src: [T, H, W, 3] uint8;  dst: [T, 3, th, tw] float32 in [-1, 1].
 * Returns 0 on success. */
int scale_crop_normalize_clip(const uint8_t *src, int T, int H, int W,
                              float *dst, int th, int tw) {
    if (T <= 0 || H <= 0 || W <= 0 || th <= 0 || tw <= 0) return 1;
    double scale = (double)tw / W;
    double sh = (double)th / H;
    if (sh > scale) scale = sh;            /* max-scale: cover the target */
    long rh = lround(H * scale), rw = lround(W * scale);
    if (rh < th) rh = th;
    if (rw < tw) rw = tw;
    long y_off = (rh - th) / 2, x_off = (rw - tw) / 2;

    Taps tx, ty;
    if (build_taps(&tx, W, rw, x_off, tw)) return 2;
    if (build_taps(&ty, H, rh, y_off, th)) { free_taps(&tx); return 2; }

    /* source row window needed by the vertical taps */
    int row0 = ty.start[0];
    int row1 = ty.start[th - 1] + ty.count[th - 1];
    if (row1 > H) row1 = H;
    int nrows = row1 - row0;

    /* horizontal pass buffer, PLANAR [3, nrows, tw] so the vertical pass
     * reduces over contiguous rows (vectorisable SAXPY) */
    size_t tplane = (size_t)nrows * tw;
    float *tmp = (float *)malloc(sizeof(float) * tplane * 3);
    float *acc = (float *)malloc(sizeof(float) * (size_t)tw);
    if (!tmp || !acc) {
        free(tmp); free(acc); free_taps(&tx); free_taps(&ty); return 2;
    }

    const long frame_in = (long)H * W * 3;
    const long plane = (long)th * tw;
    for (int t = 0; t < T; ++t) {
        const uint8_t *f = src + (long)t * frame_in;
        /* horizontal: src rows row0..row1 -> planar tmp */
        for (int r = 0; r < nrows; ++r) {
            const uint8_t *row = f + (long)(row0 + r) * W * 3;
            float *t0 = tmp + (size_t)r * tw;
            float *t1 = t0 + tplane;
            float *t2 = t1 + tplane;
            for (int x = 0; x < tw; ++x) {
                const float *w = tx.weight + (size_t)x * tx.max_taps;
                const uint8_t *p = row + (long)tx.start[x] * 3;
                float a0 = 0.f, a1 = 0.f, a2 = 0.f;
                for (int k = 0; k < tx.count[x]; ++k) {
                    float wk = w[k];
                    a0 += wk * p[0]; a1 += wk * p[1]; a2 += wk * p[2];
                    p += 3;
                }
                t0[x] = a0; t1[x] = a1; t2[x] = a2;
            }
        }
        /* vertical (contiguous row SAXPY) + normalise */
        float *o = dst + (long)t * 3 * plane;
        for (int c = 0; c < 3; ++c) {
            const float *tp = tmp + (size_t)c * tplane;
            float *oc = o + (long)c * plane;
            for (int y = 0; y < th; ++y) {
                const float *w = ty.weight + (size_t)y * ty.max_taps;
                int s0 = ty.start[y] - row0;
                int cnt = ty.count[y];
                const float *p0 = tp + (size_t)s0 * tw;
                float w0 = w[0];
                for (int x = 0; x < tw; ++x)
                    acc[x] = w0 * p0[x];
                for (int k = 1; k < cnt; ++k) {
                    const float *pk = tp + (size_t)(s0 + k) * tw;
                    float wk = w[k];
                    for (int x = 0; x < tw; ++x)
                        acc[x] += wk * pk[x];
                }
                float *oy = oc + (long)y * tw;
                for (int x = 0; x < tw; ++x)
                    oy[x] = acc[x] * (1.f / 127.5f) - 1.f;
            }
        }
    }
    free(tmp);
    free(acc);
    free_taps(&tx);
    free_taps(&ty);
    return 0;
}
